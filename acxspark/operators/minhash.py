"""Batched MinHash signatures — Arrow-vectorized numpy, no per-row Python.

Stage 2 of the fuzzy-dedup implementation the reference only documents
(reference README.md:119,194). Signature j of a shingle set S is
``min_{s in S} (a_j * s + b_j) mod 2^64`` with seed-pinned odd
multipliers — the permutation matrix is built once per executor from
``DedupConfig.seed`` and amortized across every Arrow batch
(north_rule: "batched MinHash signatures ... vectorized pandas/Arrow
UDFs, no per-row Python").

Scale note: per 4096-row Arrow batch the work is one numpy broadcast
per row-chunk; the 100 TB cost driver is the shuffle of the resulting
(num_perm × 8B) signatures, which is why signatures ride as
array<long> (fixed width, no strings).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from acxspark.config import DEFAULT_CONFIG, DedupConfig
from acxspark.operators.shingle import shingle_hashes

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


@lru_cache(maxsize=8)
def _perms(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


_SCRATCH: dict[int, np.ndarray] = {}


def _scratch(num_perm: int, n: int) -> np.ndarray:
    """Per-worker reusable (num_perm, >=n) buffer.

    A fresh (P, N) uint64 temp per row (~200 KB) exceeds glibc's mmap
    threshold, so the naive broadcast allocated + unmapped a fresh
    mapping per row; with 32 workers that serialized on kernel mmap
    bookkeeping and made the stage ANTI-scale (measured 5-20s swings).
    One growing buffer per worker removes every per-row mapping."""
    buf = _SCRATCH.get(num_perm)
    if buf is None or buf.shape[1] < n:
        buf = np.empty((num_perm, max(n, 1024)), dtype=np.uint64)
        _SCRATCH[num_perm] = buf
    return buf


def minhash_batch(shingle_lists: pd.Series, num_perm: int, seed: int) -> pd.Series:
    """pd.Series[list[int64-shingles]] → pd.Series[list[int64-sig]]."""
    a, b = _perms(num_perm, seed)
    a_col = a[:, None]
    out = []
    empty = [np.int64(np.iinfo(np.int64).max)] * num_perm
    for sh in shingle_lists:
        if sh is None or len(sh) == 0:
            out.append(empty)
            continue
        s = np.asarray(sh, dtype=np.int64).view(np.uint64)
        n = len(s)
        buf = _scratch(num_perm, n)
        view = buf[:, :n]
        # (P,1)*(1,N) + (P,1) in uint64 with natural mod-2^64 overflow,
        # computed in the reused scratch (no per-row allocation)
        with np.errstate(over="ignore"):
            np.multiply(a_col, s[None, :], out=view)
            view += b[:, None]
        m = view.min(axis=1)
        out.append(m.view(np.int64).tolist())
    return pd.Series(out)


def make_minhash_udf(cfg: DedupConfig = DEFAULT_CONFIG):
    num_perm, seed = cfg.num_perm, cfg.seed

    @pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(sh: pd.Series) -> pd.Series:
        return minhash_batch(sh, num_perm, seed)

    return _minhash


def minhash_signature(shingles_col, cfg: DedupConfig = DEFAULT_CONFIG) -> Column:
    return make_minhash_udf(cfg)(shingles_col)


def with_minhash(df: DataFrame, text_col: str | None = "text",
                 cfg: DedupConfig = DEFAULT_CONFIG,
                 sig_col: str = "minhash",
                 keep_shingles: bool = False,
                 shingles_col: str | None = None) -> DataFrame:
    """text → shingles → signature; drops the shingle array unless the
    verification stage downstream needs it (exact Jaccard re-check).

    Pass ``shingles_col`` to reuse an already-materialized shingle
    array (the pipeline shares one shingle scan across tiers)."""
    if shingles_col is None:
        out = df.withColumn(
            "shingles", shingle_hashes(F.col(text_col), cfg.shingle_k, cfg.seed)
        )
        shingles_col = "shingles"
    else:
        out = df
    out = out.withColumn(sig_col, minhash_signature(F.col(shingles_col), cfg))
    if not keep_shingles and shingles_col == "shingles":
        out = out.drop("shingles")
    return out


def minhash_jaccard_estimate(sig_a, sig_b) -> Column:
    """Fraction of agreeing signature positions — unbiased Jaccard
    estimator; pure zip_with, JVM-side."""
    agree = F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(agree, F.lit(0), lambda acc, x: acc + x) / F.size(sig_a)
