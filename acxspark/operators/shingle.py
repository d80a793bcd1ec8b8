"""Word k-shingling, entirely JVM-side (whole-stage codegen, no UDF).

The reference documents fuzzy dedup over configurable keys +
similarity threshold but never implements it (reference README.md:36,
53,119,194; no similarity code in src/). This is stage 1 of our
implementation: canonical text → word k-grams → 64-bit xxhash64
shingle set.

Scale note: shingle hashing via ``transform`` + ``xxhash64`` stays
inside codegen; the array of distinct shingle hashes is what flows to
MinHash, so raw text is dropped immediately after this projection
(column pruning keeps the 100 TB of html out of the shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from acxspark.config import DEFAULT_CONFIG, DedupConfig
from acxspark.functions.normalize import tokens


def shingle_hashes(text_col, k: int = DEFAULT_CONFIG.shingle_k, seed: int = 42) -> Column:
    """array<long> of distinct xxhash64 values of the k-gram shingles.

    Documents shorter than k tokens hash their full token string as a
    single shingle (so tiny docs still participate).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k)), F.lit(seed)),
    )
    return F.array_distinct(grams)


def with_shingles(df: DataFrame, text_col: str = "text",
                  cfg: DedupConfig = DEFAULT_CONFIG,
                  out_col: str = "shingles") -> DataFrame:
    return df.withColumn(out_col, shingle_hashes(F.col(text_col), cfg.shingle_k, cfg.seed))
