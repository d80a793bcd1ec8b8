"""Candidate verification: exact Jaccard + substring containment,
both whole-stage codegen by default.

Stage 4 (north_rule: "per-partition suffix-array exact-substring
verification"). Candidate pairs from LSH/SimHash are re-checked:

- ``verified_edges``: exact shingle-set Jaccard with
  array_intersect/array_union — whole-stage codegen, no UDF; keeps
  pairs with J >= cfg.jaccard_threshold.
- ``containment_edges``: detects page-inside-page duplication that
  Jaccard misses when the outer page is much larger. Default (round
  4): a codegen ``contains(outer, inner)`` filter behind a 64-char
  prefix probe — zero Python, zero grouping shuffle
  (BENCH/r4_containment.json A/Bs it against the Python path on the
  640k bench corpus, identical edges). The python/suffix-array paths
  remain as the parity twin: applyInPandas over bounded candidate
  groups, optional per-group suffix array binary-searched per pair.

Group-size guard (python path only): groups above ``max_group_docs``
are truncated by doc order — the generalization of the reference's
1 MiB record cap (reference src/storage.cpp:516) to group granularity
(SURVEY §7.3.5). The JVM path needs no cap: there are no groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acxspark.config import DEFAULT_CONFIG, DedupConfig

# ---------------------------------------------------------------- jaccard


def exact_jaccard_edges(pairs: DataFrame, docs_with_shingles: DataFrame,
                        id_col: str,
                        cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """pairs(id_a,id_b) ⋈ shingles → (id_a, id_b, jaccard) filtered at τ.

    Two hash joins on the doc id (both sides pruned to id+shingles);
    the Jaccard itself is array_intersect/union sizes inside codegen.

    The shingle side is first semi-joined down to the ids that appear
    in any pair: shingle arrays are the widest rows in the pipeline
    (~kB/doc) and candidates usually touch a small fraction of the
    corpus, so pruning BEFORE the pair joins keeps the wide rows out
    of (most of) the join shuffles. AQE broadcasts the id list when
    it is small; when pairs are huge the semi-join degrades to one
    full shuffle of the shingle side — still no worse than the
    un-pruned second pair join it replaces. Callers that consume the
    pairs plan more than once (this joins ``pairs`` twice more)
    should pass a persisted ``pairs``, as plans/pipeline.py does.
    """
    sh = docs_with_shingles.select(F.col(id_col), F.col("shingles"))
    pair_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = sh.join(pair_ids, id_col, "left_semi")
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .filter(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------ containment


def _suffix_array(s: str) -> list[int]:
    """O(n log^2 n) doubling suffix array — library-free, deterministic.

    KEPT ONLY for the opt-in ``use_suffix_array`` mode of
    :func:`containment_edges`: an interpreted-Python SA build with a
    per-comparison closure key costs minutes on a 1 MiB text, while
    CPython's C-implemented two-way search (``needle in haystack``)
    scans the same text in ~1 ms — the SA can only amortize when very
    many probes (≫ SA build cost / scan cost ≈ thousands) share one
    haystack, which the ≤64-doc group cap makes impossible. The
    default path therefore uses ``in``; output is identical (tested).
    """
    n = len(s)
    sa = list(range(n))
    rank = [ord(c) for c in s]
    tmp = [0] * n
    k = 1
    while True:
        def key(i):
            return (rank[i], rank[i + k] if i + k < n else -1)
        sa.sort(key=key)
        tmp[sa[0]] = 0
        for j in range(1, n):
            tmp[sa[j]] = tmp[sa[j - 1]] + (1 if key(sa[j]) != key(sa[j - 1]) else 0)
        rank = tmp[:]
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def _contains_via_sa(hay: str, sa: list[int], needle: str) -> bool:
    """Binary search the suffix array for needle as a prefix."""
    lo, hi = 0, len(sa)
    m = len(needle)
    while lo < hi:
        mid = (lo + hi) // 2
        if hay[sa[mid]: sa[mid] + m] < needle:
            lo = mid + 1
        else:
            hi = mid
    return lo < len(sa) and hay[sa[lo]: sa[lo] + m] == needle


def containment_edges(pairs: DataFrame, docs: DataFrame, id_col: str,
                      text_col: str = "text",
                      min_inner_chars: int = 64,
                      max_group_docs: int = 64,
                      use_suffix_array: bool = False,
                      impl: str = "jvm") -> DataFrame:
    """Mark candidate pairs where one text contains the other.

    Default ``impl='jvm'`` (round 4): the substring decision runs
    ENTIRELY inside whole-stage codegen — Python ``inner in outer``
    and JVM ``contains(outer, inner)`` are the same predicate (both
    exact substring over code points; surrogate pairs can't half-match
    because the needle is well-formed), so the applyInPandas stage the
    JVM path replaces was pure overhead: at 100 TB the old shape was
    ~10^8 Python group invocations ("hours on 4000 cores",
    docs/SCALE.md); the new shape is a codegen filter on the pair
    stream — zero Python, zero grouping shuffle, and no group-cap
    truncation (the cap only ever existed to bound the Python groups).
    A cheap probe (does inner's first-64-char prefix occur in outer?)
    gates the full scan so a non-matching pair costs one short
    ``locate``, and Java's naive indexOf can only degenerate on pairs
    that already share a 64-char block.

    ``impl='python'`` keeps the applyInPandas path (grouped by id_a;
    ``max_group_docs`` caps the PAIRS evaluated per group, applied
    after an in-group sort on id_b so the truncated subset is
    deterministic — applyInPandas delivers rows in shuffle-arrival
    order, which varies run to run) — the parity twin for tests and
    for adversarial corpora where CPython's two-way search beats
    naive indexOf. ``use_suffix_array=True`` (implies the python
    path) keeps the per-group suffix-array probe (north_rule names
    it; same output, tested) for environments with a C-speed SA
    builder.
    """
    d = docs.select(F.col(id_col), F.col(text_col))
    # participating-id semi-join, same rationale as exact_jaccard_edges:
    # texts are the heaviest column in the pipeline — prune the doc side
    # to ids that appear in any unverified pair before the text joins
    pair_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    d = d.join(pair_ids, id_col, "left_semi")
    j = (
        pairs.join(d.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a")), "id_a")
        .join(d.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b")), "id_b")
    )

    if impl == "jvm" and not use_suffix_array:
        inner = F.when(
            F.length("text_a") <= F.length("text_b"), F.col("text_a")
        ).otherwise(F.col("text_b"))
        outer = F.when(
            F.length("text_a") <= F.length("text_b"), F.col("text_b")
        ).otherwise(F.col("text_a"))
        return (
            j.select("id_a", "id_b", inner.alias("_in"), outer.alias("_out"))
            .filter(F.length("_in") >= min_inner_chars)
            # probe-then-scan: the 64-char prefix locate rejects the
            # overwhelming share of non-containments at bounded cost
            .filter(F.contains(F.col("_out"), F.substring(F.col("_in"), 1, 64)))
            .filter(F.contains(F.col("_out"), F.col("_in")))
            .select("id_a", "id_b")
        )

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic truncation: sort before head — group row order
        # is shuffle-arrival order and differs across runs/parallelism
        pdf = pdf.sort_values("id_b", kind="mergesort").head(max_group_docs)
        rows = []
        sa_cache: dict[str, list[int]] = {}
        for r in pdf.itertuples(index=False):
            a, b = r.text_a or "", r.text_b or ""
            inner, outer = (a, b) if len(a) <= len(b) else (b, a)
            if len(inner) < min_inner_chars or not inner or not outer:
                contained = False
            elif use_suffix_array:
                if outer not in sa_cache:
                    sa_cache[outer] = _suffix_array(outer)
                contained = _contains_via_sa(outer, sa_cache[outer], inner)
            else:
                contained = inner in outer
            if contained:
                rows.append({"id_a": r.id_a, "id_b": r.id_b})
        return pd.DataFrame(rows, columns=["id_a", "id_b"])

    id_type = dict(docs.dtypes)[id_col]
    schema = f"id_a {id_type}, id_b {id_type}"
    return j.groupBy("id_a").applyInPandas(check, schema=schema)
