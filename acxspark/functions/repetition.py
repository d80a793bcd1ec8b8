"""Per-document repetition statistics — the Gopher/MassiveText-style
quality filter (Rae et al. 2021, §A1.1) LLM webtext pipelines apply
before dedup: documents dominated by repeated n-grams (scraper loops,
keyword stuffing, boilerplate) are dropped by thresholding
(a) the duplicate n-gram fraction and (b) the fraction taken by the
single most frequent n-gram. No reference counterpart (the reference
validates field syntax, not content quality) — graft training-data
tier alongside functions/text.py's quality_score.

Scale design: everything is a pure column expression over the token
array with ZERO shuffle — a 100 TB corpus scan stays map-only. The
stats are computed over xxhash64 GRAM HASHES, not gram strings:
building space-joined gram strings per element (array_join+slice in a
transform lambda) allocates a slice array and a string per gram in
the interpreted higher-order-function evaluator, and measured 25x
slower than the hashed formulation on a 40k-doc corpus (88.7s vs
3.6s at 8 cores, identical outputs). Instead, grams are built by
folding ``zip_with`` over shifted slices of the token array (n-1
zips, each one xxhash64 per gram), and distinct-count + max
multiplicity come from a SINGLE O(n) fold over the sorted hash array
(no separate array_distinct pass). Duplicate/top fractions over
64-bit hashes equal those over the strings unless two distinct grams
of the SAME document collide — probability ~m^2/2^65 (~1e-15 for a
400-gram page), negligible even summed over 10^12 docs.

The explode+groupBy formulation (the DuckDB oracle twin of
``repetition_filter_docs``) would shuffle every n-gram of every
document — at ~1 KB/doc that is a corpus-sized shuffle bought for
nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gram_hashes(toks: Column, n: int) -> Column:
    """xxhash64 of each word n-gram as ``array<long>``; empty array
    when fewer than n tokens. Built shuffle-free by hashing the first
    token of every gram, then folding each of the n-1 shifted token
    slices in with ``zip_with`` — one hash call per gram per level,
    no per-gram string/array allocation."""
    sz = F.size(toks)
    m = F.greatest(sz - n + 1, F.lit(0))
    acc = F.transform(F.slice(toks, 1, m), lambda x: F.xxhash64(x))
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, 1 + j, m), lambda a, b: F.xxhash64(a, b))
    return F.when(sz >= n, acc).otherwise(F.array().cast("array<long>"))


def _sorted_fold(grams_h: Column) -> Column:
    """ONE pass over the sorted hash array producing
    struct(best=max multiplicity, nd=distinct count): run-length of
    equal neighbours for the max, prev!=x transitions for the
    distinct count. Replaces a separate array_distinct scan + fold."""
    return F.aggregate(
        F.array_sort(grams_h),
        F.struct(
            F.lit(None).cast("long").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("nd"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(x.eqNullSafe(acc["prev"]), acc["nd"])
            .otherwise(acc["nd"] + 1)
            .alias("nd"),
        ),
        lambda acc: F.struct(acc["best"].alias("best"), acc["nd"].alias("nd")),
    )


def _tokens(text: Column) -> Column:
    # whitespace CLASS, not a single literal space: the filter's
    # domain is multi-line webtext, and splitting on ' ' alone merged
    # tokens across newlines/tabs ('end.\\nThe'), computing the
    # repetition stats over wrong word grams. Case is preserved (the
    # gram identity stays Gopher's raw words); the DuckDB twin
    # (queries.py repetition_filter_docs) splits identically.
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def rep_keep_col(
    text: Column,
    n: int = 2,
    max_dup_frac: float = 0.3,
    max_top_frac: float = 0.2,
    min_grams: int = 20,
) -> Column:
    """The Gopher-style keep decision as ONE fold: the finish lambda
    computes the boolean directly from (best, nd, cnt), so the gram
    array appears exactly once in the expression tree. Column
    expressions are trees, not DAGs — composing ``rep_keep`` out of
    separate dup/top columns (each embedding its own copy of the
    fold, as repetition_cols must to expose the stats individually)
    duplicates the sorted fold and the gram construction; measured
    1.7x slower on the 40k-doc gate (3.26 s vs 1.95 s, 8 cores).
    Value-identical to repetition_cols()['rep_keep'] (same 6-decimal
    rounding before the threshold comparison; pytest-asserted).
    """
    return F.aggregate(
        F.array_sort(gram_hashes(_tokens(text), n)),
        F.struct(
            F.lit(None).cast("long").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("nd"),
            F.lit(0).alias("cnt"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(x.eqNullSafe(acc["prev"]), acc["nd"])
            .otherwise(acc["nd"] + 1)
            .alias("nd"),
            (acc["cnt"] + 1).alias("cnt"),
        ),
        lambda acc: (acc["cnt"] < min_grams)
        | (
            # cnt >= min_grams >= 1 in this branch unless min_grams <= 0,
            # so guard the divisions for that degenerate config
            F.when(
                acc["cnt"] > 0,
                (
                    F.round(
                        1.0 - acc["nd"] / acc["cnt"].cast("double"), 6
                    )
                    <= max_dup_frac
                )
                & (
                    F.round(acc["best"] / acc["cnt"].cast("double"), 6)
                    <= max_top_frac
                ),
            ).otherwise(F.lit(True))
        ),
    )


def repetition_cols(
    text: Column,
    n: int = 2,
    max_dup_frac: float = 0.3,
    max_top_frac: float = 0.2,
    min_grams: int = 20,
) -> dict[str, Column]:
    """The four stat columns as plain expressions, for composing into
    a wider single-scan select (e.g. the webtext_clean_gate query):
    n_grams, dup_gram_frac, top_gram_frac, rep_keep. Callers that
    need several of these in ONE projection should prefer
    ``repetition_stats`` (two-step select, fold evaluated once), and
    callers that only want the gate decision should use
    :func:`rep_keep_col` (single fold; the dict's ``rep_keep`` here
    necessarily embeds the fold twice, once via dup and once via
    top, because column expressions are trees)."""
    grams = gram_hashes(_tokens(text), n)
    total = F.size(grams)
    fold = _sorted_fold(grams)
    dup = F.when(
        total > 0,
        F.round(1.0 - fold["nd"] / total.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    top = F.when(
        total > 0,
        F.round(fold["best"] / total.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    keep = (total < min_grams) | ((dup <= max_dup_frac) & (top <= max_top_frac))
    return {
        "n_grams": total,
        "dup_gram_frac": dup,
        "top_gram_frac": top,
        "rep_keep": keep,
    }


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_dup_frac: float = 0.3,
    max_top_frac: float = 0.2,
    min_grams: int = 20,
) -> DataFrame:
    """(id, n_grams, dup_gram_frac, top_gram_frac, rep_keep).

    ``dup_gram_frac`` = fraction of n-gram occurrences that are
    repeats of an n-gram already seen in the SAME document
    (1 - distinct/total); ``top_gram_frac`` = share of the most
    frequent n-gram. ``rep_keep`` applies the Gopher-style thresholds
    — but only to documents with at least ``min_grams`` n-grams: a
    4-token document's top 2-gram is trivially 1/3 of it, which says
    nothing about scraper loops (Gopher applies repetition filters to
    web documents, not snippets). Fractions are rounded to 6 decimals
    (stable across engines).

    Two-step select so the gram array and the sorted fold are each
    evaluated ONCE for all four outputs (CollapseProject does not
    merge projections that would duplicate non-cheap expressions).
    """
    grams = gram_hashes(_tokens(F.col(text_col)), n)
    mid = docs.select(
        F.col(id_col),
        F.size(grams).alias("_tot"),
        _sorted_fold(grams).alias("_f"),
    )
    tot = F.col("_tot")
    dup = F.when(
        tot > 0, F.round(1.0 - F.col("_f.nd") / tot.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    top = F.when(
        tot > 0, F.round(F.col("_f.best") / tot.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return mid.select(
        F.col(id_col),
        tot.alias("n_grams"),
        dup.alias("dup_gram_frac"),
        top.alias("top_gram_frac"),
        (
            (tot < min_grams) | ((dup <= max_dup_frac) & (top <= max_top_frac))
        ).alias("rep_keep"),
    )
