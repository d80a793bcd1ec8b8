"""Per-document repetition statistics — the Gopher/MassiveText-style
quality filter (Rae et al. 2021, §A1.1) LLM webtext pipelines apply
before dedup: documents dominated by repeated n-grams (scraper loops,
keyword stuffing, boilerplate) are dropped by thresholding
(a) the duplicate n-gram fraction and (b) the fraction taken by the
single most frequent n-gram. No reference counterpart (the reference
validates field syntax, not content quality) — graft training-data
tier alongside functions/text.py's quality_score.

Scale design: everything is a pure column expression over the token
array — n-gram construction (transform+slice), duplicate fraction
(array_distinct), and the top-gram multiplicity (a sort + one
O(n) fold with F.aggregate) all run inside whole-stage codegen with
ZERO shuffle and zero Python; a 100 TB corpus scan stays map-only.
The explode+groupBy formulation would shuffle every n-gram of every
document — at ~1 KB/doc that is a corpus-sized shuffle bought for
nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams; empty array when fewer than n tokens
    (sequence() would otherwise count DOWN from 1 to sz-n+1)."""
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_multiplicity(grams: Column) -> Column:
    """Multiplicity of the most frequent element: sort, then a single
    O(n) fold counting the longest run of equal neighbours. Runs in
    codegen; no per-row quadratic filter() scan."""
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
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
    n_grams, dup_gram_frac, top_gram_frac, rep_keep."""
    toks = F.filter(F.split(text, " "), lambda x: x != "")
    grams = _ngrams(toks, n)
    total = F.size(grams)
    dup = F.when(
        total > 0,
        F.round(1.0 - F.size(F.array_distinct(grams)) / total.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    top = F.when(
        total > 0,
        F.round(_max_multiplicity(grams) / total.cast("double"), 6),
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
    """
    cols = repetition_cols(
        F.col(text_col), n=n, max_dup_frac=max_dup_frac,
        max_top_frac=max_top_frac, min_grams=min_grams,
    )
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )
