"""Exact substring (span) dedup — the ExactSubstr pass of Lee et al.
2021 ("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499) at fixed k-gram granularity: any token span of
length >= k that occurs more than once ANYWHERE in the corpus is kept
only at its first occurrence (lexicographic (id, pos)) and removed
from every other document position; documents are reassembled from
their surviving tokens.

Relation to the paper: a shared substring of >= k tokens has ALL of
its length-k windows duplicated, so the non-first occurrence is fully
covered by duplicated k-gram starts and gets removed — exactly the
paper's "remove the duplicate span from all but one occurrence", with
the suffix-array machinery replaced by a k-gram groupBy that Catalyst
can plan. Spans shorter than k tokens are never touched. The
document-level tiers (MinHash/SimHash/containment, plans/pipeline.py)
drop whole near-dup documents; this operator is the complementary
WITHIN-document pass that strips quoted boilerplate from documents
that otherwise survive. No reference counterpart (the reference ends
at record-level keys) — graft training-data tier alongside
operators/linededup.py.

Scale design (the budget at 10^12 docs):

- gram occurrences are (xxhash64-chain, id, pos) — the shared
  functions/repetition.py gram kernel, no gram STRINGS are ever
  built or shuffled (a k=50 gram string is ~300 B; the hash is 8 B);
- "first occurrence" is ``min(struct(id, pos))`` under groupBy(gram
  hash) — partial aggregation combines map-side, so a boilerplate
  gram occurring 10^6 times costs one combiner row per partition,
  never a 10^6-row window partition (same skew posture as
  linededup.py);
- only grams with count >= 2 survive the aggregate; the
  occurrence-side join back is an equi-join on the gram hash that
  AQE skew-splits if a band is hot;
- duplicate START positions (longs) are the only thing grouped per
  doc; covered intervals are merged per-document with one fold over
  the sorted starts (a boilerplate run of m overlapping starts melts
  into ONE interval), and the token filter is O(tokens × intervals)
  with intervals typically O(1) — the document text itself never
  shuffles: reassembly is a pure column expression on the original
  row.

Hash note: two DISTINCT grams colliding in xxhash64 would wrongly
mark a span duplicated; P ≈ (corpus gram count)²/2^65 per pair —
negligible even at 10^12 docs, and the DuckDB oracle twin (which
compares gram strings exactly) doubles as a collision canary at test
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acxspark.functions.repetition import _tokens, gram_hashes


def duplicate_span_starts(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 8) -> DataFrame:
    """(id, pos) of every duplicated-k-gram occurrence that is NOT the
    corpus-wide first occurrence of that gram — the removal set.

    ``pos`` is the 0-based token index where the duplicated k-gram
    starts; tokens pos..pos+k-1 of that document are scheduled for
    removal (after interval merging in :func:`span_dedup`).
    """
    occ = docs.select(
        F.col(id_col),
        F.posexplode(gram_hashes(_tokens(F.col(text_col)), k)).alias("pos", "gh"),
    )
    firsts = (
        occ.groupBy("gh")
        .agg(
            F.count("*").alias("_c"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first"),
        )
        .filter(F.col("_c") >= 2)
        .select(
            "gh",
            F.col(f"first.{id_col}").alias("_fid"),
            F.col("first.pos").alias("_fpos"),
        )
    )
    return (
        occ.join(firsts, "gh")  # inner: non-dup grams vanish here
        .filter(
            ~((F.col(id_col) == F.col("_fid")) & (F.col("pos") == F.col("_fpos")))
        )
        .select(id_col, "pos")
    )


def _merged_intervals(starts_sorted, k: int):
    """Fold sorted duplicate-start positions into merged, disjoint
    [lo, hi] cover intervals (start s covers s..s+k-1; overlapping or
    adjacent intervals coalesce). A run of m consecutive boilerplate
    starts becomes ONE interval, keeping the downstream token filter
    O(tokens × few)."""
    empty = F.array().cast("array<struct<lo:int,hi:int>>")

    def step(acc, s):
        last = F.element_at(acc, -1)
        new_iv = F.struct(s.cast("int").alias("lo"),
                          (s + k - 1).cast("int").alias("hi"))
        extend = F.struct(
            last["lo"].alias("lo"),
            F.greatest(last["hi"], (s + k - 1).cast("int")).alias("hi"),
        )
        return (
            F.when(F.size(acc) == 0, F.array(new_iv))
            .when(
                s.cast("int") <= last["hi"] + 1,
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(extend)),
            )
            .otherwise(F.concat(acc, F.array(new_iv)))
        )

    return F.aggregate(starts_sorted, empty, step)


def span_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 8) -> DataFrame:
    """(id, clean_text, n_tokens, n_removed): corpus-wide exact
    substring dedup at k-token granularity, first occurrence wins.

    Documents with no duplicated span come back byte-identical
    (single-space token join of their own tokens — callers that must
    preserve original whitespace should treat clean_text as the
    canonical retokenized form, as Lee et al.'s pipeline does).
    """
    starts = (
        duplicate_span_starts(docs, id_col, text_col, k)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("_starts"))
    )
    toks = F.col("_toks")
    merged = _merged_intervals(F.col("_starts"), k)
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("_iv"), lambda m: (i >= m["lo"]) & (i <= m["hi"])
        ),
    )
    return (
        docs.select(id_col, text_col)
        .join(starts, id_col, "left")
        .withColumn("_toks", _tokens(F.col(text_col)))
        .withColumn(
            "_iv",
            F.coalesce(merged, F.array().cast("array<struct<lo:int,hi:int>>")),
        )
        .withColumn("_kept", kept)
        .select(
            id_col,
            F.array_join(F.col("_kept"), " ").alias("clean_text"),
            F.size("_toks").cast("long").alias("n_tokens"),
            (F.size("_toks") - F.size("_kept")).cast("long").alias("n_removed"),
        )
    )
