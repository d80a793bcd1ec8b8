"""Line-level (paragraph-level) dedup — the CCNet/RefinedWeb-style
pass LLM webtext pipelines run besides document-level dedup: a line
repeated across documents (navbars, cookie banners, footers) is kept
ONLY in its first occurrence and dropped everywhere else; documents
are reassembled from their surviving lines.

Public precedent: CCNet (Wenzek et al. 2020) deduplicates per-line
hashes across shards; RefinedWeb (Penedo et al. 2023) line-level
corrections. No reference counterpart (the reference ends at
record-level keys) — graft training-data tier.

Scale design: "first occurrence" is computed with groupBy(line) +
``min(struct(id, pos))`` — partial aggregation combines map-side, so
a line occurring 10^6 times (exactly the boilerplate this operator
exists for) costs one combiner row per partition, NOT a 10^6-row
window partition (a row_number over the line key would put the
hottest boilerplate on one reducer). Reassembly is a groupBy(doc)
over the surviving (pos, line) pairs — array_sort restores order
without a per-doc window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", sep: str = "\n",
               hot_min: int = 1024, hot_cap: int = 65536) -> DataFrame:
    """(id, clean_text, n_lines, n_kept): corpus-wide first-occurrence
    line dedup, order (id, pos) — deterministic for any orderable id.

    Empty lines are preserved per-document (they carry layout, and
    corpus-wide deduping the empty string would strip every blank
    line after the corpus' first document).

    ``sep`` is a LITERAL separator, not a regex: F.split takes a Java
    regex, so the separator is \\Q..\\E-quoted (java.util.regex
    Pattern.quote semantics, embedded \\E handled) — a caller passing
    '|' or '.' gets literal splits, not per-character ones. Reassembly
    (array_join) was always literal; both sides now agree.
    """
    quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(quoted))).alias("pos", "line"),
    )
    nonempty = lines.filter(F.col("line") != "")
    stats = (
        nonempty.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first"),
             F.count("*").alias("_n"))
        .select(
            "line",
            F.col(f"first.{id_col}").alias("_fid"),
            F.col("first.pos").alias("_fpos"),
            "_n",
        )
    )
    # hot/cold verdict split: the first-occurrence agg above is
    # combiner-friendly, but the join-BACK on the raw line key routes
    # every copy of a hot line (a 10^6-occurrence cookie banner) to one
    # reducer. The hottest lines' verdicts are tiny (one row per
    # DISTINCT hot line) — broadcast the top ``hot_cap`` of them so
    # their copies resolve map-side, and the shuffle join handles only
    # keys whose volume is bounded by the hot threshold (AQE skew-join
    # remains the second line of defense for corpora with more than
    # ``hot_cap`` distinct hot lines).
    hot = F.broadcast(
        stats.filter(F.col("_n") > hot_min)
        .orderBy(F.desc("_n"), "line")
        .limit(hot_cap)
        .drop("_n")
    )
    cold_firsts = stats.join(hot.select("line"), "line", "left_anti").drop("_n")
    keep_first = (F.col(id_col) == F.col("_fid")) & (F.col("pos") == F.col("_fpos"))
    kept_hot = (
        nonempty.join(hot, "line")          # map-side (broadcast)
        .filter(keep_first)
        .select(id_col, "pos", "line")
    )
    kept_cold = (
        nonempty.join(hot.select("line"), "line", "left_anti")  # map-side
        .join(cold_firsts, "line", "left")
        .filter(keep_first)
        .select(id_col, "pos", "line")
    )
    kept = (
        lines.filter(F.col("line") == "").select(id_col, "pos", "line")
        .unionByName(kept_hot)
        .unionByName(kept_cold)
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
        .join(totals, id_col, "right")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
