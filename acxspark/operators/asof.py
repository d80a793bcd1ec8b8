"""As-of join — an operator Spark lacks natively, built from a union +
window (no UDF, one shuffle+sort per key).

For each left row, attach the LATEST right row with the same key and
``right.ts <= left.ts`` (backward as-of, inclusive — the common
point-in-time-correctness semantics for feature lookup).

Method: tag the sides, union on (key, ts), sort within key by
(ts, side) with right rows ordering BEFORE left rows at equal ts, then
``last(value, ignorenulls=True)`` over an unbounded-preceding window
carries the most recent right value onto every left row. One exchange
on the key + one sort — the same cost shape as a sort-merge join, with
no range-explosion; skewed keys fall to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """left ⟕-asof right on (key, ts). Output = left columns + each
    right ``value_col`` as ``<col><suffix>`` (NULL when no right row
    precedes)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    from pyspark.sql import types as T

    # ONE struct per right row, not per-column carries: ignorenulls
    # over independent value columns would skip a legitimately-NULL
    # field of the latest right row and backfill it from an OLDER row
    # — stitching together a right "row" that never existed. The
    # struct is non-null exactly for right rows, so last(ignorenulls)
    # attaches the latest right row WHOLESALE, NULL fields included
    # (pandas merge_asof / DuckDB ASOF semantics).
    r_struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, ts)],
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    # right (_side=0) sorts before left (_side=1) at equal ts ⇒ the
    # carried value at a left row includes same-timestamp right rows;
    # the row struct joins the sort key so two right rows sharing
    # (key, ts) resolve deterministically (max struct wins) instead of
    # by partition placement
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(),
                 F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_rc", F.last(F.col("_r"), ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        *[c for c in carried.columns if c not in ("_side", "_r", "_rc")],
        *[F.col(f"_rc.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
