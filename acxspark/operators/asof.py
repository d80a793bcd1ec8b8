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
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, ts)],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l_tag.unionByName(r_tag)
    # right (_side=0) sorts before left (_side=1) at equal ts ⇒ the
    # carried value at a left row includes same-timestamp right rows;
    # the value columns join the sort key so two right rows sharing
    # (key, ts) resolve deterministically (max wins) instead of by
    # partition placement
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(),
                 *[F.col(f"_r_{c}").asc_nulls_first() for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop(
        "_side", *[f"_r_{c}" for c in value_cols]
    )
