"""As-of join semantics (operators/asof.py)."""

from __future__ import annotations

from acxspark.operators.asof import asof_join


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3"), (3, 7, "p4")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 9, 200.0)],
        "k long, ts long, value double",
    )
    out = {
        r["tag"]: r["value_asof"]
        for r in asof_join(left, right, key="k", ts="ts").collect()
    }
    assert out["p1"] == 100.0   # inclusive: right at same ts matches
    assert out["p2"] == 150.0   # latest preceding, not first
    assert out["p3"] is None    # right row is AFTER the left ts
    assert out["p4"] is None    # key never seen on the right


def test_asof_deterministic_across_partitionings(spark):
    left = spark.createDataFrame(
        [(1, i, f"p{i}") for i in range(0, 50, 5)], "k long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, i, float(i)) for i in range(50)]
        + [(1, 25, 999.0)],  # duplicate right ts → tie-break must be stable
        "k long, ts long, value double",
    )
    a = asof_join(left.repartition(1), right.repartition(1), "k", "ts").collect()
    b = asof_join(left.repartition(7), right.repartition(5), "k", "ts").collect()
    assert {(r["tag"], r["value_asof"]) for r in a} == {
        (r["tag"], r["value_asof"]) for r in b
    }
    tied = {r["tag"]: r["value_asof"] for r in a}
    assert tied["p25"] == 999.0  # max wins the equal-ts tie


def test_asof_attaches_latest_right_row_wholesale(spark):
    """A NULL field in the most recent right row must stay NULL — not
    be backfilled from an older row (per-column ignorenulls used to
    stitch together a right row that never existed)."""
    from acxspark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 3)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 1, 5.0, 9.0), ("k", 2, None, 7.0)],
        ["key", "ts", "v", "w"],
    )
    row = asof_join(left, right, key="key", ts="ts").first()
    assert row["w_asof"] == 7.0
    assert row["v_asof"] is None   # the t=2 row's NULL, not t=1's 5.0
