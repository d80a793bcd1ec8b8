"""Stateful streaming sessionization vs its batch oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from acxspark.streaming.sessionize import sessionize_batch, sessionize_stream

ROWS = [
    # user 1: two sessions separated by a 2h gap
    (1, "2025-01-01 10:00:00", 1.0),
    (1, "2025-01-01 10:10:00", 2.0),
    (1, "2025-01-01 12:30:00", 3.0),
    # user 2: one session
    (2, "2025-01-01 09:00:00", 5.0),
    (2, "2025-01-01 09:20:00", 7.0),
]


def _mk(spark):
    return spark.createDataFrame(
        ROWS, "user_id long, ts_s string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_batch_sessionize(spark):
    out = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(_mk(spark), gap_seconds=1800).collect()
    }
    assert out[(1, "2025-01-01 10:00:00")] == (2, 3.0)
    assert out[(1, "2025-01-01 12:30:00")] == (1, 3.0)
    assert out[(2, "2025-01-01 09:00:00")] == (2, 12.0)


def test_batch_sessionize_tied_timestamps(spark):
    """Duplicate (user_id, ts) rows must land in ONE session with the
    explicit ROWS frame (the default RANGE frame made peers share the
    cumulative gap count and matched only while test data had unique
    timestamps)."""
    rows = [
        (1, "2025-01-01 10:00:00", 1.0),
        (1, "2025-01-01 10:00:00", 2.0),  # exact tie
        (1, "2025-01-01 10:00:00", 3.0),  # exact tie
        (1, "2025-01-01 13:00:00", 4.0),  # new session after gap
        (1, "2025-01-01 13:00:00", 5.0),  # tie in second session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = sorted(
        (str(r["session_start"]), r["n_events"], r["sum_value"])
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    )
    assert out == [
        ("2025-01-01 10:00:00", 3, 6.0),
        ("2025-01-01 13:00:00", 2, 9.0),
    ]


def test_first_wins_null_key_bypass(spark):
    """NULL-key rows survive AND never enter the window shuffle
    (routing fix); tied seq on non-null keys still picks exactly one
    winner per key."""
    from acxspark.operators.dedup_exact import first_wins

    rows = [
        ("k1", 2, "late"), ("k1", 1, "first"),
        (None, 5, "null-a"), (None, 6, "null-b"),
        ("k2", 3, "only"),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, v string")
    out = {(r["k"], r["v"]) for r in first_wins(df, "k", "seq").collect()}
    assert out == {("k1", "first"), ("k2", "only"),
                   (None, "null-a"), (None, "null-b")}


def test_stream_sessionize_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    _mk(spark).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    want = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(_mk(spark), gap_seconds=1800).collect()
    }
    # within-batch closed sessions must match the batch oracle exactly;
    # the trailing open session per user may be withheld until timeout
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert want[k] == v
    assert (1, "2025-01-01 10:00:00") in got  # the gap-closed session
