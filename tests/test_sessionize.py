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
