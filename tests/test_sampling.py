"""Stratified exact-N sampling (operators/sampling.py) — the
two-level tournament must equal the single-window draw exactly."""
import pyspark.sql.functions as F
from pyspark.sql import Window

from acxspark.operators.sampling import stratified_sample_exact


def _single_window_draw(df, strata, idc, n, seed):
    h = F.md5(F.concat(F.col(idc).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy(strata).orderBy(h.alias("_h"), idc)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def test_tournament_equals_single_window(spark):
    rows = [(i, ["en", "en", "en", "de", "fr"][i % 5]) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    for buckets in (2, 16, 64):
        got = sorted(map(tuple, stratified_sample_exact(
            df, "lang", "doc_id", 7, seed=3, salt_buckets=buckets).collect()))
        want = sorted(map(tuple, _single_window_draw(
            df, "lang", "doc_id", 7, 3).collect()))
        assert got == want


def test_exact_n_and_small_strata(spark):
    rows = [(i, "big") for i in range(100)] + [(1000, "tiny"), (1001, "tiny")]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_sample_exact(df, "lang", "doc_id", 10).groupBy("lang").count()
    counts = {r["lang"]: r["count"] for r in out.collect()}
    assert counts == {"big": 10, "tiny": 2}


def test_deterministic_across_partitioning(spark):
    rows = [(i, f"l{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    a = sorted(map(tuple, stratified_sample_exact(
        df.repartition(1), "lang", "doc_id", 9).collect()))
    b = sorted(map(tuple, stratified_sample_exact(
        df.repartition(17), "lang", "doc_id", 9).collect()))
    assert a == b and len(a) == 27
