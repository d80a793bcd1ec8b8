"""Stratified exact-N sampling (operators/sampling.py) — the
two-level tournament must equal the single-window draw exactly."""
import pyspark.sql.functions as F
from pyspark.sql import Window

from acxspark.operators.sampling import stratified_sample_exact


def _single_window_draw(df, strata, idc, n, seed):
    h = F.md5(F.concat(F.col(idc).cast("string"), F.lit(f":sample:{seed}")))
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


def test_quota_tournament_equals_single_window(spark):
    from acxspark.operators.sampling import quota_sample_exact

    rows = [(i, ["en"] * 6 + ["de", "de", "fr", "xx"])
            for i in range(400)]
    rows = [(i, rows[i][1][i % 10]) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    quotas = spark.createDataFrame(
        [("en", 9), ("de", 4), ("fr", 2), ("xx", 1)], ["lang", "quota"]
    )
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":quota:5")))
    w = Window.partitionBy("lang").orderBy(h.alias("_h"), "doc_id")
    want = sorted(
        map(
            tuple,
            df.join(quotas, "lang")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("quota"))
            .select("lang", "doc_id")
            .collect(),
        )
    )
    for buckets in (2, 64):
        got = sorted(
            map(
                tuple,
                quota_sample_exact(df, "lang", "doc_id", quotas, seed=5,
                                   salt_buckets=buckets)
                .select("lang", "doc_id")
                .collect(),
            )
        )
        assert got == want


def test_sqrt_cap_quota_counts(spark):
    from acxspark.operators.sampling import quota_sample_exact, sqrt_cap_quotas

    rows = (
        [(i, "huge") for i in range(144)]
        + [(1000 + i, "mid") for i in range(9)]
        + [(2000, "solo")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "src"])
    out = (
        quota_sample_exact(df, "src", "doc_id", sqrt_cap_quotas(df, "src"))
        .groupBy("src")
        .count()
    )
    counts = {r["src"]: r["count"] for r in out.collect()}
    assert counts == {"huge": 12, "mid": 3, "solo": 1}
