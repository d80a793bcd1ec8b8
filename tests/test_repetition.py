"""Gopher-style repetition filter (functions/repetition.py) — graft
training-data quality tier; zero-shuffle column-expression scan."""
import pyspark.sql.functions as F

from acxspark.functions.repetition import repetition_stats


def test_repetition_stats_hand_cases(spark):
    rows = [
        (1, "a b a b a b"),          # 5 grams, 2 distinct, top 'a b' x3
        (2, "x y z w"),              # all distinct
        (3, "solo"),                 # no grams
        (4, "spam spam spam spam spam"),  # one gram repeated, 4 grams
        (5, "a  b   a b"),           # runs of spaces collapse
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_stats(df, min_grams=4).collect()}
    assert (out[1]["n_grams"], out[1]["dup_gram_frac"], out[1]["top_gram_frac"]) \
        == (5, 0.6, 0.6)
    assert (out[2]["n_grams"], out[2]["dup_gram_frac"]) == (3, 0.0)
    assert (out[3]["n_grams"], out[3]["rep_keep"]) == (0, True)
    assert (out[4]["dup_gram_frac"], out[4]["top_gram_frac"], out[4]["rep_keep"]) \
        == (0.75, 1.0, False)
    assert out[5]["n_grams"] == 3  # empty tokens filtered before gramming
    assert not out[1]["rep_keep"] and out[2]["rep_keep"]


def test_repetition_min_grams_exempts_short_docs(spark):
    df = spark.createDataFrame([(1, "x y x y")], ["doc_id", "text"])
    strict = repetition_stats(df, min_grams=1).collect()[0]
    lax = repetition_stats(df, min_grams=20).collect()[0]
    assert not strict["rep_keep"] and lax["rep_keep"]


def test_repetition_trigram_param(spark):
    df = spark.createDataFrame([(1, "a b c a b c a b c")], ["doc_id", "text"])
    out = repetition_stats(df, n=3, min_grams=1).collect()[0]
    # 7 trigrams: 'a b c' x3, 'b c a' x2, 'c a b' x2 -> all duplicated
    assert out["n_grams"] == 7
    assert out["dup_gram_frac"] == round(1 - 3 / 7, 6)
    assert out["top_gram_frac"] == round(3 / 7, 6)


def test_repetition_no_shuffle_plan(spark):
    """The scale contract: the stats scan must contain no Exchange."""
    df = spark.createDataFrame([(i, "w x " * 30) for i in range(10)],
                               ["doc_id", "text"])
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_clean_gate_single_scan_no_shuffle(spark, tmp_path):
    """The composed webtext_clean_gate must stay one map-only scan."""
    import pandas as pd
    p = str(tmp_path / "documents.parquet")
    pd.DataFrame({
        "doc_id": range(6),
        "text": ["the quick brown fox jumps over the lazy dog " * 5] * 6,
        "lang": ["en"] * 6, "source": ["s"] * 6, "n_chars": [10] * 6,
    }).to_parquet(p)
    from acxspark.queries import REGISTRY
    df = REGISTRY["webtext_clean_gate"].fn(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() == 6


def test_rep_keep_col_matches_stats(spark):
    """Single-fold rep_keep_col == repetition_cols['rep_keep'] ==
    repetition_stats.rep_keep across configs and edge cases (empty,
    sub-min, exactly-min, all-dup, all-distinct)."""
    from acxspark.functions.repetition import rep_keep_col, repetition_cols

    rows = [(i, t) for i, t in enumerate([
        "", "solo", "a b a b a b", "x y z w", "spam spam spam spam spam",
        "a  b   a b", " ".join(f"t{j}" for j in range(50)),
        " ".join(["loop one two"] * 30),
        " ".join(f"w{j % 7}" for j in range(40)),
    ])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for n, mg in [(2, 20), (2, 1), (3, 4), (2, 0)]:
        got = df.select(
            "doc_id",
            rep_keep_col(F.col("text"), n=n, min_grams=mg).alias("fast"),
            repetition_cols(F.col("text"), n=n, min_grams=mg)["rep_keep"]
            .alias("ref"),
        ).collect()
        for r in got:
            assert r["fast"] == r["ref"], (n, mg, r)


def test_tokens_split_on_any_whitespace(spark):
    """Repetition stats tokenize on the whitespace CLASS: newlines and
    tabs separate words (splitting on ' ' alone merged tokens across
    line breaks, computing stats over wrong grams)."""
    from acxspark.functions.repetition import repetition_stats

    flat = ("alpha beta " * 15).strip()
    multiline = flat.replace(" beta ", " beta\n").replace("beta\nalpha",
                                                          "beta\nalpha")
    df = spark.createDataFrame([(1, flat), (2, multiline)], ["doc_id", "t"])
    out = {r["doc_id"]: r for r in
           repetition_stats(df, text_col="t", n=2).collect()}
    # same word stream ⇒ identical gram counts regardless of separator
    assert out[1]["n_grams"] == out[2]["n_grams"]
    assert out[1]["dup_gram_frac"] == out[2]["dup_gram_frac"]
