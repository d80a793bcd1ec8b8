"""Unigram-LM perplexity filter: hand-computed millinats, top-V cut,
OOV floor, empty docs, determinism, broadcast plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from acxspark.operators.lmfilter import score_unigram_nll, train_unigram_lm


def _m(p: float) -> int:
    return round(-math.log(p) * 1000)


def test_model_counts_and_millinats(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    m = {r["token"]: r for r in train_unigram_lm(docs).collect()}
    assert m["a"]["n"] == 3 and m["a"]["nll_milli"] == _m(3 / 6)  # 693
    assert m["b"]["nll_milli"] == _m(2 / 6)  # 1099
    assert m["c"]["nll_milli"] == _m(1 / 6)  # 1792
    assert m["a"]["total"] == 6


def test_top_v_cut_is_deterministic_and_oov_floors(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "c d")], "doc_id long, text string"
    )
    # counts: a=3, b=2, c=2, d=1, total=8; V=2 keeps a then b (tie on
    # 2 broken by token: b < c)
    model = train_unigram_lm(docs, vocab_size=2)
    kept = {r["token"] for r in model.collect()}
    assert kept == {"a", "b"}
    scores = {
        r["doc_id"]: r for r in score_unigram_nll(docs, model).collect()
    }
    oov = _m(1 / 9)  # total+1
    assert scores[2]["n_tokens"] == 2
    assert scores[2]["nll_milli_sum"] == 2 * oov  # both c and d are OOV
    assert scores[2]["mean_nll"] == oov / 1000.0
    assert scores[2]["mean_nll_micro"] == oov * 1000  # micronats/token


def test_doc_scores_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b")], "doc_id long, text string"
    )
    model = train_unigram_lm(docs)  # total=8: a=4, b=3, c=1
    s = {r["doc_id"]: r for r in score_unigram_nll(docs, model).collect()}
    want = _m(4 / 8) + _m(3 / 8)
    assert s[2]["nll_milli_sum"] == want
    assert s[2]["mean_nll"] == want / 2 / 1000.0
    assert s[2]["mean_nll_micro"] == int(1000 * want / 2)
    # ordinary doc (head tokens) scores lower than the c-containing one
    assert s[2]["mean_nll"] < s[1]["mean_nll"]


def test_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "")], "doc_id long, text string"
    )
    model = train_unigram_lm(docs)
    s = {r["doc_id"]: r for r in score_unigram_nll(docs, model).collect()}
    assert s[2]["n_tokens"] == 0 and s[2]["nll_milli_sum"] == 0
    assert s[2]["mean_nll"] == 0.0


def test_deterministic_across_parallelism(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} shared word") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model1 = train_unigram_lm(docs.repartition(1), vocab_size=5)
    model16 = train_unigram_lm(docs.repartition(16), vocab_size=5)
    a = sorted(map(tuple, score_unigram_nll(docs.repartition(1), model1).collect()))
    b = sorted(map(tuple, score_unigram_nll(docs.repartition(16), model16).collect()))
    assert a == b


def test_scoring_plan_broadcasts_model(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = train_unigram_lm(docs)
    plan = score_unigram_nll(docs, model)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "BroadcastHashJoin" in plan


def test_dsir_hand_computed(spark):
    from acxspark.operators.lmfilter import dsir_log_weights

    target = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(0, "a a b"), (1, "c c c")], "doc_id long, text string"
    )
    tm = train_unigram_lm(target)  # total 3: a=2, b=1
    cm = train_unigram_lm(corpus)  # total 6: a=2, b=1, c=3
    probe = spark.createDataFrame([(9, "a c")], "doc_id long, text string")
    r = dsir_log_weights(probe, tm, cm).collect()[0]
    want = (_m(2 / 6) - _m(2 / 3)) + (_m(3 / 6) - _m(1 / 4))  # c OOV in target
    assert r["logw_milli_sum"] == want
    assert r["mean_logw"] == want / 2 / 1000.0


def test_dsir_ranks_target_like_docs_higher(spark):
    from acxspark.operators.lmfilter import dsir_log_weights

    target = spark.createDataFrame(
        [(0, "science method theory data")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(0, "science method theory data"),
         (1, "buy cheap pills now buy now"),
         (2, "buy cheap pills now buy now")],
        "doc_id long, text string",
    )
    tm, cm = train_unigram_lm(target), train_unigram_lm(corpus)
    probes = spark.createDataFrame(
        [(10, "science data theory"), (11, "buy cheap pills")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["mean_logw"]
         for r in dsir_log_weights(probes, tm, cm).collect()}
    # the spam probe can still land slightly positive here: a TINY
    # target corpus has a HIGH Laplace floor (1/(total+1)), so its OOV
    # penalty is mild — the ORDERING is the DSIR contract, not the sign
    assert s[10] > s[11] and s[10] > 1.0


def test_dsir_both_oov_is_floor_difference(spark):
    from acxspark.operators.lmfilter import dsir_log_weights

    target = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(0, "a a a a a a a a a")], "doc_id long, text string"
    )
    tm, cm = train_unigram_lm(target), train_unigram_lm(corpus)
    probe = spark.createDataFrame([(9, "zzz")], "doc_id long, text string")
    r = dsir_log_weights(probe, tm, cm).collect()[0]
    # floors: corpus -ln(1/10), target -ln(1/2)
    assert r["logw_milli_sum"] == _m(1 / 10) - _m(1 / 2)
