"""Benchmark decontamination (operators/decontaminate.py)."""
from acxspark.operators.decontaminate import (
    benchmark_gram_set,
    contaminated_doc_ids,
    decontaminate,
    token_ngrams,
)
import pyspark.sql.functions as F


BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight"


def _tables(spark):
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {BENCH_SENT} and a long tail of text"),
            (2, "completely unrelated page about spark dataframes and joins"),
            (3, "short doc"),  # < 8 tokens: no grams, never flagged
            (4, "The  QUICK brown fox JUMPS over the lazy dog tonight!?"),
            (5, "quick brown fox jumps over the lazy cat tonight ok"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, BENCH_SENT)], ["doc_id", "text"])
    return docs, bench


def test_flags_planted_overlap_and_canonicalization(spark):
    docs, bench = _tables(spark)
    bg = benchmark_gram_set(bench, "text", 8)
    got = sorted(
        r["doc_id"] for r in contaminated_doc_ids(docs, bg, hashed=False).collect()
    )
    # doc 1 embeds the sentence verbatim; doc 4 matches only after
    # canonicalization (case-fold + whitespace collapse; trailing
    # punctuation breaks the final gram but earlier 8-grams match);
    # doc 5 shares at most 7 consecutive tokens (cat != dog) -> clean
    assert got == [1, 4]


def test_hashed_equals_exact(spark):
    docs, bench = _tables(spark)
    bg = benchmark_gram_set(bench, "text", 8)
    exact = sorted(
        r["doc_id"] for r in contaminated_doc_ids(docs, bg, hashed=False).collect()
    )
    hashed = sorted(
        r["doc_id"] for r in contaminated_doc_ids(docs, bg, hashed=True).collect()
    )
    assert exact == hashed


def test_decontaminate_removes_only_flagged(spark):
    docs, bench = _tables(spark)
    kept = sorted(r["doc_id"] for r in decontaminate(docs, bench).collect())
    assert kept == [2, 3, 5]


def test_ngram_edges(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, ""), (3, "1 2 3 4 5 6 7 8")],
                               ["doc_id", "text"])
    out = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", token_ngrams(F.col("text"), 8).alias("g")
        ).collect()
    }
    assert out[1] == [] and out[2] == []
    assert out[3] == ["1 2 3 4 5 6 7 8"]


def test_corpus_side_plan_has_no_shuffle_before_join(spark):
    """The corpus explode->semi-join must plan a BroadcastHashJoin
    (benchmark side broadcast); the corpus side reaches it without an
    Exchange — map-only at 10^12 docs."""
    docs, bench = _tables(spark)
    bg = benchmark_gram_set(bench, "text", 8)
    flagged = contaminated_doc_ids(docs, bg, hashed=True)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    join_at = plan.index("BroadcastHashJoin")
    # the only Exchange above the join is the final distinct's
    # hash-partition on doc_id; the corpus branch below the join line
    # must contain none (generate/explode feeds the join directly)
    below = plan[join_at:]
    corpus_branch = below.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_branch.split("\n", 1)[1]
