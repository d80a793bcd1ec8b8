"""Exact substring (span) dedup semantics (Lee et al. 2021
ExactSubstr at fixed k-gram granularity, operators/spandedup.py):
first occurrence wins corpus-wide, covered tokens removed, interval
merging, partitioning invariance, and the no-window plan shape."""

import pyspark.sql.functions as F

from acxspark.operators.spandedup import duplicate_span_starts, span_dedup

SPAN = "alpha beta gamma delta epsilon zeta eta theta"


def _corpus(spark):
    rows = [
        (1, f"{SPAN} unique one"),              # first occurrence — kept whole
        (2, f"intro words {SPAN} tail"),        # loses the 8-token span
        (3, "totally different content with no repeats at all here"),
        (4, SPAN),                               # entirely the span → empty
        (5, "x x x x x x x x x x"),              # within-doc repeat
        (6, ""),
        (7, "short doc"),                        # < k tokens → untouched
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_removed_from_all_but_first(spark):
    out = {r["doc_id"]: r for r in span_dedup(_corpus(spark), k=8).collect()}
    assert out[1]["clean_text"] == f"{SPAN} unique one"
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "intro words tail"
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == ""
    assert out[4]["n_removed"] == 8


def test_within_doc_repeats_keep_head(spark):
    # "x"*10, k=8: grams at pos 0,1,2 are identical; the pos-0 gram is
    # the first occurrence, so covered = {1..9} and token 0 survives.
    out = {r["doc_id"]: r for r in span_dedup(_corpus(spark), k=8).collect()}
    assert out[5]["clean_text"] == "x"
    assert out[5]["n_removed"] == 9


def test_short_and_empty_docs_untouched(spark):
    out = {r["doc_id"]: r for r in span_dedup(_corpus(spark), k=8).collect()}
    assert out[6]["clean_text"] == "" and out[6]["n_tokens"] == 0
    assert out[7]["clean_text"] == "short doc" and out[7]["n_removed"] == 0


def test_overlapping_spans_merge_into_one_interval(spark):
    # doc 2 shares a 10-token span with doc 1 → three overlapping
    # duplicated 8-gram starts (pos 0,1,2) must merge to one removal
    # interval covering all 10 tokens, not 3×8 double-counted.
    long_span = "p q r s t u v w y z"
    rows = [(1, f"{long_span} end1"), (2, f"{long_span} end2")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(df, k=8).collect()}
    assert out[1]["clean_text"] == f"{long_span} end1"
    assert out[2]["clean_text"] == "end2"
    assert out[2]["n_removed"] == 10


def test_partitioning_invariance(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, span_dedup(df.repartition(1), k=8).collect()))
    b = sorted(map(tuple, span_dedup(df.repartition(13), k=8).collect()))
    assert a == b


def test_no_window_in_plan(spark):
    # firsts come from groupBy + min(struct) (map-side partial agg),
    # never a row_number window over the hot gram key — the skew
    # posture the operator exists for.
    plan = span_dedup(_corpus(spark), k=8)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_pipeline_span_stage_strips_residual_shared_spans(spark):
    # Two documents far below the Jaccard threshold (both survive the
    # doc-level tiers) sharing one 8-token quote: with span_dedup_k=8
    # the later survivor loses exactly the quote, the earlier keeps it.
    import datetime

    from acxspark.plans.pipeline import run_pipeline

    quote = "to be or not to be that is"
    fill_a = " ".join(f"alpha{i} beta{i}" for i in range(30))
    fill_b = " ".join(f"gamma{i} delta{i}" for i in range(30))
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("a.example/1", ts, f"{fill_a} {quote}"),
        ("b.example/2", ts, f"{quote} {fill_b}"),
    ]
    web = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    res = run_pipeline(web, span_dedup_k=8)
    got = {r["url"]: r["text"] for r in res.survivors.collect()}
    res.release()
    assert len(got) == 2  # both survive the doc-level tiers
    assert got["a.example/1"] == f"{fill_a} {quote}"  # first occurrence
    assert got["b.example/2"] == fill_b               # quote stripped


def test_removal_set_is_non_first_dup_occurrences(spark):
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicate_span_starts(_corpus(spark), k=8).collect()
    }
    # doc2's copy starts at token 2; doc4's at 0; doc5's at 1 and 2.
    assert got == {(2, 2), (4, 0), (5, 1), (5, 2)}
