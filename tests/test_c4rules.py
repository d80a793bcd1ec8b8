"""C4 cleaning rules (Raffel et al. 2020 §2.2): line filter, sentence
floor, bad phrases, reassembly order, zero-shuffle plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from acxspark.functions.c4rules import c4_clean_docs_df

GOOD_LINE = "this sentence has clearly more than five words."


def _one(spark, text: str, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean_docs_df(df, **kw).collect()[0]


def test_keeps_terminal_punctuation_lines_only(spark):
    text = "\n".join([
        GOOD_LINE,                      # kept
        "no terminal punctuation here at all",   # dropped: no terminal
        "short one.",                   # dropped: < 5 words
        'he said it was "quoted words"',  # kept: closing quote IS a C4 terminal
        "does this question have six words?",     # kept
        "five words end with bang!",    # kept
    ])
    r = _one(spark, text)
    assert r["n_lines"] == 6 and r["n_kept"] == 4
    assert r["clean_text"].splitlines() == [
        GOOD_LINE,
        'he said it was "quoted words"',
        "does this question have six words?",
        "five words end with bang!",
    ]
    assert r["keep"] is True and r["has_bad_phrase"] is False


def test_quote_terminal_counts(spark):
    r = _one(spark, 'she said more than five words "end quote."\n"ends with a quote mark here"')
    assert r["n_kept"] == 2


def test_sentence_floor_drops_page(spark):
    r = _one(spark, f"{GOOD_LINE}\n{GOOD_LINE}")
    assert r["n_kept"] == 2 and r["keep"] is False  # < 3 sentences


def test_bad_phrases_drop_page(spark):
    for bad in ("Lorem Ipsum dolor", "see our Privacy Policy today",
                "function() { return 1; }"):
        text = "\n".join([GOOD_LINE] * 3 + [bad])
        r = _one(spark, text)
        assert r["has_bad_phrase"] is True and r["keep"] is False, bad


def test_whitespace_only_words_not_counted(spark):
    # 4 words + doubled spaces must stay 4 words → dropped
    r = _one(spark, "only  four   words  here.")
    assert r["n_kept"] == 0


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, GOOD_LINE)], "doc_id long, text string")
    plan = c4_clean_docs_df(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
