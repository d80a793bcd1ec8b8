"""Gopher rule battery (Rae et al. 2021 §A1.1): each rule isolated on
a planted document; thresholds verbatim from the paper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acxspark.functions.text import gopher_rules

# 60 words, mean word length ~3.9, 100% alphabetic, 6 Gopher stop
# words present — passes every rule.
GOOD = " ".join(["apple banana cherry the and with that have to of"] * 6)


def _flags(spark, text: str) -> dict:
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    rules = gopher_rules(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in rules.items()]).collect()[0]
    return row.asDict()


def test_good_doc_passes_all(spark):
    f = _flags(spark, GOOD)
    assert all(f.values()), f


@pytest.mark.parametrize(
    "text,broken",
    [
        ("the cat and dog have fun with it to of", "r_wordcount"),  # 10 words
        # 56 short words (176 chars) + 80×15-char words → mean 10.1 > 10
        (" ".join(["the and with that have to of"] * 8)
         + " " + " ".join(["extraordinarily"] * 80), "r_meanwl"),
        (GOOD + " " + " ".join(["#"] * 10), "r_hash"),
        (GOOD + " " + " ".join(["word..."] * 10), "r_ellipsis"),
        (GOOD + " " + " ".join(["9042"] * 30), "r_alpha"),
        (" ".join(f"word{i} token{i} piece{i}" for i in range(20)), "r_stop"),
    ],
)
def test_word_rules_isolated(spark, text, broken):
    f = _flags(spark, text)
    assert f[broken] is False, f
    assert f["keep"] is False


def test_bullet_line_rule(spark):
    # 10 non-empty lines, all bullets → fraction 1.0 > 0.9 → fail
    body = "\n".join(f"- {GOOD}" for _ in range(10))
    f = _flags(spark, body)
    assert f["r_bullet"] is False
    # 10 lines, 8 bullets → 0.8 <= 0.9 → pass
    body2 = "\n".join([f"- {GOOD}"] * 8 + [GOOD, GOOD])
    assert _flags(spark, body2)["r_bullet"] is True
    # '*' and '•' bullets count too
    assert _flags(spark, "\n".join(f"* {GOOD}" for _ in range(5)))["r_bullet"] is False
    assert _flags(spark, "\n".join(f"•{GOOD}" for _ in range(5)))["r_bullet"] is False


def test_ellipsis_end_line_rule(spark):
    # 4 of 10 lines end with '...' → 0.4 > 0.3 → fail
    body = "\n".join([f"{GOOD} ..."] * 4 + [GOOD] * 6)
    f = _flags(spark, body)
    assert f["r_ellipsis_end"] is False
    # unicode ellipsis counts; 3 of 10 → 0.3 <= 0.3 → pass
    body2 = "\n".join([f"{GOOD} …"] * 3 + [GOOD] * 7)
    f2 = _flags(spark, body2)
    assert f2["r_ellipsis_end"] is True
    # the trailing '…' also feeds the per-word ellipsis rule: 3/~63 ok
    assert f2["r_ellipsis"] is True


def test_blank_lines_ignored(spark):
    body = "\n\n".join([f"- {GOOD}"] * 9 + [GOOD])  # 10 non-empty, 9 bullets
    assert _flags(spark, body)["r_bullet"] is True


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("d", GOOD)], "doc_id string, text string")
    rules = gopher_rules(F.col("text"))
    plan = df.select(*[v.alias(k) for k, v in rules.items()])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
