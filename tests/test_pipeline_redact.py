"""Pipeline redact wiring + extraction-determinism invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from acxspark.config import DedupConfig
from acxspark.corpus import generate, to_spark
from acxspark.plans.pipeline import (
    extract_stage,
    extraction_violations,
    run_pipeline,
)


def test_redacted_survivors_have_no_pii(spark):
    rows = [
        ("a", "contact me at alice@example.com for details"),
        ("b", "call +1 415 555 0100 right away please"),
        ("c", "nothing sensitive in this one at all"),
    ]
    web = spark.createDataFrame(rows, "url string, text string")
    res = run_pipeline(web, cfg=DedupConfig(), text_col="text", redact=True)
    texts = {r["url"]: r["text"] for r in res.survivors.collect()}
    assert "[EMAIL]" in texts["a"] and "@" not in texts["a"]
    assert "[PHONE]" in texts["b"] and "555" not in texts["b"]
    assert texts["c"] == "nothing sensitive in this one at all"


def test_extraction_invariant_on_corpus(spark):
    web, _, _ = to_spark(spark, generate(n_docs=120, seed=11))
    extracted = extract_stage(web)
    assert extraction_violations(extracted).count() == 0
    # and a planted violation IS caught
    bad = extracted.select("url", "extracted_text").unionByName(
        spark.createDataFrame(
            [(extracted.select("url").first()["url"], "DIFFERENT TEXT")],
            "url string, extracted_text string",
        )
    )
    assert extraction_violations(bad).count() == 1
