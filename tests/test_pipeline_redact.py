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


def test_submit_job_wiring(spark, tmp_path, monkeypatch):
    """tools/submit_dedup.py (the spark-submit ship path) end-to-end
    in-process: writes clusters/survivors/edges + lineage under
    --output. (The true spark-submit invocation is exercised manually:
    spark-submit --master local[4] --driver-memory 8g --py-files
    <package_zip()> tools/submit_dedup.py --input ... --output ...)"""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import submit_dedup

    from acxspark.corpus import generate, to_spark

    web, _, _ = to_spark(spark, generate(n_docs=120, seed=3))
    inp = str(tmp_path / "web_in")
    web.select("url", "text").write.parquet(inp)
    out = str(tmp_path / "dedup_out")
    monkeypatch.setattr(
        sys, "argv",
        ["submit_dedup.py", "--input", inp, "--output", out],
    )
    submit_dedup.main()
    clusters = spark.read.parquet(f"{out}/clusters")
    survivors = spark.read.parquet(f"{out}/survivors")
    assert clusters.count() == 120
    assert 0 < survivors.count() <= 120
    assert set(clusters.columns) == {"url", "cluster_id"}
