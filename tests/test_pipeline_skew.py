"""Pipeline behavior under pathological skew + lineage counters."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from acxspark.config import DedupConfig
from acxspark.metrics import Lineage
from acxspark.plans.pipeline import run_pipeline


def test_boilerplate_flood_capped_and_clustered(spark):
    """500 byte-identical copies of one page + distinct singletons:
    the exact tier must emit STAR edges (linear, not clique), the
    hot-band cap must keep LSH candidate generation bounded, and the
    result is one big cluster + intact singletons."""
    boiler = "subscribe to our newsletter for daily updates " * 8
    rows = [(f"{i:06d}", boiler) for i in range(500)]
    rows += [(f"s{i:06d}", f"unique document number {i} about topic {i*7}")
             for i in range(50)]
    web = spark.createDataFrame(rows, "url string, text string")
    cfg = DedupConfig(max_band_size=50)  # every boiler band is hot → capped
    res = run_pipeline(web, cfg=cfg, text_col="text")
    # star edges: 499 exact edges, not 500*499/2
    exact_n = res.edges.filter(F.col("tier") == "exact").count()
    assert exact_n == 499
    clusters = {r["url"]: r["cluster_id"] for r in res.clusters.collect()}
    boiler_cluster = {clusters[f"{i:06d}"] for i in range(500)}
    assert boiler_cluster == {"000000"}  # one component, min-url canonical
    singles = [clusters[f"s{i:06d}"] for i in range(50)]
    assert all(c.startswith("s") for c in singles)
    assert res.survivors.count() == 51


def test_lineage_counters_recorded(spark, tmp_path):
    path = tmp_path / "lineage.jsonl"
    web = spark.createDataFrame(
        [(f"{i:04d}", f"doc {i} text body alpha beta gamma {i}") for i in range(30)],
        "url string, text string",
    )
    cfg = DedupConfig()
    res = run_pipeline(web, cfg=cfg, text_col="text", lineage_path=str(path))
    res.clusters.count()  # fire the observed plans
    recs = res.lineage.flush()
    stages = {r["stage"] for r in recs}
    assert "docs_scanned" in stages
    by_stage = {r["stage"]: r for r in recs}
    assert by_stage["docs_scanned"]["rows"] == 30
    # config fingerprint rides every record (the "identical config" audit)
    assert all(r["config"] == cfg.fingerprint() for r in recs)
    on_disk = [json.loads(line) for line in path.read_text().splitlines()]
    assert on_disk and on_disk[0]["config"] == cfg.fingerprint()
