"""Benchmark harness — one JSON line for the round driver.

Runs the headline near-dup pipeline (documents table, full tier stack:
exact + MinHash/LSH + SimHash + containment + CC) plus a representative
query suite at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32).

Output: {"metric": "headline_suite_sec", "value": <total sec>,
         "unit": "sec", "queries": {name: sec}, "sf": <sf>,
         "dedup_docs_per_sec": <docs/sec>, "dedup_docs": N,
         "parallelism": P}

Scaling-efficiency evidence (BASELINE.md gate) is produced by
tools/bench_scaling.py, which runs THIS harness at two parallelism
levels on the same input.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from acxspark import queries as Q  # noqa: E402
from acxspark.config import DedupConfig  # noqa: E402
from acxspark.plans.pipeline import run_pipeline  # noqa: E402
from acxspark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "rollup_revenue",
    "report_stats",
    "first_wins_dedup_docs",
    "or_key_clusters",
    "window_top3_orders_per_cust",
    "merge_prefer_newer",
    "events_hourly",
    "events_sessions",
    "asof_purchase_last_view",
    "ann_cosine_topk",
    "embedding_near_dup",
    "ngram_jaccard_pairs_docs",
    "minhash_lsh_pairs_docs",
    "simhash_hamming_pairs_docs",
    # round-2 surfaces
    "schema_conformance",
    "history_append_merge",
    "mask_phone_policy_q",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("acxspark-bench", parallelism=cpus)

    timings: dict[str, float] = {}

    # headline: full near-dup pipeline over documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("url"), F.col("text")
    )
    n_docs = docs.count()
    # two runs: the first pays JVM/worker warmup, the second is the
    # steady state a long-running cluster job operates in; both are
    # reported, throughput is computed from the steady state
    dedup_sec = float("inf")
    n_survivors = 0
    for trial in range(2):
        t0 = time.time()
        res = run_pipeline(docs, cfg=DedupConfig(), text_col="text")
        n_survivors = res.survivors.count()
        el = time.time() - t0
        timings[f"dedup_pipeline_t{trial}"] = round(el, 3)
        dedup_sec = min(dedup_sec, el)
        spark.catalog.clearCache()
    timings["dedup_pipeline"] = round(dedup_sec, 3)

    from acxspark.operators.lsh import release_band_caches

    registry = Q.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        # count() forces full execution without driver-side collect cost
        registry[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        release_band_caches()  # candidate-pair queries persist band rows

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "dedup_docs": n_docs,
        "dedup_survivors": n_survivors,
        "dedup_docs_per_sec": round(n_docs / dedup_sec, 1),
        "parallelism": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
