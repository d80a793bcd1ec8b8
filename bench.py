"""Benchmark harness — one JSON line for the round driver.

Runs the headline near-dup pipeline (documents table, full tier stack:
exact + MinHash/LSH + SimHash + containment + CC) plus a representative
query suite at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32).

Output: {"metric": "headline_suite_sec", "value": <total sec>,
         "unit": "sec", "queries": {name: sec}, "sf": <sf>,
         "dedup_docs_per_sec": <docs/sec>, "dedup_docs": N,
         "parallelism": P}

Robust reporting (round-4): the host wall clock varies ±40% when
another Spark JVM is resident (BENCH_r03 recorded a contended-host
outlier that read as a 44% regression on unchanged code). Two
defenses, both internal to this harness so any single capture is
already robust:
  * each query runs SPARK_GRAFT_BENCH_TRIALS times (default 3) and
    the reported per-query time is the MIN across trials; the
    headline value is the sum of per-query mins ("trials" carries
    every raw sample for auditability);
  * before starting, the harness scans /proc for other resident
    Spark/Java JVMs and reports them under "contended_jvms" (stderr
    warning + JSON flag — observable, not fatal, because the round
    driver must always get its one JSON line back);
  * (round-4 addendum) external hypervisor steal inflates walls even
    with zero resident JVMs (BENCH/BASELINE.md §19/§21: identical jobs
    measured 84.7 vs 122.0 s minutes apart, contended_jvms=0 both
    times), so the harness also runs a 2-second single-thread DRAM
    microbench before and after the suite and reports both under
    "host_speed" (iterations of a fixed 35 MB numpy op) — a capture
    taken in a slow window carries its own calibration: compare
    host_speed across captures before comparing walls.

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

# curation-tier operators (r3/r4): timed single-shot, reported under
# "extended", never summed into the headline value
EXTENDED_QUERIES = [
    "span_dedup_docs",
    "semantic_dedup_docs",
    "line_dedup_docs",
    "url_canonical_dedup",
    "gopher_rules_docs",
    "c4_clean_docs",
    "unigram_nll_docs",
    "contamination_flags_docs",
    "packed_shards_docs",
    "point_lookup_bucketed",
]


def _resident_spark_jvms() -> list[str]:
    """Other Spark driver/executor JVMs on this host (contention
    witnesses). Reads /proc directly — no external tools — and skips
    our own pid tree (this process has not launched its JVM yet when
    we scan, so any hit is a foreign job)."""
    hits: list[str] = []
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\x00", b" ").decode("utf-8", "replace")
            except OSError:
                continue
            if "org.apache.spark" in cmd and "java" in cmd:
                hits.append(f"pid={pid} {cmd[:120]}")
    except OSError:
        pass
    return hits


def _host_speed(seconds: float = 2.0) -> int:
    """Single-thread DRAM-streaming iterations in ``seconds`` — the
    window-calibration witness (same 35 MB op as the BASELINE.md DRAM
    table, one process). External steal that slows Spark walls slows
    this count proportionally, while contended_jvms stays 0; a capture
    whose host_speed is 30% below another's is measuring the host, not
    the code. numpy-only so it costs ~2 s and no Spark state."""
    import numpy as np

    a = np.random.default_rng(0).integers(0, 1 << 63, size=4_400_000, dtype=np.int64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        b = a * 3
        b += 7
        n += 1
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    contended = _resident_spark_jvms()
    if contended:
        print(
            f"WARNING: {len(contended)} other Spark JVM(s) resident — wall "
            f"times will be inflated; min-of-{n_trials} still reported:\n  "
            + "\n  ".join(contended),
            file=sys.stderr,
        )

    speed_before = _host_speed()
    spark = get_spark("acxspark-bench", parallelism=cpus)

    timings: dict[str, float] = {}  # reported per-query MIN across trials
    trials: dict[str, list[float]] = {}  # every raw sample, for audit

    def record(name: str, sec: float) -> None:
        trials.setdefault(name, []).append(round(sec, 3))
        prev = timings.get(name)
        timings[name] = round(sec if prev is None else min(prev, sec), 3)

    # headline: full near-dup pipeline over documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("url"), F.col("text")
    )
    n_docs = docs.count()
    # trial 0 pays JVM/worker warmup; the min is the steady state a
    # long-running cluster job operates in. The round-4 pipeline has
    # ~2× the stage count of r3 (bucket pair generation, hashed-id
    # join-backs, verify-input semi-joins), so codegen/JIT warmup now
    # spans TWO trials (measured 27.6 / 12.0 / 9.8 / 7.2 s on a quiet
    # host) — one extra trial lets the min reach the steady state the
    # ladder artifacts confirm.
    n_survivors = 0
    for _ in range(max(2, n_trials) + 1):
        t0 = time.time()
        res = run_pipeline(docs, cfg=DedupConfig(), text_col="text")
        n_survivors = res.survivors.count()
        record("dedup_pipeline", time.time() - t0)
        spark.catalog.clearCache()
    dedup_sec = timings["dedup_pipeline"]

    from acxspark.operators.lsh import release_band_caches

    registry = Q.queries()
    for _ in range(n_trials):
        for name in BENCH_QUERIES:
            t0 = time.time()
            # count() forces full execution without driver-side collect cost
            registry[name](spark, sf_dir).count()
            record(name, time.time() - t0)
            release_band_caches()  # candidate-pair queries persist band rows

    # extended section: curation-tier operators, timed single-shot and
    # NOT summed into the headline (keeps "value" comparable across
    # rounds while giving the heavy r3/r4 tiers a per-round number)
    extended: dict[str, float] = {}
    for name in EXTENDED_QUERIES:
        if name not in registry:
            continue
        t0 = time.time()
        registry[name](spark, sf_dir).count()
        extended[name] = round(time.time() - t0, 3)
        release_band_caches()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extended": extended,
        "trials": trials,
        "n_trials": n_trials,
        "contended_jvms": len(contended),
        "host_speed": {"before": speed_before, "after": _host_speed(),
                       "unit": "iters_2s_35MB_stream"},
        "sf": sf,
        "dedup_docs": n_docs,
        "dedup_survivors": n_survivors,
        "dedup_docs_per_sec": round(n_docs / dedup_sec, 1),
        "parallelism": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
