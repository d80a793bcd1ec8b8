"""Incremental-vs-full measurement at a scale where the comparison is
meaningful (full-run cost dominated by data, not job latency).

Full pipeline on BENCH/corpus_640000 committing snapshots (including
the `sha_bloom` membership artifact), then the incremental plan folds
two 40k-doc deltas in, timed separately:

  * ``fresh``     — 40k brand-new docs (seed=77, distinct urls): the
    bloom gate prunes the whole probe, every doc is signed. This is
    the continuity point with the r3/r4 artifacts.
  * ``refetch50`` — 20k byte-identical re-fetches of base pages under
    new urls + 20k fresh docs: the crawl-realistic mix. The exact
    tier catches the re-fetches and they SKIP the signature stage
    (plans/incremental.py), so this delta should be markedly cheaper
    per doc than ``fresh`` despite identical size.

At toy scale (sf0.01) the incremental plan is SLOWER than a full run
— ~40 fixed-latency Spark jobs dominate 49 documents — which is why
this lives here and not in bench.py's headline: the crossover needs a
corpus big enough that re-scanning it costs more than the increment's
fixed overhead. Usage: SPARK_GRAFT_CPUS=8 python tools/bench_incremental.py
[out_name] (default r4_incremental_bloom)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from acxspark.catalog import ParquetSnapshotCatalog  # noqa: E402
from acxspark.config import DedupConfig  # noqa: E402
from acxspark.corpus import generate  # noqa: E402
from acxspark.plans.incremental import run_incremental  # noqa: E402
from acxspark.plans.pipeline import run_pipeline  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def _time_increment(spark, cat, delta, name: str) -> dict:
    t0 = time.time()
    inc = run_incremental(delta, cat, cfg=DedupConfig(), text_col="text",
                          update_snapshots=False)
    n_assigned = inc.assignments.count()
    sec = round(time.time() - t0, 2)
    counters = {}
    for stage in ("incr_signed", "incr_bloom_maybe"):
        obs = inc.lineage.observations.get(stage)
        if obs is not None:
            try:
                counters[stage] = int(obs.get["rows"])
            except Exception:
                pass  # observed subtree never fired (empty branch)
    for df in inc.caches:
        df.unpersist()
    return {"name": name, "sec": sec, "assigned": n_assigned, **counters}


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "r4_incremental_bloom"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("bench-incremental", parallelism=cpus)
    base = spark.read.parquet(str(REPO / "BENCH" / "corpus_640000"))
    n_base = base.count()

    fresh_pd = generate(n_docs=40000, seed=77).webpages[["url", "text"]]
    fresh_pd["url"] = "incr-" + fresh_pd["url"].astype(str)
    fresh = spark.createDataFrame(fresh_pd).repartition(32).cache()
    n_fresh = fresh.count()

    # re-fetches: 20k base pages re-crawled under new capture urls —
    # deterministic pick (hash order), byte-identical text
    refetch = (
        base.select("url", "text")
        .orderBy(F.xxhash64("url"))
        .limit(20000)
        .select(F.concat(F.lit("refetch-"), F.col("url")).alias("url"), "text")
    )
    half_fresh = spark.createDataFrame(fresh_pd.iloc[:20000]).selectExpr(
        "url", "text"
    )
    refetch50 = refetch.unionByName(half_fresh).repartition(32).cache()
    n_refetch50 = refetch50.count()

    cat_dir = tempfile.mkdtemp(prefix="bench_incr_")
    try:
        cat = ParquetSnapshotCatalog(cat_dir)
        t0 = time.time()
        res = run_pipeline(base, cfg=DedupConfig(), text_col="text", catalog=cat)
        res.clusters.count()
        full_sec = round(time.time() - t0, 2)
        res.release()
        spark.catalog.clearCache()
        fresh.persist()
        refetch50.persist()

        runs = [
            _time_increment(spark, cat, fresh, "fresh"),
            _time_increment(spark, cat, refetch50, "refetch50"),
        ]
    finally:
        shutil.rmtree(cat_dir, ignore_errors=True)

    incr_sec = runs[0]["sec"]
    out = {
        "parallelism": cpus,
        "base_docs": n_base,
        "delta_docs": {"fresh": n_fresh, "refetch50": n_refetch50},
        "full_pipeline_sec": full_sec,
        "incremental_sec": incr_sec,
        "runs": runs,
        "full_over_incremental": round(full_sec / max(incr_sec, 1e-9), 2),
        "refetch_speedup_vs_fresh": round(
            runs[0]["sec"] / max(runs[1]["sec"], 1e-9), 2
        ),
    }
    (REPO / "BENCH" / f"{out_name}.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
