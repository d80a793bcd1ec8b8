"""Incremental-vs-full measurement at a scale where the comparison is
meaningful (full-run cost dominated by data, not job latency).

Full pipeline on BENCH/corpus_640000 committing snapshots, then the
incremental plan folds a FRESH 40k-doc delta (distinct urls, seed=77)
in. Records wall times + the ratio to BENCH/r3_incremental.json.

At toy scale (sf0.01) the incremental plan is SLOWER than a full run
— ~40 fixed-latency Spark jobs dominate 49 documents — which is why
this lives here and not in bench.py's headline: the crossover needs a
corpus big enough that re-scanning it costs more than the increment's
fixed overhead. Usage: SPARK_GRAFT_CPUS=8 python tools/bench_incremental.py
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


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("bench-incremental", parallelism=cpus)
    base = spark.read.parquet(str(REPO / "BENCH" / "corpus_640000"))
    n_base = base.count()

    delta_pd = generate(n_docs=40000, seed=77).webpages[["url", "text"]]
    delta_pd["url"] = "incr-" + delta_pd["url"].astype(str)
    delta = spark.createDataFrame(delta_pd).repartition(32).cache()
    n_delta = delta.count()

    cat_dir = tempfile.mkdtemp(prefix="bench_incr_")
    try:
        cat = ParquetSnapshotCatalog(cat_dir)
        t0 = time.time()
        res = run_pipeline(base, cfg=DedupConfig(), text_col="text", catalog=cat)
        res.clusters.count()
        full_sec = round(time.time() - t0, 2)
        res.release()
        spark.catalog.clearCache()

        t0 = time.time()
        inc = run_incremental(delta, cat, cfg=DedupConfig(), text_col="text",
                              update_snapshots=False)
        n_assigned = inc.assignments.count()
        incr_sec = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(cat_dir, ignore_errors=True)

    out = {
        "parallelism": cpus,
        "base_docs": n_base,
        "delta_docs": n_delta,
        "full_pipeline_sec": full_sec,
        "incremental_sec": incr_sec,
        "assigned": n_assigned,
        "full_over_incremental": round(full_sec / max(incr_sec, 1e-9), 2),
    }
    (REPO / "BENCH" / "r3_incremental.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
