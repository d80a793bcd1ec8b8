"""The scaling-evidence job: full near-dup pipeline over a generated
corpus at $SPARK_GRAFT_CPUS parallelism. Prints one JSON line.

Run by tools/bench_scaling.py at two parallelism levels on the SAME
input parquet — the sandbox proxy for N vs 4N executors (BASELINE.md).
Timing starts AFTER the session is up and the input is readable (a
real cluster's executors are provisioned before the job too); it
covers the full pipeline: shingle → MinHash → LSH → Jaccard verify →
SimHash → containment → CC → survivors.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from acxspark.config import DedupConfig  # noqa: E402
from acxspark.plans.pipeline import run_pipeline  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def main() -> None:
    data = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # SPARK_GRAFT_DFCUT=<fraction> enables the shingle doc-frequency
    # cut (config.shingle_max_doc_freq) for ramp-flattening A/B runs
    dfcut = os.environ.get("SPARK_GRAFT_DFCUT")
    cfg = DedupConfig(
        shingle_max_doc_freq=float(dfcut) if dfcut else None
    )
    spark = get_spark("scaling-job", parallelism=cpus)
    docs = spark.read.parquet(data).select("url", "text")
    n_docs = docs.count()  # warm: session + file listing out of the timer

    # best-of-2: the host is a shared VM with visible steal-time
    # spikes; the second run also reflects steady-state (warm JIT,
    # warm worker arenas) — the regime a long-running cluster job
    # actually operates in.
    wall = float("inf")
    n_survivors = 0
    checksum = 0
    for _ in range(2):
        t0 = time.time()
        res = run_pipeline(docs, cfg=cfg, text_col="text")
        n_survivors = res.survivors.count()
        wall = min(wall, time.time() - t0)
        # determinism witness (outside the timer): order-free xor of
        # survivor url hashes — must be bit-identical at every
        # parallelism level on the same input
        checksum = int(
            res.survivors.agg(
                F.coalesce(F.bit_xor(F.xxhash64("url")), F.lit(0))
            ).collect()[0][0]
        )
        for (_, df) in list(vars(res).items()):
            if hasattr(df, "unpersist"):
                df.unpersist()
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "parallelism": cpus,
                "docs": n_docs,
                "survivors": n_survivors,
                "survivor_checksum": checksum,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
