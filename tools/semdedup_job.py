"""One semantic-dedup (SemDeDup IVF-cell scale path) run at a fixed
parallelism — the fresh-JVM unit of tools/semdedup_scaling.py's ladder.

Reads a deterministic embedding corpus (semdedup_scaling.ensure_embeddings
layout), runs operators/semdedup.semantic_dedup on the IVF-cell path
(n_centroids = n/500 → ~500-row cells), and prints ONE JSON line with
wall time, throughput, and the determinism witnesses (row count,
survivor count, bit_xor checksum over the full assignment — bit_xor,
not sum: ANSI mode overflows a sum of xxhash64).

Usage: python tools/semdedup_job.py <parquet_dir> <cpus>
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from acxspark.operators.semdedup import semantic_dedup  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def main() -> None:
    data, cpus = sys.argv[1], int(sys.argv[2])
    spark = get_spark("semdedup-scaling", parallelism=cpus)
    emb = spark.read.parquet(data)
    n = emb.count()  # corpus size is an input, not part of the timed job

    t0 = time.time()
    # k = n/500 targets ~500-row cells; capped at 2000 so the Lloyd
    # driver loop (k×dim rows/round) stays off the serial floor
    out = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.9,
        n_centroids=max(8, min(2000, n // 500)), n_iter=2, seed=42,
    )
    agg = out.agg(
        F.count("*").alias("n_rows"),
        F.sum("is_survivor").alias("n_survivors"),
        F.bit_xor(
            F.xxhash64("vec_id", "sem_cluster_id", "is_survivor")
        ).alias("checksum"),
    ).collect()[0]
    wall = time.time() - t0

    print(json.dumps({
        "cpus": cpus,
        "wall_s": round(wall, 3),
        "vecs_per_sec": round(agg["n_rows"] / wall, 1),
        "n_rows": agg["n_rows"],
        "n_survivors": int(agg["n_survivors"]),
        "checksum": int(agg["checksum"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
