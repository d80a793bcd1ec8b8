"""One span-dedup (ExactSubstr) run at a fixed parallelism — the
fresh-JVM unit of tools/span_scaling.py's ladder.

Reads the deterministic webpages corpus (tools/bench_scaling.py
ensure_corpus layout), runs operators/spandedup.span_dedup at k=8
over the extracted text keyed by url, and prints ONE JSON line with
wall time, throughput, and the determinism witnesses (doc count,
total kept/removed tokens, bit_xor checksum over (url, clean_text) —
bit_xor, not sum: ANSI mode overflows a sum of xxhash64).

Usage: python tools/span_job.py <parquet_dir> <cpus>
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from acxspark.operators.spandedup import span_dedup  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def main() -> None:
    data, cpus = sys.argv[1], int(sys.argv[2])
    spark = get_spark("span-scaling", parallelism=cpus)
    docs = spark.read.parquet(data).select("url", "text")

    t0 = time.time()
    out = span_dedup(docs, id_col="url", text_col="text", k=8)
    agg = out.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_removed").alias("total_removed"),
        F.bit_xor(F.xxhash64("url", "clean_text")).alias("checksum"),
    ).collect()[0]
    wall = time.time() - t0

    print(json.dumps({
        "cpus": cpus,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(agg["n_docs"] / wall, 1),
        "n_docs": agg["n_docs"],
        "total_tokens": int(agg["total_tokens"]),
        "total_removed": int(agg["total_removed"]),
        "checksum": int(agg["checksum"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
