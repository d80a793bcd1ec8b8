"""Measured evidence for the streaming ingestion path: one real
Structured Streaming query (file source, availableNow, one file per
micro-batch) cold-starts on a 160k-doc base and folds four 20k-doc
crawl increments, timing every micro-batch inside foreachBatch.

Deltas alternate the two crawl-realistic shapes bench_incremental.py
measures for the batch plan:
  * fresh      — all-new content (bloom gate prunes the old-side probe)
  * refetch50  — half byte-identical re-fetches (skip the signature
                 stage), half fresh

Run at two parallelism levels on the SAME feed for the scaling
witness; the final clusters-snapshot checksum must be bit-identical
across levels (the determinism invariant extended to the streaming
path). Usage:

  SPARK_GRAFT_CPUS=8 python tools/ingest_bench.py [out_name]

Appends one JSON line to BENCH/<out_name>.jsonl (default r4_ingest).
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
from acxspark.session import get_spark  # noqa: E402
from acxspark.streaming.ingest import fold_batch  # noqa: E402

# env-overridable so the SAME harness measures the batch-size
# amortization claim (BASELINE.md §23: a 20k micro-batch is
# fixed-latency-bound; a bigger delta should inherit the batch
# ladder's scaling). Base corpus must exist as BENCH/corpus_<N>.
BASE_DOCS = int(os.environ.get("SPARK_GRAFT_INGEST_BASE", 160_000))
DELTA_DOCS = int(os.environ.get("SPARK_GRAFT_INGEST_DELTA", 20_000))


def build_feed(spark, feed: Path) -> None:
    """Base + 4 deltas, one parquet file each, mtimes forcing order."""
    base = spark.read.parquet(str(REPO / "BENCH" / f"corpus_{BASE_DOCS}"))

    def fresh_pdf(seed: int):
        pdf = generate(n_docs=DELTA_DOCS, seed=seed).webpages[["url", "text"]]
        pdf["url"] = f"incr{seed}-" + pdf["url"].astype(str)
        return pdf

    refetch = (
        base.select("url", "text")
        .orderBy(F.xxhash64("url"))
        .limit(DELTA_DOCS // 2)
    )

    batches = [
        ("b0-base", base.select("url", "text"), "cold_start"),
        ("b1-fresh", spark.createDataFrame(fresh_pdf(101)), "fresh"),
        (
            "b2-refetch50",
            refetch.select(
                F.concat(F.lit("refetch2-"), F.col("url")).alias("url"), "text"
            ).unionByName(
                spark.createDataFrame(fresh_pdf(102).iloc[: DELTA_DOCS // 2])
            ),
            "refetch50",
        ),
        ("b3-fresh", spark.createDataFrame(fresh_pdf(103)), "fresh"),
        (
            "b4-refetch50",
            refetch.select(
                F.concat(F.lit("refetch4-"), F.col("url")).alias("url"), "text"
            ).unionByName(
                spark.createDataFrame(fresh_pdf(104).iloc[: DELTA_DOCS // 2])
            ),
            "refetch50",
        ),
    ]
    now = time.time()
    for i, (name, df, _) in enumerate(batches):
        d = feed / name
        df.coalesce(1).write.parquet(str(d))
        for f in os.listdir(d):
            os.utime(d / f, (now + i * 10, now + i * 10))
    return [kind for _, _, kind in batches]


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "r4_ingest"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    cfg = DedupConfig()
    spark = get_spark("ingest-bench", parallelism=cpus)

    work = Path(tempfile.mkdtemp(prefix="ingest_bench_"))
    try:
        feed = work / "feed"
        kinds = build_feed(spark, feed)
        cat = ParquetSnapshotCatalog(work / "cat")

        records: list[dict] = []

        def _fold(bdf, bid):
            t0 = time.time()
            s = fold_batch(bdf, bid, cat, cfg=cfg)
            s["sec"] = round(time.time() - t0, 2)
            s["kind"] = kinds[bid] if bid < len(kinds) else "?"
            records.append(s)

        schema = "url string, text string"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(_fold)
            .option("checkpointLocation", str(work / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        clusters = cat.read(spark, "clusters")
        checksum = int(
            clusters.agg(
                F.coalesce(
                    F.bit_xor(F.xxhash64("url", "cluster_id")), F.lit(0)
                )
            ).collect()[0][0]
        )
        incr = [r for r in records
                if r["action"] in ("increment", "increment_split")]
        incr_sec = sum(r["sec"] for r in incr)
        line = {
            "parallelism": cpus,
            "base_docs": BASE_DOCS,
            "delta_docs": DELTA_DOCS,
            "batches": records,
            "incr_docs_per_sec": round(
                sum(r["n_docs"] for r in incr) / incr_sec, 1
            ) if incr_sec else None,
            "clusters_rows": clusters.count(),
            "clusters_checksum": checksum,
        }
        print(json.dumps(line))
        with open(REPO / "BENCH" / f"{out_name}.jsonl", "a") as f:
            f.write(json.dumps(line) + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
