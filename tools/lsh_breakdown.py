"""Sub-stage attribution INSIDE the LSH candidate stage.

stage_breakdown.py times `lsh_candidates` as one block; this splits it
at the operator's internal boundaries (same code path as
operators/lsh.py candidate_pairs, strategy="bucket", hashed string
ids) with a materialization barrier after each:

  band_persist   explode signature -> (band_key, hid), persist + count
  huge_sample    1% sampled over-cap key detection (the broadcast probe)
  bucket_pairs   groupBy band_key collect_list -> triangular explode
  distinct       cross-band pair dedup (shuffle of the raw pair stream)
  join_back      hid pairs -> url pairs (2 equi-joins vs the corpus)

Each boundary materializes via count() so a stage's time includes its
own shuffle write+read, mirroring how the pipeline consumes the real
plan. Barriers make the SUM slightly exceed the fused stage time; the
point is the RATIO between sub-stages, not absolutes.

Usage: SPARK_GRAFT_CPUS=4 python tools/lsh_breakdown.py BENCH/corpus_160000
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
from acxspark.operators.lsh import (  # noqa: E402
    band_keys,
    bucket_pairs,
    huge_band_keys,
    join_back_ids,
)
from acxspark.operators.signatures import with_signatures  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def main() -> None:
    data = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    cfg = DedupConfig()
    spark = get_spark("lsh-breakdown", parallelism=cpus)
    docs = spark.read.parquet(data).select("url", "text")
    docs.count()

    sigs = with_signatures(docs, text_col="text", cfg=cfg, id_col="url").persist()
    sigs.count()  # signatures out of the timer: we attribute LSH only

    stages: dict[str, float] = {}

    def mark(name: str, action):
        t0 = time.time()
        out = action()
        stages[name] = round(time.time() - t0, 2)
        return out

    src = sigs.withColumn("_acx_hid", F.xxhash64(F.col("url")))
    bk = (
        band_keys(src, "_acx_hid", "minhash", cfg)
        .select("band_key", "_acx_hid")
        .persist()
    )
    n_band_rows = mark("band_persist", bk.count)

    huge = mark(
        "huge_sample",
        lambda: F.broadcast(
            huge_band_keys(bk, cfg.max_band_size).persist()
        ),
    )
    kc = bk.join(huge, "band_key", "left_anti")

    raw_pairs = bucket_pairs(kc, "_acx_hid", cap=cfg.max_band_size).persist()
    n_raw = mark("bucket_pairs", raw_pairs.count)

    pairs = raw_pairs.distinct().persist()
    n_pairs = mark("distinct", pairs.count)

    resolved = join_back_ids(pairs, docs, "url").persist()
    n_resolved = mark("join_back", resolved.count)

    print(json.dumps({
        "parallelism": cpus,
        "docs": docs.count(),
        "band_rows": n_band_rows,
        "raw_pairs": n_raw,
        "distinct_pairs": n_pairs,
        "resolved_pairs": n_resolved,
        "stages": stages,
        "lsh_total_sec": round(sum(stages.values()), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
