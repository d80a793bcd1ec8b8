"""A/B the LSH candidate+verify composition shapes (round-5 items 1+4).

Times the full minhash_lsh_pairs shape (signatures → candidate_pairs →
exact-Jaccard verify, exactly as the bench query composes it) under
four physical variants, alternating trials in one JVM:

  r4          sigs un-persisted, band rows persisted  (the r4 query shape)
  join        sigs un-persisted, strategy="join"      (the r3 strategy — the
                                                       regression adjudication)
  sigcache    sigs persisted, band rows persisted
  sigcache_nobk  sigs persisted, band explode fused into consumers

Pair checksums are asserted identical across all variants. Directional
tool — committed numbers come from bench.py's fresh-JVM protocol.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/lsh_ab.py
       python tools/lsh_ab.py BENCH/corpus_160000   # raw parquet of (url,text)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from acxspark.config import DedupConfig  # noqa: E402
from acxspark.operators.lsh import candidate_pairs, release_band_caches  # noqa: E402
from acxspark.operators.signatures import with_signatures  # noqa: E402
from acxspark.operators.verify import exact_jaccard_edges  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    spark = get_spark("lsh-ab", parallelism=cpus)
    if len(sys.argv) > 1:
        docs = spark.read.parquet(sys.argv[1]).select(
            F.col("url").alias("doc_id"), "text"
        )
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
    n = docs.count()
    cfg = DedupConfig()

    def run(variant: str) -> tuple[float, tuple[int, int]]:
        t0 = time.time()
        caches = []
        sigs = with_signatures(docs, text_col="text", cfg=cfg, id_col="doc_id")
        kw: dict = {"caches": caches}
        if variant == "join":
            kw["strategy"] = "join"
        if variant.startswith("sigcache"):
            sigs = sigs.persist()
            caches.append(sigs)
        if variant == "sigcache_nobk":
            kw["persist_bands"] = False
        cands = candidate_pairs(sigs, "doc_id", "minhash", cfg, **kw)
        pairs = exact_jaccard_edges(cands, sigs, "doc_id", cfg)
        row = pairs.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64("id_a", "id_b")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        wall = time.time() - t0
        for c in caches:
            c.unpersist()
        release_band_caches()
        spark.catalog.clearCache()
        return wall, (int(row["n"]), int(row["h"]))

    variants = ["r4", "join", "sigcache", "sigcache_nobk"]
    walls: dict[str, list[float]] = {v: [] for v in variants}
    sums: dict[str, set] = {v: set() for v in variants}
    for _ in range(trials):
        for v in variants:
            w, s = run(v)
            walls[v].append(round(w, 3))
            sums[v].add(s)

    base = next(iter(sums["r4"]))
    assert all(sums[v] == {base} for v in variants), sums
    print(json.dumps({
        "cpus": cpus, "docs": n,
        "walls": walls,
        "min": {v: min(walls[v]) for v in variants},
        "pairs": base[0], "checksum": base[1],
        "identical_across_variants": True,
    }))


if __name__ == "__main__":
    main()
