"""Per-stage weak-scaling attribution for the near-dup pipeline.

Replays the pipeline's stage boundaries (same operators, same config)
with a materialization barrier after each, timing each stage at the
given parallelism. Run at two (cores, docs) points with constant
work/core and divide: stages whose time ratio exceeds 1.0 are the
weak-scaling bottlenecks BENCH/BASELINE.md must name.

Usage: SPARK_GRAFT_CPUS=8 python tools/stage_breakdown.py <parquet_dir>
Prints one JSON line {"parallelism": N, "docs": D, "stages": {...}}.
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
from acxspark.operators.cc import cluster_assignments  # noqa: E402
from acxspark.operators.lsh import candidate_pairs  # noqa: E402
from acxspark.operators.signatures import with_signatures  # noqa: E402
from acxspark.operators.simhash import simhash_candidate_pairs  # noqa: E402
from acxspark.operators.verify import containment_edges, exact_jaccard_edges  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def run_once(docs, cfg) -> dict[str, float]:
    stages: dict[str, float] = {}
    caches = []

    def mark(name, action):
        t0 = time.time()
        out = action()
        stages[name] = round(time.time() - t0, 2)
        return out

    docs = docs.filter(F.length("text") <= cfg.max_text_bytes).persist()
    caches.append(docs)
    mark("scan", docs.count)

    hashed = docs.select("url", F.sha2(F.col("text"), 256).alias("text_sha"))
    sha_min = hashed.groupBy("text_sha").agg(F.min("url").alias("min_url"),
                                             F.count("*").alias("n"))
    exact_edges = (
        hashed.join(sha_min.filter(F.col("n") > 1), "text_sha")
        .filter(F.col("url") != F.col("min_url"))
        .select(F.col("min_url").alias("id_a"), F.col("url").alias("id_b"))
    )
    mark("exact_tier", exact_edges.count)

    sigs = with_signatures(docs, text_col="text", cfg=cfg, id_col="url").persist()
    caches.append(sigs)
    mark("signatures", sigs.count)

    cands = candidate_pairs(sigs, "url", "minhash", cfg, caches=caches).persist()
    caches.append(cands)
    mark("lsh_candidates", cands.count)

    near = exact_jaccard_edges(cands, sigs, "url", cfg).persist()
    caches.append(near)
    mark("jaccard_verify", near.count)

    sim = simhash_candidate_pairs(sigs, "url", "simhash", cfg, caches=caches)
    mark("simhash_tier", sim.count)

    unverified = cands.join(near.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
    contain = containment_edges(
        unverified, docs.select("url", "text"), "url"
    )
    mark("containment", contain.count)

    edges = (
        exact_edges.select("id_a", "id_b")
        .unionByName(near.select("id_a", "id_b"))
        .unionByName(sim.select("id_a", "id_b"))
    )
    edge_pairs = mark(
        "edge_checkpoint", lambda: edges.localCheckpoint(eager=True)
    )
    # cluster_assignments runs its CC rounds EAGERLY (localCheckpoint
    # per round) — time the call itself, not just the final count
    clusters = mark(
        "cc_rounds",
        lambda: cluster_assignments(docs.select("url"), "url", edge_pairs),
    )
    mark("cc_label_count", clusters.count)

    survivors = docs.join(
        clusters.filter(F.col("url") == F.col("cluster_id")).select("url"),
        "url", "left_semi",
    )
    mark("survivors", survivors.count)

    for c in caches:
        c.unpersist()
    return stages


def main() -> None:
    data = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stage-breakdown", parallelism=cpus)
    docs = spark.read.parquet(data).select("url", "text")
    n_docs = docs.count()
    cfg = DedupConfig()
    best: dict[str, float] | None = None
    for _ in range(2):  # best-of-2 per stage (shared-host jitter)
        cur = run_once(docs, cfg)
        spark.catalog.clearCache()
        best = cur if best is None else {
            k: min(best[k], cur[k]) for k in cur
        }
    total = round(sum(best.values()), 2)
    print(json.dumps({"parallelism": cpus, "docs": n_docs,
                      "stages": best, "stage_total_sec": total}))


if __name__ == "__main__":
    main()
