"""Containment-tier A/B: applyInPandas path vs codegen contains() path.

Round-4 artifact (VERDICT item 8): the containment stage used to run
as ~one Python group-call per candidate left-doc (docs/SCALE.md priced
~10^8 group calls at 100 TB, "hours on 4000 cores"). The JVM path
replaces the whole stage with a codegen filter. This tool runs BOTH on
the same unverified candidate set from the bench corpus, asserts the
edge sets are IDENTICAL, and reports wall time + the group-call count
the Python path would have made (distinct id_a) vs zero.

Usage: SPARK_GRAFT_CPUS=32 python tools/containment_bench.py \
           BENCH/corpus_640000 [> BENCH/r4_containment.json]
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
from acxspark.operators.lsh import candidate_pairs  # noqa: E402
from acxspark.operators.signatures import with_signatures  # noqa: E402
from acxspark.operators.verify import containment_edges, exact_jaccard_edges  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "BENCH/corpus_640000"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("containment-bench", parallelism=cpus)
    cfg = DedupConfig()

    docs = (
        spark.read.parquet(data)
        .select("url", "text")
        .filter(F.length("text") <= cfg.max_text_bytes)
        .persist()
    )
    n_docs = docs.count()
    sigs = with_signatures(docs, text_col="text", cfg=cfg, id_col="url").persist()
    sigs.count()
    cands = candidate_pairs(sigs, "url", "minhash", cfg).persist()
    near = exact_jaccard_edges(cands, sigs, "url", cfg).select("id_a", "id_b")
    unverified = (
        cands.join(near, ["id_a", "id_b"], "left_anti").persist()
    )
    n_pairs = unverified.count()
    n_groups = unverified.select("id_a").distinct().count()

    out: dict = {
        "corpus": data,
        "docs": n_docs,
        "unverified_pairs": n_pairs,
        "python_group_calls": n_groups,
        "jvm_group_calls": 0,
        "parallelism": cpus,
        "impls": {},
    }
    edge_sets: dict[str, frozenset] = {}
    for impl in ("python", "jvm"):
        best = float("inf")
        for _ in range(2):  # best-of-2 (shared-host jitter)
            t0 = time.time()
            rows = containment_edges(
                unverified, docs, "url", impl=impl
            ).collect()
            best = min(best, time.time() - t0)
        edge_sets[impl] = frozenset((r["id_a"], r["id_b"]) for r in rows)
        out["impls"][impl] = {"sec": round(best, 3), "edges": len(edge_sets[impl])}

    out["identical_edges"] = edge_sets["python"] == edge_sets["jvm"]
    out["speedup"] = round(
        out["impls"]["python"]["sec"] / max(out["impls"]["jvm"]["sec"], 1e-9), 2
    )
    print(json.dumps(out))
    if not out["identical_edges"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
