"""Semantic-dedup (SemDeDup IVF-cell path) scaling ladder — same
protocol as tools/bench_scaling.py / span_scaling.py: fresh-JVM
subprocesses (one per level) across a core ladder on one deterministic
embedding corpus, best-of-R per level, determinism gate (row count,
survivor count, and the full-assignment bit_xor checksum must be
IDENTICAL at every parallelism), output to BENCH/r3_semdedup.json.

The north rule's two-cluster-size criterion is proxied as elsewhere:
local[c] vs local[4c] on the same input, the host's single shared
DRAM bus being the known ceiling (BENCH/BASELINE.md "single-bus
arithmetic").

Corpus: n unit vectors (32-dim), 10% in planted near-dup pairs
(cosine ≈ 0.97 within a pair), generated once per n with a fixed
numpy seed and cached under BENCH/embcorpus_{n} (gitignored).

Usage: python tools/semdedup_scaling.py [n_vecs] [runs_per_level]
(defaults 400000, 2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LADDER = (1, 2, 4, 8, 32)


def ensure_embeddings(n: int, dim: int = 32) -> str:
    out = REPO / "BENCH" / f"embcorpus_{n}"
    if (out / "_SUCCESS").exists():
        return str(out)
    import numpy as np

    from acxspark.session import get_spark

    print(f"generating embedding corpus n={n} ...", flush=True)
    rng = np.random.default_rng(42)
    base = rng.standard_normal((n, dim))
    # plant pairs: vector 2i+1 is a tight perturbation of 2i for the
    # first 10% of ids (cosine ≈ 0.97 → same IVF cell, above τ=0.9)
    n_pairs = n // 20
    base[1 : 2 * n_pairs : 2] = (
        base[0 : 2 * n_pairs : 2]
        + 0.05 * rng.standard_normal((n_pairs, dim)) / np.sqrt(dim)
    )
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    spark = get_spark("embcorpus-gen", parallelism=16)
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [row.astype(np.float32) for row in base]}
    )
    spark.createDataFrame(pdf).repartition(32).write.mode(
        "overwrite"
    ).parquet(str(out))
    spark.stop()
    return str(out)


def run_level(data: str, cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "semdedup_job.py"), data, str(cpus)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=os.environ,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"semdedup_job failed at cpus={cpus}:\n{proc.stderr[-2000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # arg 3: artifact name — a NEW name starts a clean ladder (no
    # best-of merging across code versions; cross-round minima would
    # blur which code produced which wall)
    out_name = sys.argv[3] if len(sys.argv) > 3 else "r3_semdedup.json"

    data = ensure_embeddings(n_vecs)
    best: dict[int, dict] = {}
    prior = REPO / "BENCH" / out_name
    if prior.exists():
        old = json.loads(prior.read_text())
        if old.get("n_vecs") == n_vecs:
            best = {int(k): v for k, v in old["levels"].items()}

    for cpus in LADDER:
        for r in range(runs):
            res = run_level(data, cpus)
            print(f"cpus={cpus} run={r}: {res['wall_s']}s "
                  f"({res['vecs_per_sec']} vecs/s)", flush=True)
            if cpus not in best or res["wall_s"] < best[cpus]["wall_s"]:
                best[cpus] = res

    witnesses = {
        (v["n_rows"], v["n_survivors"], v["checksum"]) for v in best.values()
    }
    assert len(witnesses) == 1, f"determinism gate FAILED: {witnesses}"

    effs = {}
    for lo, hi in ((1, 4), (2, 8), (8, 32)):
        if lo in best and hi in best:
            effs[f"{lo}->{hi}"] = round(
                best[lo]["wall_s"] / best[hi]["wall_s"] / (hi / lo), 3
            )
    out = {
        "n_vecs": n_vecs,
        "levels": {str(k): v for k, v in sorted(best.items())},
        "efficiency": effs,
        "deterministic": True,
    }
    (REPO / "BENCH" / out_name).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
