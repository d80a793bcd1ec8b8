"""Span-dedup (ExactSubstr) scaling ladder — round-3 companion to
tools/bench_scaling.py (dedup pipeline) and tools/bench_curation.py
(curation chain), same protocol: tools/span_job.py in FRESH
subprocesses (one JVM per level) across a core ladder on one
deterministic corpus, best-of-R per level, determinism gate (doc
count, token totals, and the (url, clean_text) bit_xor checksum must
be IDENTICAL at every parallelism), output to BENCH/r3_span.json.

The north rule's two-cluster-size criterion is proxied as elsewhere:
local[c] vs local[4c] on the same input, the host's single shared
DRAM bus being the known ceiling (BENCH/BASELINE.md "single-bus
arithmetic").

Usage: python tools/span_scaling.py [n_docs] [runs_per_level]
(defaults 160000, 2)
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


def run_level(data: str, cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "span_job.py"), data, str(cpus)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=os.environ,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"span_job failed at cpus={cpus}:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from tools.bench_scaling import ensure_corpus

    data = ensure_corpus(n_docs)
    best: dict[int, dict] = {}
    prior = REPO / "BENCH" / "r3_span.json"
    if prior.exists():
        old = json.loads(prior.read_text())
        if old.get("n_docs") == n_docs:
            best = {int(k): v for k, v in old["levels"].items()}

    for cpus in LADDER:
        for r in range(runs):
            res = run_level(data, cpus)
            print(f"cpus={cpus} run={r}: {res['wall_s']}s "
                  f"({res['docs_per_sec']} docs/s)", flush=True)
            if cpus not in best or res["wall_s"] < best[cpus]["wall_s"]:
                best[cpus] = res

    witnesses = {
        (v["n_docs"], v["total_tokens"], v["total_removed"], v["checksum"])
        for v in best.values()
    }
    assert len(witnesses) == 1, f"determinism gate FAILED: {witnesses}"

    effs = {}
    for lo, hi in ((1, 4), (2, 8), (8, 32)):
        if lo in best and hi in best:
            effs[f"{lo}->{hi}"] = round(
                best[lo]["wall_s"] / best[hi]["wall_s"] / (hi / lo), 3
            )
    out = {
        "n_docs": n_docs,
        "levels": {str(k): v for k, v in sorted(best.items())},
        "efficiency": effs,
        "deterministic": True,
    }
    (REPO / "BENCH" / "r3_span.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
