"""Curation-path scaling ladder (round-3 companion to
tools/bench_scaling.py, which measures the dedup pipeline).

Runs tools/curation_job.py — clean gate → decontamination →
sqrt-quota sampling → token packing — in FRESH subprocesses (one JVM
per level, same protocol as the dedup ladder) across a core ladder on
one deterministic corpus, best-of-R per level, asserts the job's
output checksum + kept/sampled counts are IDENTICAL at every
parallelism (the determinism gate), and writes BENCH/r3_curation.json.

The two-cluster-size criterion (north rule) is proxied the same way
as the dedup ladder: local[c] vs local[4c] on the same input, with
the host's single shared DRAM bus as the known ceiling (see
BENCH/BASELINE.md "single-bus arithmetic").

Usage: python tools/bench_curation.py [n_docs] [runs_per_level]
[ladder_csv] [out_name]  (defaults 160000, 2, 1,2,4,8,32,
r3_curation.json — pass a new out_name whenever the JOB changes:
the prior-merge best-of would otherwise mix checksums across chain
versions and trip the determinism gate)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LADDER = (1, 2, 4, 8, 32)


def run_level(data: str, cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "curation_job.py"), data, str(cpus)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=os.environ,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"curation_job failed at cpus={cpus}:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    global LADDER
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if len(sys.argv) > 3:
        LADDER = tuple(int(x) for x in sys.argv[3].split(","))
    out_name = sys.argv[4] if len(sys.argv) > 4 else "r3_curation.json"

    from tools.bench_scaling import ensure_corpus

    data = ensure_corpus(n_docs)
    best: dict[int, dict] = {}
    # merge with a prior pass if one exists (best-of-all-fresh-JVM-runs)
    prior = REPO / "BENCH" / out_name
    if prior.exists():
        old = json.loads(prior.read_text())
        if old.get("n_docs") == n_docs:
            best = {int(c): r for c, r in old["ladder"].items()}
            print(f"merging with prior pass: {sorted(best)}", flush=True)
    for c in LADDER:
        for r in range(runs):
            res = run_level(data, c)
            print(f"cpus={c} run={r}: {res['wall_s']}s "
                  f"({res['docs_per_sec']} docs/s)", flush=True)
            if c not in best or res["wall_s"] < best[c]["wall_s"]:
                best[c] = res

    # determinism gate: identical output at every parallelism
    keys = ("kept", "sampled", "stream_tokens", "checksum")
    ref = {k: best[LADDER[0]][k] for k in keys}
    for c in LADDER[1:]:
        got = {k: best[c][k] for k in keys}
        assert got == ref, f"output drift at cpus={c}: {got} != {ref}"
    print(f"determinism: identical {keys} at all of {LADDER}")

    def eff(lo: int, hi: int) -> float:
        return round(
            (best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"]) / (hi / lo), 3
        )

    out = {
        "job": "curation chain (clean+gopher gate -> LM band -> decontam -> quota sample -> packing)",
        "n_docs": n_docs,
        "runs_per_level": runs,
        "ladder": {str(c): best[c] for c in LADDER},
        "eff": {f"{lo}_{hi}": eff(lo, hi)
                for lo, hi in ((1, 4), (2, 8), (8, 32))
                if lo in best and hi in best},
        "determinism": ref,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (REPO / "BENCH" / out_name).write_text(json.dumps(out, indent=2))
    print(json.dumps(out["eff"]))


if __name__ == "__main__":
    main()
