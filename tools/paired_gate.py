"""Drift-tolerant N -> 4N gate pair measurement.

BENCH/BASELINE.md §19 showed the failure mode of min-per-level ladders
on this shared microVM: external steal drifts the host speed by up to
1.8x WITHIN a session, so a 1-core min captured in a fast window over a
4-core min from a slow one biases the scaling ratio in either
direction. This harness measures the gate pair so that first-order
drift cancels:

    run [4c, 1c, 4c, (1c, 4c)*]   -- every 1c sample is BRACKETED by
                                      two 4c samples a few minutes away

    eff_i = T1_i / (4 * gmean(T4_before, T4_after))

If host speed drifts (roughly) linearly across the ~10-minute bracket,
the geometric mean of the bracketing 4-core walls estimates the 4-core
wall AT THE TIME of the 1-core run, so the ratio reflects the code, not
the window. Output: one JSON line per raw sample plus a final line with
every bracketed efficiency and their max/median.

Usage: python tools/paired_gate.py [data_dir] [n_cycles] [out.jsonl]
Defaults: BENCH/corpus_640000, 1 cycle, BENCH/paired_gate.jsonl
(n_cycles=k runs k bracketed 1-core samples, i.e. levels 4,(1,4)*k).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

A_CORES = 1   # the "N" level
B_CORES = 4   # the "4N" level


def run_level(data: str, cpus: int, retries: int = 1) -> dict:
    """One scaling_job subprocess; on empty stdout (a silently-dying
    JVM was observed once on this host under heavy steal) log stderr
    and retry rather than crash mid-run and lose the bracket."""
    for attempt in range(retries + 1):
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "scaling_job.py"), data],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
            timeout=3600,
        )
        lines = proc.stdout.strip().splitlines()
        if lines:
            try:
                # parse INSIDE the retry loop: a JVM killed mid-print
                # leaves partial/non-JSON stdout — the same
                # dying-under-steal mode the empty-stdout retry covers
                rec = json.loads(lines[-1])
            except json.JSONDecodeError:
                lines = []
        if lines:
            if attempt:
                rec["retried"] = attempt
            rec["t_end"] = round(time.time(), 1)
            return rec
        print(
            f"level {cpus}c attempt {attempt}: no/garbled stdout "
            f"(rc={proc.returncode}); stderr tail: "
            + " | ".join(proc.stderr.strip().splitlines()[-3:]),
            file=sys.stderr,
            flush=True,
        )
    raise RuntimeError(f"level {cpus}c produced no output after {retries + 1} attempts")


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "BENCH" / "corpus_640000")
    n_cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    out_path = Path(sys.argv[3]) if len(sys.argv) > 3 else REPO / "BENCH" / "paired_gate.jsonl"

    levels = [B_CORES]
    for _ in range(n_cycles):
        levels += [A_CORES, B_CORES]

    samples: list[dict] = []
    with open(out_path, "a") as fh:
        for cpus in levels:
            rec = run_level(data, cpus)
            samples.append(rec)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec), flush=True)

        checks = {s["survivor_checksum"] for s in samples}
        effs = []
        for i, s in enumerate(samples):
            if s["parallelism"] != A_CORES:
                continue
            t4_before = samples[i - 1]["wall_sec"]
            t4_after = samples[i + 1]["wall_sec"]
            t4_interp = math.sqrt(t4_before * t4_after)
            effs.append(
                {
                    "t1": s["wall_sec"],
                    "t4_before": t4_before,
                    "t4_after": t4_after,
                    "t4_interp": round(t4_interp, 2),
                    "eff_1_to_4": round(s["wall_sec"] / ((B_CORES / A_CORES) * t4_interp), 3),
                }
            )
        vals = sorted(e["eff_1_to_4"] for e in effs)
        summary = {
            "metric": "paired_gate_eff_1_to_4",
            "pairs": effs,
            "best": vals[-1],
            "median": vals[len(vals) // 2],
            "deterministic": len(checks) == 1,
            "survivor_checksum": samples[0]["survivor_checksum"],
        }
        fh.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
