"""One curation-path run at a fixed parallelism — the measured job for
tools/bench_curation.py (fresh JVM per level, same protocol as
tools/scaling_job.py). The chain itself is the library plan
acxspark/plans/curate.py::run_curation — this script only adds the
corpus read, the eval-slice choice, and the witness aggregate.

Chain under test (the round-3 webtext curation tier, end to end):
clean gate (lang + quality + token bounds + repetition + the Gopher
  structural rules — symbol/ellipsis/bullet/alpha — all map-only)
→ unigram-LM perplexity band (model trained on the gated survivors,
  broadcast into the scoring join; CCNet-style keep-band on mean NLL)
→ decontamination flags (broadcast 8-gram semi-join)
→ sqrt-quota source mixing per host (two-level tournament)
→ token-budget packing (two-level prefix sum)
finished by an aggregate action that cannot prune any stage.
(The Gopher word-count/stop-word floors and the C4 terminal-punctuation
rules are NOT in this chain: the synthetic corpus has no line/stopword
structure, so they would zero it out — their cost shape is the same
map-only scan as the rules that are included.)

Usage: python tools/curation_job.py <parquet_dir> <cpus>
Prints one JSON line {cpus, docs, kept, sampled, wall_s, docs_per_sec,
stream_tokens, checksum}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    data, cpus = sys.argv[1], int(sys.argv[2])
    from acxspark.plans.curate import run_curation
    from acxspark.session import get_spark

    spark = get_spark("curation-bench", parallelism=cpus)
    docs = spark.read.parquet(data)
    n_docs = docs.count()

    t0 = time.time()
    # eval set: a deterministic ~1/997 slice of the corpus
    bench = docs.filter(F.pmod(F.xxhash64("url"), F.lit(997)) == 0)
    res = run_curation(
        docs,
        id_col="url",
        text_col="text",
        quality_min=0.3,
        tok_bounds=(5, 50000),
        gopher_structural=True,
        lm_nll_band=(0.0, 12.0),
        vocab_size=50_000,
        eval_docs=bench,
        quota_sample=True,
        pack_budget=2048,
        seed=11,
    )
    row = res.packed.agg(
        F.count("*").alias("n"),
        F.max(F.col("start_offset") + F.col("tok_ws")).alias("stream_tokens"),
        F.bit_xor(F.xxhash64("url", "start_offset", "shard_id")).alias("ck"),
    ).collect()[0]
    kept = res.survivors.count()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": n_docs,
                "kept": kept,
                "sampled": row["n"],
                "wall_s": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "stream_tokens": int(row["stream_tokens"]),
                "checksum": int(row["ck"]),
            }
        )
    )
    res.release()
    spark.stop()


if __name__ == "__main__":
    main()
