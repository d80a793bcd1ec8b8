"""One curation-path run at a fixed parallelism — the measured job for
tools/bench_curation.py (fresh JVM per level, same protocol as
tools/scaling_job.py).

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
    from acxspark.functions import text as TX
    from acxspark.functions.repetition import rep_keep_col
    from acxspark.functions.url import url_host
    from acxspark.operators.decontaminate import (
        benchmark_gram_set,
        contaminated_doc_ids,
    )
    from acxspark.operators.packing import pack_token_budget
    from acxspark.operators.sampling import quota_sample_exact, sqrt_cap_quotas
    from acxspark.session import get_spark

    spark = get_spark("curation-bench", parallelism=cpus)
    docs = spark.read.parquet(data)
    n_docs = docs.count()

    from acxspark.functions.text import gopher_rules
    from acxspark.operators.lmfilter import score_unigram_nll, train_unigram_lm

    t0 = time.time()
    g = gopher_rules(F.col("text"))
    gated = docs.select(
        "url",
        "text",
        url_host(F.col("url")).alias("host"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.token_count_ws(F.col("text")).cast("long").alias("tok_ws"),
        rep_keep_col(F.col("text"), n=2, min_grams=20).alias("rep_keep"),
        (g["r_hash"] & g["r_ellipsis"] & g["r_bullet"]
         & g["r_ellipsis_end"] & g["r_alpha"]).alias("gopher_ok"),
    ).filter(
        (F.col("lang_pred") != "und")
        & (F.col("quality") >= 0.3)
        & F.col("tok_ws").between(5, 50000)
        & F.col("rep_keep")
        & F.col("gopher_ok")
    )

    # the gate's regex/array expressions dominate the wall — persist
    # the SLIM survivor projection once (text rides into decontam, so
    # keep it; at 10^12 docs this is the Iceberg `cleaned` snapshot
    # the pipeline would commit between stages anyway)
    gated = gated.persist()

    # unigram-LM perplexity band: model trained on the gated survivors
    # (the clean-slice bootstrap a 100 TB run would do), broadcast into
    # the scoring join; the band is generous — it prices the stage, the
    # cut itself is corpus-dependent policy
    # persist the V-row model: it is consumed twice downstream (the
    # scorer's OOV-floor probe + the broadcast build) and would
    # otherwise re-run the full token explode+groupBy each time — this
    # is the "materialize the model once" the operator docstring
    # prescribes, at job granularity
    model = train_unigram_lm(gated, "text", vocab_size=50_000).persist()
    nll = score_unigram_nll(gated, model, id_col="url", text_col="text")
    gated = gated.join(
        nll.filter(F.col("mean_nll") <= 12.0).select("url"), "url", "left_semi"
    )

    # eval set: a deterministic ~1/997 slice of the corpus
    bench = docs.filter(F.pmod(F.xxhash64("url"), F.lit(997)) == 0)
    flagged = contaminated_doc_ids(
        gated, benchmark_gram_set(bench, "text", 8), "url", "text", 8, hashed=True
    )
    clean = gated.join(F.broadcast(flagged), "url", "left_anti").select(
        "url", "host", "tok_ws"
    ).persist()

    sampled = quota_sample_exact(
        clean,
        "host",
        "url",
        sqrt_cap_quotas(clean, "host"),
        seed=11,
    )
    packed = pack_token_budget(sampled, "tok_ws", "url", budget=2048, seed=42)

    row = packed.agg(
        F.count("*").alias("n"),
        F.max(F.col("start_offset") + F.col("tok_ws")).alias("stream_tokens"),
        F.bit_xor(F.xxhash64("url", "start_offset", "shard_id")).alias("ck"),
    ).collect()[0]
    kept = clean.count()
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
    spark.stop()


if __name__ == "__main__":
    main()
