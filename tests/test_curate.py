"""run_curation plan: stage toggles, determinism across parallelism,
decontamination wiring, LM-band monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from acxspark.plans.curate import run_curation

# short (< 21 tokens: below the repetition filter's min_grams floor),
# clean English, one shared 13-token prefix (≥ 8-gram overlap for the
# decontamination test), unique tail per doc
PREFIX = "the quick brown fox jumps over a lazy dog near the barn gate"


def _docs(spark, n=40):
    rows = [
        (f"http://host{i % 5}.example/page{i}",
         f"{PREFIX} word{i} item{i} thing{i} piece{i} part{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_chain_end_to_end_and_release(spark):
    docs = _docs(spark)
    res = run_curation(docs, pack_budget=256)
    surv = res.survivors.count()
    assert surv == 40  # clean English docs all pass the gates
    packed = res.packed.collect()
    assert len(packed) > 0
    res.release()


def test_stage_toggles(spark):
    docs = _docs(spark)
    res = run_curation(docs, lm_nll_band=None, quota_sample=False,
                       pack_budget=None)
    assert res.packed is None
    assert res.survivors.count() == 40
    res.release()


def test_decontamination_drops_planted_overlap(spark):
    docs = _docs(spark)
    eval_docs = spark.createDataFrame(
        [("e1", PREFIX)], "url string, text string"
    )
    res = run_curation(docs, eval_docs=eval_docs, quota_sample=False,
                       pack_budget=None)
    kept = {r["url"] for r in res.survivors.collect()}
    res.release()
    # every doc shares BODY 8-grams with the eval doc → all flagged
    assert kept == set()


def test_lm_band_monotone(spark):
    docs = _docs(spark)
    wide = run_curation(docs, lm_nll_band=(0.0, 50.0), quota_sample=False,
                        pack_budget=None)
    n_wide = wide.survivors.count()
    wide.release()
    tight = run_curation(docs, lm_nll_band=(0.0, 0.1), quota_sample=False,
                         pack_budget=None)
    n_tight = tight.survivors.count()
    tight.release()
    assert n_wide == 40 and n_tight == 0


def test_deterministic_across_parallelism(spark):
    docs = _docs(spark, n=60)

    def run(df):
        res = run_curation(df, pack_budget=256)
        row = res.packed.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("url", "start_offset", "shard_id")).alias("ck"),
        ).collect()[0]
        out = (res.survivors.count(), row["n"], row["ck"])
        res.release()
        return out

    assert run(docs.repartition(1)) == run(docs.repartition(16))
