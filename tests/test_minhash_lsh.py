"""MinHash/LSH/SimHash unit behavior: signature determinism, Jaccard
estimation accuracy, band-key candidate generation, Hamming probe."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from acxspark.config import DedupConfig
from acxspark.operators.lsh import band_keys, candidate_pairs
from acxspark.operators.minhash import minhash_batch, with_minhash
from acxspark.operators.simhash import simhash_batch, simhash_candidate_pairs, with_simhash

CFG = DedupConfig()


def test_minhash_deterministic():
    sh = pd.Series([[1, 2, 3, 4], [1, 2, 3, 4], [9, 10, 11]])
    a = minhash_batch(sh, 128, 42)
    b = minhash_batch(sh, 128, 42)
    assert a[0] == b[0] == a[1]
    assert a[0] != a[2]


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    base = list(rng.integers(0, 1 << 60, size=200))
    # true Jaccard 0.8: |A∩B|=200 shared of 250 union
    extra = list(rng.integers(0, 1 << 60, size=50))
    a_set, b_set = base, base + extra
    sigs = minhash_batch(pd.Series([a_set, b_set]), 256, 42)
    est = np.mean(np.array(sigs[0]) == np.array(sigs[1]))
    true_j = 200 / 250
    assert abs(est - true_j) < 0.1


def test_simhash_close_for_near_texts():
    rng = np.random.default_rng(1)
    base = list(rng.integers(0, 1 << 60, size=300))
    perturbed = base[:-5] + list(rng.integers(0, 1 << 60, size=5))
    fps = simhash_batch(pd.Series([base, perturbed]))
    ham = bin((int(fps[0]) ^ int(fps[1])) & ((1 << 64) - 1)).count("1")
    assert ham <= 10


def test_lsh_finds_identical_and_skips_disjoint(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog again and again"),
        ("b", "the quick brown fox jumps over the lazy dog again and again"),
        ("c", "completely different words about mountains rivers and stars xyz"),
    ]
    df = with_minhash(spark.createDataFrame(rows, ["url", "text"]), cfg=CFG)
    pairs = {(r["id_a"], r["id_b"]) for r in candidate_pairs(df, "url", cfg=CFG).collect()}
    assert ("a", "b") in pairs
    assert ("a", "c") not in pairs and ("b", "c") not in pairs


def test_band_key_count(spark):
    df = with_minhash(spark.createDataFrame([("a", "x y z w v u t s")], ["url", "text"]), cfg=CFG)
    assert band_keys(df, "url", cfg=CFG).count() == CFG.lsh_bands


def test_hot_band_cap(spark):
    # 30 identical docs: every band bucket has 30 members; cap at 10 ⇒ 0 pairs
    cfg = DedupConfig(max_band_size=10)
    rows = [(f"u{i:02d}", "same words everywhere forever and ever amen") for i in range(30)]
    df = with_minhash(spark.createDataFrame(rows, ["url", "text"]), cfg=cfg)
    assert candidate_pairs(df, "url", cfg=cfg).count() == 0


def test_simhash_candidates(spark):
    words = [f"word{i}" for i in range(240)]
    near = words[:120] + ["CHANGED"] + words[121:]  # 1 token of 240 edited
    rows = [
        ("a", " ".join(words)),
        ("b", " ".join(near)),
        ("c", " ".join(f"other{i}" for i in range(240))),
    ]
    df = with_simhash(spark.createDataFrame(rows, ["url", "text"]))
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_candidate_pairs(df, "url").collect()}
    assert ("a", "b") in pairs
    assert ("a", "c") not in pairs


def test_simhash_salted_equals_plain_on_hot_bucket(spark):
    """The SimHash tier's salted self-join must emit EXACTLY the plain
    join's pairs on a corpus with a hot chunk bucket (30 identical
    fingerprints ⇒ every chunk bucket has 30 members, above the
    hot threshold, below the cap)."""
    base = " ".join(f"tok{i}" for i in range(100))
    rows = [(f"u{i:02d}", base if i < 30 else f"unique {i} " * 40)
            for i in range(40)]
    df = with_simhash(spark.createDataFrame(rows, ["url", "text"]))
    cfg = DedupConfig(max_chunk_bucket=100, band_salt_buckets=4)
    plain = {(r["id_a"], r["id_b"], r["hamming"]) for r in
             simhash_candidate_pairs(df, "url", cfg=cfg, salted=False,
                                     strategy="join").collect()}
    salted = {(r["id_a"], r["id_b"], r["hamming"]) for r in
              simhash_candidate_pairs(df, "url", cfg=cfg, salted=True,
                                      strategy="join").collect()}
    bucket = {(r["id_a"], r["id_b"], r["hamming"]) for r in
              simhash_candidate_pairs(df, "url", cfg=cfg,
                                      strategy="bucket").collect()}
    assert plain == salted == bucket and len(plain) >= 30 * 29 // 2


def test_simhash_hot_bucket_cap(spark):
    """Buckets above max_chunk_bucket drop out of pair generation —
    the O(bucket²) self-join cannot detonate on a degenerate chunk.
    30 identical docs, cap 10 ⇒ every chunk bucket capped ⇒ 0 pairs."""
    rows = [(f"u{i:02d}", "same words everywhere forever and ever amen")
            for i in range(30)]
    df = with_simhash(spark.createDataFrame(rows, ["url", "text"]))
    cfg = DedupConfig(max_chunk_bucket=10)
    assert simhash_candidate_pairs(df, "url", cfg=cfg).count() == 0
    # and with the cap above the bucket size, all pairs come back
    cfg2 = DedupConfig(max_chunk_bucket=100)
    assert simhash_candidate_pairs(df, "url", cfg=cfg2).count() == 30 * 29 // 2


def test_pair_strategies_identical(spark):
    """All three pair-generation paths — plain self-join, salted
    self-join (north_rule: salted band-key repartitioning), and the
    round-4 groupBy-bucket default — must produce exactly the same
    candidate set."""
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again extra words here"
    for i in range(40):
        rows.append((f"d{i:03d}", base if i % 4 == 0 else base + f" tail {i} {i*3}"))
    df = spark.createDataFrame(rows, "url string, text string")
    cfg = DedupConfig(band_salt_buckets=4, max_band_size=40)  # hot_threshold=10 → the identical-doc bands go through the salted tier
    sigs = with_minhash(df, "text", cfg, keep_shingles=False)
    plain = {(r["id_a"], r["id_b"]) for r in
             candidate_pairs(sigs, "url", "minhash", cfg, salted=False,
                             strategy="join").collect()}
    salted = {(r["id_a"], r["id_b"]) for r in
              candidate_pairs(sigs, "url", "minhash", cfg, salted=True,
                              strategy="join").collect()}
    bucket = {(r["id_a"], r["id_b"]) for r in
              candidate_pairs(sigs, "url", "minhash", cfg,
                              strategy="bucket").collect()}
    nobk = {(r["id_a"], r["id_b"]) for r in
            candidate_pairs(sigs, "url", "minhash", cfg,
                            strategy="bucket", persist_bands=False).collect()}
    assert plain == salted == bucket == nobk and len(plain) > 0


def test_bucket_pairs_respect_cap(spark):
    """The bucket strategy drops over-cap bands BEFORE collect_list
    (the memory guard): 30 identical docs with cap 10 ⇒ every band
    capped ⇒ 0 pairs; cap 100 ⇒ the full 30·29/2."""
    rows = [(f"u{i:02d}", "same words everywhere forever and ever amen again")
            for i in range(30)]
    df = spark.createDataFrame(rows, "url string, text string")
    sigs = with_minhash(df, "text", DedupConfig(), keep_shingles=False)
    low = DedupConfig(max_band_size=10)
    assert candidate_pairs(sigs, "url", "minhash", low, strategy="bucket").count() == 0
    high = DedupConfig(max_band_size=100)
    assert (candidate_pairs(sigs, "url", "minhash", high, strategy="bucket").count()
            == 30 * 29 // 2)


def test_simhash_cap_drop_counter_observable(spark):
    """The hot-bucket cap's recall loss is a recorded lineage counter
    (ADVICE r2: make drops observable, not assumed)."""
    from acxspark.config import DedupConfig
    from acxspark.metrics import Lineage
    from acxspark.operators.signatures import with_signatures
    from acxspark.operators.simhash import simhash_candidate_pairs

    cfg = DedupConfig(max_chunk_bucket=3)
    docs = spark.createDataFrame(
        [(str(i), "the same boilerplate sentence repeated verbatim") for i in range(8)]
        + [(str(100 + i), f"unique document number {i} about topic {i}") for i in range(3)],
        "doc_id string, text string",
    )
    sigs = with_signatures(docs, text_col="text", cfg=cfg, id_col="doc_id")
    lin = Lineage()
    simhash_candidate_pairs(sigs, "doc_id", "simhash", cfg, lineage=lin).collect()
    recs = {r["stage"]: r for r in lin.flush()}
    r = recs["simhash_band_rows"]
    # 8 identical docs share all 4 chunk buckets; cap=3 drops them all
    assert r["dropped_by_cap"] >= 8 * 4
    assert r["total"] > r["dropped_by_cap"]
