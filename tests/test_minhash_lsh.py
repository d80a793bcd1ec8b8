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


# ---- OPH mode (minhash_mode='oph') kernel pinning -------------------


def _oph_reference(rows, p, seed):
    """Per-row pure-python twin of signatures._minhash_oph_flat:
    multiply-shift binning, scatter-min, nearest-LEFT circular
    rotation densification with the distance-keyed mix."""
    from acxspark.operators import signatures as S

    M = (1 << 64) - 1
    A, C, K = int(S._OPH_A), int(S._OPH_C), int(S._DENSE_K)
    out = []
    for hs in rows:
        slots = [None] * p
        for s in hs:
            h = ((int(s) + seed) * A + C) & M
            h ^= h >> 31
            b = ((h >> 32) * p) >> 32
            if slots[b] is None or h < slots[b]:
                slots[b] = h
        if all(v is None for v in slots):
            out.append([np.int64(np.uint64((1 << 63) - 1))] * p)
            continue
        dense = []
        for j in range(p):
            if slots[j] is not None:
                dense.append(slots[j])
                continue
            d = 1
            while slots[(j - d) % p] is None:
                d += 1
            dense.append((slots[(j - d) % p] + d * K) & M)
        out.append([np.int64(np.uint64(v)) for v in dense])
    return np.array(out, dtype=np.int64)


def test_oph_kernel_matches_per_row_reference():
    from acxspark.operators.signatures import _minhash_oph_flat

    rng = np.random.default_rng(7)
    for p in (16, 100, 128):     # incl. a NON-power-of-two bin count
        rows = [
            rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)
            for n in (0, 1, 3, 7, 40, 500)  # sparse docs exercise
        ]                                    # the densification path
        flat = np.concatenate([r for r in rows if len(r)]) \
            if any(len(r) for r in rows) else np.array([], dtype=np.uint64)
        n_sh = np.array([len(r) for r in rows], dtype=np.int64)
        got = _minhash_oph_flat(flat, n_sh, p, seed=42)
        want = _oph_reference(rows, p, seed=42)
        assert np.array_equal(got, want)


def test_oph_bins_cover_all_slots_for_non_power_of_two():
    """Multiply-shift binning must reach EVERY slot (the former
    top-bits shift starved slots >= 2^floor(log2 p) forever)."""
    from acxspark.operators.signatures import _minhash_oph_flat

    rng = np.random.default_rng(3)
    hs = rng.integers(0, 1 << 63, size=20_000, dtype=np.int64).astype(np.uint64)
    p = 100
    sig = _minhash_oph_flat(hs, np.array([len(hs)]), p, seed=1)[0]
    # a dense doc fills every bin directly: no two adjacent slots may
    # both be densified borrows; cheap proxy — all values distinct and
    # none equals the empty sentinel
    assert len(set(sig.tolist())) == p


def test_oph_slot_agreement_tracks_jaccard():
    """Per-slot collision probability ≈ Jaccard (the estimator
    property the broken bin-index densification violated)."""
    from acxspark.operators.signatures import _minhash_oph_flat

    rng = np.random.default_rng(11)
    shared = rng.integers(0, 1 << 63, size=60, dtype=np.int64).astype(np.uint64)
    only_a = rng.integers(0, 1 << 63, size=30, dtype=np.int64).astype(np.uint64)
    only_b = rng.integers(0, 1 << 63, size=30, dtype=np.int64).astype(np.uint64)
    a = np.concatenate([shared, only_a])     # J = 60 / 120 = 0.5
    b = np.concatenate([shared, only_b])
    agree = total = 0
    for seed in range(40):                   # independent sketches
        flat = np.concatenate([a, b])
        n_sh = np.array([len(a), len(b)])
        sig = _minhash_oph_flat(flat, n_sh, 128, seed=seed)
        agree += int((sig[0] == sig[1]).sum())
        total += 128
    assert abs(agree / total - 0.5) < 0.05


def test_unknown_minhash_mode_raises():
    import pytest as _pytest

    from acxspark.operators.signatures import compute_signatures, signature_col

    with _pytest.raises(ValueError, match="minhash_mode"):
        compute_signatures(pd.Series([[1, 2, 3]]), 3, 8, 1,
                           minhash_mode="kprem")
    with _pytest.raises(ValueError, match="minhash_mode"):
        signature_col(F.lit("x"), DedupConfig(minhash_mode="oph "))
