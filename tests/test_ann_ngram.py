"""Tests for similarity search (ANN) and exact n-gram Jaccard dedup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from acxspark.operators import ann, ngram


@pytest.fixture(scope="module")
def vectors(spark):
    """64-dim corpus with planted near-dup pairs at cosine >= 0.95."""
    rng = np.random.default_rng(7)
    rows = []
    truth = []
    vid = 0
    for _ in range(40):  # 40 base vectors, each with one near-dup twin
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        w = v + 0.15 * rng.standard_normal(64) / np.sqrt(64)
        w /= np.linalg.norm(w)
        rows.append((vid, [float(x) for x in v]))
        rows.append((vid + 1, [float(x) for x in w]))
        truth.append((vid, vid + 1))
        vid += 2
    for _ in range(120):  # random background
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), truth


def test_brute_force_topk_finds_twin(vectors):
    df, truth = vectors
    queries = df.filter(F.col("vec_id") < 10)
    top = ann.brute_force_topk(df, queries, k=1).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    for a, b in truth[:5]:
        assert got[a] == b and got[b] == a


def test_near_dup_pairs_threshold(vectors):
    df, truth = vectors
    pairs = {(r["id_a"], r["id_b"]) for r in ann.near_dup_pairs(df, threshold=0.9).collect()}
    planted = set(truth)
    assert planted <= pairs, f"missing {planted - pairs}"
    # background pairs must not flood in at a 0.9 threshold
    assert len(pairs) <= len(planted) + 3


def test_lsh_near_dup_recall_vs_brute_force(vectors):
    """The LSH scale path must keep >=0.95 recall of the brute-force
    truth for high-cosine (>=0.9) near-dups."""
    df, _ = vectors
    exact = {(r["id_a"], r["id_b"]) for r in ann.near_dup_pairs(df, threshold=0.9).collect()}
    got = {
        (r["id_a"], r["id_b"])
        for r in ann.lsh_near_dup_pairs(
            df, threshold=0.9, n_planes=8, n_tables=8, dim=64, seed=1
        ).collect()
    }
    assert got <= exact  # exact re-check ⇒ no false positives
    recall = len(got & exact) / max(len(exact), 1)
    assert recall >= 0.95, f"LSH recall {recall}"


def test_blocked_path_guard_raises_and_falls_back(vectors):
    """The blocked-matmul path collects the corpus to the driver to
    build its broadcast matrix, so its row guard must be ENFORCED:
    above max_broadcast_rows it raises, or routes to the LSH path
    when on_overflow='lsh' (no driver collect, subset of exact)."""
    df, _ = vectors
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        ann.near_dup_pairs_blocked(df, threshold=0.9, max_broadcast_rows=10)
    exact = {(r["id_a"], r["id_b"])
             for r in ann.near_dup_pairs(df, threshold=0.9).collect()}
    fb = {(r["id_a"], r["id_b"])
          for r in ann.near_dup_pairs_blocked(
              df, threshold=0.9, max_broadcast_rows=10, on_overflow="lsh"
          ).collect()}
    assert fb <= exact and len(fb) > 0


def test_blocked_path_matches_brute_force(vectors):
    """Under the guard, the blocked matmul is bit-equal to the
    zip_with/aggregate brute force (same rounding)."""
    df, _ = vectors
    exact = {(r["id_a"], r["id_b"], r["sim"])
             for r in ann.near_dup_pairs(df, threshold=0.9).collect()}
    blocked = {(r["id_a"], r["id_b"], r["sim"])
               for r in ann.near_dup_pairs_blocked(df, threshold=0.9).collect()}
    assert blocked == exact


def test_ngram_jaccard_pairs_and_survivors(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "THE QUICK  brown fox jumps over the lazy dog tonight"),  # ws/case var
            (3, "a completely different document about spark shuffles"),
            (4, "the quick brown fox jumps over the lazy cat tonight"),  # 1 token edit
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs and pairs[(1, 4)] < 1.0
    assert all(3 not in p for p in pairs)
    survivors = sorted(
        r["doc_id"]
        for r in ngram.ngram_dedup_survivors(docs, "doc_id", threshold=0.5).collect()
    )
    assert survivors == [1, 3]  # 2 and 4 fold into 1's cluster (first-wins min id)


def test_ngram_max_doc_freq_cap(spark):
    """Grams above the doc-frequency cap are excluded from pairing —
    the idf cut that kills boilerplate skew at scale."""
    boiler = "copyright two thousand twenty six example corp"
    docs = spark.createDataFrame(
        [(i, f"unique{i} token{i} stuff{i} " + boiler) for i in range(10)],
        "doc_id long, text string",
    )
    uncapped = ngram.ngram_jaccard_pairs(docs, "doc_id", threshold=0.3).count()
    capped = ngram.ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.3, max_doc_freq=5
    ).count()
    assert uncapped > 0 and capped == 0
