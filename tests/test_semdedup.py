"""SemDeDup semantic dedup: exact path contract, IVF-cell scale path
parity, pair precision, determinism across parallelism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from acxspark.operators.ann import near_dup_pairs_blocked
from acxspark.operators.semdedup import semantic_dedup, within_cell_pairs


@pytest.fixture(scope="module")
def clustered(spark):
    """30 planted semantic groups (sizes 2-4, cosine >= ~0.97 within a
    group) + 100 random background vectors — tight enough that every
    group shares one IVF cell at k=8."""
    rng = np.random.default_rng(11)
    rows, groups, vid = [], [], 0
    for g in range(30):
        base = rng.standard_normal(32)
        base /= np.linalg.norm(base)
        size = 2 + g % 3
        members = []
        for _ in range(size):
            v = base + 0.05 * rng.standard_normal(32) / np.sqrt(32)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            members.append(vid)
            vid += 1
        groups.append(members)
    for _ in range(100):
        v = rng.standard_normal(32)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), groups


def test_exact_path_keeps_min_id_per_group(clustered):
    df, groups = clustered
    out = semantic_dedup(df, threshold=0.9).collect()
    cluster = {r["vec_id"]: r["sem_cluster_id"] for r in out}
    surv = {r["vec_id"] for r in out if r["is_survivor"] == 1}
    for members in groups:
        labels = {cluster[m] for m in members}
        assert len(labels) == 1, f"group {members} split into {labels}"
        assert labels == {min(members)}
        assert surv & set(members) == {min(members)}


def test_singletons_survive_as_own_cluster(clustered):
    df, groups = clustered
    planted = {m for g in groups for m in g}
    out = semantic_dedup(df, threshold=0.9).collect()
    assert len(out) == df.count()  # every id gets a row
    for r in out:
        if r["vec_id"] not in planted:
            assert r["sem_cluster_id"] == r["vec_id"]
            assert r["is_survivor"] == 1


def test_ivf_scale_path_matches_exact_survivors(clustered):
    df, _ = clustered
    exact = {
        (r["vec_id"], r["sem_cluster_id"], r["is_survivor"])
        for r in semantic_dedup(df, threshold=0.9).collect()
    }
    ivf = {
        (r["vec_id"], r["sem_cluster_id"], r["is_survivor"])
        for r in semantic_dedup(df, threshold=0.9, n_centroids=8).collect()
    }
    assert ivf == exact


def test_within_cell_pairs_are_subset_of_exact(clustered):
    """Precision 1.0 by construction: cell restriction only removes
    candidates, and every emitted sim is the true rounded cosine."""
    from acxspark.operators.ann import ivf_assign, ivf_train_centroids

    df, _ = clustered
    cents = ivf_train_centroids(df, n_centroids=8, n_iter=2, seed=42)
    assigned = ivf_assign(df, cents)
    cell = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in within_cell_pairs(assigned, threshold=0.9).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in near_dup_pairs_blocked(df, threshold=0.9).collect()
    }
    assert cell <= exact
    assert len(cell) > 0


def test_block_rows_chunking_is_result_invariant(clustered):
    """The per-cell matmul row-blocking (memory bound) must not change
    the emitted pairs."""
    from acxspark.operators.ann import ivf_assign, ivf_train_centroids

    df, _ = clustered
    cents = ivf_train_centroids(df, n_centroids=8, n_iter=2, seed=42)
    assigned = ivf_assign(df, cents).cache()
    a = {
        tuple(r)
        for r in within_cell_pairs(assigned, threshold=0.9, block_rows=3).collect()
    }
    b = {
        tuple(r)
        for r in within_cell_pairs(assigned, threshold=0.9, block_rows=4096).collect()
    }
    assigned.unpersist()
    assert a == b


def test_deterministic_across_parallelism(clustered):
    df, _ = clustered
    one = {
        tuple(r)
        for r in semantic_dedup(
            df.repartition(1), threshold=0.9, n_centroids=8
        ).collect()
    }
    many = {
        tuple(r)
        for r in semantic_dedup(
            df.repartition(16), threshold=0.9, n_centroids=8
        ).collect()
    }
    assert one == many


def test_exact_dup_collapse_preserves_semantics(spark, clustered):
    """A 100-copy identical-embedding flood: collapse on/off yield the
    SAME clusters (identical vectors are sim-1.0 pairs either way),
    and the flood lands in one cluster under its min id."""
    df, _ = clustered
    flood_vec = [float(x) for x in range(1, 33)]
    flood = spark.createDataFrame(
        [(10_000 + i, flood_vec) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    corpus = df.union(flood)
    on = {
        tuple(r)
        for r in semantic_dedup(corpus, threshold=0.9, collapse_exact=True).collect()
    }
    off = {
        tuple(r)
        for r in semantic_dedup(corpus, threshold=0.9, collapse_exact=False).collect()
    }
    assert on == off
    flood_rows = {r for r in on if r[0] >= 10_000}
    assert all(c == 10_000 for _, c, _ in flood_rows)
    assert {(i, s) for i, _, s in flood_rows} == (
        {(10_000, 1)} | {(10_000 + i, 0) for i in range(1, 100)}
    )


def test_collapse_shrinks_the_quadratic_stage(spark, clustered):
    """With the flood collapsed, the matmul stage sees each distinct
    vector once: the rep-space pair set carries NO flood-internal
    pairs (they enter CC as duplicate->rep edges instead)."""
    df, _ = clustered
    flood_vec = [float(x) for x in range(1, 33)]
    flood = spark.createDataFrame(
        [(10_000 + i, flood_vec) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    corpus = df.union(flood)
    from pyspark.sql import functions as F

    reps = corpus.groupBy("embedding").agg(F.min("vec_id").alias("r"))
    assert reps.count() == df.count() + 1  # flood is ONE distinct vector


def test_ivf_path_with_exact_dups_matches_exact_path(spark, clustered):
    df, _ = clustered
    flood_vec = [float(x) for x in range(1, 33)]
    flood = spark.createDataFrame(
        [(10_000 + i, flood_vec) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    corpus = df.union(flood)
    exact = {
        tuple(r) for r in semantic_dedup(corpus, threshold=0.9).collect()
    }
    ivf = {
        tuple(r)
        for r in semantic_dedup(corpus, threshold=0.9, n_centroids=8).collect()
    }
    assert ivf == exact


def test_max_cell_rows_caps_and_is_subset(spark, clustered):
    """Subdivided hot cells: capped pairs are a subset of uncapped,
    within-subcell pairs survive, small cells are untouched (salt 0)."""
    from acxspark.operators.ann import ivf_assign, ivf_train_centroids

    df, _ = clustered
    cents = ivf_train_centroids(df, n_centroids=4, n_iter=2, seed=42)
    assigned = ivf_assign(df, cents).cache()
    full = {
        tuple(r)
        for r in within_cell_pairs(assigned, threshold=0.9).collect()
    }
    capped = {
        tuple(r)
        for r in within_cell_pairs(
            assigned, threshold=0.9, max_cell_rows=25
        ).collect()
    }
    assigned.unpersist()
    assert capped <= full
    assert len(capped) > 0  # planted pairs small enough to co-salt often
    # a cap far above every cell size is a no-op
    uncapped_hi = {
        tuple(r)
        for r in within_cell_pairs(
            assigned, threshold=0.9, max_cell_rows=10_000
        ).collect()
    }
    assert uncapped_hi == full


def test_collapse_exact_keeps_zero_vector_floods(spark):
    """Degenerate (zero-norm) embeddings have undefined cosine and the
    pair paths emit no edges among them — the exact-collapse shortcut
    must not dedupe them either ('identical ⇒ cosine 1' only holds
    for nonzero vectors). collapse on/off must agree."""
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0]),
            (4, [1.0, 0.0]), (5, [1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    want = None
    for collapse in (True, False):
        got = sorted(
            (r["vec_id"], r["is_survivor"])
            for r in semantic_dedup(df, threshold=0.9,
                                    collapse_exact=collapse).collect()
        )
        if want is None:
            want = got
        assert got == want
    # the zero-vector flood all survives; the identical REAL pair dedupes
    assert dict(want) == {1: 1, 2: 1, 3: 1, 4: 1, 5: 0}
