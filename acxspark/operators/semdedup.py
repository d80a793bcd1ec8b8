"""SemDeDup-style semantic deduplication over an embedding column.

Graft curation tier (SURVEY §2.5): remove documents whose EMBEDDINGS
are near-identical even when their token n-grams differ — templated
rewrites, paraphrases, translations — the duplicate class the
MinHash/SimHash/n-gram tiers are blind to by construction. Public
recipe: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — k-means the
embeddings, compute pairwise cosine WITHIN each cell, keep one
representative per near-duplicate group. The reference's dedup loop
is identity-key based (/root/reference/src/storage.cpp:562-570 OR-key
transitive closure); this tier generalizes its "transitive dup ⇒ one
survivor, deterministic keeper" contract to the embedding space.

Two candidate paths, one clustering contract:

- **exact** (default, the oracle path): all-pairs cosine via
  :func:`acxspark.operators.ann.near_dup_pairs_blocked` — one BLAS
  matmul per Arrow batch against the broadcast normalized corpus,
  HARD-GUARDED above ``max_broadcast_rows``.
- **IVF cells** (``n_centroids=k``, the 10^12-row scale path, and
  SemDeDup's own semantics): deterministic Lloyd centroids
  (:func:`ann.ivf_train_centroids`, content-keyed init — identical at
  every parallelism level), map-only cell assignment (vectors never
  shuffle), then pairwise cosine per cell via ``applyInPandas``. The
  shuffle moves each vector ONCE (to its cell); compute is Σ c_i² so
  ``n_centroids`` is the knob that prices it (k = n/1000 targets
  ~10^6 sims/cell); the per-cell matmul is row-blocked so peak memory
  is ``block_rows × |cell|`` sims regardless of cell size.

Both paths feed the same large-star/small-star connected components
(:func:`acxspark.operators.cc.cluster_assignments` — one scalar
checksum per round crosses the driver) and the same deterministic
keeper rule: min id per component survives. Cell-restricted recall
vs the exact path is pytest-gated (tests/test_semdedup.py); pair
precision: every emitted pair re-checks cosine, thresholded on the
``sim_decimals``-ROUNDED value (both engines round identically, so
oracle parity is exact; true cosine may sit up to half an ulp of the
rounding — 5e-5 at the default 4 decimals — below τ).
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from acxspark.operators.ann import (
    ivf_assign,
    ivf_train_centroids,
    near_dup_pairs_blocked,
)
from acxspark.operators.cc import cluster_assignments

__all__ = ["semantic_dedup", "within_cell_pairs"]


def within_cell_pairs(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cluster",
    threshold: float = 0.5,
    sim_decimals: int = 4,
    block_rows: int = 1024,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """Pairwise cosine ≥ threshold restricted to rows sharing a cell.

    One ``applyInPandas`` group per cell: normalize the cell matrix
    once, then matmul row-blocks of it against the whole cell —
    memory peaks at ``block_rows × |cell|`` float64 sims, so a hot
    cell degrades to more blocks, never to an OOM. Output matches
    :func:`ann.near_dup_pairs_blocked` (id_a < id_b, sim rounded to
    ``sim_decimals``) minus cross-cell pairs — SemDeDup semantics.

    ``max_cell_rows`` is the LAST-RESORT skew cap for a flood of
    NEAR-identical-but-distinct vectors landing in one cell (exact
    duplicates never get here — :func:`semantic_dedup` collapses them
    first): oversized cells are subdivided by a deterministic id-hash
    salt into ceil(n/max) subcells, bounding any group's compute at
    ~max² sims. Pairs ACROSS subcells are lost — an explicit
    recall-for-survival tradeoff, same posture as the MinHash/SimHash
    hot-band caps; off by default (full SemDeDup semantics).
    """
    import pandas as pd
    from pyspark.sql import types as T

    if max_cell_rows:
        sizes = assigned.groupBy(cell_col).agg(F.count("*").alias("_n"))
        assigned = (
            assigned.join(F.broadcast(sizes), cell_col)  # k rows — tiny
            .withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(F.col(id_col)),
                    F.ceil(F.col("_n") / F.lit(max_cell_rows)).cast("long"),
                ).cast("int"),
            )
            .drop("_n")
        )
        # numeric combined key (no per-row string building — GC-hot
        # at local[32]); xxhash64 over two ints cannot collide into a
        # WRONG grouping semantically: a collision only merges two
        # subcells, which can only ADD pairs the cap would have split
        return within_cell_pairs(
            assigned.withColumn(
                "_cellsalt", F.xxhash64(F.col(cell_col), F.col("_salt"))
            ),
            id_col, vec_col, "_cellsalt",
            threshold=threshold, sim_decimals=sim_decimals,
            block_rows=block_rows, max_cell_rows=None,
        )

    out_schema = T.StructType(
        [
            T.StructField("id_a", assigned.schema[id_col].dataType),
            T.StructField("id_b", assigned.schema[id_col].dataType),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"sim": "float64"}
            )
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        outs = []
        for lo in range(0, n, block_rows):
            hi = min(lo + block_rows, n)
            sims = np.round(mat[lo:hi] @ mat.T, sim_decimals)
            keep_r, keep_c = np.nonzero(sims >= threshold)
            ia, ib = ids[keep_r + lo], ids[keep_c]
            mask = ia < ib
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ia[mask],
                        "id_b": ib[mask],
                        "sim": sims[keep_r, keep_c][mask],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return (
        assigned.select(cell_col, id_col, vec_col)
        .groupBy(cell_col)
        .applyInPandas(cell, schema=out_schema)
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    n_centroids: int | None = None,
    n_iter: int = 2,
    seed: int = 42,
    sim_decimals: int = 4,
    collapse_exact: bool = True,
    max_cell_rows: int | None = None,
    **cc_kw,
) -> DataFrame:
    """→ (id_col, sem_cluster_id, is_survivor:int).

    ``n_centroids=None`` runs the exact all-pairs path (true DuckDB
    oracle twin exists — registry query ``semantic_dedup_docs``);
    ``n_centroids=k`` runs the IVF-cell scale path (recall vs exact
    pytest-gated, precision exact). ``sem_cluster_id`` is the min id
    of the component under transitive cosine-≥-τ closure; singletons
    are their own cluster. ``is_survivor`` = 1 on the keeper (the
    min id), matching the reference's first-wins canonical contract
    (src/cli.cpp:303).

    ``collapse_exact`` (default on) is the SKEW DEFENSE for the
    quadratic stage: real crawls carry floods of byte-identical
    embeddings (zero vectors from failed encoders, template pages) —
    a 10⁶-copy flood in one IVF cell would cost 10¹² sims. Identical
    vectors are collapsed to their min-id representative first (one
    groupBy on the vector — the only time the vector is a shuffle
    key, and it shuffles each vector once, same budget as the cell
    assign), the duplicate→rep edges feed CC directly (cosine of
    identical vectors is 1 ≥ any τ), and the matmul stages see each
    distinct vector ONCE. Semantics are unchanged — only the
    redundant pair work is removed. The remaining pathological case,
    a flood of NEAR-identical-but-distinct vectors, is inherent to
    SemDeDup's Σc² compute (``n_centroids`` prices it; ``block_rows``
    bounds its memory).
    """
    if collapse_exact:
        # key = a 128-bit hash pair of the vector, NOT the raw array:
        # the dedup groupBy and the dup→rep join then shuffle 16-byte
        # keys + ids instead of full vectors (collision odds n²/2^128
        # — nil at any scale). min(struct(id, vec)) partial-aggregates
        # map-side, so a 10⁶-copy flood forwards ONE candidate row per
        # partition, and each distinct vector rides the shuffle once.
        #
        # degenerate (≈zero-norm) vectors are routed AROUND the
        # collapse: cosine is undefined for them, the pair paths emit
        # no edges among them, and "identical ⇒ cosine 1 ≥ τ" — the
        # justification for the dup→rep edges — does not hold, so
        # collapsing them would DELETE failed-encoder docs the
        # pair-path semantics keep. They still ride `work` (where the
        # kernels ignore them), preserving collapse on/off equality.
        nrm2 = F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
        degenerate = corpus.filter(nrm2 < F.lit(1e-24)).select(
            F.col(id_col), F.col(vec_col)
        )
        corpus_ok = corpus.filter(nrm2 >= F.lit(1e-24))
        k1 = F.xxhash64(F.col(vec_col))
        k2 = F.xxhash64(F.col(vec_col), F.lit(1))
        keyed = corpus_ok.select(
            F.col(id_col), F.col(vec_col),
            k1.alias("_k1"), k2.alias("_k2"),
        )
        reps = keyed.groupBy("_k1", "_k2").agg(
            F.min(F.struct(F.col(id_col), F.col(vec_col))).alias("_r")
        )
        exact_edges = (
            keyed.select(id_col, "_k1", "_k2")
            .join(
                reps.select(
                    "_k1", "_k2", F.col(f"_r.{id_col}").alias("_rep")
                ),
                ["_k1", "_k2"],
            )
            .filter(F.col(id_col) != F.col("_rep"))
            .select(F.col(id_col).alias("id_a"), F.col("_rep").alias("id_b"))
        )
        work = reps.select(
            F.col(f"_r.{id_col}").alias(id_col),
            F.col(f"_r.{vec_col}").alias(vec_col),
        ).unionByName(degenerate)
    else:
        exact_edges = None
        work = corpus.select(id_col, vec_col)

    if n_centroids:
        cents = ivf_train_centroids(
            work, id_col, vec_col,
            n_centroids=n_centroids, n_iter=n_iter, seed=seed,
        )
        assigned = ivf_assign(work, cents, id_col, vec_col)
        pairs = within_cell_pairs(
            assigned, id_col, vec_col, "ivf_cluster",
            threshold=threshold, sim_decimals=sim_decimals,
            max_cell_rows=max_cell_rows,
        )
    else:
        pairs = near_dup_pairs_blocked(
            work, id_col, vec_col,
            threshold=threshold, sim_decimals=sim_decimals,
        )
    edges = pairs.select("id_a", "id_b")
    if exact_edges is not None:
        edges = edges.union(exact_edges)
    assign = cluster_assignments(corpus.select(id_col), id_col, edges, **cc_kw)
    return assign.select(
        F.col(id_col),
        F.col("cluster_id").alias("sem_cluster_id"),
        (F.col(id_col) == F.col("cluster_id")).cast("int").alias("is_survivor"),
    )
