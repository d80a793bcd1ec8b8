"""Approximate-nearest-neighbor search over an embedding column.

Graft-brief training-data-pipeline tier (no reference counterpart —
the reference ends at string keys): brute-force cosine top-k as the
correctness baseline, plus a random-hyperplane LSH-bucketed variant as
the 100 TB scale path.

Scale design:
- queries are the SMALL side → ``F.broadcast`` — the corpus (10^12
  rows) streams once, no shuffle of embeddings;
- cosine is pure ``zip_with``/``aggregate`` (whole-stage codegen, no
  UDF, no Python);
- top-k per query via window over the (tiny) per-query candidate set;
  the heavy corpus side is reduced map-side before the rank shuffle by
  pre-aggregation is NOT possible for top-k, so the LSH variant exists
  to shrink candidates by ~bucket_count× first.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns — JVM-side."""
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sim_decimals: int = 4,
) -> DataFrame:
    """(query_id, rank, neighbor_id, sim) — exact top-k by cosine.

    Rank is over ROUNDED similarity with the neighbor id as the
    deterministic tie-break, so results are stable across engines,
    runs, and parallelism levels (float ULP noise cannot reorder).
    Queries are broadcast; the corpus is scanned once.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("_qv"), F.col("_cv")), sim_decimals))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    sim_decimals: int = 4,
) -> DataFrame:
    """All (id_a < id_b) pairs with rounded cosine >= threshold.

    Brute-force O(n²) — the small-scale oracle baseline. The scale
    path is :func:`lsh_near_dup_pairs` (bucketed candidates first).
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("_va"), F.col("_vb")), sim_decimals))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def near_dup_pairs_blocked(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    sim_decimals: int = 4,
    max_broadcast_rows: int = 1_000_000,
    on_overflow: str = "raise",
) -> DataFrame:
    """Same output as :func:`near_dup_pairs`, computed as one numpy
    matmul per Arrow batch against a broadcast of the normalized
    corpus matrix.

    The zip_with/aggregate cosine is ~100 ns/element interpreted; the
    matmul is BLAS. Each executor partition of B rows does one
    (B × dim) @ (dim × N) multiply — this is the right physical shape
    whenever the corpus matrix fits a broadcast.

    This path pulls the (id, vector) projection through the driver to
    build the broadcast matrix, so it is HARD-GUARDED: corpora above
    ``max_broadcast_rows`` (default 10^6 ≈ 512 MB at 64-dim float64)
    either raise (``on_overflow='raise'``) or fall back to the
    bucketed :func:`lsh_near_dup_pairs` scale path
    (``on_overflow='lsh'`` — probabilistic recall, no driver collect,
    no all-pairs scan). The guard is a count on the slim projection,
    enforced — not a docstring promise.
    """
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    slim = corpus.select(id_col, vec_col)
    # limit-bounded probe: reads at most cap+1 rows to enforce the
    # guard, instead of a full count scan before every call
    if slim.limit(max_broadcast_rows + 1).count() > max_broadcast_rows:
        if on_overflow == "lsh":
            return lsh_near_dup_pairs(
                corpus, id_col, vec_col, threshold=threshold,
                dim=None, sim_decimals=sim_decimals,
            )
        raise ValueError(
            f"near_dup_pairs_blocked: corpus exceeds "
            f"max_broadcast_rows={max_broadcast_rows}; the broadcast "
            "matrix would not fit. Use lsh_near_dup_pairs (or pass "
            "on_overflow='lsh')."
        )
    pdf = slim.toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    out_schema = T.StructType(
        [
            T.StructField("id_a", corpus.schema[id_col].dataType),
            T.StructField("id_b", corpus.schema[id_col].dataType),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def block(batches):
        all_ids, all_mat = bc.value
        order = {v: i for i, v in enumerate(all_ids)}
        for pdf_b in batches:
            if len(pdf_b) == 0:
                continue
            rows = np.array([order[v] for v in pdf_b[id_col]])
            sims = np.round(all_mat[rows] @ all_mat.T, sim_decimals)
            keep_r, keep_c = np.nonzero(sims >= threshold)
            ia, ib = all_ids[rows[keep_r]], all_ids[keep_c]
            mask = ia < ib
            yield pd.DataFrame(
                {"id_a": ia[mask], "id_b": ib[mask], "sim": sims[keep_r, keep_c][mask]}
            )

    return corpus.select(id_col).mapInPandas(block, schema=out_schema)


# ------------------------------------------------------- LSH scale path


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id (sign bits packed into a long).

    Charikar (2002) SimHash for unit vectors, expressed as pure column
    arithmetic: bit i = sign(<v, plane_i>). Constant plane arrays fold
    into the codegen'd plan — no UDF, no shuffle to compute.
    """
    v = _as_double(vec_col)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(v, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = 64,
    seed: int = 42,
    sim_decimals: int = 4,
) -> DataFrame:
    """Near-dup pairs via multi-table hyperplane LSH + exact re-check.

    Each of ``n_tables`` independent plane sets buckets the corpus;
    the candidate self-join runs per (table, bucket) equi-key — at
    10^12 rows this turns the O(n²) cross join into Σ bucket² work,
    with AQE skew-split on hot buckets. Recall is tested against
    :func:`near_dup_pairs` in pytest (not an oracle query — LSH is
    probabilistic by construction).
    """
    if dim is None:  # infer from one row (schema carries no length)
        row = corpus.select(vec_col).filter(F.col(vec_col).isNotNull()).head()
        if row is None:
            raise ValueError(
                "lsh_near_dup_pairs: cannot infer dim from an empty "
                "corpus (or all-NULL vector column); pass dim explicitly"
            )
        dim = len(row[0])
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        tables.append(
            corpus.select(
                F.lit(t).alias("tbl"),
                hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
                F.col(id_col),
                F.col(vec_col),
            )
        )
    keyed = tables[0]
    for t in tables[1:]:
        keyed = keyed.unionByName(t)
    a = keyed.select("tbl", "bucket", F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("_va"))
    b = keyed.select("tbl", "bucket", F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("_vb"))
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("sim", F.round(cosine(F.col("_va"), F.col("_vb")), sim_decimals))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
