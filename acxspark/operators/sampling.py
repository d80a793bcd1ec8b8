"""Stratified exact-N sampling — the training-data curation step that
follows cleaning/dedup: draw exactly N documents per stratum (per
language, per source, per quality bucket) deterministically, so a
data mix is reproducible run-to-run and auditable. Extends the
reference's exact-N reservoir sample (src/cli.cpp:423-445, uniform
only) to per-group draws with a pinned seed.

Scale design: a naive ``row_number() OVER (PARTITION BY stratum)``
puts an entire hot stratum (``lang='en'`` is half the web) on ONE
reducer. The draw here is a two-level tournament: level 1 ranks
within (stratum, salt-bucket) — bounding any reducer's partition to
~|stratum|/S rows — and keeps n per bucket; level 2 ranks the
surviving S*n rows per stratum (tiny) and keeps the final n. The
seeded-hash order makes both levels deterministic AND equivalent to
the single-window draw: the global top-n of a stratum is always in
the level-1 survivors, because each level-1 bucket forwards its own
top-n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def seeded_order_hash(id_col: str, seed: int, domain: str) -> Column:
    """``md5(id || ':<domain>:<seed>')`` — THE deterministic draw key
    for every seeded ordering in the curation tier (sampling, quota,
    packing order, train/val split; their DuckDB oracle twins build
    the same literal).

    ``domain`` separates the operators' hash streams: without it,
    identical (id, seed) keys made every draw perfectly CORRELATED —
    e.g. the lowest-hash docs were simultaneously "sampled first",
    "packed first", and "val", so a default-seed sample landed
    entirely inside the val split instead of ~val_pct% of it.
    """
    return F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{domain}:{seed}"))
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    seed: int = 42,
    salt_buckets: int = 64,
) -> DataFrame:
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum,
    chosen by seeded md5 rank (engine-portable; ties broken by id).
    Output columns = input columns."""
    h = seeded_order_hash(id_col, seed, "sample").alias("_h")
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets))
    w1 = Window.partitionBy(strata_col, "_salt").orderBy("_h", id_col)
    w2 = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= n_per_stratum)
        .withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= n_per_stratum)
        .drop("_h", "_salt", "_rn1", "_rn2")
    )


def quota_sample_exact(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quota_df: DataFrame,
    seed: int = 42,
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-stratum exact-quota draw — :func:`stratified_sample_exact`
    generalized from one constant n to a per-stratum quota table
    ``(strata_col, quota)`` (small — one row per source/host/lang —
    so it BROADCASTS into both tournament levels). Same two-level
    skew defense, same determinism, same equivalence argument: each
    level-1 bucket forwards its own top-``quota`` rows, which always
    contains the stratum's global top-``quota``."""
    # duplicate-stratum guard: the inner join below would multiply a
    # duplicated stratum's rows BEFORE ranking (the draw could then
    # return the same id twice) — a quota table is one row per
    # source/host/lang by contract, so a dup is a caller bug worth a
    # loud error; the table is broadcast-small, the check costs one
    # tiny agg. (Strata present in df but absent from quota_df draw
    # nothing — quota 0 — by the same join.)
    dup = (
        quota_df.groupBy(strata_col).count()
        .filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            f"quota_df has duplicate {strata_col!r} rows — "
            "one quota per stratum required"
        )
    q = F.broadcast(quota_df.select(strata_col, "quota"))
    h = seeded_order_hash(id_col, seed, "quota").alias("_h")
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets))
    w1 = Window.partitionBy(strata_col, "_salt").orderBy("_h", id_col)
    w2 = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        df.join(q, strata_col)
        .withColumn("_h", h)
        .withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("quota"))
        .withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= F.col("quota"))
        .drop("_h", "_salt", "_rn1", "_rn2", "quota")
    )


def sqrt_cap_quotas(df: DataFrame, strata_col: str) -> DataFrame:
    """Sub-linear mixing quotas: stratum contributes
    ``max(1, floor(sqrt(count)))`` docs — the head-flattening
    temperature move of pretraining data mixes (a 10^8-page domain
    yields 10^4 docs, a 100-page domain 10). Integer-exact on both
    engines (IEEE sqrt of an exact integer is correctly rounded, so
    the floor cannot straddle an ULP): oracle-safe where a normalized
    float-sum weighting would not be (cross-strata float sums are
    order-dependent)."""
    return (
        df.groupBy(strata_col)
        .agg(F.count("*").alias("_n"))
        .select(
            strata_col,
            F.greatest(F.lit(1), F.floor(F.sqrt(F.col("_n")))).cast("int").alias("quota"),
        )
    )
