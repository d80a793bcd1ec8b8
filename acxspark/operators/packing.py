"""Token-budget sequence packing — the last step of a pretraining data
pipeline: shuffle the cleaned/deduped corpus deterministically,
concatenate the token stream, and cut it into fixed-budget shards
(context windows / training files). Every doc gets a global token
offset and a shard id; the assignment is a pure function of
(doc ids, token counts, seed) — independent of layout, parallelism,
and engine, so a re-run or a different cluster packs the identical
stream. Extends the reference's deterministic exact-N sample ordering
(src/cli.cpp:423-445, seeded-hash rank) from "draw N" to "order ALL
and assign offsets".

Scale design — the naive formulation is a global window
``SUM(tokens) OVER (ORDER BY h)``, which Spark executes as a
SINGLE-partition window (no PARTITION BY → one reducer holds 10^12
rows). The implementation here is the classic two-level distributed
prefix sum instead, with the twist that the level-1 "partition" is
DATA-derived, not layout-derived:

1. order key ``h = md5(id || ':pack:' || seed)`` (the deterministic shuffle a
   training pipeline wants anyway);
2. bucket = the first ``bucket_chars`` hex chars of ``h`` — a PREFIX
   of the order key, so ordering by (bucket, h, id) equals ordering
   by (h, id) and the bucketing never has to sample range boundaries
   (repartitionByRange's sampled splits are layout-dependent; a hash
   prefix is not);
3. level 1: per-bucket exclusive cumsum (window PARTITION BY bucket —
   each reducer holds ~n/16^k rows);
4. level 2: per-bucket token totals (a 16^k-row aggregate) →
   exclusive prefix over buckets (a window over 16^k rows — tiny) →
   broadcast-joined back as each bucket's base offset.

Shuffle cost: one hash-partition on bucket for the window + one
map-side-combined agg over the same key; the broadcast side is 16^k
rows. At 10^12 docs use ``bucket_chars=4`` (65 536 buckets, ~15M
rows per window partition); the default 2 (256 buckets) fits test
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def packing_order(id_col: str, seed: int, bucket_chars: int = 2):
    """(order-hash, bucket) column pair: md5(id || ':pack:' || seed)
    and its first ``bucket_chars`` hex chars. The bucket is a prefix
    of the hash, so (bucket, hash) ordering == global hash ordering.
    Domain-separated from the sample/quota/split draws
    (sampling.seeded_order_hash) so packing order is independent of
    which docs a default-seed sample or holdout picks."""
    from acxspark.operators.sampling import seeded_order_hash

    h = seeded_order_hash(id_col, seed, "pack")
    return h, F.substring(h, 1, bucket_chars)


def with_global_offsets(
    df: DataFrame,
    token_col: str,
    id_col: str,
    seed: int = 42,
    bucket_chars: int = 2,
) -> DataFrame:
    """Attach ``start_offset`` — each row's exclusive prefix sum of
    ``token_col`` under the deterministic shuffle order md5(id, ':pack:', seed)
    — via the two-level prefix sum described in the module docstring.
    Equals ``SUM(tok) OVER (ORDER BY h, id ROWS UNBOUNDED PRECEDING
    AND 1 PRECEDING)`` without the single-reducer global window."""
    h, bucket = packing_order(id_col, seed, bucket_chars)
    t = df.withColumn("_h", h).withColumn("_bkt", bucket)

    # level 1: exclusive cumsum WITHIN each hash-prefix bucket
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "_local_off", F.coalesce(F.sum(token_col).over(w_in), F.lit(0)).cast("long")
    )

    # level 2: per-bucket totals → exclusive prefix over the (tiny,
    # 16^bucket_chars-row) bucket list → broadcast base offsets back
    # explicit constant partition key: the bucket list MUST reduce on
    # one task (it is the global prefix over <=16^k constant-size
    # rows); lit(0) says so in the plan instead of tripping Spark's
    # partition-less-window warning
    w_bkt = (
        Window.partitionBy(F.lit(0))
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        t.groupBy("_bkt")
        .agg(F.sum(token_col).cast("long").alias("_bkt_total"))
        .withColumn(
            "_base", F.coalesce(F.sum("_bkt_total").over(w_bkt), F.lit(0)).cast("long")
        )
        .select("_bkt", "_base")
    )
    return (
        t.join(F.broadcast(bases), "_bkt")
        .withColumn("start_offset", (F.col("_base") + F.col("_local_off")).cast("long"))
        .drop("_h", "_bkt", "_local_off", "_base")
    )


def pack_token_budget(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    seed: int = 42,
    bucket_chars: int = 2,
) -> DataFrame:
    """GPT-style stream packing: concatenate the corpus token stream
    in deterministic-shuffle order and cut it every ``budget`` tokens.
    Returns the input columns + ``start_offset`` (global token
    position where this doc begins) + ``shard_id``
    (= start_offset div budget — the training shard/context-file the
    doc STARTS in; docs may straddle a boundary, exactly as a packed
    pretraining stream does)."""
    out = with_global_offsets(df, token_col, id_col, seed, bucket_chars)
    # integer `div`, never float `/`+floor: Spark's `/` is DOUBLE
    # division, and past ~2^52 total tokens (well inside the 10^12-doc
    # envelope) a doc one token before a shard boundary can round UP
    # into the wrong shard
    return out.withColumn(
        "shard_id", F.expr(f"start_offset div {int(budget)}").cast("long")
    )


def write_packed_shards(
    df: DataFrame,
    path: str,
    token_col: str,
    id_col: str,
    budget: int,
    seed: int = 42,
    bucket_chars: int = 2,
    shards_per_file: int = 1024,
) -> None:
    """Materialize the packed layout: parquet PARTITIONED BY
    ``shard_file`` (= shard_id div shards_per_file, so the directory
    count stays bounded — 10^12 docs at 2048-token shards is ~10^9
    shards, far too many directories at 1 shard/file), each file
    sorted by ``start_offset``. A trainer reads one partition
    directory, already in stream order; partition pruning makes
    "give me shards [a, b)" a storage-level file skip, the same
    device as write_ivf_partitioned (operators/ann.py)."""
    packed = pack_token_budget(df, token_col, id_col, budget, seed, bucket_chars)
    (
        packed.withColumn(
            "shard_file",
            F.expr(f"shard_id div {int(shards_per_file)}").cast("long"),
        )
        .repartition("shard_file")
        # shard_file must LEAD the sort: the dynamic-partition write
        # requires ordering by the partition column, and sorting by
        # start_offset alone makes Spark insert its own shard_file-only
        # sort whose stability (and thus the per-file stream order) is
        # not guaranteed once it spills
        .sortWithinPartitions("shard_file", "start_offset")
        .write.mode("overwrite")
        .partitionBy("shard_file")
        .parquet(path)
    )


def train_val_split(
    df: DataFrame,
    id_col: str,
    val_pct: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Deterministic holdout split: ``split = 'val'`` iff the first 8
    hex chars of md5(id || ':split:' || seed) land in the lowest ``val_pct``% of
    the 32-bit space. A pure map-side column expression — no shuffle,
    no sampling state, reproducible on any engine (the md5 keying is
    the same device as the reservoir sample / packing order), and a
    doc's split never changes as the corpus grows — the property a
    training pipeline needs so validation documents stay quarantined
    across recrawls."""
    from acxspark.operators.sampling import seeded_order_hash

    # ':split:' domain: the holdout must be INDEPENDENT of the other
    # seeded draws — with a shared key, a default-seed sample's docs
    # all landed in 'val' (lowest hashes are both "sampled first" and
    # "below the val cut")
    h32 = F.conv(
        F.substring(seeded_order_hash(id_col, seed, "split"), 1, 8),
        16,
        10,
    ).cast("long")
    cut = int((val_pct / 100.0) * 0x100000000)
    return df.withColumn(
        "split", F.when(h32 < cut, F.lit("val")).otherwise(F.lit("train"))
    )
