"""Sharded Bloom membership artifact (operators/bloom.py).

Pins the three properties the incremental-dedup use depends on:
zero false negatives (exactness of genuinely_new_rows), an fpp in the
theoretical ballpark (the artifact actually prunes), and bitmap
determinism across partitionings (the artifact is a committable
snapshot, not a run-dependent byproduct)."""

import pytest
from pyspark.sql import functions as F

from acxspark.operators.bloom import (
    build_bloom,
    genuinely_new_rows,
    might_contain,
    shards_for,
)

N_OLD = 3_000
N_NEW = 1_200
N_SHARDS = 16


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.range(N_OLD).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key")
    )
    # every 3rd new key is a true member; the rest are novel
    new = spark.range(N_NEW).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("key-"), F.col("id")))
        .otherwise(F.concat(F.lit("novel-"), F.col("id")))
        .alias("key"),
    )
    bloom = build_bloom(old, "key", n_shards=N_SHARDS).persist()
    bloom.count()
    yield old, new, bloom
    bloom.unpersist()


def test_zero_false_negatives(frames):
    old, new, bloom = frames
    flags = might_contain(new, "key", bloom, N_SHARDS)
    members = new.filter(F.col("doc_id") % 3 == 0).select("key")
    missed = members.join(
        flags.filter(F.col("might_contain")), "key", "left_anti"
    ).count()
    assert missed == 0


def test_fpp_in_ballpark(frames):
    old, new, bloom = frames
    flags = might_contain(new, "key", bloom, N_SHARDS)
    novel = new.filter(F.col("doc_id") % 3 != 0).count()
    false_pos = (
        flags.filter(F.col("might_contain"))
        .join(old.select("key"), "key", "left_anti")
        .count()
    )
    # theory at 10 bits/item, k=7: ~0.8%; assert < 5x with slack for
    # the double-hashing approximation and small-n variance
    assert false_pos / novel < 0.05


def test_genuinely_new_is_exact_anti_join(frames):
    old, new, bloom = frames
    got = genuinely_new_rows(new, "key", bloom, old, N_SHARDS)
    exp = new.join(old, "key", "left_anti")
    assert got.count() == exp.count() == (N_NEW - (N_NEW + 2) // 3)
    assert got.join(exp, ["doc_id", "key"], "left_anti").count() == 0


def test_bitmap_deterministic_across_partitionings(frames, spark):
    old, _, bloom = frames
    again = build_bloom(
        old.repartition(3), "key", n_shards=N_SHARDS,
        expected_items=N_OLD,
    )
    a = {r["shard"]: bytes(r["bitmap"]) for r in bloom.collect()}
    b = {r["shard"]: bytes(r["bitmap"]) for r in again.collect()}
    assert a == b


def test_empty_shard_means_definite_no(frames, spark):
    _, new, bloom = frames
    empty_bloom = bloom.limit(0)
    flags = might_contain(new, "key", empty_bloom, N_SHARDS)
    assert flags.filter(F.col("might_contain")).count() == 0
    # and every distinct probe key still gets a row back
    assert flags.count() == new.select("key").distinct().count()


def test_oversized_shard_bitmap_raises(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(ValueError, match="2\\^32"):
        build_bloom(df, "key", n_shards=1,
                    expected_items=1 << 40, bits_per_item=10)


def test_shards_for():
    assert shards_for(1) == 1
    assert shards_for(4_000_000) == 1
    assert shards_for(4_000_001) == 2
    assert shards_for(10**12) == 250_000
