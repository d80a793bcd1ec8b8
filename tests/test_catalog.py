"""Snapshot catalog unit tests: versioning, atomic manifest, GC,
resume reads (the Iceberg-semantics fallback, SURVEY §7.3.6)."""

from __future__ import annotations

import json

from acxspark.catalog import ParquetSnapshotCatalog


def test_versioned_commits_and_read_latest(spark, tmp_path):
    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    df1 = spark.range(5)
    df2 = spark.range(9)
    assert not cat.has("t")
    v0 = cat.write("t", df1, meta={"iteration": 1})
    v1 = cat.write("t", df2, meta={"iteration": 2})
    assert (v0, v1) == (0, 1)
    assert cat.latest_meta("t")["iteration"] == 2
    assert cat.read(spark, "t").count() == 9


def test_manifest_is_the_commit_point(spark, tmp_path):
    """A snapshot directory without a manifest update is invisible —
    simulates a writer killed before the atomic rename."""
    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    cat.write("t", spark.range(3))
    # fake a partially-written newer snapshot (no manifest flip)
    stale = tmp_path / "cat" / "t" / "snap-000099"
    spark.range(100).write.parquet(str(stale))
    assert cat.latest_meta("t")["path"] == "snap-000000"
    assert cat.read(spark, "t").count() == 3


def test_gc_retains_recent_snapshots(spark, tmp_path):
    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    for i in range(4):
        cat.write("t", spark.range(i + 1))
    tdir = tmp_path / "cat" / "t"
    snaps = sorted(p.name for p in tdir.iterdir() if p.name.startswith("snap-"))
    assert len(snaps) <= 3  # retain=2 plus the fresh one
    m = json.loads((tdir / "MANIFEST.json").read_text())
    assert m["version"] == 3
    assert cat.read(spark, "t").count() == 4
