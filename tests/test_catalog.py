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
    assert cat.latest_meta("t")["path"].startswith("snap-000000")
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


def test_pipeline_stage_level_resume(spark, tmp_path, monkeypatch):
    """north_rule resumability, stage-granular: a re-run against the
    same catalog resumes past the signature scan AND all candidate
    tiers (their snapshots carry matching config+input stamps), while
    a changed input invalidates the snapshots and recomputes."""
    from acxspark.catalog import ParquetSnapshotCatalog
    from acxspark.config import DedupConfig
    from acxspark.corpus import generate, to_spark
    from acxspark.plans import pipeline as P

    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    web, _, _ = to_spark(spark, generate(n_docs=120, seed=3))
    web = web.cache()
    res1 = P.run_pipeline(web, cfg=DedupConfig(), catalog=cat)
    c1 = sorted((r["url"], r["cluster_id"]) for r in res1.clusters.collect())
    # one-sha2-scan device (round 5): the (url, text_sha) projection is
    # persisted, so the exact tier AND the signature-snapshot sha join
    # read the cache instead of re-hashing the corpus; and the snapshot
    # sha column equals a fresh sha2 pass (contents unchanged)
    assert any(
        set(c.columns) == {"url", "text_sha"} and c.storageLevel.useMemory
        for c in res1.caches
    )
    import pyspark.sql.functions as F
    snap_sha = cat.read(spark, "signatures").select("url", "text_sha")
    fresh_sha = web.select(
        "url", F.sha2(F.col("text"), 256).alias("text_sha")
    ).join(snap_sha.select("url"), "url", "left_semi")
    assert snap_sha.exceptAll(fresh_sha).count() == 0
    res1.release()
    assert cat.has("signatures") and cat.has("edges")

    def boom(*a, **k):  # pragma: no cover - must never fire
        raise AssertionError("stage re-ran despite a fresh snapshot")

    monkeypatch.setattr(P, "with_signatures", boom)
    monkeypatch.setattr(P, "candidate_pairs", boom)
    monkeypatch.setattr(P, "simhash_candidate_pairs", boom)
    res2 = P.run_pipeline(web, cfg=DedupConfig(), catalog=cat)
    c2 = sorted((r["url"], r["cluster_id"]) for r in res2.clusters.collect())
    assert c2 == c1  # resumed result identical to the computed one
    res2.release()
    monkeypatch.undo()

    # a different input (subset) must MISS the stamps and recompute
    web2 = web.limit(80).cache()
    res3 = P.run_pipeline(web2, cfg=DedupConfig(), catalog=cat)
    assert res3.clusters.count() == 80
    res3.release()

    # a different config fingerprint also invalidates
    res4 = P.run_pipeline(web, cfg=DedupConfig(shingle_k=4), catalog=cat)
    assert res4.clusters.count() == 120
    res4.release()


def test_incremental_folds_new_batch_into_frozen_base(spark, tmp_path):
    """Incremental plan: new docs join matched old clusters (labels
    FROZEN), intra-increment dups cluster first-wins, uniques stand
    alone, and the snapshots advance so the next increment sees this
    one."""
    from acxspark.catalog import ParquetSnapshotCatalog
    from acxspark.config import DedupConfig
    from acxspark.plans.incremental import run_incremental
    from acxspark.plans.pipeline import run_pipeline

    base_text = ("the quick brown fox jumps over the lazy dog while "
                 "seventeen ships sail quietly past the harbor wall "
                 "under a pale winter sky full of patient birds ")
    other = ("completely different content about distributed shuffle "
             "joins and columnar execution engines at petabyte scale "
             "with adaptive query planning and skew mitigation ")
    edit = base_text.replace("winter", "summer")
    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    A = spark.createDataFrame(
        [("a1", base_text), ("a2", edit),          # near pair
         ("a3", other), ("a4", other),             # exact pair
         ("a5", "tiny unique doc five " * 10),
         ("a6", "tiny unique doc six " * 10)],
        "url string, text string",
    )
    res = run_pipeline(A, cfg=DedupConfig(), catalog=cat)
    old = {r["url"]: r["cluster_id"] for r in res.clusters.collect()}
    res.release()
    assert old["a1"] == old["a2"] == "a1"
    assert old["a3"] == old["a4"] == "a3"

    B = spark.createDataFrame(
        [("b1", "tiny unique doc five " * 10),              # exact dup of a5
         ("b2", base_text.replace("patient", "curious")),   # near dup of a1
         ("b3", "brand new cluster of words " * 8),
         ("b4", "brand new cluster of words " * 8 + "tail"),# near dup of b3
         ("b5", "entirely novel singleton document " * 6)],
        "url string, text string",
    )
    inc = run_incremental(B, cat, cfg=DedupConfig())
    got = {r["url"]: r["cluster_id"] for r in inc.assignments.collect()}
    assert got["b1"] == "a5"            # joined the old cluster, frozen label
    assert got["b2"] == "a1"
    assert got["b3"] == got["b4"] == "b3"  # first-wins within increment
    assert got["b5"] == "b5"

    # snapshots advanced: old labels unchanged, new rows present
    snap = {r["url"]: r["cluster_id"]
            for r in cat.read(spark, "clusters").collect()}
    for u, c in old.items():
        assert snap[u] == c
    for u, c in got.items():
        assert snap[u] == c

    # a SECOND increment matches content first seen in the FIRST one
    C = spark.createDataFrame(
        [("c1", "brand new cluster of words " * 8 + "small tail")],
        "url string, text string",
    )
    inc2 = run_incremental(C, cat, cfg=DedupConfig())
    got2 = {r["url"]: r["cluster_id"] for r in inc2.assignments.collect()}
    assert got2["c1"] == "b3"           # b3's frozen label propagates
    inc.lineage.flush()
    for df in inc.caches + inc2.caches:
        df.unpersist()


def test_resume_applies_span_dedup_tail(spark, tmp_path):
    """A resumed run (fresh edge snapshot) must produce the SAME
    survivor text as a fresh run with identical flags — the resume
    branch used to skip the span_dedup_k stage entirely."""
    from acxspark.catalog import ParquetSnapshotCatalog
    from acxspark.config import DedupConfig
    from acxspark.corpus import generate, to_spark
    from acxspark.plans import pipeline as P

    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    web, _, _ = to_spark(spark, generate(n_docs=60, seed=9))
    web = web.cache()
    res1 = P.run_pipeline(web, cfg=DedupConfig(), catalog=cat, span_dedup_k=8)
    fresh = sorted((r["url"], r["text"]) for r in res1.survivors.collect())
    res1.release()
    assert cat.has("edges")

    res2 = P.run_pipeline(web, cfg=DedupConfig(), catalog=cat, span_dedup_k=8)
    resumed = sorted((r["url"], r["text"]) for r in res2.survivors.collect())
    assert resumed == fresh
    # the resumed run must have WIRED the span stage (its lineage
    # observation exists and fired on the collect above)
    obs = dict(res2.lineage.observations)  # list of (stage, Observation)
    assert "span_dedup" in obs
    assert obs["span_dedup"].get["rows"] == len(resumed)
    res2.release()


def test_incremental_pathological_single_hash_batch(spark, tmp_path):
    """10^5 copies of ONE page in a single increment: the intra-exact
    tier must stream (star edges via groupBy-min + join), never build
    the whole dup group as one array in a single aggregation buffer.
    Plan-asserted (no ObjectHashAggregate/collect_list) AND executed
    end-to-end: every copy lands in one first-wins cluster."""
    from acxspark.catalog import ParquetSnapshotCatalog
    from acxspark.config import DedupConfig
    from acxspark.plans.incremental import run_incremental
    from acxspark.plans.pipeline import run_pipeline
    from pyspark.sql import functions as F

    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    A = spark.createDataFrame(
        [("a1", "seed corpus document totally unrelated " * 8)],
        "url string, text string",
    )
    run_pipeline(A, cfg=DedupConfig(), catalog=cat).release()

    hot = "hot boilerplate page served a hundred thousand times " * 6
    B = spark.range(100_000).select(
        F.concat(F.lit("b"), F.lpad(F.col("id").cast("string"), 7, "0"))
        .alias("url"),
        F.lit(hot).alias("text"),
    )
    inc = run_incremental(B, cat, cfg=DedupConfig())
    plan = inc.assignments._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    agg = inc.assignments.groupBy("cluster_id").count().collect()
    assert len(agg) == 1 and agg[0]["count"] == 100_000
    assert agg[0]["cluster_id"] == "b0000000"  # first-wins within increment
    inc.lineage.flush()
    for df in inc.caches:
        df.unpersist()


def _iceberg_jar_present() -> bool:
    import glob
    import os

    spark_home = os.environ.get("SPARK_HOME", "")
    roots = [p for p in [spark_home and f"{spark_home}/jars"] if p]
    try:
        import pyspark

        roots.append(f"{os.path.dirname(pyspark.__file__)}/jars")
    except ImportError:
        pass
    return any(glob.glob(f"{r}/iceberg-spark-runtime*.jar") for r in roots)


def test_iceberg_session_conf_wiring():
    """The conf switch is pure data — assert the wiring that a cluster
    deployment depends on, so it can't bit-rot silently."""
    from acxspark.catalog import iceberg_session_conf

    conf = iceberg_session_conf("s3://warehouse/path", catalog_name="acx")
    assert conf["spark.sql.catalog.acx"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.acx.warehouse"] == "s3://warehouse/path"
    assert conf["spark.sql.catalog.acx.type"] == "hadoop"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_iceberg_catalog_logic_with_double():
    """IcebergSnapshotCatalog's OWN logic — fq name mangling, meta →
    snapshot-property JSON encoding, latest_meta decode + newest-commit
    selection, version = snapshot_id — pinned WITHOUT the runtime jar
    via a pure-Python double of the exact Spark surface the class
    touches (spark.sql / catalog.tableExists / df.writeTo). The
    jar-gated roundtrip below stays as the DEPLOY gate for the real
    Iceberg side (docs/SCALE.md checklist); this test makes the class
    logic a tested component rather than a perpetual skip."""
    from acxspark.catalog import IcebergSnapshotCatalog

    committed: dict[str, list] = {}
    clock = [0]

    class FakeWriter:
        def __init__(self, fq):
            self.fq, self.opts, self.fmt = fq, {}, None

        def using(self, fmt):
            self.fmt = fmt
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def createOrReplace(self):
            assert self.fmt == "iceberg"
            clock[0] += 1
            summary = {
                k.removeprefix("snapshot-property."): v
                for k, v in self.opts.items()
            }
            committed.setdefault(self.fq, []).append(
                {"snapshot_id": 1000 + clock[0], "committed_at": clock[0],
                 "summary": summary}
            )

    class FakeDF:
        def writeTo(self, fq):
            return FakeWriter(fq)

    class FakeCatalogAPI:
        def tableExists(self, fq):
            return fq in committed

    class FakeResult:
        def __init__(self, rows):
            self._rows = rows

        def collect(self):
            return self._rows

    class FakeSpark:
        catalog = FakeCatalogAPI()

        def sql(self, q):
            if q.startswith("CREATE NAMESPACE"):
                return FakeResult([])
            assert ".snapshots" in q and "committed_at DESC" in q
            # mirror the class's ORDER BY incl. the snapshot_id
            # tiebreaker for same-millisecond commits
            assert "snapshot_id DESC" in q
            fq = q.split("FROM ")[1].split(".snapshots")[0]
            newest = max(committed[fq],
                         key=lambda s: (s["committed_at"], s["snapshot_id"]))
            return FakeResult(
                [{"snapshot_id": newest["snapshot_id"],
                  "summary": newest["summary"]}]
            )

    cat = IcebergSnapshotCatalog(FakeSpark(), "acx", "t")
    assert not cat.has("cc_edges-ab12-cd34")
    v1 = cat.write("cc_edges-ab12-cd34", FakeDF(),
                   meta={"n_docs": 10, "config": "fp",
                         "checksum": [3, -7], "note": "x"})
    # dashes mangle to underscores in the fq table name
    assert cat.has("cc_edges-ab12-cd34")
    assert "acx.t.cc_edges_ab12_cd34" in committed
    m = cat.latest_meta("cc_edges-ab12-cd34")
    # version = snapshot_id; meta values round-trip through JSON with
    # their types (int stays int, list stays list)
    assert m["version"] == v1 == 1001
    assert m["n_docs"] == 10 and m["config"] == "fp"
    assert m["checksum"] == [3, -7] and m["note"] == "x"
    # a second commit wins latest_meta by committed_at
    v2 = cat.write("cc_edges-ab12-cd34", FakeDF(), meta={"n_docs": 11})
    m2 = cat.latest_meta("cc_edges-ab12-cd34")
    assert m2["version"] == v2 == 1002 and m2["n_docs"] == 11
    # same-millisecond tie (fast sequential CC-round commits):
    # snapshot_id breaks it deterministically toward the newer commit
    committed["acx.t.cc_edges_ab12_cd34"].append(
        {"snapshot_id": 1003, "committed_at": clock[0],
         "summary": {"acx.n_docs": "12"}}
    )
    m3 = cat.latest_meta("cc_edges-ab12-cd34")
    assert m3["version"] == 1003 and m3["n_docs"] == 12
    # reserved caller meta is rejected before any write
    with _pytest.raises(ValueError, match="reserved"):
        cat.write("cc_edges-ab12-cd34", FakeDF(), meta={"path": "x"})


import pytest as _pytest


@_pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath (deploy "
    "gate — see docs/SCALE.md Iceberg deployment checklist; the class "
    "logic is pinned jar-free by test_iceberg_catalog_logic_with_double)",
)
def test_iceberg_catalog_roundtrip(tmp_path):
    """Full write/read/has/latest_meta + meta-stamp roundtrip against a
    real Iceberg warehouse — runs wherever the runtime jar exists."""
    from acxspark.catalog import IcebergSnapshotCatalog, iceberg_session_conf
    from acxspark.session import get_spark

    s = get_spark(
        "iceberg-smoke",
        parallelism=2,
        extra_conf=iceberg_session_conf(str(tmp_path / "wh")),
    )
    cat = IcebergSnapshotCatalog(s, "acx", "t_smoke")
    assert not cat.has("edges")
    cat.write("edges", s.range(10), meta={"n_docs": 10, "config": "fp"})
    assert cat.has("edges")
    m = cat.latest_meta("edges")
    assert m["n_docs"] == 10 and m["config"] == "fp"
    assert cat.read(s, "edges").count() == 10


def test_torn_manifest_reads_as_uncommitted_and_recovers(spark, tmp_path):
    """A zero-length / garbled MANIFEST.json (crash mid-commit before
    the rename's data hit disk) must mean 'nothing committed' — not a
    permanently bricked table: has() False, and the next write starts
    the table over instead of crashing on the unreadable manifest."""
    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    cat.write("t", spark.range(3))
    (tmp_path / "cat" / "t" / "MANIFEST.json").write_text("")  # torn
    assert not cat.has("t")
    v = cat.write("t", spark.range(7))   # recovery write, not a raise
    assert v == 0
    assert cat.read(spark, "t").count() == 7


def test_reserved_meta_keys_rejected(spark, tmp_path):
    """Caller meta may not shadow the catalog's own manifest fields —
    a meta {'version': ...} would corrupt the next write's version
    arithmetic silently."""
    import pytest

    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    for k in ("version", "path", "prior"):
        with pytest.raises(ValueError, match="reserved"):
            cat.write("t", spark.range(1), meta={k: "x"})


def test_gc_is_commit_ordered_not_name_ordered(spark, tmp_path):
    """Retention must follow COMMIT order from the manifest, not
    directory-name order: stray higher-numbered dirs (junk from a
    recreated manifest or a killed writer) must never push the
    previous committed snapshot out of the retention window."""
    cat = ParquetSnapshotCatalog(tmp_path / "cat")
    tdir = tmp_path / "cat" / "t"
    cat.write("t", spark.range(1))
    # strays that sort ABOVE every real snapshot name
    for j in (5, 6):
        spark.range(50).write.parquet(str(tdir / f"snap-9999{j:02d}-junk"))
    cat.write("t", spark.range(2))
    prev = cat.latest_meta("t")["prior"]
    assert len(prev) == 1
    # the previous committed snapshot is retained and still readable
    assert (tdir / prev[0]).exists()
    assert spark.read.parquet(str(tdir / prev[0])).count() == 1
