"""Snapshot catalog — Iceberg-like commit/resume semantics on plain parquet.

The north_rule asks for Iceberg tables with atomic snapshot commits so
any stage resumes from the last committed snapshot. No Iceberg runtime
jar exists in this sandbox (offline), so the catalog is an abstraction
(SURVEY §7.3.6):

- ``ParquetSnapshotCatalog`` (default): each write lands in
  ``root/<table>/snap-<n>/`` and is committed by atomically renaming a
  manifest json into place — the same tmp+rename crash-safety the
  reference uses for its data file (reference src/utils.cpp:21-38,
  src/cli.cpp:357-368), promoted from file to table granularity.
  Readers resolve the manifest first, so a killed writer is invisible.
- On a real cluster, swap in Iceberg via session conf
  (``spark.sql.catalog.*``) and ``df.writeTo(tbl)``; the call sites
  only use write/read/has/latest_meta, which map 1:1.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class ParquetSnapshotCatalog:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _tdir(self, table: str) -> Path:
        return self.root / table

    def _manifest_path(self, table: str) -> Path:
        return self._tdir(table) / "MANIFEST.json"

    def has(self, table: str) -> bool:
        return self._manifest_path(table).exists()

    def latest_meta(self, table: str) -> dict:
        with open(self._manifest_path(table)) as f:
            return json.load(f)

    def write(self, table: str, df: DataFrame, meta: dict | None = None) -> int:
        """Write a new snapshot and atomically commit the manifest."""
        tdir = self._tdir(table)
        tdir.mkdir(parents=True, exist_ok=True)
        version = (self.latest_meta(table)["version"] + 1) if self.has(table) else 0
        snap = tdir / f"snap-{version:06d}"
        df.write.mode("overwrite").parquet(str(snap))
        manifest = {"version": version, "path": snap.name, **(meta or {})}
        fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))  # atomic commit point
        self._gc(tdir, keep=snap.name)
        return version

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        m = self.latest_meta(table)
        return spark.read.parquet(str(self._tdir(table) / m["path"]))

    def _gc(self, tdir: Path, keep: str, retain: int = 2) -> None:
        """Drop all but the newest `retain` snapshots (never `keep`)."""
        snaps = sorted(p for p in tdir.iterdir() if p.name.startswith("snap-"))
        for p in snaps[:-retain]:
            if p.name != keep:
                shutil.rmtree(p, ignore_errors=True)


# ---- Iceberg path (cluster deployments; jar-gated in this sandbox) ----


def iceberg_session_conf(
    warehouse: str, catalog_name: str = "acx"
) -> dict[str, str]:
    """The session confs that switch the snapshot catalog to real
    Iceberg (SURVEY §1.6/§7.0). Pass to ``get_spark(extra_conf=...)``
    (or ``--conf`` on spark-submit) on a cluster with
    ``iceberg-spark-runtime`` on the classpath:

        spark = get_spark(extra_conf=iceberg_session_conf("s3://wh"))
        cat = IcebergSnapshotCatalog(spark, "acx", "dedup")

    Hadoop-catalog flavor (pure warehouse-path, no metastore) — the
    minimal deployment; swap ``type`` for hive/rest/glue as the
    environment provides.
    """
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog_name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog_name}.type": "hadoop",
        f"spark.sql.catalog.{catalog_name}.warehouse": warehouse,
    }


class IcebergSnapshotCatalog:
    """Same 4-method surface as :class:`ParquetSnapshotCatalog`, backed
    by a real Iceberg catalog — the call sites (pipeline/incremental/CC
    round snapshots) only use write/read/has/latest_meta, so the switch
    is this class plus :func:`iceberg_session_conf`.

    meta round-trip: stamps ride the Iceberg SNAPSHOT SUMMARY
    (``snapshot-property.*`` write options), so `latest_meta` reads
    them back from the committed snapshot — resume staleness checks
    (pipeline.py `_fresh`) work identically; `version` maps to
    Iceberg's snapshot_id. Untestable without the runtime jar
    (tests/test_catalog.py skips when absent), but exercised by the
    same contract as the parquet fallback when one is present.
    """

    def __init__(self, spark: SparkSession, catalog: str = "acx",
                 namespace: str = "acxspark"):
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")

    def _fq(self, table: str) -> str:
        safe = table.replace("-", "_")
        return f"{self.prefix}.{safe}"

    def has(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._fq(table))

    def latest_meta(self, table: str) -> dict:
        row = (
            self.spark.sql(
                f"SELECT snapshot_id, summary FROM {self._fq(table)}.snapshots "
                f"ORDER BY committed_at DESC LIMIT 1"
            ).collect()[0]
        )
        meta = {"version": int(row["snapshot_id"]), "path": self._fq(table)}
        for k, v in dict(row["summary"]).items():
            if k.startswith("acx."):
                try:
                    meta[k[4:]] = json.loads(v)
                except (TypeError, ValueError):
                    meta[k[4:]] = v
        return meta

    def write(self, table: str, df: DataFrame, meta: dict | None = None) -> int:
        w = df.writeTo(self._fq(table)).using("iceberg")
        for k, v in (meta or {}).items():
            # snapshot summary properties — committed atomically WITH
            # the data, so a killed writer can't leave a stamped but
            # dataless snapshot (same commit-point contract as the
            # manifest rename in the parquet fallback)
            w = w.option(f"snapshot-property.acx.{k}", json.dumps(v))
        w.createOrReplace()
        return self.latest_meta(table)["version"]

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.table(self._fq(table))
