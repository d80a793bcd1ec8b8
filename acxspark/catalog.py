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
