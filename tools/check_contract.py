"""Local twin of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given SF dir, runs
the matching oracle_sql() under DuckDB on the same parquet, and
compares row count + column names + order-insensitive values exactly.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402
from acxspark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check", parallelism=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {exc}")
            continue
        el = time.time() - t0
        from acxspark.operators.lsh import release_band_caches

        release_band_caches()
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(got)} rows, {el:.1f}s)")
            continue
        want = con.execute(oracles[name]).df()
        g, w = canon_frame(got), canon_frame(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            continue
        if not g.equals(w):
            failures.append(name)
            neq = (g != w).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())} differing rows; first few:")
            print("  spark:", g[neq].head(3).to_dict("records"))
            print("  duckdb:", w[neq].head(3).to_dict("records"))
            continue
        print(f"ok    {name}: {len(g)} rows match ({el:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
