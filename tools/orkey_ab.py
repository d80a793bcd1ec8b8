"""A/B the OR-key CC node representation at bench scale.

Round-5 adjudication tool for VERDICT r4 item 3: time
`or_key_clusters` (customer table, sf dir from $SPARK_GRAFT_SF_DIR)
with hashed long node ids vs the string-node path, alternating trials
in one JVM (directional check only — the committed number comes from
bench.py's fresh-JVM protocol). Prints one JSON line with per-variant
trial walls + mins and asserts the two label sets are identical.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from acxspark.operators.dedup_exact import or_key_components  # noqa: E402
from acxspark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "4"))
    spark = get_spark("orkey-ab", parallelism=cpus)

    # $SPARK_GRAFT_ORKEY_SYNTH=N switches to a synthetic N-record table
    # with realistic LONG keys (35-B emails, 18-B phones) — the regime
    # the hashed-node claim is about (short sf0.1 custkeys understate
    # the string-shuffle cost ~4x).
    n_synth = int(os.environ.get("SPARK_GRAFT_ORKEY_SYNTH", "0"))
    if n_synth:
        c = spark.range(n_synth).select(
            F.concat(F.lit("record-id-"),
                     F.lpad(F.col("id").cast("string"), 12, "0")).alias("id"),
            F.concat(F.lit("user."), (F.col("id") % (n_synth // 3)).cast("string"),
                     F.lit("@example-mail-provider.com")).alias("ek"),
            F.concat(F.lit("+1-555-000-"),
                     (F.col("id") % (n_synth // 4)).cast("string")).alias("pk"),
        )
    else:
        c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("id"),
            (F.col("c_custkey") % 200).cast("string").alias("ek"),
            (F.col("c_custkey") % 150).cast("string").alias("pk"),
        )

    # driver = the default small-graph union-find path; hashed/string
    # force the distributed star-join CC (small_graph_cap=0) to A/B the
    # long-node vs string-node per-round shuffle at this volume.
    variants = {
        "driver": dict(),
        "hashed": dict(small_graph_cap=0, hash_nodes=True),
        "string": dict(small_graph_cap=0, hash_nodes=False),
    }
    walls: dict[str, list[float]] = {k: [] for k in variants}
    sums: dict[str, set] = {}
    for t in range(trials):
        for variant, kw in variants.items():
            t0 = time.time()
            out = or_key_components(c, "id", ["ek", "pk"], **kw)
            rows = out.agg(
                F.count("*").alias("n"),
                F.coalesce(
                    F.bit_xor(F.xxhash64("id", "cluster_id")), F.lit(0)
                ).alias("h"),
            ).collect()[0]
            walls[variant].append(round(time.time() - t0, 3))
            sums.setdefault(variant, set()).add((rows["n"], rows["h"]))
            spark.catalog.clearCache()

    assert sums["driver"] == sums["hashed"] == sums["string"], sums
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "n_synth": n_synth,
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
        "labels_identical": True,
        "checksum": sorted(sums["hashed"]),
    }))


if __name__ == "__main__":
    main()
