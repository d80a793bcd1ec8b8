"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship near-duplicate pipeline on sf0.001 documents.
queries()     — one callable per implemented operator (SURVEY.md §2 +
                graft training-data tier), from acxspark.queries.
oracle_sql()  — DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from acxspark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup pipeline (exact + MinHash/LSH + SimHash
    + containment → CC clusters) over sf0.001 documents; returns one
    row per cluster with its size and canonical (min) doc id."""
    from acxspark.config import DedupConfig
    from acxspark.plans.pipeline import run_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("url"),
        F.col("text"),
    )
    res = run_pipeline(docs, cfg=DedupConfig(), text_col="text")
    return (
        res.clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("n_docs"), F.min("url").alias("canonical_doc"))
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "n_docs",
            F.col("canonical_doc").cast("bigint").alias("canonical_doc"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
