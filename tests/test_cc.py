"""Connected-components correctness, including chains longer than one
large/small-star round, plus catalog checkpoint/resume."""

import pyspark.sql.functions as F

from acxspark.catalog import ParquetSnapshotCatalog
from acxspark.operators.cc import cluster_assignments, connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    return {r["u"]: r["component"] for r in connected_components(df).collect()}


def test_simple_components(spark):
    got = _labels(spark, [("a", "b"), ("c", "d"), ("b", "e")])
    assert got["a"] == got["b"] == got["e"] == "a"
    assert got["c"] == got["d"] == "c"


def test_long_chain(spark):
    # path graph 0-1-2-...-19 → one component labeled "00"
    edges = [(f"{i:02d}", f"{i+1:02d}") for i in range(19)]
    got = _labels(spark, edges)
    assert set(got.values()) == {"00"}
    assert len(got) == 20


def test_numeric_ids(spark):
    df = spark.createDataFrame([(10, 2), (2, 30), (5, 6)], ["u", "v"])
    got = {r["u"]: r["component"] for r in connected_components(df).collect()}
    assert got[10] == got[2] == got[30] == 2
    assert got[5] == got[6] == 5


def test_cluster_assignments_includes_singletons(spark):
    ids = spark.createDataFrame([("a",), ("b",), ("z",)], ["url"])
    edges = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    got = {r["url"]: r["cluster_id"] for r in cluster_assignments(ids, "url", edges).collect()}
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_cc_checkpoint_resume(spark, tmp_path):
    cat = ParquetSnapshotCatalog(tmp_path / "catalog")
    edges = spark.createDataFrame(
        [(f"{i:02d}", f"{i+1:02d}") for i in range(9)], ["u", "v"]
    )
    got1 = {r["u"]: r["component"]
            for r in connected_components(edges, catalog=cat, table="t").collect()}
    assert set(got1.values()) == {"00"}
    # resume: catalog already converged — a fresh call starting from the
    # committed snapshot converges immediately to the same labels
    got2 = {r["u"]: r["component"]
            for r in connected_components(edges, catalog=cat, table="t").collect()}
    assert got2 == got1


def test_cc_nonconvergence_is_loud(spark):
    """max_iter elapsing without a checksum fixpoint must RAISE, not
    silently emit possibly-split labels (round-2 verdict finding #4).
    A 3-node chain needs a 2nd round just to PROVE the fixpoint, so
    max_iter=1 cannot certify convergence."""
    import pytest as _pytest

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=1)
    # with room to certify, the same edges converge fine
    labels = {r["u"]: r["component"]
              for r in connected_components(edges, max_iter=50).collect()}
    assert labels == {1: 1, 2: 1, 3: 1}
