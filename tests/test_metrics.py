"""Lineage observe/flush: unfired stages must not hang, repeated
stage names must all survive."""

from __future__ import annotations

import time

from acxspark.metrics import Lineage


def test_flush_skips_unfired_observation_without_hanging(spark):
    """Observation.get blocks FOREVER for a stage whose plan never
    reached an action (a config-skipped branch, an early return) —
    flush must bound the probe and skip it, not deadlock the
    pipeline's cleanup."""
    lin = Lineage()
    fired = lin.observe(spark.range(10), "fired")
    fired.count()
    lin.observe(spark.range(10), "never_fired")  # no action, ever
    t0 = time.time()
    out = lin.flush(timeout=3.0)
    assert time.time() - t0 < 30
    assert [r["stage"] for r in out] == ["fired"]
    assert out[0]["rows"] == 10


def test_repeated_stage_names_all_flush(spark):
    """Two runs sharing one Lineage (the idempotence check) observe
    the same stage name twice — a dict keyed by stage silently dropped
    the first run's metrics."""
    lin = Lineage()
    a = lin.observe(spark.range(3), "s")
    a.count()
    b = lin.observe(spark.range(4), "s")
    b.count()
    rows = lin.flush()
    assert sorted(r["rows"] for r in rows) == [3, 4]
    assert {r["stage"] for r in rows} == {"s"}
