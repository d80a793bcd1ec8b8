"""Context-window chunking: window math, overlap reconstruction,
edge cases, determinism, map-only plan."""

from __future__ import annotations

import pytest

from acxspark.operators.chunking import chunk_documents


def _chunks(spark, text: str, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, **kw).collect()
    return sorted(rows, key=lambda r: r["chunk_id"])


def test_window_coverage_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    rows = _chunks(spark, text, max_tokens=50, overlap=10)
    # stride 40 → ceil((100-10)/40) = 3 chunks: [0,50) [40,90) [80,100)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["chunk_text"].split()[:2] == ["t0", "t1"]
    assert rows[1]["chunk_text"].split()[0] == "t40"
    assert rows[2]["chunk_text"].split() == [f"t{i}" for i in range(80, 100)]
    assert [r["n_tokens_chunk"] for r in rows] == [50, 50, 20]
    # consecutive chunks share exactly the overlap
    assert rows[0]["chunk_text"].split()[40:] == rows[1]["chunk_text"].split()[:10]


def test_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b c", max_tokens=50, overlap=10)
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c" and rows[0]["n_tokens_chunk"] == 3


def test_exact_window_is_one_chunk(spark):
    text = " ".join(f"t{i}" for i in range(50))
    rows = _chunks(spark, text, max_tokens=50, overlap=10)
    assert len(rows) == 1 and rows[0]["n_tokens_chunk"] == 50


def test_empty_doc_emits_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word one two")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, max_tokens=8, overlap=2).collect()
    assert {r["doc_id"] for r in rows} == {3}


def test_tokens_reconstruct_document(spark):
    """De-overlapped chunk concatenation == the original token stream."""
    text = " ".join(f"w{i}" for i in range(137))
    rows = _chunks(spark, text, max_tokens=32, overlap=8)
    out = rows[0]["chunk_text"].split()
    for r in rows[1:]:
        out.extend(r["chunk_text"].split()[8:])
    assert out == text.split()


def test_invalid_overlap_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=8)


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode
