"""Hypothesis property/fuzz tests — the pytest analog of the
reference's libFuzzer harnesses (reference fuzz/csv_fuzz.cpp:1-10,
fuzz/jsonl_fuzz.cpp:1-9; SURVEY §5.5).

Pure-function codecs get full-rate property testing; Spark-backed
parsers get batched fuzzing (one Spark job per hypothesis example,
each example a LIST of adversarial lines) with a low example budget —
the goal is the reference's property ("parser never crashes, corrupt
input is contained"), not coverage-guided exploration.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from acxspark import io_paths as IO
from acxspark.operators import multimodal as MM

# printable lines that cannot smuggle a record separator
_line = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\n\r\x00"),
    max_size=120,
)


@given(
    sr=st.integers(min_value=1, max_value=192_000),
    nf=st.integers(min_value=0, max_value=50_000),
    ch=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_wav_encode_decode_roundtrip_property(sr, nf, ch):
    """decode(encode(params)) recovers every field, any params."""
    meta = MM.decode_wav_meta(MM.encode_wav_pcm16(sr, nf, channels=ch))
    assert meta["sample_rate"] == sr
    assert meta["channels"] == ch
    assert meta["n_frames"] == nf
    assert meta["duration_ms"] == nf * 1000 // sr


@given(payload=st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_media_decoders_never_crash_on_garbage(payload):
    """Arbitrary bytes: ValueError or a valid parse — never a crash,
    never a partial/negative result (the fuzz contract)."""
    for fn in (MM.decode_wav_meta, MM.decode_ppm_meta):
        try:
            meta = fn(payload)
        except ValueError:
            continue
        assert all(v is None or isinstance(v, (int, str)) for v in meta.values())
        assert all(v >= 0 for v in meta.values() if isinstance(v, int))


def _naive_reference(line: str):
    """The reference importer's semantics, transliterated for the
    property check only (storage.cpp:446-455): comma split, no
    quoting, <6 parts -> skipped, extra parts ignored."""
    parts = line.split(",")
    return parts[:6] if len(parts) >= 6 else None


@given(lines=st.lists(_line, min_size=1, max_size=40))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_naive_csv_split_matches_python_reference(spark, lines):
    """naive_split_fields == the sequential reference semantics on
    arbitrary comma/quote-riddled lines (batched Spark fuzz)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = [
        None if r["c"] is None else list(r["c"])
        for r in df.select(IO.naive_split_fields(F.col("value")).alias("c"))
        .collect()
    ]
    # row order: createDataFrame preserves it at this size (1 partition)
    assert got == [_naive_reference(l) for l in lines]


@given(lines=st.lists(_line, min_size=1, max_size=30))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jsonl_scan_contains_arbitrary_garbage(spark, tmp_path_factory, lines):
    """read_jsonl on arbitrary lines: never raises, emits at most one
    row per input line, and every emitted row is either parsed (null
    _corrupt_record) or carries the raw line in _corrupt_record —
    corrupt input is CONTAINED, exactly the reference passthrough
    contract (src/cli.cpp:303-304)."""
    p = tmp_path_factory.mktemp("fuzz") / "fuzz.jsonl"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    rows = IO.read_jsonl(spark, str(p), keep_corrupt=True,
                         max_record_bytes=None).collect()
    assert len(rows) <= len(lines)
    # membership is checked against the RAW lines: Python's str.strip()
    # treats \x1c-\x1f as whitespace, Spark does not — a '\x1f' line is
    # non-blank to the scan and legitimately surfaces as corrupt
    for r in rows:
        if r["_corrupt_record"] is not None:
            assert r["_corrupt_record"] in lines
        else:  # parsed: some source line must have been valid JSON
            assert any(_parses(l) for l in lines)


def _parses(line: str) -> bool:
    try:
        json.loads(line)
        return True
    except Exception:
        return False


@given(
    toks=st.lists(st.integers(min_value=0, max_value=10_000),
                  min_size=1, max_size=60),
    seed=st.integers(min_value=0, max_value=999),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_packing_offsets_match_python_reference(spark, toks, seed):
    """Two-level distributed prefix sum == the sequential reference:
    sort (md5(id:pack:seed), id), cumulate token counts — for arbitrary
    token-count multisets and seeds (batched Spark fuzz)."""
    import hashlib

    from acxspark.operators.packing import with_global_offsets

    rows = list(enumerate(toks))
    df = spark.createDataFrame(rows, ["doc_id", "tok"])
    got = {
        r["doc_id"]: r["start_offset"]
        for r in with_global_offsets(df, "tok", "doc_id", seed=seed).collect()
    }
    order = sorted(
        rows, key=lambda r: (hashlib.md5(f"{r[0]}:pack:{seed}".encode()).hexdigest(), r[0])
    )
    pos, want = 0, {}
    for i, t in order:
        want[i] = pos
        pos += t
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=14),
        min_size=1, max_size=12,
    ),
    bench=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=14),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_contamination_matches_python_reference(spark, docs, bench):
    """Broadcast-semi-join flags == sequential 4-gram set overlap, for
    arbitrary tiny-alphabet corpora (worst case for collisions /
    shared boilerplate)."""
    from acxspark.operators.decontaminate import (
        benchmark_gram_set,
        contaminated_doc_ids,
    )

    def grams(words):
        return {" ".join(words[i:i + 4]) for i in range(len(words) - 3)}

    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    ddf = spark.createDataFrame(rows, ["doc_id", "text"])
    bdf = spark.createDataFrame([(0, " ".join(bench))], ["doc_id", "text"])
    got = sorted(
        r["doc_id"]
        for r in contaminated_doc_ids(
            ddf, benchmark_gram_set(bdf, "text", 4), n=4, hashed=True
        ).collect()
    )
    bg = grams(bench)
    want = sorted(i for i, w in enumerate(docs) if grams(w) & bg)
    assert got == want


@given(lines=st.lists(_line, min_size=1, max_size=12))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_curation_gates_never_crash_and_invariants(spark, lines):
    """Gopher battery + C4 rules + chunking on arbitrary text: never
    raise, C4's kept lines are a subset of input lines in order, the
    chunk tokens reconstruct the canonical token stream exactly."""
    from acxspark.functions.c4rules import c4_clean_docs_df
    from acxspark.functions.text import gopher_rules
    from acxspark.operators.chunking import chunk_documents
    from pyspark.sql import functions as F

    text = "\n".join(lines)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    g = df.select(*[v.alias(k) for k, v in gopher_rules(F.col("text")).items()])
    row = g.collect()[0]
    assert all(isinstance(v, bool) for v in row.asDict().values())

    c4 = c4_clean_docs_df(df).collect()[0]
    assert 0 <= c4["n_kept"] <= c4["n_lines"]
    if c4["n_kept"] > 0:
        kept = c4["clean_text"].split("\n")
        it = iter(text.split("\n"))
        assert all(any(k == x for x in it) for k in kept)  # subsequence

    chunks = sorted(
        chunk_documents(df, max_tokens=7, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    import re
    # .strip(" ") not .strip(): Python str.strip() eats \x1f/\xa0-class
    # controls that Spark's trim (space-only) and ASCII \s keep
    canon = [t for t in re.sub(r"\s+", " ", text.lower(),
                               flags=re.ASCII).strip(" ").split(" ") if t]
    if not canon:
        assert chunks == []
    else:
        out = list(chunks[0]["chunk_text"].split(" ")) if chunks else []
        for r in chunks[1:]:
            out.extend(r["chunk_text"].split(" ")[2:])
        assert out == canon


@given(texts=st.lists(_line, min_size=1, max_size=8))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lm_scores_nonnegative_and_token_exact(spark, texts):
    """Unigram NLL on arbitrary corpora: scores are non-negative
    (every probability <= 1), token counts match the canonical
    tokenization, and the OOV floor bounds every in-vocab NLL above."""
    from acxspark.operators.lmfilter import score_unigram_nll, train_unigram_lm

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    import re

    model = train_unigram_lm(docs)
    rows = score_unigram_nll(docs, model).collect()
    for r in rows:
        # Java/RE2 \s is ASCII-only — Python str.split() also eats
        # \xa0 etc., so the reference tokenizer must pin re.ASCII
        canon = re.sub(r"\s+", " ", texts[r["doc_id"]].lower(),
                       flags=re.ASCII).strip(" ")
        want_tokens = len([x for x in canon.split(" ") if x])
        assert r["n_tokens"] == want_tokens
        assert r["nll_milli_sum"] >= 0
        assert r["mean_nll"] >= 0.0
