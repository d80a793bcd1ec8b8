"""Multimodal plumbing tests — schema, determinism, guards.

The codec layer is stubbed (no media libs in this container); what IS
real and tested: binary column handling through Arrow batches, output
schemas, the size guard, frame explosion, and byte-determinism of the
stub features across partitionings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acxspark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"m{i}", "image" if i % 2 == 0 else "video", bytes([i % 251]) * (100 + i))
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "media_id string, kind string, payload binary"
    ).cache()


def test_attach_meta_jvm_side(media):
    out = MM.attach_media_meta(media).select("media_id", "meta").collect()
    m = {r["media_id"]: r["meta"] for r in out}
    assert m["m0"]["n_bytes"] == 100 and m["m0"]["mime"] == "application/image"
    assert m["m1"]["width"] is None  # codec fields stay NULL pre-decode


def test_extract_features_deterministic_across_partitionings(media):
    a = MM.extract_features(media.repartition(1), dim=8).collect()
    b = MM.extract_features(media.repartition(7), dim=8).collect()
    fa = {r["media_id"]: r["features"] for r in a}
    fb = {r["media_id"]: r["features"] for r in b}
    assert fa == fb and len(fa) == 20
    assert all(len(v) == 8 and all(0 <= x <= 1 for x in v) for v in fa.values())


def test_extract_features_size_guard(media):
    out = MM.extract_features(media, max_payload_bytes=105).collect()
    assert len(out) == 6  # payload sizes 100..119 → only <=105 survive


def test_resize_schema_and_shape(media):
    out = MM.resize_images(media, width=32, height=32)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "payload", "width", "height",
    ]
    rows = out.collect()
    assert len(rows) == 20 and all(r["width"] == 32 for r in rows)
    assert all(len(r["payload"]) >= 32 for r in rows)


def test_sample_frames_explodes(media):
    out = MM.sample_frames(media, n_frames=3)
    rows = out.collect()
    assert len(rows) == 60
    per = {(r["media_id"], r["frame_idx"]) for r in rows}
    assert len(per) == 60  # unique (id, frame)
    assert all(len(r["frame"]) == 32 for r in rows)  # sha256 stub frames


def test_real_decode_is_a_marked_stub():
    with pytest.raises(NotImplementedError):
        MM._real_decode(b"x", "image")
