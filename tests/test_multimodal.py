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


def test_real_decode_swap_point_still_marked_for_video():
    """Formats that genuinely need external libs (video containers)
    keep the single marked NotImplementedError swap point; corrupt
    bytes for supported kinds raise ValueError, not silence."""
    with pytest.raises(NotImplementedError):
        MM._real_decode(b"x", "video")
    with pytest.raises(ValueError):
        MM._real_decode(b"x", "image")  # not a PPM
    with pytest.raises(ValueError):
        MM._real_decode(b"x", "audio")  # not a WAV


def _wav_bytes(sample_rate=8000, channels=1, bits=16, n_frames=4000) -> bytes:
    """A real 16-bit PCM WAV file, built from the RIFF spec by hand."""
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = bytes(n_frames * block_align)  # silence
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _ppm_bytes(width=3, height=2) -> bytes:
    header = f"P6\n# a comment\n{width} {height}\n255\n".encode()
    return header + bytes(width * height * 3)


def test_decode_wav_meta_real_bytes():
    """The graduated codec: a hand-built PCM WAV parses byte-for-byte
    deterministically — 0.5 s at 8 kHz mono 16-bit."""
    meta = MM.decode_wav_meta(_wav_bytes(sample_rate=8000, n_frames=4000))
    assert meta == {"mime": "audio/wav", "channels": 1, "sample_rate": 8000,
                    "bits_per_sample": 16, "n_frames": 4000,
                    "duration_ms": 500}
    stereo = MM.decode_wav_meta(
        _wav_bytes(sample_rate=44100, channels=2, n_frames=44100)
    )
    assert stereo["channels"] == 2 and stereo["duration_ms"] == 1000
    # determinism: same bytes, same result
    assert MM.decode_wav_meta(_wav_bytes()) == MM.decode_wav_meta(_wav_bytes())


def test_decode_ppm_meta_real_bytes():
    assert MM.decode_ppm_meta(_ppm_bytes(640, 480)) == {
        "mime": "image/ppm", "width": 640, "height": 480
    }


def test_decode_media_meta_end_to_end(spark):
    """REAL decode through the Spark mapInPandas plumbing: WAV and PPM
    rows get codec fields, a video row gets NULLs + decode_error
    (poison payloads must not kill the stage)."""
    rows = [
        ("a", "audio", _wav_bytes(sample_rate=16000, n_frames=8000)),
        ("i", "image", _ppm_bytes(32, 16)),
        ("v", "video", b"\x00\x01\x02"),
        ("c", "audio", b"not a wav"),
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, payload binary")
    out = {r["media_id"]: r for r in MM.decode_media_meta(df).collect()}
    assert out["a"]["mime"] == "audio/wav" and out["a"]["duration_ms"] == 500
    assert out["i"]["width"] == 32 and out["i"]["height"] == 16
    assert out["v"]["mime"] is None and "video" in out["v"]["decode_error"]
    assert out["c"]["mime"] is None and out["c"]["decode_error"]
    assert all(out[k]["n_bytes"] == len(p) for k, _, p in rows)


def test_resize_ppm_real_and_through_spark(spark):
    """REAL nearest-neighbor PPM resize: downsample a 4x4 gradient to
    2x2 and check exact pixel selection; then the same through the
    resize_images(decode_stub=False) Spark path."""
    import numpy as np

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    src = b"P6\n4 4\n255\n" + px.tobytes()
    out = MM.resize_ppm(src, 2, 2)
    meta = MM.decode_ppm_meta(out)
    assert (meta["width"], meta["height"]) == (2, 2)
    got = np.frombuffer(out[out.index(b"255\n") + 4:], dtype=np.uint8).reshape(2, 2, 3)
    # nearest-neighbor with ri=[0,2], ci=[0,2]
    assert (got == px[[0, 2]][:, [0, 2]]).all()

    df = spark.createDataFrame(
        [("ok", src), ("bad", b"P6 garbage")],
        "media_id string, payload binary",
    )
    rows = {r["media_id"]: r for r in
            MM.resize_images(df, width=2, height=2, decode_stub=False).collect()}
    assert bytes(rows["ok"]["payload"]) == out
    assert rows["bad"]["payload"] is None  # poison → NULL, stage survives


def test_image_ahash_hand_computed(spark):
    from acxspark.operators.multimodal import encode_ppm_gray, image_ahash

    # 8x8 image, left half dark (10), right half bright (200):
    # mean = 105 -> bright bits set. pos = i*8+j, bright at j>=4.
    vals = [[10] * 4 + [200] * 4 for _ in range(8)]
    flat = [v for row in vals for v in row]
    df = spark.createDataFrame(
        [(1, encode_ppm_gray(8, 8, flat))], "media_id long, payload binary"
    )
    h = image_ahash(df).collect()[0]["ahash"]
    import numpy as np

    want = np.uint64(0)
    for i in range(8):
        for j in range(4, 8):
            want |= np.uint64(1) << np.uint64(i * 8 + j)
    assert h == int(want.view(np.int64))


def test_image_ahash_near_dup_small_hamming(spark):
    from acxspark.operators.multimodal import encode_ppm_gray, image_ahash

    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(32, 32))
    tweak = base.copy()
    tweak[:2, :2] = 255  # small corner edit
    other = rng.integers(0, 256, size=(32, 32))
    df = spark.createDataFrame(
        [(1, encode_ppm_gray(32, 32, base.ravel())),
         (2, encode_ppm_gray(32, 32, tweak.ravel())),
         (3, encode_ppm_gray(32, 32, other.ravel()))],
        "media_id long, payload binary",
    )
    h = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    ham12 = bin((h[1] ^ h[2]) & (2**64 - 1)).count("1")
    ham13 = bin((h[1] ^ h[3]) & (2**64 - 1)).count("1")
    assert ham12 <= 6 < ham13


def test_image_ahash_poison_payloads_null(spark):
    from acxspark.operators.multimodal import encode_ppm_gray, image_ahash

    df = spark.createDataFrame(
        [(1, b"not a ppm"), (2, None), (3, b"P6\n4 4\n255\nshort"),
         (4, encode_ppm_gray(4, 4, list(range(16))))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] is not None


def test_audio_energy_hash_hand_computed(spark):
    from acxspark.operators.multimodal import audio_energy_hash, encode_wav_pcm16

    import numpy as np

    # 128 frames: first half silent, second half loud -> bits 32..63 set
    s = np.concatenate([np.zeros(64), np.full(64, 1000)]).astype(np.int16)
    df = spark.createDataFrame(
        [(1, encode_wav_pcm16(8000, 128, 1, samples=s))],
        "media_id long, payload binary",
    )
    h = audio_energy_hash(df).collect()[0]["ehash"]
    want = np.uint64(0)
    for b in range(32, 64):
        want |= np.uint64(1) << np.uint64(b)
    assert h == int(want.view(np.int64))


def test_audio_energy_hash_near_dup_and_poison(spark):
    from acxspark.operators.multimodal import audio_energy_hash, encode_wav_pcm16

    import numpy as np

    rng = np.random.default_rng(9)
    base = rng.integers(-2000, 2000, size=512).astype(np.int16)
    tweak = base.copy()
    tweak[:8] = 0  # tiny edit at the head
    other = rng.integers(-2000, 2000, size=512).astype(np.int16)
    df = spark.createDataFrame(
        [(1, encode_wav_pcm16(8000, 512, 1, samples=base)),
         (2, encode_wav_pcm16(8000, 512, 1, samples=tweak)),
         (3, encode_wav_pcm16(8000, 512, 1, samples=other)),
         (4, b"not audio"), (5, None)],
        "media_id long, payload binary",
    )
    h = {r["media_id"]: r["ehash"] for r in audio_energy_hash(df).collect()}
    ham12 = bin((h[1] ^ h[2]) & (2**64 - 1)).count("1")
    ham13 = bin((h[1] ^ h[3]) & (2**64 - 1)).count("1")
    assert ham12 <= 6 < ham13
    assert h[4] is None and h[5] is None


def test_truncated_fmt_chunk_is_poison_not_fatal(spark):
    """A RIFF payload whose fmt chunk claims 16 bytes but truncates
    mid-unpack raises struct.error — poison row, never a dead stage."""
    import struct

    from acxspark.operators.multimodal import decode_media_meta

    bad = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + b"\x01\x00")
    df = spark.createDataFrame([("m1", "audio", bytearray(bad))],
                               "media_id string, kind string, payload binary")
    row = decode_media_meta(df).first()
    assert row["decode_error"] is not None
    assert row["mime"] is None


def test_null_payload_gets_decode_error_row(spark):
    """NULL payloads must surface as decode_error rows, not vanish in
    the size pre-filter (length(NULL) is NULL)."""
    from acxspark.operators.multimodal import decode_media_meta, extract_features

    df = spark.createDataFrame(
        [("m1", "audio", None)],
        "media_id string, kind string, payload binary",
    )
    rows = decode_media_meta(df).collect()
    assert len(rows) == 1 and rows[0]["decode_error"] == "null payload"
    f = extract_features(df).collect()
    assert len(f) == 1 and f[0]["features"] is None


def test_hash_width_guards(spark):
    """Packed 64-bit hashes must refuse configs whose bit count
    overflows the word (numpy shifts >= 64 silently wrap)."""
    import pytest as _pytest

    from acxspark.operators.multimodal import audio_energy_hash, image_ahash

    df = spark.createDataFrame([("m1", bytearray(b"x"))],
                               "media_id string, payload binary")
    with _pytest.raises(ValueError, match="grid"):
        image_ahash(df, grid=16)
    with _pytest.raises(ValueError, match="buckets"):
        audio_energy_hash(df, buckets=128)


def test_extract_features_real_decode_raises_early(spark):
    import pytest as _pytest

    from acxspark.operators.multimodal import extract_features

    df = spark.createDataFrame([("m1", bytearray(b"x"))],
                               "media_id string, payload binary")
    with _pytest.raises(NotImplementedError, match="swap point"):
        extract_features(df, decode_stub=False)
