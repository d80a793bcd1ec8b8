"""Multimodal columns: opaque binary payloads + typed metadata.

Graft-brief training-data tier: image/audio/video ride as ``binary``
columns with a struct of metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched functions over ``mapInPandas`` so
each executor touches only its partition of payload bytes — the bytes
never shuffle, only extracted features do.

Codec status (round 3): WAV (RIFF parse → sample rate/channels/
duration) and PPM (P6 header + nearest-neighbor resize) are decoded
FOR REAL, library-free — see :func:`decode_wav_meta`,
:func:`decode_ppm_meta`, :func:`resize_ppm`. Formats that genuinely
need PIL/soundfile/ffmpeg (jpeg, mp3, video containers) remain behind
the single marked ``_real_decode`` swap point; ``decode_stub=True``
(default for the feature/frame paths) derives deterministic
pseudo-features from the payload bytes so the Spark-side plumbing —
schema, batch shape, partitioning, null handling — is real and tested
either way.

Scale notes:
- payloads are filtered/limited BEFORE the mapInPandas stage so the
  Python workers see only surviving rows (predicate pushdown happens
  in the JVM scan, column pruning keeps other columns out of Arrow);
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds per-batch
  memory: payload_bytes × batch_rows must fit the Python worker.
"""

from __future__ import annotations

import hashlib
import struct as _struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def encode_wav_pcm16(sample_rate: int, n_frames: int, channels: int = 1,
                     samples=None) -> bytes:
    """Minimal PCM-16 WAV encoder — the encode twin of
    :func:`decode_wav_meta`. ``samples=None`` emits silence (the
    original behavior; total size = 44 + n_frames*2*channels bytes);
    pass an int16 array of length n_frames*channels for real audio
    (interleaved little-endian). Used by the ``media_wav_decode`` and
    ``audio_energy_hash_docs`` oracle queries to roundtrip REAL bytes
    against closed-form arithmetic twins in DuckDB."""
    import numpy as np

    block_align = channels * 2
    if samples is None:
        data = bytes(n_frames * block_align)
    else:
        arr = np.asarray(samples, dtype=np.int16)
        if arr.size != n_frames * channels:
            raise ValueError("samples length must be n_frames*channels")
        data = arr.astype("<i2").tobytes()
    fmt = _struct.pack("<HHIIHH", 1, channels, sample_rate,
                       sample_rate * block_align, block_align, 16)
    body = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data)
    return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav_meta(payload: bytes) -> dict:
    """REAL (library-free) RIFF/WAVE parse: sample rate, channels,
    bit depth, frame count, duration. Pure function of the bytes —
    deterministic across runs and parallelism levels.

    RIFF layout (public spec): ``RIFF <u32 size> WAVE`` then chunks of
    ``<4cc> <u32 size> <data>`` (word-aligned). We need ``fmt `` for
    the format fields and ``data`` for the payload length.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = _struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            fmt = _struct.unpack_from("<HHIIHH", payload, body)
        elif cid == b"data":
            data_size = min(size, len(payload) - body)  # tolerate truncation
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("WAVE missing fmt/data chunk")
    _audio_format, channels, sample_rate, byte_rate, block_align, bits = fmt
    if block_align == 0 or sample_rate == 0:
        raise ValueError("WAVE fmt has zero block_align/sample_rate")
    n_frames = data_size // block_align
    return {
        "mime": "audio/wav",
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
    }


def _ppm_header(payload: bytes) -> tuple[dict, int]:
    """Parse a P6 header → (meta, pixel_offset). Whitespace/comment
    handling per the netpbm spec: exactly one whitespace char follows
    the maxval token before the pixel block."""
    if len(payload) < 2 or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens, pos = [], 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, _maxval = (int(t) for t in tokens)
    return {"mime": "image/ppm", "width": width, "height": height}, pos + 1


def decode_ppm_meta(payload: bytes) -> dict:
    """REAL (library-free) binary-PPM (P6) header parse → width/height."""
    return _ppm_header(payload)[0]


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a binary PPM — numpy index map
    over the (h, w, 3) pixel block, re-emitted as a minimal P6. Pure
    function of (bytes, dims): byte-identical across runs/partitions."""
    import numpy as np

    meta, pixel_offset = _ppm_header(payload)
    w0, h0 = meta["width"], meta["height"]
    if len(payload) - pixel_offset < w0 * h0 * 3:
        raise ValueError("truncated PPM pixel block")
    px = np.frombuffer(payload, dtype=np.uint8, count=w0 * h0 * 3,
                       offset=pixel_offset).reshape(h0, w0, 3)
    ri = (np.arange(height) * h0) // height
    ci = (np.arange(width) * w0) // width
    out = px[ri][:, ci]
    return f"P6\n{width} {height}\n255\n".encode() + out.tobytes()


def _real_decode(payload: bytes, kind: str):
    """THE codec call site. WAV (audio) and PPM (image) are decoded
    for real, library-free; container formats that genuinely need
    PIL / soundfile / ffmpeg (jpeg, mp3, video) raise — swap this
    function on a real cluster. The swap point stays a single marked
    function either way."""
    if kind == "audio":
        return decode_wav_meta(payload)
    if kind == "image":
        return decode_ppm_meta(payload)
    raise NotImplementedError(
        f"media codec for kind={kind!r} is not available in this "
        "environment; use decode_stub=True (deterministic fake) or "
        "swap _real_decode"
    )


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-feature vector from payload bytes: sha256
    expanded counter-mode — a pure function of the bytes, so tests can
    assert determinism across runs and parallelism levels."""
    if payload is None:
        return None
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
        out.extend(
            _struct.unpack(">8I", h)[j] / 0xFFFFFFFF for j in range(8)
        )
        i += 1
    return out[:dim]


def attach_media_meta(df: DataFrame, payload_col: str = "payload",
                      kind_col: str = "kind") -> DataFrame:
    """Fill size metadata JVM-side (length() on binary is codegen'd);
    codec-derived fields stay NULL until decode."""
    return df.withColumn(
        "meta",
        F.struct(
            F.concat(F.lit("application/"), F.col(kind_col)).alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "kind",
    max_payload_bytes: int = 64 << 20,
) -> DataFrame:
    """(id, kind, mime, width, height, duration_ms, n_bytes) via a REAL
    decode over mapInPandas — WAV and PPM parsed from bytes, no stub.

    Rows whose payload is not decodable (unsupported kind, corrupt
    bytes) get NULL codec fields and an ``decode_error`` string instead
    of failing the job — at 10^12 docs a poison payload must not kill
    the stage (reference corrupt-line passthrough semantics,
    src/cli.cpp:303-304, at media granularity). Oversized payloads are
    dropped JVM-side before Arrow ever sees them.
    """
    # coalesce: length(NULL) is NULL and a bare <= filter would DROP
    # null-payload rows, while the contract below gives them a
    # decode_error row instead
    slim = df.select(F.col(id_col), F.col(kind_col), F.col(payload_col)).filter(
        F.coalesce(F.length(F.col(payload_col)), F.lit(0)) <= max_payload_bytes
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(kind_col, T.StringType()),
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def gen(batches):
        for b in batches:
            rows = {k: [] for k in ("mime", "width", "height",
                                    "duration_ms", "n_bytes", "decode_error")}
            for kind, p in zip(b[kind_col], b[payload_col]):
                meta, err = None, None
                if p is None:
                    err = "null payload"
                else:
                    try:
                        meta = _real_decode(bytes(p), kind)
                    except (NotImplementedError, ValueError,
                            _struct.error) as e:
                        # struct.error: a truncated RIFF/fmt chunk
                        # fails mid-unpack — poison, not fatal
                        err = str(e)
                meta = meta or {}
                rows["mime"].append(meta.get("mime"))
                rows["width"].append(meta.get("width"))
                rows["height"].append(meta.get("height"))
                rows["duration_ms"].append(meta.get("duration_ms"))
                rows["n_bytes"].append(None if p is None else len(p))
                rows["decode_error"].append(err)
            yield pd.DataFrame({id_col: b[id_col], kind_col: b[kind_col], **rows})

    return slim.mapInPandas(gen, schema=out_schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
    decode_stub: bool = True,
    max_payload_bytes: int = 64 << 20,
) -> DataFrame:
    """(id, features: array<double>) via mapInPandas over payload bytes.

    Oversized payloads are dropped JVM-side first (the reference's
    record-size guard, src/storage.cpp:516, at media granularity);
    null payloads yield NULL features (kept, not dropped).

    ``decode_stub=False`` raises HERE, at plan-build time: the real
    embedding model is a deploy-time swap (the image/audio libraries
    are absent in this environment — see _real_decode's swap point),
    and the old behavior deferred the NotImplementedError to the
    first executor batch."""
    if not decode_stub:
        raise NotImplementedError(
            "extract_features(decode_stub=False) needs a real feature "
            "extractor wired at the _real_decode swap point "
            "(deploy-time dependency; stub path is the tested contract)"
        )
    slim = df.select(F.col(id_col), F.col(payload_col)).filter(
        F.coalesce(F.length(F.col(payload_col)), F.lit(0)) <= max_payload_bytes
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches):
        for b in batches:
            feats = [
                None if p is None else _stub_features(bytes(p), dim)
                for p in b[payload_col]
            ]
            yield pd.DataFrame({id_col: b[id_col], "features": feats})

    return slim.mapInPandas(gen, schema=out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    width: int = 224,
    height: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """(id, payload: binary, width, height) — resize plumbing.

    Stub 'resize' emits a deterministic transform of the input bytes
    (sha-prefixed truncation) with the target dimensions recorded, so
    schema/batching are exercised end-to-end."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _real_resize(p):
        if p is None:
            return None
        try:
            return resize_ppm(bytes(p), width, height)
        except ValueError:
            return None  # poison payload → NULL, never a dead stage

    def gen(batches):
        for b in batches:
            if decode_stub:
                payloads = [
                    None
                    if p is None
                    else hashlib.sha256(p).digest() + bytes(p[: width * height // 64])
                    for p in b[payload_col]
                ]
            else:
                payloads = [_real_resize(p) for p in b[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        gen, schema=out_schema
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """One row per sampled frame: (id, frame_idx, frame: binary).

    The exploded output is the shape a downstream image-embedding
    stage consumes; frame extraction itself is the stubbed codec."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def gen(batches):
        for b in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(b[id_col], b[payload_col]):
                if p is None:
                    continue
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    if decode_stub:
                        frames.append(hashlib.sha256(p + bytes([i])).digest())
                    else:  # pragma: no cover
                        frames.append(_real_decode(p, "video"))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        gen, schema=out_schema
    )


def encode_ppm_gray(width: int, height: int, values) -> bytes:
    """Minimal P6 with R=G=B=values (row-major, len w*h) — the test /
    synthesis inverse of :func:`image_ahash`'s decode path."""
    import numpy as np

    v = np.asarray(values, dtype=np.uint8).reshape(height, width)
    px = np.repeat(v[:, :, None], 3, axis=2)
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def image_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    grid: int = 8,
) -> DataFrame:
    """Perceptual average-hash of P6 image payloads → (id, ahash:long).

    The image near-duplicate key (public aHash recipe): decode,
    integer grayscale ((r+g+b)//3), nearest-neighbor-sample a
    grid×grid lattice (the same index map as :func:`resize_ppm`), set
    bit (i·grid+j) when sample·grid² ≥ Σsamples — ALL INTEGER
    arithmetic, so the hash is bit-identical across partitions, runs,
    and engines (the registry oracle recomputes it in closed form
    from the synthesis formula, pinning the full decode→hash path).
    Near-dup images differ in few bits; feed the hashes to the
    SimHash Hamming-ball machinery (operators/simhash.py) for the
    pair stage. Undecodable payloads → NULL hash (poison-safe).
    """
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("ahash", T.LongType()),
        ]
    )
    g2 = grid * grid
    if g2 > 64:
        # the packed hash is ONE LongType: numpy shifts >= 64 wrap mod
        # 64 on x86, silently aliasing high bits onto low ones — a
        # corrupt "hash" that still looks valid
        raise ValueError(f"grid {grid}: {g2} bits exceed the 64-bit "
                         "ahash (grid must be <= 8)")

    def one(p) -> int | None:
        try:
            meta, off = _ppm_header(p)
            w, h = meta["width"], meta["height"]
            if len(p) - off < w * h * 3 or w < 1 or h < 1:
                return None
            px = np.frombuffer(p, dtype=np.uint8, count=w * h * 3,
                               offset=off).reshape(h, w, 3)
            gray = px.astype(np.int64).sum(axis=2) // 3
            ri = (np.arange(grid) * h) // grid
            ci = (np.arange(grid) * w) // grid
            vals = gray[ri][:, ci].ravel()  # row-major: pos = i*grid+j
            total = int(vals.sum())
            bits = (vals * g2 >= total).astype(np.uint64)
            hash_u = np.uint64(0)
            for pos in range(g2):
                hash_u |= bits[pos] << np.uint64(pos)
            return int(hash_u.astype(np.uint64).view(np.int64))
        except Exception:
            return None

    def gen(batches):
        for b in batches:
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "ahash": pd.array(
                        [one(p) if p is not None else None
                         for p in b[payload_col]],
                        dtype="Int64",
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)


def audio_energy_hash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    buckets: int = 64,
) -> DataFrame:
    """Acoustic fingerprint of PCM-16 WAV payloads → (id, ehash:long).
    ``buckets`` must be <= 64 (one bit per window in one LongType).

    The audio near-duplicate key (energy-profile hash, the public
    chromaprint-family recipe reduced to its integer core): parse the
    REAL PCM block, split frames into ``buckets`` contiguous time
    windows, sum |sample| per window (channel-interleaved samples all
    count — energy is channel-agnostic), set bit b when
    window_energy·buckets ≥ total_energy. ALL integer arithmetic —
    bit-identical across partitions/engines; the registry oracle
    recomputes the hash in closed form from the synthesis formula.
    Trims/re-encodes shift few bits; Hamming-ball pair generation
    reuses the SimHash tier machinery. Undecodable payloads → NULL.
    """
    import numpy as np
    import pandas as pd

    if buckets > 64 or buckets < 1:
        # one bit per window in one LongType; numpy shifts >= 64 wrap
        # mod 64 and would silently alias bits
        raise ValueError(f"buckets {buckets} must be in [1, 64]")

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("ehash", T.LongType()),
        ]
    )

    def one(p) -> int | None:
        try:
            meta = decode_wav_meta(p)
            # locate the data chunk again (decode_wav_meta validated it)
            pos, data_off, data_size = 12, None, 0
            while pos + 8 <= len(p):
                cid = p[pos:pos + 4]
                (sz,) = _struct.unpack("<I", p[pos + 4:pos + 8])
                if cid == b"data":
                    data_off, data_size = pos + 8, sz
                    break
                pos += 8 + sz + (sz & 1)
            if data_off is None:
                return None
            n16 = min(data_size, len(p) - data_off) // 2
            if n16 < 1:
                return None
            sm = np.frombuffer(p, dtype="<i2", count=n16, offset=data_off)
            mag = np.abs(sm.astype(np.int64))
            edges = (np.arange(buckets + 1) * n16) // buckets
            csum = np.concatenate(([0], np.cumsum(mag)))
            win = csum[edges[1:]] - csum[edges[:-1]]
            total = int(csum[-1])
            bits = (win * buckets >= total).astype(np.uint64)
            h = np.uint64(0)
            for b in range(buckets):
                h |= bits[b] << np.uint64(b)
            return int(h.view(np.int64))
        except Exception:
            return None

    def gen(batches):
        for b in batches:
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "ehash": pd.array(
                        [one(p) if p is not None else None
                         for p in b[payload_col]],
                        dtype="Int64",
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)
