"""Multimodal columns: opaque binary payloads + typed metadata.

Graft-brief training-data tier: image/audio/video ride as ``binary``
columns with a struct of metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched functions over ``mapInPandas`` so
each executor touches only its partition of payload bytes — the bytes
never shuffle, only extracted features do.

The actual codec work is STUBBED (no image/audio libraries exist in
this container): ``decode_stub=True`` (default) derives deterministic
pseudo-features from the payload bytes (sha-seeded), so the Spark-side
plumbing — schema, batch shape, partitioning, null handling — is real
and tested, while the codec call sites are single, clearly-marked
functions to swap for PIL/ffmpeg on a real cluster.

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


def _real_decode(payload: bytes, kind: str):  # pragma: no cover - swap point
    """THE codec call site. On a real cluster, replace with PIL /
    soundfile / ffmpeg. This container has none of them."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_stub=True (deterministic fake) or swap _real_decode"
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
    record-size guard, src/storage.cpp:516, at media granularity)."""
    slim = df.select(F.col(id_col), F.col(payload_col)).filter(
        F.length(F.col(payload_col)) <= max_payload_bytes
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
                _stub_features(p, dim) if decode_stub else _real_decode(p, "any")
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

    def gen(batches):
        for b in batches:
            if decode_stub:
                payloads = [
                    None
                    if p is None
                    else hashlib.sha256(p).digest() + bytes(p[: width * height // 64])
                    for p in b[payload_col]
                ]
            else:  # pragma: no cover
                payloads = [_real_decode(p, "image") for p in b[payload_col]]
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
