"""Crypto/identity scalar function tests (reference src/utils.cpp,
src/hmac.cpp parity)."""

from __future__ import annotations

import hashlib
import hmac
import re

from pyspark.sql import functions as F

from acxspark.functions import crypto as C


def test_sha256_matches_hashlib(spark):
    df = spark.createDataFrame([("abc",), ("",)], "v string")
    got = {r["v"]: r["h"] for r in df.select("v", C.sha256_hex("v").alias("h")).collect()}
    assert got["abc"] == hashlib.sha256(b"abc").hexdigest()
    assert got[""] == hashlib.sha256(b"").hexdigest()


def test_hmac_matches_stdlib(spark):
    key = b"secret-key"
    df = spark.createDataFrame([("payload",), (None,)], "v string")
    got = [r["h"] for r in df.select(C.hmac_sha256_hex("v", key).alias("h")).collect()]
    assert got[0] == hmac.new(key, b"payload", hashlib.sha256).hexdigest()
    assert got[1] is None


def test_deterministic_id_shape_and_stability(spark):
    df = spark.createDataFrame([(1,), (2,), (1,)], "k long")
    ids = [r["i"] for r in df.select(C.deterministic_id("k").alias("i")).collect()]
    assert ids[0] == ids[2] and ids[0] != ids[1]  # pure function of key
    assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}", ids[0])


def test_now_iso_format(spark):
    row = spark.range(1).select(C.now_iso8601_utc().alias("t")).collect()[0]
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", row["t"])
