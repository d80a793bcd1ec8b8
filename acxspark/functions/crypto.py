"""Crypto/identity scalar functions.

Parity targets:
- ``sha256_hex``      reference src/utils.cpp:75-120 (from-scratch
                      SHA-256) → built-in ``sha2`` (JVM, codegen)
- ``hmac_sha256_hex`` reference src/hmac.cpp:14-53 — no Spark builtin,
                      so an Arrow-batched UDF over Python's stdlib
                      ``hmac`` (NOT per-row Python in the plan sense:
                      one UDF node, vectorized batches)
- ``deterministic_id``reference uuid_v4 (src/utils.cpp:57-71) is
                      random; at 10^12 docs a random id breaks
                      re-run reproducibility, so ids are derived from
                      content: uuid-SHAPED hex of sha2(key) — stable
                      across runs and cluster sizes
- ``now_iso8601_utc`` reference src/utils.cpp:48-55 — second-resolution
                      UTC string (session TZ pinned UTC)

AES-256-GCM file + column crypto (reference src/crypto_file.cpp) is
implemented in :mod:`acxspark.functions.aescrypt` (round 3 — the
``cryptography`` package turned out to be available, closing the
last deliberate exclusion).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from acxspark.functions.normalize import _c


def sha256_hex(col) -> Column:
    return F.sha2(_c(col), 256)


def make_hmac_udf(key: bytes):
    """HMAC-SHA256 hex of a string column under a fixed key."""

    @pandas_udf(T.StringType())
    def _hmac_udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else _hmac.new(key, v.encode("utf-8"), hashlib.sha256).hexdigest()
        )

    return _hmac_udf


def hmac_sha256_hex(col, key: bytes) -> Column:
    return make_hmac_udf(key)(_c(col))


def deterministic_id(col) -> Column:
    """UUID-shaped (8-4-4-4-12) hex derived from sha2 of the key —
    version nibble pinned to '4' for shape parity with the reference's
    v4 ids, but a pure function of content (re-runs agree)."""
    h = F.sha2(_c(col).cast("string"), 256)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("4"), F.substring(h, 14, 3)),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def now_iso8601_utc() -> Column:
    """UTC second-resolution ISO-8601 string (reference format
    ``YYYY-MM-DDTHH:MM:SSZ``)."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'")
