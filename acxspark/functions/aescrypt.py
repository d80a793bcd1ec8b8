"""AES-256-GCM crypto — file-format parity + a distributed column path.

Closes the last deliberate round-1/2 exclusion: the ``cryptography``
package (baked into this environment) provides AESGCM, so the
reference's file crypto (reference src/crypto_file.cpp:51-124 encrypt,
:127-210 decrypt) is implemented for real, byte-format compatible:

- ``ACXEG1`` container: ``magic(6) || iv(12) || tag(16) || ct`` with a
  32-byte hex key (crypto_file.cpp:86-91);
- ``ACXEG2`` container: ``magic(6) || salt(16) || iters(4 BE) ||
  iv(12) || tag(16) || ct`` with a PBKDF2-HMAC-SHA256(passphrase,
  salt, iters, 32) derived key, default 200000 iterations
  (crypto_file.cpp:96-117).

The file functions are driver-side utilities (the reference encrypts
its single data file; the analog here is encrypting an exported
artifact). The DISTRIBUTED surface is the column pair
:func:`encrypt_col` / :func:`decrypt_col`: Arrow-batched AESGCM per
value with a per-row nonce DERIVED from a caller-supplied unique id
(sha256(key_fp || id)[:12]) — deterministic for oracle/idempotence
checks while structurally preventing GCM nonce reuse across distinct
ids. Encrypting the same value under the same id twice yields the
same bytes (re-runs agree, the determinism invariant); two different
rows never share a nonce.

Import of ``cryptography`` is deferred to call time and raises a
clear error if the runtime lacks it (the library functions stay
importable everywhere).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

_MAGIC_KEY = b"ACXEG1"
_MAGIC_PASS = b"ACXEG2"
_PBKDF2_ITERS = 200000  # reference crypto_file.cpp:98


def _aesgcm(key: bytes):
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "AES-256-GCM requires the 'cryptography' package"
        ) from e
    return AESGCM(key)


def _key_from_hex(key_hex: str) -> bytes:
    key = bytes.fromhex(key_hex)
    if len(key) != 32:
        # reference: "Key must be 32 bytes hex (64 chars)"
        raise ValueError("key must be 32 bytes hex (64 chars)")
    return key


def random_key_hex(n_bytes: int = 32) -> str:
    """Parity with reference random_key_hex (crypto_file.cpp:41-49)."""
    return os.urandom(n_bytes).hex()


def encrypt_file_aes256gcm(in_path: str, out_path: str,
                           key_hex: str | None = None,
                           passphrase: str | None = None,
                           aad: bytes = b"") -> None:
    """Write the reference's ACXEG1 (hex key) or ACXEG2 (passphrase +
    PBKDF2) container. Exactly one of key_hex/passphrase required."""
    if (key_hex is None) == (passphrase is None):
        raise ValueError("provide exactly one of key_hex or passphrase")
    with open(in_path, "rb") as f:
        pt = f.read()
    iv = os.urandom(12)
    if key_hex is not None:
        key = _key_from_hex(key_hex)
        ct_tag = _aesgcm(key).encrypt(iv, pt, aad or None)
        ct, tag = ct_tag[:-16], ct_tag[-16:]
        blob = _MAGIC_KEY + iv + tag + ct
    else:
        salt = os.urandom(16)
        key = hashlib.pbkdf2_hmac(
            "sha256", passphrase.encode(), salt, _PBKDF2_ITERS, dklen=32
        )
        ct_tag = _aesgcm(key).encrypt(iv, pt, aad or None)
        ct, tag = ct_tag[:-16], ct_tag[-16:]
        blob = (_MAGIC_PASS + salt + _PBKDF2_ITERS.to_bytes(4, "big")
                + iv + tag + ct)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)  # reference tmp+rename atomicity


def decrypt_file_aes256gcm(in_path: str, out_path: str,
                           key_hex: str | None = None,
                           passphrase: str | None = None,
                           aad: bytes = b"") -> None:
    """Read either container; auth failure raises (never a silent
    truncated plaintext — reference 'DecryptFinal (auth failed)')."""
    with open(in_path, "rb") as f:
        buf = f.read()
    if len(buf) < 6 + 12 + 16:
        raise ValueError("file too small")
    magic = buf[:6]
    if magic == _MAGIC_KEY:
        if key_hex is None:
            raise ValueError("ACXEG1 container needs key_hex")
        key = _key_from_hex(key_hex)
        iv, tag = buf[6:18], buf[18:34]
        ct = buf[34:]
    elif magic == _MAGIC_PASS:
        if passphrase is None:
            raise ValueError("ACXEG2 container needs passphrase")
        salt = buf[6:22]
        iters = int.from_bytes(buf[22:26], "big")
        iv, tag = buf[26:38], buf[38:54]
        ct = buf[54:]
        key = hashlib.pbkdf2_hmac(
            "sha256", passphrase.encode(), salt, iters, dklen=32
        )
    else:
        raise ValueError(f"unknown container magic {magic!r}")
    pt = _aesgcm(key).decrypt(iv, ct + tag, aad or None)  # raises on tamper
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(pt)
    os.replace(tmp, out_path)


# ------------------------------------------------ distributed column path


def _derive_nonce(key_fp: bytes, context: str, row_id: str) -> bytes:
    # length-prefixed context: ("ab","c") and ("a","bc") must never
    # collapse to the same nonce input
    ctx = context.encode("utf-8")
    return hashlib.sha256(
        key_fp + len(ctx).to_bytes(4, "big") + ctx + row_id.encode("utf-8")
    ).digest()[:12]


def encrypt_col(value_col, id_col, key_hex: str,
                context: str | None = None) -> Column:
    """binary AESGCM(value) with a per-row (context, id)-derived nonce.

    Arrow-batched; the nonce is sha256(key_fingerprint || context ||
    id)[:12], so (a) no two DISTINCT (context, id) pairs ever share a
    nonce under one key — the GCM safety requirement — and (b) the
    ciphertext is a pure function of (key, context, id, value):
    re-runs and different cluster sizes produce byte-identical output
    (the determinism invariant; also what makes the roundtrip
    oracle-checkable).

    ``context`` defaults to the value column's NAME: without it,
    encrypting TWO columns of one table with the same key and id
    column reused every row's nonce for two different plaintexts —
    GCM keystream reuse, which leaks the plaintext XOR. Pass it
    explicitly when ``value_col`` is an expression. Callers must pass
    a UNIQUE id column — reusing ids for different values within one
    context would still reuse a nonce."""
    key = _key_from_hex(key_hex)
    key_fp = hashlib.sha256(key).digest()
    if context is None:
        if not isinstance(value_col, str):
            raise ValueError(
                "encrypt_col: pass context= when value_col is an "
                "expression (the nonce must be domain-separated per "
                "encrypted column)"
            )
        context = value_col

    @pandas_udf(T.BinaryType())
    def _enc(vals: pd.Series, ids: pd.Series) -> pd.Series:
        gcm = _aesgcm(key)
        out = []
        for v, i in zip(vals, ids):
            if v is None or i is None:
                out.append(None)
                continue
            nonce = _derive_nonce(key_fp, context, str(i))
            out.append(nonce + gcm.encrypt(nonce, str(v).encode("utf-8"), None))
        return pd.Series(out)

    return _enc(F.col(value_col) if isinstance(value_col, str) else value_col,
                F.col(id_col) if isinstance(id_col, str) else id_col)


def decrypt_col(cipher_col, key_hex: str) -> Column:
    """string plaintext of :func:`encrypt_col` output (nonce-prefixed
    ct||tag). Auth failure yields NULL for that row, never a partial
    value (poison rows must not kill a 10^12-row stage)."""
    key = _key_from_hex(key_hex)

    @pandas_udf(T.StringType())
    def _dec(blobs: pd.Series) -> pd.Series:
        gcm = _aesgcm(key)
        out = []
        for b in blobs:
            if b is None or len(b) < 12 + 16:
                out.append(None)
                continue
            try:
                out.append(
                    gcm.decrypt(bytes(b[:12]), bytes(b[12:]), None).decode("utf-8")
                )
            except Exception:
                out.append(None)
        return pd.Series(out)

    return _dec(F.col(cipher_col) if isinstance(cipher_col, str) else cipher_col)
