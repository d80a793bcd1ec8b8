"""Normalization functions — pure column expressions (no UDFs).

Parity targets in the reference:
- ``to_lower_ascii``            reference src/validation.cpp:35-39
- trim / whitespace collapse    reference src/utils.cpp:128-133, src/cli.cpp:370-372
- ``normalize_phone_e164``      reference src/validation.cpp:71-89
- text canonicalization for shingling (new, per north_rule)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference src/validation.cpp:74-79 — country → dial code map
_COUNTRY_CC = {"US": "+1", "MX": "+52", "GB": "+44", "ES": "+34", "BR": "+55"}


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def norm_email(col) -> Column:
    """Lowercase + trim — the stored-email normalization
    (reference src/storage.cpp:135)."""
    return F.lower(F.trim(_c(col)))


def phone_digits(col) -> Column:
    """Strip every non-digit (the digits-only kernel normalize_phone
    builds on, reference src/validation.cpp:71-89)."""
    return F.regexp_replace(_c(col), r"[^0-9]", "")


def phone_digits_keep_plus(col) -> Column:
    """The reference CLI's normalize helper, exact (src/cli.cpp:374:
    keep ``c`` when ``isdigit(c) || (c=='+' && o.empty())``): digits
    only, plus a single leading ``+`` when a ``+`` precedes every
    digit — i.e. the first digit-or-plus character in the input is
    ``+``."""
    col = _c(col)
    d = phone_digits(col)
    return F.when(
        col.rlike(r"^[^0-9+]*\+"), F.concat(F.lit("+"), d)
    ).otherwise(d)


def normalize_phone(col, default_country: str = "US") -> Column:
    """E.164-ish normalization (reference src/validation.cpp:71-89):

    - keep digits only → ``d``
    - empty ``d``            → ``d``
    - input begins with ``+`` → ``'+' + d`` (already international)
    - ``len(d) >= 10``        → country dial code + ``d``
    - else                    → ``d`` (too short to infer region)
    """
    col = _c(col)
    cc = _COUNTRY_CC.get(default_country, "+1")
    d = phone_digits(col)
    return (
        F.when(d == "", d)
        .when(F.substring(col, 1, 1) == "+", F.concat(F.lit("+"), d))
        .when(F.length(d) >= 10, F.concat(F.lit(cc), d))
        .otherwise(d)
    )


def canonical_text(col) -> Column:
    """Canonicalize text for shingling: lowercase, collapse whitespace,
    trim. The reference's trim+lower normalization family
    (reference src/cli.cpp:370-374) generalized to documents."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col) -> Column:
    """Whitespace tokenization of canonical text → array<string>.
    NOTE: an empty/whitespace-only doc yields ``['']`` (split's
    behavior); counting consumers want :func:`tokens_nonempty`."""
    return F.split(canonical_text(col), " ")


def tokens_nonempty(col) -> Column:
    """Whitespace tokens of canonical text with empty strings removed
    — an empty/whitespace-only doc yields ``[]``. THE shared
    tokenizer for every token-counting operator (chunking, LM
    filters, decontamination); one definition, not per-module copies
    that must stay in sync by hand. (ngram.py keeps the raw
    :func:`tokens` deliberately: its gram construction and DuckDB
    twin both encode the ``['']`` empty-doc behavior.)"""
    return F.filter(tokens(col), lambda x: x != F.lit(""))
