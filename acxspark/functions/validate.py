"""Validation predicates — pure column expressions.

Parity targets:
- ``is_valid_name``   reference src/validation.cpp:19-28
- ``is_valid_email``  reference src/validation.cpp:30-33
- ``is_valid_phone``  reference src/validation.cpp:63-66
- ``is_email_like``   reference src/cli.cpp:232-235 (search, not match)
- record validity     reference src/cli.cpp:253-275 (name non-empty AND
                      (email absent OR email-like))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from acxspark.functions.normalize import _c, normalize_phone

# reference src/validation.cpp:31 — anchored match
EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"
# reference src/cli.cpp:233 — unanchored search
EMAIL_LIKE_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"


def is_valid_email(col) -> Column:
    return _c(col).rlike(EMAIL_RE)


def is_email_like(col) -> Column:
    return _c(col).rlike(EMAIL_LIKE_RE)


def is_valid_name(col) -> Column:
    """>=2 letters; only alpha / space / ``-`` / ``'`` allowed
    (reference src/validation.cpp:19-28)."""
    col = _c(col)
    only_allowed = col.rlike(r"^[A-Za-z \t\n\r\f\v'-]*$")
    letters = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return (F.length(col) >= 2) & only_allowed & (letters >= 2)


def is_valid_phone(col, default_country: str = "US") -> Column:
    """normalized length >= 10 (reference src/validation.cpp:63-66)."""
    return F.length(normalize_phone(col, default_country)) >= 10


def record_valid(name_col, email_col) -> Column:
    """The fast validate predicate (reference src/cli.cpp:253-275):
    name present & non-empty AND (email null OR email-like)."""
    name_c, email_c = _c(name_col), _c(email_col)
    return (
        name_c.isNotNull()
        & (F.length(name_c) > 0)
        & (email_c.isNull() | is_email_like(email_c))
    )
