"""PII masking — the redact stage, vectorized.

The reference ships TWO divergent mask families and we keep both,
named, to avoid silent semantic drift (SURVEY.md §7.3 item 8):

policy masks (reference src/policy.cpp:22-59):
- ``mask_email_policy``: keep first char of local part, ``*`` the rest,
  keep ``@domain`` verbatim; no ``@`` or ``@`` at pos 0 → unchanged.
- ``mask_phone_policy``: keep only digits/``+``; mask all but the last
  4 digits with ``x`` (<=4 digits → all kept).
- ``mask_name``: keep the FIRST alpha char of the whole string, ``*``
  every later alpha char, pass non-alpha through. (Stateful per-char
  scan → pandas UDF.)

redact-cmd masks (reference src/cli.cpp:236-252):
- ``mask_email_redact``: local part > 2 chars → first + ``*``*(n-2) +
  last; <=2 → all ``*``; no ``@`` → every char ``*``.
- ``mask_phone_redact``: ``*`` every digit, keep punctuation.

Everything except mask_name / mask_phone_policy is a pure column
expression; those two use Arrow-batched pandas UDFs (never per-row).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from acxspark.functions.normalize import _c


def mask_email_policy(col) -> Column:
    """reference src/policy.cpp:36-44."""
    col = _c(col)
    at = F.instr(col, "@")  # 1-based; 0 if absent
    local_len = at - 1
    masked = F.concat(
        F.substring(col, 1, 1),
        F.repeat(F.lit("*"), local_len - 1),
        F.substr(col, at),  # '@' + domain
    )
    return F.when(at <= 1, col).otherwise(masked)


def mask_email_redact(col) -> Column:
    """reference src/cli.cpp:236-244."""
    col = _c(col)
    at = F.instr(col, "@")
    local = F.substring(col, 1, at - 1)
    dom = F.substr(col, at + 1)
    n = F.length(local)
    masked_local = F.when(
        n > 2,
        F.concat(F.substring(local, 1, 1), F.repeat(F.lit("*"), n - 2), F.substr(local, n)),
    ).otherwise(F.repeat(F.lit("*"), n))
    return F.when(at == 0, F.repeat(F.lit("*"), F.length(col))).otherwise(
        F.concat(masked_local, F.lit("@"), dom)
    )


def mask_phone_redact(col) -> Column:
    """``*`` every digit, keep punctuation (reference src/cli.cpp:245-252)."""
    return F.regexp_replace(_c(col), r"[0-9]", "*")


@pandas_udf(T.StringType())
def _mask_phone_policy_udf(s: pd.Series) -> pd.Series:
    def one(p):
        if p is None:
            return None
        d = [c for c in p if c.isdigit() or c == "+"]
        digits = sum(c.isdigit() for c in d)
        if digits <= 4:
            return "".join(d)
        to_mask = digits - 4
        out = []
        for c in d:
            if c.isdigit() and to_mask > 0:
                out.append("x")
                to_mask -= 1
            else:
                out.append(c)
        return "".join(out)

    return s.map(one)


def mask_phone_policy(col) -> Column:
    """Keep digits/``+``, mask all but last 4 digits with ``x``
    (reference src/policy.cpp:45-59). The keep-some/mask-others
    positional scan is genuinely stateful → Arrow pandas UDF."""
    return _mask_phone_policy_udf(_c(col))


@pandas_udf(T.StringType())
def _mask_name_udf(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        out, first = [], True
        for c in v:
            if c.isalpha():
                if first:
                    out.append(c)
                    first = False
                else:
                    out.append("*")
            else:
                out.append(c)
        return "".join(out)

    return s.map(one)


def mask_name(col) -> Column:
    """Keep first alpha char overall, ``*`` later alphas, pass through
    non-alpha (reference src/policy.cpp:22-35)."""
    return _mask_name_udf(_c(col))
