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

Every mask is a pure column expression (whole-stage codegen, zero
Python in the redact hot path); the two stateful scans
(mask_phone_policy, mask_name) use F.aggregate / regexp identities
rather than pandas UDFs — tools/explain_audit.py asserts no
ArrowEvalPython node appears in the mask query plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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


def mask_phone_policy(col) -> Column:
    """Keep digits/``+``, mask all but last 4 digits with ``x``
    (reference src/policy.cpp:45-59).

    The keep-some/mask-others positional scan is stateful, but still
    expressible JVM-side: filter the string to digits/``+``, then walk
    it with ``F.aggregate`` carrying (digits seen, output) — a
    whole-stage-codegen expression over phone-length strings, which
    beats shipping every row through an Arrow Python worker. The
    former pandas-UDF formulation is the semantics spec (test vectors
    in tests/test_functions.py are unchanged)."""
    col = _c(col)
    kept = F.regexp_replace(col, r"[^0-9+]", "")
    n_digits = F.length(F.regexp_replace(kept, r"[^0-9]", ""))
    to_mask = n_digits - F.lit(4)
    walked = F.aggregate(
        F.split(kept, ""),
        F.struct(F.lit(0).alias("seen"), F.lit("").alias("out")),
        lambda acc, ch: F.struct(
            (acc["seen"] + F.when(ch.rlike("^[0-9]$"), 1).otherwise(0)).alias("seen"),
            F.concat(
                acc["out"],
                F.when(ch.rlike("^[0-9]$") & (acc["seen"] < to_mask), F.lit("x"))
                .otherwise(ch),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(walked)


def mask_name(col) -> Column:
    """Keep first alpha char overall, ``*`` later alphas, pass through
    non-alpha (reference src/policy.cpp:22-35).

    Pure column expressions: the first-alpha position is the length of
    the leading non-letter run; everything after it has its letters
    starred with one regexp_replace. Letters are UNICODE (\\p{L},
    supported identically by java.util.regex and DuckDB's RE2) — the
    reference's std::isalpha is C-locale ASCII, but a PII mask that
    lets 'Ольга' through unmasked is a leak, so the wider class wins
    (this also matches the round-1 pandas-UDF behavior, which used
    Python's Unicode isalpha). The UDF is gone: zero Python in the
    redact stage."""
    col = _c(col)
    fp = F.length(F.regexp_extract(col, r"^[^\p{L}]*", 0)) + 1
    return F.concat(
        F.substr(col, F.lit(1), fp),
        F.regexp_replace(F.substr(col, fp + 1), r"\p{L}", "*"),
    )
