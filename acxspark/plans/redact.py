"""Redact stage — vectorized PII masking applied post-clustering.

The reference's redact command rewrites contact fields with masked
variants (src/cli.cpp:236-252) and its policy engine applies
mask_email/mask_phone/mask_name per policy file (src/policy.cpp:22-59).
Here the stage is a pure DataFrame → DataFrame fn applied to the
survivor set AFTER clustering (north_rule: "the redact stage becomes a
vectorized PII-masking UDF applied post-clustering") — masking before
dedup would change content hashes and split clusters.

Free-text PII (emails/phones embedded in document text) is scrubbed
with regexp_replace — JVM-side, codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acxspark.functions.mask import (
    mask_email_policy,
    mask_email_redact,
    mask_name,
    mask_phone_policy,
    mask_phone_redact,
)
from acxspark.functions.validate import EMAIL_LIKE_RE

# unanchored phone-ish detector (the reference only masks dedicated
# phone fields; free text needs one). Structural, not "any long digit
# run": three alternatives — international (+CC then 1-4 separated
# groups), area-code ((nn[nn]) prefix), and local (nnn-nnnn[nnnn]) —
# so ISO dates ('2020-01-01'), timestamps ('10:00:00'), and invoice
# ids ('INV-2024-00123') no longer scrub to [PHONE]. Word boundaries
# stop mid-number matches ('024-0012' inside '2024-00123'). RE2-safe
# (no lookarounds) because the DuckDB oracle twin runs the SAME
# pattern; \b and (?:) are common to RE2 and java.util.regex.
# Known limit: hyphenated ISBN segments like '306-40615' still look
# structurally phone-like and are scrubbed.
PHONE_LIKE_RE = (
    r"\+\d{7,15}\b"                                  # E.164 +CCnnnnnnnnn
    r"|\+\d{1,3}(?:[ .\-]\(?\d{1,6}\)?){1,4}\b"      # +CC g [g g g]
    r"|\(\d{2,4}\)[ .\-]?\d{3,4}(?:[ .\-]?\d{2,6})?\b"  # (area) nnn-nnnn
    r"|\b\d{3}[ .\-](?:\d{3}[ .\-]\d{2,6}|\d{4,8})\b"   # nnn-nnn-nnnn / nnn-nnnnnn
)

_FIELD_MASKS = {
    "email": {"policy": mask_email_policy, "redact": mask_email_redact},
    "phone": {"policy": mask_phone_policy, "redact": mask_phone_redact},
    "name": {"policy": mask_name, "redact": mask_name},
}


def redact_fields(df: DataFrame, field_kinds: dict[str, str],
                  variant: str = "policy") -> DataFrame:
    """Mask typed PII columns in place.

    field_kinds: column → kind ('email' | 'phone' | 'name');
    variant: 'policy' (src/policy.cpp) or 'redact' (src/cli.cpp) —
    the two reference mask families, kept distinct (SURVEY §7.3.8)."""
    out = df
    for col, kind in field_kinds.items():
        fn = _FIELD_MASKS[kind][variant]
        out = out.withColumn(col, fn(F.col(col)))
    return out


def scrub_text(df: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace email-like and phone-like spans in free text with typed
    placeholders — pure regexp_replace, whole-stage codegen."""
    out_col = out_col or text_col
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_LIKE_RE, "[EMAIL]"),
        PHONE_LIKE_RE,
        "[PHONE]",
    )
    return df.withColumn(out_col, scrubbed)
