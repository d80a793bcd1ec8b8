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

# unanchored phone-ish pattern: international or 10+ digit runs with
# common separators (the reference only masks dedicated phone fields;
# free text needs a detector)
PHONE_LIKE_RE = r"\+?[0-9][0-9 ()\-\.]{8,}[0-9]"

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
