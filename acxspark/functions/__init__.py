"""Scalar column functions: normalize / validate / mask / text analysis.

All pure column expressions (JVM-side, whole-stage-codegen eligible)
except where a stateful per-char scan genuinely needs a pandas UDF
(mask_name). Reference parity citations live on each function.
"""
