"""Context-window document chunking — split long documents into
max-token chunks with a fixed overlap (sliding window, stride =
max_tokens − overlap), the training-prep step between cleaning and
sequence packing: packing (operators/packing.py) lays whole docs into
a token budget; chunking splits docs LONGER than the window first so
nothing is truncated.

Public recipe: every LM data pipeline does this (GPT-2/3 data prep,
RedPajama, Dolma); there is no single canonical paper — the sliding
window with overlap is the folklore formulation. No reference
counterpart (the reference ends at contact records) — graft
training-data tier.

Scale design: chunk enumeration is `posexplode(sequence(...))` — the
row multiplication is inherent to the output (one row per chunk), and
everything is JVM-side column expressions (split, slice, array_join);
no UDF, no shuffle beyond the explode's narrow dependency. A
downstream repartition on (doc_id, chunk_id) — or the packing stage's
hash-prefix bucketing — spreads hot documents; the operator itself is
map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from acxspark.functions.normalize import canonical_text, tokens_nonempty

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """→ (id, chunk_id, chunk_text, n_tokens_chunk), ordered windows.

    stride = max_tokens − overlap; chunk i covers token positions
    [i·stride, i·stride + max_tokens). n_chunks =
    max(1, ceil((n − overlap) / stride)) for non-empty docs — the last
    window is allowed to be short rather than re-reading extra overlap
    (deterministic, SQL-replicable). Empty/whitespace-only docs emit
    ZERO chunks (they were gated upstream; a silent empty chunk would
    poison packing).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    toks = tokens_nonempty(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
        )
    )
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        n_chunks.alias("_nc"),
    ).filter(F.col("_nc") > 0)  # sequence(0,-1) would DESCEND in Spark
    chunks = base.select(
        id_col,
        "_toks",
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
            "chunk_id", "_i"
        ),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, max_tokens)
    return chunks.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens_chunk"),
    )
