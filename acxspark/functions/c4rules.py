"""C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2) —
the most-cited webtext cleaning recipe, as pure column expressions.

C4 cleans at LINE granularity then drops whole documents:

- keep a line only if it ends in terminal punctuation (. ! ? ")
- keep a line only if it has ≥ 5 words
- drop the whole page if it has < 3 surviving sentences-lines
- drop the page if it contains a bad phrase ("lorem ipsum", the
  curly brace "{" — a JS/code tell — or policy boilerplate like
  "terms of use" / "privacy policy" / "cookie policy" / "uses
  cookies"; the paper's "List-of-Dirty-Words" blocklist is a
  plug-point, represented here by this deterministic short list)

No reference counterpart (the reference ends at contact fields) —
graft training-data tier. Zero shuffle: every rule is a higher-order
array expression over the line split; reassembly is an array_join of
the surviving lines in original order (no explode, no window). The
DuckDB oracle twin (`c4_clean_docs`) replicates every rule verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["c4_clean", "c4_clean_docs_df", "BAD_PHRASES"]

# deterministic stand-in for the paper's blocklists (lowercase match)
BAD_PHRASES = [
    "lorem ipsum",
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "{",
]

_TERMINALS = (".", "!", "?", '"')


def _line_keep(x: Column) -> Column:
    """C4 line rule: ends in terminal punctuation AND ≥ 5 words."""
    t = F.rtrim(x)
    ends_ok = None
    for p in _TERMINALS:
        e = t.endswith(F.lit(p))
        ends_ok = e if ends_ok is None else (ends_ok | e)
    words = F.size(F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != F.lit("")))
    return ends_ok & (words >= 5)


def c4_clean(text_col, min_sentences: int = 3) -> dict:
    """→ dict of Columns: ``clean_text`` (surviving lines, original
    order), ``n_lines``, ``n_kept``, ``has_bad_phrase``, ``keep``
    (≥ ``min_sentences`` surviving lines AND no bad phrase).
    """
    raw = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.split(raw, "\n")
    kept = F.filter(lines, _line_keep)
    lower = F.lower(raw)
    bad = None
    for p in BAD_PHRASES:
        b = lower.contains(F.lit(p))
        bad = b if bad is None else (bad | b)
    n_kept = F.size(kept)
    return {
        "clean_text": F.array_join(kept, "\n"),
        "n_lines": F.size(lines),
        "n_kept": n_kept,
        "has_bad_phrase": bad,
        "keep": (n_kept >= min_sentences) & ~bad,
    }


def c4_clean_docs_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sentences: int = 3,
) -> DataFrame:
    """Apply :func:`c4_clean` as one map-only projection."""
    cols = c4_clean(text_col, min_sentences=min_sentences)
    return docs.select(
        F.col(id_col), *[v.alias(k) for k, v in cols.items()]
    )
