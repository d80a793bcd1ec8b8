"""Benchmark decontamination — flag training documents that share a
long token n-gram with an evaluation/benchmark set, the standard
pre-training hygiene pass (GPT-3 appendix C / PaLM-style 8-gram
overlap). Complements the dedup tiers: dedup removes doc-vs-doc
redundancy, decontamination removes doc-vs-EVAL leakage.

Scale shape: the benchmark side is small (eval suites are ~10^5-10^6
grams) and the corpus side is 10^12 docs — so the right plan is a
BROADCAST semi-join of the corpus's exploded grams against the
benchmark gram set: the corpus streams map-only, zero shuffle, and
the only reduction is the final distinct on flagged doc ids (a
shuffle of the tiny contaminated subset). With ``hashed=True`` the
join key is xxhash64(gram) — 8 bytes instead of the gram string —
which is what the broadcast table should hold at real benchmark
sizes; hashed and exact modes are proven equal in pytest (a 64-bit
collision adds a false flag at ~n²/2⁶⁴ odds — acceptable for a
contamination REMOVAL pass, which only ever over-removes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from acxspark.functions.normalize import canonical_text, tokens_nonempty
from acxspark.functions.repetition import gram_hashes


def token_ngrams(text_col: Column, n: int) -> Column:
    """Array of space-joined token n-grams of the canonical text —
    pure column expressions (split → slice windows → concat), no UDF.
    Documents shorter than n tokens yield an empty array. This is the
    EXACT (string) path; the hashed hot path below never builds these
    strings."""
    toks = tokens_nonempty(text_col)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def token_ngram_hashes(text_col: Column, n: int) -> Column:
    """xxhash64 chain of each token n-gram as ``array<long>`` — the
    corpus-side hot path. Shares ``gram_hashes`` (zip_with fold over
    shifted token slices, functions/repetition.py) so NO gram string
    is ever allocated; measured ~15x cheaper than hashing the
    concat_ws strings on a 40k-doc corpus."""
    toks = tokens_nonempty(text_col)
    return gram_hashes(toks, n)


def _hash_token_seq(toks: Column) -> Column:
    """Fold a token array into the SAME xxhash64 chain
    ``token_ngram_hashes`` produces for one gram: h1 = xxhash64(t1),
    h_j = xxhash64(h_{j-1}, t_j). Used to re-key the (tiny) benchmark
    gram strings onto the hashed join key without re-deriving them
    from the original benchmark text."""
    return F.aggregate(
        toks,
        F.lit(None).cast("long"),
        lambda acc, x: F.when(acc.isNull(), F.xxhash64(x)).otherwise(
            F.xxhash64(acc, x)
        ),
    )


def benchmark_gram_set(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-grams of the benchmark set → one-column DataFrame
    ``gram`` (the broadcast side)."""
    return (
        bench.select(F.explode(token_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contaminated_doc_ids(
    docs: DataFrame,
    bench_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hashed: bool = False,
) -> DataFrame:
    """Distinct ids of documents sharing >= 1 token n-gram with the
    benchmark. The corpus side explodes its grams and semi-joins the
    BROADCAST benchmark set — map-only over the corpus; only flagged
    ids reach the final distinct."""
    if hashed:
        grams = docs.select(
            F.col(id_col),
            F.explode(token_ngram_hashes(F.col(text_col), n)).alias("gk"),
        )
        bg = bench_grams.select(
            _hash_token_seq(F.split(F.col("gram"), " ")).alias("gk")
        ).distinct()
    else:
        grams = docs.select(
            F.col(id_col),
            F.explode(token_ngrams(F.col(text_col), n)).alias("gk"),
        )
        bg = bench_grams.withColumnRenamed("gram", "gk")
    return (
        grams.join(F.broadcast(bg), "gk", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hashed: bool = True,
) -> DataFrame:
    """Training corpus minus benchmark-overlapping documents: anti-join
    on the contaminated id set (itself tiny, so the anti-join
    broadcasts too)."""
    bad = contaminated_doc_ids(
        docs, benchmark_gram_set(bench, text_col, n), id_col, text_col, n, hashed
    )
    return docs.join(F.broadcast(bad), id_col, "left_anti")
