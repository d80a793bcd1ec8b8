"""Unigram-LM perplexity filter — the CCNet-style language-model
quality gate (Wenzek et al. 2020 score documents with a KenLM model;
RedPajama/CCNet keep the middle perplexity buckets). No pretrained LM
exists in this environment, so the model is CORPUS-DERIVED — exactly
how a 100 TB pipeline bootstraps one: train token frequencies on the
corpus (or a clean slice), score every document, cut the tail.

No reference counterpart (the reference ends at contact-field
validation, src/validators.cpp) — graft training-data tier.

Scale design (10^12 docs):

- **train**: explode tokens → groupBy(token) count. Partial (map-side)
  aggregation collapses each partition to one combiner row per
  distinct token, so the shuffle carries ≈ |vocab| rows per partition,
  not one row per token occurrence. Top-V cut = orderBy + limit →
  TakeOrderedAndProject (no total sort).
- **score**: explode tokens → BROADCAST join against the V-row model →
  groupBy(doc) sum. A document's exploded tokens stay in its
  partition, so partial agg again collapses to one row per doc per
  partition; the corpus text itself never shuffles.
- **exact aggregation**: per-token NLL is quantized to integer
  MILLINATS (round(-ln(p)·1000)) in the model table, so the per-doc
  score is a BIGINT sum — bit-identical at any parallelism and in any
  engine (float sums are order-dependent; integer sums are not). The
  DuckDB oracle twin reproduces the model and the scores exactly.

Out-of-vocabulary tokens score at the Laplace floor -ln(1/(total+1))
— rarer than every kept token, which is the honest penalty for a
token the model has never seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from acxspark.functions.normalize import canonical_text, tokens_nonempty

__all__ = ["train_unigram_lm", "score_unigram_nll", "dsir_log_weights"]


def _toks(text_col) -> "F.Column":
    return tokens_nonempty(text_col)


def train_unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> DataFrame:
    """→ (token, n, nll_milli) for the top-``vocab_size`` tokens by
    frequency (ties broken by token — deterministic at any
    parallelism), plus the model metadata needed to score OOV: every
    row also carries ``total`` (corpus token count) so scorers derive
    the OOV floor without a second pass.

    nll_milli = round(-ln(n / total) · 1000) — integer millinats.
    """
    tok = docs.select(F.explode(_toks(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n")).collect()[0][0] or 0
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(vocab_size)
    return top.select(
        "token",
        "n",
        F.round(-F.log(F.col("n") / F.lit(float(total))) * 1000)
        .cast("long")
        .alias("nll_milli"),
        F.lit(int(total)).alias("total"),
    )


def score_unigram_nll(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, n_tokens, nll_milli_sum, mean_nll) per document.

    ``mean_nll`` (nats/token, rounded to 4) is the CCNet-style score:
    LOW = the model finds the document ordinary (head tokens), HIGH =
    rare/garbage tokens. The filter keeps a band (CCNet keeps
    head+middle perplexity buckets); the band cut is the caller's
    one-line filter on this column.
    """
    import math

    row = model.select(F.max("total")).collect()[0]
    total = int(row[0]) if row[0] is not None else 0
    oov_milli = round(-math.log(1.0 / (total + 1)) * 1000) if total else 0

    tok = docs.select(
        F.col(id_col),
        F.explode(_toks(F.col(text_col))).alias("token"),
    )
    scored = tok.join(
        F.broadcast(model.select("token", "nll_milli")), "token", "left"
    ).select(
        id_col,
        F.coalesce(F.col("nll_milli"), F.lit(oov_milli)).alias("m"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("m").alias("nll_milli_sum"),
    )
    # right join restores empty-token docs (score 0 over 0 tokens);
    # coalesce BEFORE the mean, or the NULL propagates through round.
    # mean_nll_micro (micronats/token, BIGINT) is the ORACLE-exact
    # mean: floor() of an IEEE double is engine-identical, whereas
    # round(x, 4) tie-handling diverges between engines when the true
    # mean lands exactly on a .00005 boundary (seen at sf0.1).
    # mean_nll (nats/token, double) stays as the convenience column.
    nt = F.coalesce("n_tokens", F.lit(0))
    ms = F.coalesce("nll_milli_sum", F.lit(0))
    ntz = F.greatest(nt, F.lit(1))
    # multiply BEFORE dividing: 1000*sum is an exact integer double
    # (< 2^53), so both engines floor the SAME quotient — the
    # divide-then-multiply order loses a ulp and floors differently
    return per_doc.join(docs.select(id_col), id_col, "right").select(
        id_col,
        nt.alias("n_tokens"),
        ms.alias("nll_milli_sum"),
        F.floor(ms * 1000.0 / ntz).cast("long").alias("mean_nll_micro"),
        (ms / ntz / 1000.0).alias("mean_nll"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_model: DataFrame,
    corpus_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    log w(x) = log p_target(x) − log p_corpus(x), the data-selection
    score that upsamples documents resembling a target domain. With
    unigram models this is Σ_tok (nll_corpus − nll_target) — computed
    here in integer millinats, so the per-doc weight is an order-free
    BIGINT sum (bit-identical at any parallelism).

    → (id, n_tokens, logw_milli_sum, mean_logw). Positive = more
    target-like than the corpus average; the resampler keeps/upsamples
    high scores. Both models BROADCAST into one scoring join each;
    the corpus text never shuffles. OOV tokens take each model's own
    Laplace floor, so a token unknown to BOTH models contributes
    their floor difference (≈ the size ratio of the two corpora).
    """
    import math

    def _floor(model: DataFrame) -> int:
        row = model.select(F.max("total")).collect()[0]
        total = int(row[0]) if row[0] is not None else 0
        return round(-math.log(1.0 / (total + 1)) * 1000) if total else 0

    t_oov, c_oov = _floor(target_model), _floor(corpus_model)
    tok = docs.select(
        F.col(id_col),
        F.explode(_toks(F.col(text_col))).alias("token"),
    )
    scored = (
        tok.join(
            F.broadcast(
                target_model.select("token", F.col("nll_milli").alias("_t"))
            ),
            "token",
            "left",
        )
        .join(
            F.broadcast(
                corpus_model.select("token", F.col("nll_milli").alias("_c"))
            ),
            "token",
            "left",
        )
        .select(
            id_col,
            (
                F.coalesce(F.col("_c"), F.lit(c_oov))
                - F.coalesce(F.col("_t"), F.lit(t_oov))
            ).alias("lw"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("lw").alias("logw_milli_sum"),
    )
    nt = F.coalesce("n_tokens", F.lit(0))
    ms = F.coalesce("logw_milli_sum", F.lit(0))
    ntz = F.greatest(nt, F.lit(1))
    # multiply before dividing (exact integer double), floor (not
    # trunc: ONE well-defined answer incl. negatives) — see the
    # sibling comment in score_unigram_nll
    return per_doc.join(docs.select(id_col), id_col, "right").select(
        id_col,
        nt.alias("n_tokens"),
        ms.alias("logw_milli_sum"),
        F.floor(ms * 1000.0 / ntz).cast("long").alias("mean_logw_micro"),
        (ms / ntz / 1000.0).alias("mean_logw"),
    )
