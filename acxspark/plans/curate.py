"""The webtext curation plan — the pre-training data-prep chain as a
reusable library surface (the measured job in tools/curation_job.py
calls this; the scaling evidence is BENCH/r3_curation_v3.json).

Chain (every stage optional, all declarative):

  clean gate     lang-id + composite quality + token bounds +
                 repetition filter + Gopher structural rules —
                 ONE map-only scan, plan-audited Exchange-free
  LM band        unigram-LM perplexity scores from a model trained on
                 the gated survivors (CCNet bootstrap); keep a
                 mean-NLL band; model persisted (V rows) + broadcast
  decontaminate  eval-set 8-gram overlap via broadcast semi-join —
                 the corpus never shuffles
  quota sample   sqrt-cap per-host mixing (two-level tournament)
  pack           token-budget sequence packing (two-level prefix sum)

Counters ride the existing jobs via observe() (metrics.Lineage), the
reference's audit-log analog (src/audit.cpp:21-36). No reference
counterpart for the chain itself — the graft training-data tier,
composed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from acxspark.functions import text as TX
from acxspark.functions.repetition import rep_keep_col
from acxspark.functions.text import gopher_rules
from acxspark.functions.url import url_host
from acxspark.metrics import Lineage
from acxspark.operators.decontaminate import (
    benchmark_gram_set,
    contaminated_doc_ids,
)
from acxspark.operators.lmfilter import score_unigram_nll, train_unigram_lm
from acxspark.operators.packing import pack_token_budget
from acxspark.operators.sampling import quota_sample_exact, sqrt_cap_quotas

__all__ = ["CurationResult", "run_curation", "apply_clean_gate"]


def apply_clean_gate(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    quality_min: float = 0.3,
    tok_bounds: tuple[int, int] = (5, 50_000),
    gopher_structural: bool = True,
) -> DataFrame:
    """The stage-1 clean gate as a standalone transform: lang-id +
    composite quality + token bounds + repetition filter + Gopher
    structural rules, one map-only projection + filter. STATELESS —
    applies unchanged to a streaming DataFrame
    (streaming/stream_ops.streaming_clean_gate is this function)."""
    g = gopher_rules(F.col(text_col))
    structural_ok = (
        g["r_hash"] & g["r_ellipsis"] & g["r_bullet"]
        & g["r_ellipsis_end"] & g["r_alpha"]
        if gopher_structural
        else F.lit(True)
    )
    return docs.select(
        F.col(id_col),
        F.col(text_col),
        url_host(F.col(id_col)).alias("host"),
        TX.lang_id(F.col(text_col)).alias("lang_pred"),
        TX.quality_score(F.col(text_col)).alias("quality"),
        TX.token_count_ws(F.col(text_col)).cast("long").alias("tok_ws"),
        rep_keep_col(F.col(text_col), n=2, min_grams=20).alias("rep_keep"),
        structural_ok.alias("gopher_ok"),
    ).filter(
        (F.col("lang_pred") != "und")
        & (F.col("quality") >= quality_min)
        & F.col("tok_ws").between(*tok_bounds)
        & F.col("rep_keep")
        & F.col("gopher_ok")
    )


@dataclass
class CurationResult:
    survivors: DataFrame        # (id, host, tok_ws) post all gates
    packed: DataFrame | None    # packing layout, or None if budget unset
    lineage: Lineage
    _persisted: list = field(default_factory=list)

    def release(self) -> None:
        for df in self._persisted:
            df.unpersist()


def run_curation(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    quality_min: float = 0.3,
    tok_bounds: tuple[int, int] = (5, 50_000),
    gopher_structural: bool = True,
    lm_nll_band: tuple[float, float] | None = (0.0, 12.0),
    vocab_size: int = 50_000,
    eval_docs: DataFrame | None = None,
    quota_sample: bool = True,
    pack_budget: int | None = 2048,
    seed: int = 11,
    lineage_path: str | None = None,
) -> CurationResult:
    """Run the curation chain; see module docstring for stage order.

    ``lm_nll_band=None`` skips the LM stage; ``eval_docs=None`` skips
    decontamination; ``quota_sample=False`` keeps all survivors;
    ``pack_budget=None`` skips packing (``packed`` is None).
    Deterministic at any parallelism (ladder-asserted: identical
    kept/sampled/stream_tokens/checksum at 1/4/32 cores).
    """
    lin = Lineage(lineage_path)
    persisted: list[DataFrame] = []

    gated = apply_clean_gate(
        docs, id_col, text_col, quality_min, tok_bounds, gopher_structural
    )
    gated = lin.observe(gated, "clean_gate").persist()
    persisted.append(gated)

    if lm_nll_band is not None:
        lo, hi = lm_nll_band
        # persist the V-row model: consumed twice (OOV floor probe +
        # broadcast build) — unpersisted it re-runs the token
        # explode+groupBy each time (measured 2-12%/level, BASELINE §11)
        model = train_unigram_lm(gated, text_col, vocab_size=vocab_size).persist()
        persisted.append(model)
        nll = score_unigram_nll(gated, model, id_col=id_col, text_col=text_col)
        gated = lin.observe(
            gated.join(
                nll.filter(F.col("mean_nll").between(lo, hi)).select(id_col),
                id_col,
                "left_semi",
            ),
            "lm_band",
        )

    if eval_docs is not None:
        flagged = contaminated_doc_ids(
            gated, benchmark_gram_set(eval_docs, text_col, 8),
            id_col, text_col, 8, hashed=True,
        )
        gated = gated.join(F.broadcast(flagged), id_col, "left_anti")

    survivors = lin.observe(
        gated.select(id_col, "host", "tok_ws"), "survivors"
    ).persist()
    persisted.append(survivors)

    sampled = (
        quota_sample_exact(
            survivors, "host", id_col,
            sqrt_cap_quotas(survivors, "host"), seed=seed,
        )
        if quota_sample
        else survivors
    )
    packed = (
        # the operators now domain-separate their own hash streams
        # (sampling.seeded_order_hash), so the chain seed passes
        # through unscrambled — a caller varying `seed` still gets a
        # different packing order, and sample/pack independence is the
        # operators' guarantee, not this caller's
        pack_token_budget(sampled, "tok_ws", id_col, budget=pack_budget,
                          seed=seed)
        if pack_budget
        else None
    )
    return CurationResult(
        survivors=survivors, packed=packed, lineage=lin, _persisted=persisted
    )
