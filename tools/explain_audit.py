"""Physical-plan audit: capture .explain('formatted') for headline
queries and assert the plan properties the 100 TB case depends on.

Writes docs/PLANS.md. Checks:
- parquet scans carry PushedFilters / pruned ReadSchema where expected;
- dimension joins broadcast (q5);
- whole-stage codegen spans exist on the hot paths;
- orderBy+limit compiles to TakeOrderedAndProject (no total sort).

Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from acxspark import queries as Q  # noqa: E402
from acxspark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

AUDITS = {
    "q1_pricing_summary": ["PushedFilters: [IsNotNull(l_shipdate)", "Batched: true", "HashAggregate"],
    "q3_top_orders": ["TakeOrderedAndProject", "PushedFilters"],
    "q5_nation_revenue": ["BroadcastHashJoin", "EqualTo(r_name,ASIA)"],
    "prune_by_date": ["PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"],
    "limit_topk_parts": ["TakeOrderedAndProject"],
    "substring_search": ["PushedFilters", "EqualTo(c_mktsegment,MACHINERY)"],
    "first_wins_dedup_docs": ["ReadSchema: struct<doc_id:bigint,text:string>", "Window", "Batched: true"],
    "anti_join_new_customers": ["LeftAnti", "ReadSchema: struct<o_custkey:bigint>"],
    "window_top3_orders_per_cust": [
        "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"
    ],
    "ann_cosine_topk": ["BroadcastNestedLoopJoin", "ReadSchema: struct<vec_id:bigint,embedding:array<float>>"],
    "minhash_lsh_pairs_docs": ["ArrowEvalPython", "ReadSchema: struct<doc_id:bigint,text:string>"],
    # the redact stage is pure column expressions — NO Python worker
    # may appear in any mask plan (mask_name/mask_phone_policy were
    # pandas UDFs until round 2)
    "mask_name_q": {"must": ["Batched: true"], "forbid": ["ArrowEvalPython", "BatchEvalPython"]},
    "mask_phone_policy_q": {"must": ["Batched: true"], "forbid": ["ArrowEvalPython", "BatchEvalPython"]},
    # round 3: the hardened hyperplane-LSH path must join candidates
    # on the band key via shuffle hash/sort-merge (equi-join) — a
    # CartesianProduct or nested loop anywhere means the bucketing
    # fell out of the plan
    "ann_lsh_near_dup": {
        "must": ["ReadSchema: struct<vec_id:bigint,embedding:array<float>>"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    # round 3: IVF probe is an EQUI-join on the cell id (broadcast
    # hash join), never the nested loop an array_contains probe plans
    "ann_ivf_topk": {
        "must": ["BroadcastHashJoin", "ivf_cluster"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    # round 3: the cross-implementation SimHash check runs the fused
    # kernel (ArrowEvalPython) and the 64 column-expr bit votes in ONE
    # aggregated scan — no join, no shuffle of shingle arrays
    "simhash_crosscheck": {
        "must": ["ArrowEvalPython", "HashAggregate"],
        "forbid": ["CartesianProduct", "SortMergeJoin"],
    },
    # round 3 (late): the composed cleaning gate and the repetition
    # filter are ZERO-shuffle map-only scans — any Exchange means a
    # column expression regressed into a join/groupBy
    "webtext_clean_gate": {
        "must": ["Batched: true"],
        "forbid": ["Exchange", "ArrowEvalPython", "BatchEvalPython"],
    },
    "repetition_filter_docs": {
        "must": ["Batched: true"],
        "forbid": ["Exchange", "ArrowEvalPython", "BatchEvalPython"],
    },
    # vocabulary top-k: partial agg + per-partition top-k, no total sort
    "vocab_topk_docs": ["TakeOrderedAndProject", "HashAggregate"],
    # canonical-URL dedup: ONE shuffle, argmax combines map-side
    # (partial_max of the keep-struct BEFORE the exchange — struct max
    # plans as SortAggregate, which is fine; a Window here would put
    # every capture of a hot homepage on one reducer)
    "url_canonical_dedup": {
        "must": ["partial_max(struct", "hashpartitioning(canonical_url"],
        "forbid": ["Window", "SortMergeJoin", "ArrowEvalPython"],
    },
    # packing: both window operators must carry a partition spec over
    # the hash-prefix bucket — a partition-less Window is the
    # one-reducer global cumsum the two-level formulation exists to
    # avoid (the level-2 base-offset window also keys on _bkt)
    "packed_shards_docs": {
        "must": ["windowspecdefinition(_bkt", "BroadcastHashJoin"],
        "forbid": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    # decontamination: benchmark gram set broadcasts; the corpus
    # explodes grams map-only into the semi-join — a SortMergeJoin
    # here would shuffle every corpus 8-gram
    "contamination_flags_docs": {
        "must": ["BroadcastHashJoin", "LeftSemi"],
        "forbid": ["SortMergeJoin", "CartesianProduct"],
    },
    # quota mixing: the per-stratum quota table must broadcast into
    # the tournament (it is one row per source)
    "source_sqrt_quota_sample": {
        "must": ["BroadcastHashJoin", "Window"],
        "forbid": ["CartesianProduct"],
    },
    # span dedup (ExactSubstr): first occurrences combine map-side
    # (partial_min of the (id, pos) struct under the gram-hash
    # groupBy) — a Window over the hot boilerplate gram key, or any
    # Python worker, means the skew-safe formulation regressed
    "span_dedup_docs": {
        "must": ["partial_min(struct"],
        "forbid": ["Window", "CartesianProduct", "ArrowEvalPython",
                   "BatchEvalPython"],
    },
    # late round 3: Gopher battery and C4 rules are ZERO-shuffle
    # map-only scans (higher-order array exprs; line rules over the
    # raw split) — any Exchange or Python worker is a regression
    "gopher_rules_docs": {
        "must": ["Batched: true"],
        "forbid": ["Exchange", "ArrowEvalPython", "BatchEvalPython"],
    },
    "c4_clean_docs": {
        "must": ["Batched: true"],
        "forbid": ["Exchange", "ArrowEvalPython", "BatchEvalPython"],
    },
    # LM scoring: the V-row model BROADCASTS into the token join — a
    # SortMergeJoin here would shuffle every corpus token occurrence
    "unigram_nll_docs": {
        "must": ["BroadcastHashJoin"],
        "forbid": ["SortMergeJoin", "CartesianProduct",
                   "ArrowEvalPython", "BatchEvalPython"],
    },
    "dsir_weights_docs": {
        "must": ["BroadcastHashJoin"],
        "forbid": ["SortMergeJoin", "CartesianProduct",
                   "ArrowEvalPython", "BatchEvalPython"],
    },
    # blocklist: broadcast anti-join on the host — the corpus never
    # shuffles; a SortMergeJoin would move every page row
    "host_blocklist_docs": {
        "must": ["BroadcastHashJoin", "LeftAnti"],
        "forbid": ["SortMergeJoin", "CartesianProduct"],
    },
    # semantic dedup: the blocked-matmul pair stage runs BEFORE the CC
    # at sf0.01 the edge set is under the CC small-graph cap, so the
    # labels are a driver union-find result broadcast into the
    # assignment join (round 4); above the cap the distributed
    # star-join tail takes over (plan starts at the checkpoint
    # boundary). Audit the fast-path shape here: a broadcast equi-join
    # of the label table, never a cartesian/nested-loop join
    "semantic_dedup_docs": {
        "must": ["BroadcastHashJoin"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
}


def main() -> int:
    spark = get_spark("explain-audit", parallelism=8)
    out = ["# Physical plans — headline queries (`.explain('formatted')`)",
           "",
           "Generated by tools/explain_audit.py at sf0.01; the assertions",
           "listed per query are re-checked on every run (exit 1 on drift).",
           ""]
    registry = Q.queries()
    failures = []
    for name, spec in AUDITS.items():
        must_contain = spec["must"] if isinstance(spec, dict) else spec
        forbid = spec.get("forbid", []) if isinstance(spec, dict) else []
        df = registry[name](spark, SF_DIR)
        # explainString over py4j: assertions must see the FULL plan,
        # not whatever half-flushed text lands on captured stdout
        jvm = spark.sparkContext._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        missing = [m for m in must_contain if m not in plan]
        present = [m for m in forbid if m in plan]
        status = "OK" if not (missing or present) else (
            f"MISSING {missing}" + (f" FORBIDDEN-PRESENT {present}" if present else "")
        )
        if missing or present:
            failures.append((name, missing + present))
        out.append(f"## {name}  — audit: {status}")
        out.append("")
        out.append("asserted: " + "; ".join(f"`{m}`" for m in must_contain)
                   + ("; forbidden: " + "; ".join(f"`{m}`" for m in forbid) if forbid else ""))
        out.append("")
        out.append("```")
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("")
        print(f"{'ok  ' if not missing else 'FAIL'} {name}: {status}")
    (REPO / "docs").mkdir(exist_ok=True)
    (REPO / "docs" / "PLANS.md").write_text("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(AUDITS)} plans, {len(failures)} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
