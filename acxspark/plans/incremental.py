"""Incremental dedup: fold a NEW batch into a committed corpus state
without re-pairing the old corpus.

The production shape at 10^12 documents: the full pipeline runs once
(or rarely), committing `signatures` (exact-dup representatives +
text_sha) and `clusters` snapshots to the catalog
(plans/pipeline.py); every subsequent crawl increment runs THIS plan:

  new batch → signatures (new rows only)
    → exact tier   vs old:   sha equi-join against the snapshot
    → minhash tier vs old:   band-key equi-join new×old (never
                             old×old — the quadratic term the full
                             run already paid stays paid)
    → minhash tier within:   the normal capped/salted self-join on
                             the new rows only
    → exact-Jaccard verify at τ (same shingle arrays both sides)
    → clustering with a FROZEN base: old cluster labels never change
      (downstream consumers hold references to them); new docs join
      the matched old cluster, or form new clusters labeled first-wins
      among themselves
    → snapshots updated (signatures ∪ new, clusters ∪ new) so the
      NEXT increment sees this one.

Scale: the per-increment cost is O(|new| + matched-band rows of old),
never O(|corpus|²) — the old side is touched only through two
equi-joins (sha, band_key) that a real deployment serves from the
bucketed/partitioned snapshot tables.

Deliberate semantic deltas from a monolithic full run, documented:
- the containment tier (page-in-page) does not run across increments
  — schedule periodic full compactions for it;
- a new doc that NEAR-matches two different old clusters cannot merge
  them (labels are frozen): it joins the minimum old label and the
  bridge is counted in lineage (`clusters_bridged`) for the next
  compaction to resolve. Exact-dup bridges cannot happen (identical
  text ⇒ identical sha ⇒ one old cluster).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acxspark.config import DEFAULT_CONFIG, DedupConfig
from acxspark.metrics import Lineage
from acxspark.operators.cc import connected_components
from acxspark.operators.lsh import band_keys, candidate_pairs
from acxspark.operators.signatures import with_signatures
from acxspark.operators.verify import exact_jaccard_edges


@dataclass
class IncrementalResult:
    assignments: DataFrame   # url, cluster_id — NEW docs only
    lineage: Lineage
    caches: list


def _cross_jaccard_edges(pairs: DataFrame, new_sigs: DataFrame,
                         old_sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """exact_jaccard_edges with the two sides drawn from different
    frames (new=id_a, old=id_b)."""
    a = new_sigs.select(F.col("url").alias("id_a"),
                        F.col("shingles").alias("sh_a"))
    b = old_sigs.select(F.col("url").alias("id_b"),
                        F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .filter(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b")
    )


def run_incremental(new_web: DataFrame, catalog,
                    cfg: DedupConfig = DEFAULT_CONFIG,
                    text_col: str = "text",
                    lineage_path: str | None = None,
                    update_snapshots: bool = True) -> IncrementalResult:
    """Assign every NEW doc a cluster id against the committed state.

    Requires `signatures` and `clusters` snapshots (a prior
    run_pipeline(catalog=...)). New urls must be distinct from old
    urls (crawl increments key by url+fetch partition upstream).
    """
    spark = new_web.sparkSession
    lin = Lineage(lineage_path, cfg.fingerprint())
    caches: list[DataFrame] = []

    old_sigs = catalog.read(spark, "signatures").persist()
    old_clusters = catalog.read(spark, "clusters")
    caches.append(old_sigs)

    new_docs = lin.observe(
        new_web.filter(F.length(text_col) <= cfg.max_text_bytes),
        "incr_docs_scanned",
    ).persist()
    caches.append(new_docs)

    # ---- signatures for the new rows (with sha, matching the
    # snapshot schema so the union below stays aligned) --------------
    new_hashed = new_docs.select(
        "url", F.sha2(F.col(text_col), 256).alias("text_sha")
    )
    new_sigs = with_signatures(
        new_docs, text_col=text_col, cfg=cfg, id_col="url"
    ).join(new_hashed, "url").persist()
    caches.append(new_sigs)

    # ---- exact tier vs old (sha equi-join; snapshot carries the sha
    # of every exact-group representative) ---------------------------
    exact_cross = (
        new_hashed.join(
            old_sigs.select(F.col("url").alias("id_b"), "text_sha"),
            "text_sha",
        )
        .select(F.col("url").alias("id_a"), "id_b")
    )

    # ---- minhash tier vs old: band-key equi-join new×old -----------
    nb = band_keys(new_sigs, "url", "minhash", cfg).select(
        F.col("url").alias("id_a"), "band_key"
    )
    ob = band_keys(old_sigs, "url", "minhash", cfg).select(
        F.col("url").alias("id_b"), "band_key"
    )
    # hot-band cap on the OLD side (the side that grows with corpus
    # age — same recall tradeoff as the full run's cap)
    ob_sizes = ob.groupBy("band_key").agg(F.count("*").alias("n"))
    ob = ob.join(
        F.broadcast(ob_sizes.filter(F.col("n") > cfg.max_band_size)),
        "band_key", "left_anti",
    )
    cross_pairs = nb.join(ob, "band_key").select("id_a", "id_b").distinct()
    near_cross = _cross_jaccard_edges(cross_pairs, new_sigs, old_sigs, cfg)

    # ---- minhash tier within the increment (normal self-join path) -
    intra_cands = candidate_pairs(new_sigs, "url", "minhash", cfg,
                                  caches=caches)
    near_intra = exact_jaccard_edges(intra_cands, new_sigs, "url", cfg).select(
        "id_a", "id_b"
    )
    intra_exact = (
        new_hashed.groupBy("text_sha")
        .agg(F.min("url").alias("id_a"), F.collect_list("url").alias("us"))
        .select("id_a", F.explode("us").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )

    # ---- frozen-base clustering ------------------------------------
    # old matches become edges to the OLD CLUSTER LABEL (not the old
    # doc), so one old cluster is one vertex and its label is frozen
    matched = lin.observe(
        exact_cross.unionByName(near_cross)
        .join(
            old_clusters.withColumnRenamed("url", "id_b"), "id_b"
        )
        .select("id_a", F.col("cluster_id").alias("id_b"))
        .distinct(),
        "incr_old_matches",
    )
    all_edges = matched.unionByName(near_intra).unionByName(intra_exact)
    comp = connected_components(all_edges.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ))

    # label resolution: any old label in the component wins (labels
    # are frozen — first occurrence wins across BATCHES, the
    # reference's first-wins order lifted to increments); ties across
    # two old labels take the min and count a bridge.
    old_label_set = old_clusters.select(
        F.col("cluster_id").alias("u")
    ).distinct().withColumn("_old", F.lit(True))
    comp_labels = (
        comp.join(old_label_set, "u", "left")
        .groupBy("component")
        .agg(
            F.min(F.when(F.col("_old"), F.col("u"))).alias("old_min"),
            F.count(F.when(F.col("_old"), 1)).alias("n_old"),
        )
    )
    lin.record(
        "clusters_bridged",
        n=int(
            comp_labels.filter(F.col("n_old") > 1).count()
        ),
    )
    resolved = (
        comp.join(comp_labels, "component")
        .select(
            F.col("u").alias("url"),
            F.coalesce("old_min", "component").alias("cluster_id"),
        )
    )
    assignments = (
        new_docs.select("url")
        .join(resolved, "url", "left")
        .select(
            "url",
            F.coalesce(F.col("cluster_id"), F.col("url")).alias("cluster_id"),
        )
    )
    assignments = lin.observe(assignments, "incr_assigned").persist()
    caches.append(assignments)

    if update_snapshots:
        # next increment sees this one: union the snapshots. At real
        # scale these are Iceberg APPENDs, not rewrites.
        catalog.write(
            "signatures",
            old_sigs.unionByName(new_sigs), meta={"incremental": True},
        )
        catalog.write(
            "clusters",
            old_clusters.unionByName(assignments),
            meta={"incremental": True},
        )

    return IncrementalResult(assignments=assignments, lineage=lin,
                             caches=caches)
