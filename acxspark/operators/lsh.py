"""LSH banding → candidate pairs, with explicit hot-band skew control.

Stage 3: split each MinHash signature into ``bands`` bands of ``rows``
values; hash each band to a 64-bit band key; documents sharing any
band key become candidate pairs (reference README.md:119's
``--similarity`` surface, realized).

Skew (SURVEY.md §7.3 item 3): boilerplate web text concentrates a few
band keys into huge buckets; a self-join there is O(n²) in the hottest
key. Defenses, in order:
1. cap: bands with > ``cfg.max_band_size`` members are dropped from
   pair generation (a doc in a capped band still meets its dups in the
   other bands — with 32 bands the recall loss is negligible and
   measured by the recall gate);
2. AQE skew-join splitting (session.py) for residual imbalance;
3. the join itself is on the exploded (band_key) equi-key, so Spark
   plans a shuffled hash join with map-side pruned columns only
   (doc id + band key — never text or signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acxspark.config import DEFAULT_CONFIG, DedupConfig


def band_keys(df: DataFrame, id_col: str, sig_col: str = "minhash",
              cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """Explode the signature into (id, band_idx, band_key) — JVM-side.

    band_key = xxhash64(band_idx, slice(sig)) — xxhash64 hashes the
    long-array slice directly; band_idx in the hash keeps keys from
    different bands out of each other's buckets. NO string building:
    an earlier concat_ws-of-casts variant allocated O(bands × rows)
    strings per doc and was GC-bound at local[32] (measured 4.5×
    anti-scaling on this exact stage).
    """
    r = cfg.lsh_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda bi: F.struct(
            bi.alias("band_idx"),
            F.xxhash64(bi, F.slice(F.col(sig_col), bi * r + 1, r)).alias("band_key"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(bands).alias("b"))
        .select(id_col, F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key"))
    )


def candidate_pairs(df: DataFrame, id_col: str, sig_col: str = "minhash",
                    cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """Distinct candidate (id_a < id_b) pairs from shared band keys."""
    # persisted: the exploded band rows feed BOTH the hot-band size agg
    # and both sides of the self-join — without the cache the explode
    # (bands × corpus rows) runs three times.
    bk = band_keys(df, id_col, sig_col, cfg).persist()
    # hot-band cap: window-free (two-pass agg is cheaper than a window
    # over the skewed key at scale — partial agg combines map-side)
    sizes = bk.groupBy("band_key").agg(F.count("*").alias("band_n"))
    bk = bk.join(F.broadcast(sizes.filter(F.col("band_n") > cfg.max_band_size)),
                 "band_key", "left_anti")
    a = bk.select(F.col("band_key"), F.col(id_col).alias("id_a"))
    b = bk.select(F.col("band_key"), F.col(id_col).alias("id_b"))
    pairs = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs
