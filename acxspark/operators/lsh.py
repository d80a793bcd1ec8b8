"""LSH banding → candidate pairs, with explicit hot-band skew control.

Stage 3: split each MinHash signature into ``bands`` bands of ``rows``
values; hash each band to a 64-bit band key; documents sharing any
band key become candidate pairs (reference README.md:119's
``--similarity`` surface, realized).

Skew (SURVEY.md §7.3 item 3): boilerplate web text concentrates a few
band keys into huge buckets; naive pair generation is O(n²) in the
hottest key. Defenses, in order:
1. cap: bands with > ``cfg.max_band_size`` members are dropped from
   pair generation (a doc in a capped band still meets its dups in the
   other bands — with 32 bands the recall loss is negligible and
   measured by the recall gate);
2. the default ``strategy="bucket"`` generates pairs by grouping the
   capped band members and emitting the triangular pairs map-side —
   the cap bounds every task at cap²/2 emissions, so there is no
   reducer for a hot key to overwhelm (skew-free by construction);
3. for ``strategy="join"`` (large caps): AQE skew-join splitting
   (session.py) plus the adaptive salted self-join for mid-size hot
   bands; the join is on the exploded (band_key) equi-key with
   map-side pruned columns only (8-byte hashed doc id + band key —
   never text, urls, or signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from acxspark.config import DEFAULT_CONFIG, DedupConfig


def band_struct_col(sig_col, cfg: DedupConfig = DEFAULT_CONFIG):
    """array<struct<band_idx, band_key>> column expression over a
    MinHash signature — shared by the batch explode (band_keys) and
    the streaming near-dup flagger (streaming/stream_ops.py).

    band_key = xxhash64(band_idx, slice(sig)) — xxhash64 hashes the
    long-array slice directly; band_idx in the hash keeps keys from
    different bands out of each other's buckets. NO string building:
    an earlier concat_ws-of-casts variant allocated O(bands × rows)
    strings per doc and was GC-bound at local[32] (measured 4.5×
    anti-scaling on this exact stage)."""
    r = cfg.lsh_rows
    c = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda bi: F.struct(
            bi.alias("band_idx"),
            F.xxhash64(bi, F.slice(c, bi * r + 1, r)).alias("band_key"),
        ),
    )


def band_keys(df: DataFrame, id_col: str, sig_col: str = "minhash",
              cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """Explode the signature into (id, band_idx, band_key) — JVM-side
    (see :func:`band_struct_col` for the key construction)."""
    return (
        df.select(F.col(id_col), F.explode(band_struct_col(sig_col, cfg)).alias("b"))
        .select(id_col, F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key"))
    )


_BAND_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame, caches: list[DataFrame] | None) -> DataFrame:
    """Register a persisted intermediate for later release: in the
    caller's ``caches`` list when given, else the module registry
    drained by :func:`release_band_caches`. Shared contract for every
    operator that persists band/bucket rows (LSH candidate_pairs,
    SimHash simhash_candidate_pairs)."""
    (caches if caches is not None else _BAND_CACHES).append(df)
    return df


def release_band_caches() -> None:
    """Unpersist every band/bucket-rows cache registered via
    :func:`track_cache` by calls that did not pass ``caches`` (LSH
    *and* SimHash tiers). Library sessions that generate candidate
    pairs repeatedly should release between runs — cached partitions
    otherwise accumulate until memory pressure evicts them."""
    while _BAND_CACHES:
        _BAND_CACHES.pop().unpersist()


def candidate_pairs(df: DataFrame, id_col: str, sig_col: str = "minhash",
                    cfg: DedupConfig = DEFAULT_CONFIG,
                    salted: bool = True,
                    caches: list[DataFrame] | None = None,
                    strategy: str = "bucket",
                    persist_bands: bool = True) -> DataFrame:
    """Distinct candidate (id_a < id_b) pairs from shared band keys.

    ``strategy="bucket"`` (default): group the capped band rows by
    band_key, collect the member ids (the over-cap anti-join below
    guarantees every array is ≤ ``cfg.max_band_size``, so the
    aggregation buffer is bounded — 200 ids ≈ 1.6 KB), and emit the
    triangular pairs map-side with a double explode. One shuffle of
    the band rows total; the worst task emits cap²/2 ≈ 20k pairs, so
    no salting is needed — the cap IS the skew bound. Measured ~2×
    less candidate-stage shuffle than the self-join (both join sides
    shuffled bk + the hot tier replicated rows (s+1)/2×).

    ``strategy="join"``: the round-3 two-sided self-join, kept as the
    path for configs with a cap too large for single-task emission
    (cap²/2 pairs in one task). There ``salted=True`` routes hot bands
    through :func:`salted_self_join_pairs`: the join key becomes
    (band_key, salt_a, salt_b), so one hot band fans out over
    s(s+1)/2 shuffle keys instead of landing on a single reducer —
    the explicit salted band-key repartitioning, with AQE skew-join
    as the second line of defense and the hard cap as the third.
    All three paths produce IDENTICAL pairs (tested)."""
    if strategy not in ("bucket", "join"):
        raise ValueError(f"unknown pair strategy {strategy!r}")
    # STRING ids (urls ~40-80 B) would ride every band row through the
    # pair-generation shuffle ``bands``× per doc. On the bucket path,
    # hash them to 8-byte longs first and join the distinct pairs back
    # to the originals at the end: band-shuffle bytes drop ~4× (the
    # dominant byte mover of the whole pipeline), for two id-join
    # shuffles over the (small) pair set + the (id, hash) projection.
    # A 64-bit collision can only LOSE a pair when the two colliding
    # urls are themselves a true dup pair (their hids compare equal and
    # the triangular filter drops them) — P ≈ dup_pairs × 2⁻⁶⁴, ~5e-8
    # expected losses at 10^12 docs — and can only ADD candidates
    # otherwise (the join-back fans out), which the downstream exact
    # verify filters.
    hash_ids = strategy == "bucket" and isinstance(
        df.schema[id_col].dataType, StringType)
    if hash_ids:
        key_col = "_acx_hid"
        src = df.withColumn(key_col, F.xxhash64(F.col(id_col)))
    else:
        key_col, src = id_col, df
    # persisted: the exploded band rows feed BOTH the hot-band size agg
    # and the pair generation (both sides of the self-join under
    # strategy="join") — without the cache the explode (bands × corpus
    # rows) runs per consumer. The handle lands in ``caches`` (caller
    # releases) or the module registry (release_band_caches()) so
    # repeated calls don't leak cache.
    # band_idx is dropped before the persist (round 4): it exists only
    # inside the band-key hash — carrying it through the cache and
    # every shuffle paid 4-8 B × bands × corpus rows for nothing.
    # persist_bands=False re-derives the explode from the caller's plan
    # per consumer instead of caching band rows. MEASURED NEGATIVE on
    # this host at bench scale (BENCH/r5_lsh_ab.json, 160k/32c): even
    # with the signature frame persisted, recomputing the explode reads
    # the WIDE sig cache (shingle arrays ride it) once per consumer —
    # more DRAM traffic than the compact 16 B/row band cache it avoids
    # (24.2 s vs 18.7 s). The default stays True; the knob remains for
    # configs whose sig frame is slim (no shingles) or disk-backed.
    bk = band_keys(src, key_col, sig_col, cfg).select("band_key", key_col)
    if persist_bands:
        bk = track_cache(bk.persist(), caches)
    if strategy == "bucket":
        # ONE full-volume shuffle total. Measured at 1.28M docs / 41M
        # band rows: ~90% of band keys are singletons, so an exact
        # pre-count (a second full-volume shuffle — the partial agg
        # barely combines when nearly every key is distinct) costs as
        # much as the collect itself and found 0 over-cap bands. The
        # cap is enforced EXACTLY post-agg (size(ids) ≤ cap — identical
        # output semantics); what the pre-count really bought was the
        # aggregation-buffer memory guard, and a sampled pre-drop
        # (:func:`huge_band_keys`) buys the same guard for 1% of the
        # volume: any band big enough to threaten a buffer (≫ cap) is
        # detected with near-certainty, and a missed marginal band
        # buffers a few × cap × 8 B — harmless. Every pre-dropped band
        # is (overwhelmingly) over cap, so the post-filter would have
        # dropped it anyway — output is unchanged.
        kc = bk.join(F.broadcast(huge_band_keys(bk, cfg.max_band_size)),
                     "band_key", "left_anti")
        pairs = bucket_pairs(kc, key_col, cap=cfg.max_band_size).distinct()
        if hash_ids:
            pairs = join_back_ids(pairs, df, id_col)
        return pairs

    # hot-band cap (join strategy): window-free two-pass agg — exact
    # sizes feed the over-cap anti-join and the hot/cold salting split.
    sizes = bk.groupBy("band_key").agg(F.count("*").alias("band_n"))
    if salted and cfg.band_salt_buckets > 1:
        # sizes feeds TWO broadcast subtrees (over-cap anti-join +
        # hot/cold split) — persist so the full groupBy over the
        # exploded rows runs once
        sizes = track_cache(sizes.persist(), caches)
    bk = bk.join(F.broadcast(sizes.filter(F.col("band_n") > cfg.max_band_size)),
                 "band_key", "left_anti")

    if salted and cfg.band_salt_buckets > 1:
        # ADAPTIVE salting: replication costs (s+1)/2× rows, so only
        # bands hot enough to skew a reducer pay it; the cold majority
        # takes the plain join. Threshold = max_band_size/4 keeps the
        # salted tier's per-(key,salt-pair) group ≤ ~cap/s.
        hot_threshold = max(cfg.max_band_size // 4, 2 * cfg.band_salt_buckets)
        hot_keys = F.broadcast(
            sizes.filter(
                (F.col("band_n") > hot_threshold)
                & (F.col("band_n") <= cfg.max_band_size)
            ).select("band_key")
        )
        hot = bk.join(hot_keys, "band_key", "left_semi")
        cold = bk.join(hot_keys, "band_key", "left_anti")
        return (
            plain_pairs(cold, id_col)
            .unionByName(
                salted_self_join_pairs(hot, id_col, cfg.band_salt_buckets)
            )
            .distinct()
        )
    return plain_pairs(bk, id_col).distinct()


def join_back_ids(pairs: DataFrame, df: DataFrame, id_col: str,
                  extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Resolve (id_a, id_b) pairs of xxhash64(id) longs back to the
    original string ids via two equi-joins against the (hash, id)
    projection of ``df``, re-normalizing the pair orientation (hash
    order ≠ string order). ``extra_cols`` are carried through
    untouched (e.g. a precomputed hamming/sim column)."""
    d = df.select(F.xxhash64(F.col(id_col)).alias("_h"),
                  F.col(id_col).alias("_orig"))
    keep = [F.least("_oa", "_ob").alias("id_a"),
            F.greatest("_oa", "_ob").alias("id_b"),
            *[F.col(c) for c in extra_cols]]
    return (
        pairs
        .join(d.select(F.col("_h").alias("id_a"), F.col("_orig").alias("_oa")),
              "id_a")
        .join(d.select(F.col("_h").alias("id_b"), F.col("_orig").alias("_ob")),
              "id_b")
        .select(*keep)
    )


def huge_band_keys(bk: DataFrame, cap: int,
                   fraction: float = 0.01, seed: int = 7) -> DataFrame:
    """Band keys big enough to threaten an aggregation buffer, found
    from a Bernoulli row sample instead of an exact full-volume count.

    Detection threshold: ``max(50, 4 × cap × fraction)`` sampled rows.
    A sampled count of s implies ≥ s true members, and for any band
    with n ≳ 25 × cap the probability of slipping under the threshold
    is Chernoff-negligible (n = 10⁴ at the defaults: P < 10⁻⁶ — and a
    missed band that size buffers 80 KB, not a problem; a genuinely
    catastrophic 10⁸-member boilerplate band oversamples the threshold
    by 10⁴×). Conversely a band at exactly the cap (200 default) would
    need ≥ 50 successes from Binomial(200, 0.01) to be dropped here —
    P ≈ 10⁻⁸⁰ — so the pre-drop only ever removes bands the exact
    post-agg cap filter (:func:`bucket_pairs`) would drop anyway, and
    the output is identical to an exact pre-count at 1% of its cost."""
    smin = max(50, int(4 * cap * fraction))
    return (
        bk.sample(fraction=fraction, seed=seed)
        .groupBy("band_key").agg(F.count("*").alias("n_s"))
        .filter(F.col("n_s") >= smin)
        .select("band_key")
    )


def bucket_pairs(rows: DataFrame, id_col: str,
                 cap: int | None = None) -> DataFrame:
    """All (id_a < id_b) pairs sharing a band_key, via groupBy-collect
    + map-side double explode. The aggregation buffer is one array of
    ids per band key; callers bound it EITHER by dropping over-cap
    bands first (exact pre-count) OR by pre-dropping only catastrophic
    bands (:func:`huge_band_keys`) and passing ``cap`` so the exact
    cap semantics are enforced post-agg here. Pair emission (≤ cap²/2
    rows from one task) happens after the shuffle, inside whole-stage
    codegen — no join, no salt replication.

    Within one band key each id appears at most once (a doc emits one
    row per band and band_idx is folded into the key hash), so the
    ``id_a < id_b`` filter yields each unordered pair exactly once per
    shared band; duplicates across bands are the caller's distinct."""
    size_ok = F.size(F.col("ids")) >= 2
    if cap is not None:
        size_ok = size_ok & (F.size(F.col("ids")) <= cap)
    grouped = (
        rows.groupBy("band_key")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .filter(size_ok)
    )
    return (
        grouped.select(F.col("ids"), F.explode("ids").alias("id_a"))
        .select(F.col("id_a"), F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )


def plain_pairs(rows: DataFrame, id_col: str) -> DataFrame:
    """Triangular (id_a < id_b) pairs within each ``band_key`` via the
    plain self-join — the cold-band complement of
    :func:`salted_self_join_pairs`, shared by the LSH, SimHash and ANN
    tiers (one definition, not three hand-synced copies)."""
    a = rows.select(F.col("band_key"), F.col(id_col).alias("id_a"))
    b = rows.select(F.col("band_key"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def salted_self_join_pairs(bk: DataFrame, id_col: str, s: int) -> DataFrame:
    """All (id_a < id_b) pairs sharing a band_key, via an s-way salted
    self-join.

    Each row gets salt = hash(id) mod s. The left side replicates each
    row to every salt bucket >= its own; the right side keeps its own
    salt; the equi-join key is (band_key, salt_left_target, salt_right)
    folded into (band_key, sb) with sa carried for the triangular
    dedup. Every unordered salt pair (sa<=sb) is produced exactly once,
    so with the id_a<id_b filter the output equals the plain self-join
    while the hottest single band key spreads over s join partitions
    per replica (max partition shrinks ~s²/2 for a hot key)."""
    salted = bk.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), F.lit(s))
    )
    a = salted.select(
        "band_key",
        F.col(id_col).alias("id_a"),
        F.col("salt").alias("sa"),
        F.explode(F.sequence(F.col("salt"), F.lit(s - 1))).alias("sb"),
    )
    b = salted.select(
        "band_key", F.col(id_col).alias("id_b"), F.col("salt").alias("sb")
    )
    joined = a.join(b, ["band_key", "sb"])
    # within one salt bucket (sa == sb) both orientations appear → keep
    # id_a < id_b; across buckets (sa < sb) each unordered pair appears
    # once in arbitrary orientation → normalize with least/greatest
    within = joined.filter(
        (F.col("sa") == F.col("sb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    across = joined.filter(F.col("sa") < F.col("sb")).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    )
    # NO distinct here (round 4): within one band key each unordered
    # pair is produced exactly once (the triangular construction
    # above); duplicates only arise ACROSS band keys, and every caller
    # (candidate_pairs, simhash, ann lsh) already applies a
    # union-level distinct — the inner one was a redundant full
    # shuffle of the hot-pair set.
    return within.unionByName(across)
