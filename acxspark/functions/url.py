"""URL canonicalization — stage zero of every Common-Crawl-style
pipeline: pages are first deduplicated by *canonical* URL before any
content hashing (the reference dedupes contacts by normalized email,
src/dedupe.cpp:16-38; the webtext analogue of that normalize-then-key
step is scheme/host case-folding + tracking-param stripping).

Public precedent: RFC 3986 §6 (syntax-based normalization), plus the
de-facto crawl conventions (drop fragments, drop ``utm_*``-family
tracking params, sort the surviving query params so param order never
splits a page into two keys).

Scale design: every step is a pure column expression (regexp +
array fns) — zero shuffle, whole-stage codegen, and the canonical key
is computed map-side so the dedup groupBy that follows shuffles only
(key, id) pairs. No Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query params that never identify content: the utm_* family
# (Google Analytics), click ids, and bare referrer tags. Keys only —
# matched against "key=" or a bare "key".
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=.*)?$"

_SCHEME_HOST_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def canonicalize_url(url: Column) -> Column:
    """RFC-3986-style syntax normalization as one column expression.

    Steps (each a documented convention, applied in order):
      1. trim surrounding whitespace; strip the ``#fragment``;
      2. lowercase the scheme and authority (host) — path and query
         stay case-sensitive per RFC 3986 §6.2.2.1;
      3. strip the scheme's default port (``http://h:80`` → ``http://h``,
         ``https://h:443`` → ``https://h``);
      4. drop tracking query params (TRACKING_PARAM_RE) and empty
         params, then sort the survivors byte-wise so param order
         cannot split one page into two canonical keys;
      5. an empty path becomes ``/`` (``http://h?a=1`` → ``http://h/?a=1``).
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme_host = F.lower(F.regexp_extract(u, _SCHEME_HOST_RE, 1))
    # greedy .* with the anchored port: strips the FINAL :80/:443 even
    # when the authority carries userinfo (user:pw@host:80 — the old
    # [^:/?#]* stopped at the userinfo colon and never reached the
    # port, splitting one page into two canonical keys)
    scheme_host = F.regexp_replace(scheme_host, r"^(http://.*):80$", r"$1")
    scheme_host = F.regexp_replace(scheme_host, r"^(https://.*):443$", r"$1")
    tail = F.regexp_replace(u, _SCHEME_HOST_RE, "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme_host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus port/userinfo) — the rollup key
    for per-domain crawl stats and politeness budgeting."""
    auth = F.lower(F.regexp_extract(F.trim(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    auth = F.regexp_replace(auth, r"^[^@]*@", "")  # userinfo
    return F.regexp_replace(auth, r":[0-9]*$", "")  # port


def dedup_by_canonical_url(pages: DataFrame, url_col: str = "url",
                           order_col: str = "warc_ts") -> DataFrame:
    """One row per canonical URL: keep the row with the greatest
    ``order_col`` (newest capture wins — crawl convention), ties broken
    by the raw url then the remaining columns for determinism.

    Single shuffle, argmax via ``max(struct(order, url, *rest))``:
    partial aggregation combines map-side, so a URL captured 10^6
    times (a hot homepage) costs one combiner row per partition — no
    window function ever sees the hot key's full partition.
    """
    rest = [c for c in pages.columns if c not in (url_col, order_col)]
    canon = pages.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
    keep = F.max(
        F.struct(F.col(order_col), F.col(url_col), *[F.col(c) for c in rest])
    ).alias("_keep")
    return (
        canon.groupBy("canonical_url")
        .agg(keep, F.count("*").alias("n_captures"))
        .select(
            "canonical_url",
            F.col(f"_keep.{url_col}").alias(url_col),
            F.col(f"_keep.{order_col}").alias(order_col),
            *[F.col(f"_keep.{c}").alias(c) for c in rest],
            "n_captures",
        )
    )


def host_blocklist_filter(pages: DataFrame, blocked_hosts: DataFrame,
                          url_col: str = "url") -> DataFrame:
    """UT1/RefinedWeb-style domain blocklist — crawl stage 0: drop
    every page whose host is on the list. The blocklist BROADCASTS
    (public lists are 10^5-10^6 hosts ≈ a few MB) into a LEFT ANTI
    join on the lowercased host, so the corpus never shuffles; at
    10^12 pages this is a map-side probe per row.

    ``blocked_hosts`` needs one ``host`` column; matching is on the
    exact lowercased registered host (the caller expands wildcard
    policies into concrete hosts — deterministic and auditable,
    unlike suffix matching).
    """
    b = blocked_hosts.select(F.lower(F.col("host")).alias("_bh")).distinct()
    return (
        pages.withColumn("_h", url_host(F.col(url_col)))
        .join(F.broadcast(b), F.col("_h") == F.col("_bh"), "left_anti")
        .drop("_h")
    )
