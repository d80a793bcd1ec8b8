"""Deterministic synthetic web-page corpus with planted duplicates.

Generates the BASELINE.json ``input_hint`` table
``webpages(url, warc_ts, html, text, lang)`` at any scale, seed-stable,
plus ground-truth ``truth_pairs(url_a, url_b, kind)`` and
``truth_clusters(url, cluster_id)``. This is the recall oracle for the
>=0.99 dup-pair recall gate (BASELINE.md) — no external data.

Planted structure (FIXTURES.md §2):
- exact-dup clusters: identical text under different urls;
- near-dup clusters: 1-5%% token edits (MinHash tier);
- substring-containment pairs (verification tier);
- singletons (the majority).

HTML is a boilerplate template wrapper around ``text``; the shared
header/footer is the LSH hot-band skew driver, and extraction must
reproduce ``text`` byte-identically per url (the reference's per-row
invariant — normalized-email uniqueness per contact,
reference src/storage.cpp:126-130, mapped onto text determinism).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np
import pandas as pd

_WORDS = (
    "the a and of to in data page web site news sport market price city "
    "river mountain code open free fast slow green blue red small large "
    "house garden music film book paper stone light dark north south east "
    "west water fire earth wind table chair door window street road bridge "
    "cloud rain snow sun moon star tree leaf root branch bird fish cat dog"
).split()

_HEADER = (
    "<html><head><title>%s</title></head><body>"
    "<nav>home | about | contact | terms | privacy | sitemap</nav>"
    "<div class='banner'>subscribe to our newsletter for daily updates "
    "and exclusive offers from our partners</div><article>"
)
_FOOTER = (
    "</article><footer>copyright 2026 example corp - all rights reserved "
    "- cookie policy - do not sell my data</footer></body></html>"
)

_LANGS = ["en", "en", "en", "en", "es", "de", "fr"]  # ~57% en? no: 4/7


@dataclass
class Corpus:
    webpages: pd.DataFrame
    truth_pairs: pd.DataFrame
    truth_clusters: pd.DataFrame


def _make_text(rng: np.random.Generator, n_tokens: int) -> list[str]:
    return list(rng.choice(_WORDS, size=n_tokens))


def _perturb(rng: np.random.Generator, tokens: list[str], rate: float) -> list[str]:
    """Edit ~rate fraction of tokens (substitute/insert/delete)."""
    out = list(tokens)
    n_edits = max(1, int(len(out) * rate))
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        i = int(rng.integers(0, len(out)))
        if op == 0:
            out[i] = str(rng.choice(_WORDS))
        elif op == 1:
            out.insert(i, str(rng.choice(_WORDS)))
        elif len(out) > 10:
            del out[i]
    return out


def render_html(url: str, text: str) -> bytes:
    """Deterministic, library-free html wrapper (pure fn of url+text)."""
    return ((_HEADER % url) + text + _FOOTER).encode("utf-8")


def extract_text(html: bytes) -> str:
    """Inverse of render_html — pure function of the html bytes.

    Byte-identical per url across runs and parallelism levels
    (input_hint invariant; tested in tests/test_determinism.py).
    """
    s = html.decode("utf-8", errors="replace")
    start = s.find("<article>")
    end = s.rfind("</article>")
    if start < 0 or end < 0:
        return ""
    return s[start + len("<article>") : end]


def generate(
    n_docs: int = 500,
    seed: int = 42,
    exact_frac: float = 0.08,
    near_frac: float = 0.12,
    contain_frac: float = 0.04,
    min_tokens: int = 60,
    max_tokens: int = 400,
) -> Corpus:
    """Build the corpus. Cluster sizes 2-4; the remainder singletons."""
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    pairs: list[tuple[str, str, str]] = []
    clusters: list[tuple[str, int]] = []

    base_ts = np.datetime64("2025-01-01T00:00:00")
    doc_i = 0
    cluster_id = 0

    def url_for(i: int) -> str:
        return f"https://site{i % 97}.example/path{i}"

    def emit(tokens: list[str], cid: int) -> str:
        nonlocal doc_i
        u = url_for(doc_i)
        text = " ".join(tokens)
        ts = base_ts + np.timedelta64(int(rng.integers(0, 300 * 24 * 3600)), "s")
        rows.append(
            {
                "url": u,
                "warc_ts": pd.Timestamp(ts),
                "html": render_html(u, text),
                "text": text,
                "lang": str(rng.choice(_LANGS)),
            }
        )
        clusters.append((u, cid))
        doc_i += 1
        return u

    n_exact = int(n_docs * exact_frac)
    n_near = int(n_docs * near_frac)
    n_contain = int(n_docs * contain_frac)

    # exact-dup clusters
    made = 0
    while made < n_exact:
        size = int(rng.integers(2, 5))
        size = min(size, n_exact - made) if n_exact - made >= 2 else 2
        toks = _make_text(rng, int(rng.integers(min_tokens, max_tokens)))
        urls = [emit(toks, cluster_id) for _ in range(size)]
        pairs += [(a, b, "exact") for a, b in itertools.combinations(urls, 2)]
        cluster_id += 1
        made += size

    # near-dup clusters (1-5% token edits)
    made = 0
    while made < n_near:
        size = int(rng.integers(2, 4))
        size = min(size, n_near - made) if n_near - made >= 2 else 2
        toks = _make_text(rng, int(rng.integers(min_tokens, max_tokens)))
        urls = [emit(toks, cluster_id)]
        for _ in range(size - 1):
            urls.append(emit(_perturb(rng, toks, float(rng.uniform(0.01, 0.05))), cluster_id))
        pairs += [(a, b, "near") for a, b in itertools.combinations(urls, 2)]
        cluster_id += 1
        made += size

    # containment pairs: page B's text embedded inside page A's
    for _ in range(n_contain // 2):
        inner = _make_text(rng, int(rng.integers(min_tokens, max_tokens // 2)))
        pre = _make_text(rng, int(rng.integers(10, 40)))
        post = _make_text(rng, int(rng.integers(10, 40)))
        u_inner = emit(inner, cluster_id)
        u_outer = emit(pre + inner + post, cluster_id)
        pairs.append((u_inner, u_outer, "contain"))
        cluster_id += 1

    # singletons
    while doc_i < n_docs:
        emit(_make_text(rng, int(rng.integers(min_tokens, max_tokens))), cluster_id)
        cluster_id += 1

    webpages = pd.DataFrame(rows)
    truth_pairs = pd.DataFrame(pairs, columns=["url_a", "url_b", "kind"])
    truth_clusters = pd.DataFrame(clusters, columns=["url", "cluster_id"])
    return Corpus(webpages, truth_pairs, truth_clusters)


def to_spark(spark, corpus: Corpus):
    """Materialize the three tables as Spark DataFrames."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    web = spark.createDataFrame(corpus.webpages, schema=schema)
    tp = spark.createDataFrame(corpus.truth_pairs)
    tc = spark.createDataFrame(corpus.truth_clusters)
    return web, tp, tc
