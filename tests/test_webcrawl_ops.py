"""Tests for the round-4 web-crawl operators: URL canonicalization +
dedup, HTML→text extraction, and SemDeDup semantic deduplication."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from baselinr_spark.functions.extract import (
    escape_html_expr,
    extract_pages_text,
    extract_text_expr,
)
from baselinr_spark.functions.urltools import (
    canonical_url_expr,
    canonicalize_urls,
    url_dedup,
)
from baselinr_spark.operators.semdedup import semdedup, semdedup_prune


# ---------------------------------------------------------------- URLs
CANON_CASES = [
    # (raw, canonical)
    ("https://Example.COM/a/1", "https://example.com/a/1"),
    ("HTTPS://WWW.example.com/a/1/", "https://example.com/a/1"),
    ("https://example.com:443/a/1", "https://example.com/a/1"),
    ("http://example.com:80/a/1", "http://example.com/a/1"),
    ("http://example.com:8080/a/1", "http://example.com:8080/a/1"),
    ("https://example.com/a/1?utm_source=x&id=7", "https://example.com/a/1?id=7"),
    ("https://example.com/a/1?id=7&utm_campaign=y#frag", "https://example.com/a/1?id=7"),
    ("https://example.com/a/1?fbclid=abc", "https://example.com/a/1"),
    ("https://example.com/a/1?b=2&a=1", "https://example.com/a/1?b=2&a=1"),  # order kept
    ("https://example.com/", "https://example.com"),
    ("  https://example.com/x  ", "https://example.com/x"),
    ("not a url", "not a url"),  # non-matching passes through trimmed
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [Row(i=i, url=raw) for i, (raw, _) in enumerate(CANON_CASES)]
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url_expr(F.col("url")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_dedup_latest_wins(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # three variants of one page; the latest fetch (v2) must win
        Row(url="https://example.com/a", warc_ts=t0),
        Row(url="https://WWW.example.com/a/", warc_ts=t0 + dt.timedelta(hours=2)),
        Row(url="https://example.com/a?utm_source=x", warc_ts=t0 + dt.timedelta(hours=1)),
        # tie on ts → lexicographically smallest raw url wins
        Row(url="https://example.com/b?utm_a=1", warc_ts=t0),
        Row(url="https://example.com/b", warc_ts=t0),
        # singleton
        Row(url="https://example.com/c", warc_ts=t0),
    ]
    out = {
        r["canonical_url"]: r
        for r in url_dedup(spark.createDataFrame(rows)).collect()
    }
    assert len(out) == 3
    a = out["https://example.com/a"]
    assert a["url"] == "https://WWW.example.com/a/" and a["n_dups"] == 3
    b = out["https://example.com/b"]
    assert b["url"] == "https://example.com/b" and b["n_dups"] == 2
    assert out["https://example.com/c"]["n_dups"] == 1


# ---------------------------------------------------------------- HTML
def test_extract_text_strip_chain(spark):
    html = (
        "<html><head><style>p {color: red}</style>"
        "<script type='a'>if (1<2) alert('x')</script></head>"
        "<!-- hidden -->"
        "<body>Hello &amp; welcome to 2&lt;3&nbsp;world&#39;s &quot;best&quot;</body></html>"
    )
    df = spark.createDataFrame([Row(html=html.encode())])
    got = df.select(extract_text_expr(F.col("html")).alias("t")).first()["t"]
    assert got == "Hello & welcome to 2<3\u00a0world's \"best\""


def test_extract_roundtrip_byte_identical(spark, warehouse):
    """Wrapping text in markup + entities and extracting returns the
    text byte-identical — the north-rule per-row invariant."""
    pages = spark.read.parquet(warehouse).where(F.col("text").isNotNull())
    wrapped = pages.select(
        "url",
        "text",
        F.encode(
            F.concat(
                F.lit("<html><head><style>a{b}</style></head><body><p>"),
                escape_html_expr(F.col("text")),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    out = extract_pages_text(wrapped)
    n_bad = out.where(F.col("extracted_text") != F.col("text")).count()
    assert n_bad == 0
    # NULL html (2% of the warehouse) → NULL extraction, row preserved
    nulls = extract_pages_text(spark.read.parquet(warehouse).where(F.col("html").isNull()))
    assert nulls.where(F.col("extracted_text").isNotNull()).count() == 0


# ------------------------------------------------------------- SemDeDup
@pytest.fixture(scope="module")
def emb_df(spark):
    """24 vectors in 3 well-separated directions; within each direction
    two exact-duplicate triples (planted semantic dups) + 2 singles."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = {0: [10.0, 0, 0, 0], 1: [0, 10.0, 0, 0], 2: [0, 0, 10.0, 0]}
    rows = []
    vid = 0
    for g in range(3):
        for rep in range(2):  # two dup-triples per direction
            core = np.array(base[g]) + rng.normal(0, 0.3, 4) + (rep * 2.0)
            for _ in range(3):
                rows.append(Row(vec_id=vid, embedding=[float(x) for x in core]))
                vid += 1
        for _ in range(2):  # singletons: distinct jitter, below threshold
            v = np.array(base[g]) * (1 + rng.normal(0, 0.02)) + rng.normal(0, 1.5, 4)
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows)


def test_semdedup_exact_dups_collapse(spark, emb_df):
    out = semdedup(emb_df, n_centroids=4, threshold=0.999).cache()
    rows = out.collect()
    assert len(rows) == emb_df.count()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    # exactly one keeper per component, keeper has the component's min id
    # among lowest-rounded-centroid-cosine members
    for comp, members in by_comp.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1
        lo = min(
            (round(m["cent_cosine"], 6), m["vec_id"]) for m in members
        )
        assert keepers[0]["vec_id"] == lo[1]
    # the 6 planted triples each collapsed into one component of >= 3
    big = [m for m in by_comp.values() if len(m) >= 3]
    assert len(big) == 6
    pruned = semdedup_prune(emb_df, out)
    assert pruned.count() == len(by_comp)
    out.unpersist()


def test_semdedup_cell_cap_excludes_pairs(spark, emb_df):
    """With max_cell_size=1 no cell qualifies for pair generation, so
    every vector is its own singleton component and survives."""
    out = semdedup(emb_df, n_centroids=4, threshold=0.9, max_cell_size=1)
    assert out.where(~F.col("keep")).count() == 0
    assert out.select("component").distinct().count() == emb_df.count()


def test_semdedup_no_corpus_cross_join(spark, emb_df):
    """The pair stage must be an equi-join on centroid_id — a cartesian
    over corpus members would be the 100 TB scale-killer. Only the
    broadcast of the tiny centroid set may appear as a nested loop."""
    plan = semdedup(emb_df, n_centroids=4)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "CartesianProduct" in line:
            raise AssertionError(f"cartesian in semdedup plan: {line}")


def test_resolve_redirects_chain_and_loop(spark):
    """a->b->c->d grounds in 3 hops; x<->y loops and stays
    non-terminal at the hop cap; duplicate redirects for one src
    collapse to the min dst."""
    from baselinr_spark.functions.urltools import resolve_redirects

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("x", "y"), ("y", "x"),
         ("m", "q"), ("m", "n")],  # dup: min dst 'n' wins
        ["src", "dst"],
    )
    got = {r["url"]: r for r in resolve_redirects(edges, max_hops=3).collect()}
    assert got["a"]["final_url"] == "d" and got["a"]["n_hops"] == 3
    assert got["a"]["terminal"]
    assert got["b"]["final_url"] == "d" and got["b"]["n_hops"] == 2
    assert not got["x"]["terminal"] and not got["y"]["terminal"]
    assert got["m"]["final_url"] == "n" and got["m"]["terminal"]
