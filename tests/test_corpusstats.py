"""Corpus token-law diagnostics (operators/corpusstats.py) and HITS
(operators/linkgraph.py) against independent numpy computations."""

import math

import numpy as np
import pytest

from baselinr_spark.operators.corpusstats import (
    freq_spectrum,
    heaps_fit,
    term_counts,
    zipf_fit,
)
from baselinr_spark.operators.linkgraph import hits

DOCS = [
    (1, "a a a a b b c"),
    (2, "the cat sat on the mat"),
    (3, "b c d d"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _lstsq(x, y):
    x, y = np.asarray(x, float), np.asarray(y, float)
    n = len(x)
    cov = n * (x * y).sum() - x.sum() * y.sum()
    varx = n * (x * x).sum() - x.sum() ** 2
    vary = n * (y * y).sum() - y.sum() ** 2
    slope = cov / varx
    intercept = (y.sum() - slope * x.sum()) / n
    r2 = cov * cov / (varx * vary) if vary > 0 else 1.0
    return slope, intercept, r2


def test_term_counts(spark, docs):
    rows = {r["token"]: r["cnt"] for r in term_counts(docs, "text").collect()}
    assert rows["a"] == 4
    assert rows["b"] == 3
    assert rows["the"] == 2
    assert rows["d"] == 2
    assert rows["cat"] == 1


def test_zipf_fit_matches_numpy(spark, docs):
    # counts: a:4 b:3 c:2 d:2 the:2 cat:1 mat:1 on:1 sat:1 — ties broken
    # token-asc, so rank order is a,b,c,d,the,cat,mat,on,sat
    cnts = [4, 3, 2, 2, 2, 1, 1, 1, 1]
    x = [math.log(i + 1) for i in range(len(cnts))]
    y = [math.log(c) for c in cnts]
    slope, intercept, r2 = _lstsq(x, y)
    row = zipf_fit(docs, "text", top_k=1000).collect()[0]
    assert row["n_terms"] == 9
    assert row["slope"] == pytest.approx(slope, rel=1e-12)
    assert row["intercept"] == pytest.approx(intercept, rel=1e-12)
    assert row["r2"] == pytest.approx(r2, rel=1e-12)


def test_zipf_top_k_truncates(spark, docs):
    row = zipf_fit(docs, "text", top_k=3).collect()[0]
    # top 3 by (cnt desc, token asc): a:4 b:3 c:2
    slope, _, _ = _lstsq(
        [math.log(1), math.log(2), math.log(3)],
        [math.log(4), math.log(3), math.log(2)],
    )
    assert row["n_terms"] == 3
    assert row["slope"] == pytest.approx(slope, rel=1e-12)


def test_heaps_fit_matches_numpy(spark, docs):
    # doc points (N tokens, V types): d1 (7,3), d2 (6,5), d3 (4,3)
    pts = [(7, 3), (6, 5), (4, 3)]
    slope, intercept, r2 = _lstsq(
        [math.log(n) for n, _ in pts], [math.log(v) for _, v in pts]
    )
    row = heaps_fit(docs, "doc_id", "text").collect()[0]
    assert row["n_docs"] == 3
    assert row["beta"] == pytest.approx(slope, rel=1e-12)
    assert row["k"] == pytest.approx(math.exp(intercept), rel=1e-12)
    assert row["r2"] == pytest.approx(r2, rel=1e-12)


def test_heaps_excludes_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y y y"), (3, "a b a b")], ["doc_id", "text"]
    )
    # doc1: 1 token (excluded); doc2: 3 tokens 1 type (excluded);
    # doc3: (4,2) — a single point is a perfect fit with r2 fallback 1.0
    row = heaps_fit(df, "doc_id", "text").collect()[0]
    assert row["n_docs"] == 1


def test_freq_spectrum(spark, docs):
    rows = {r["freq"]: r for r in freq_spectrum(docs, "text", max_freq=2).collect()}
    # cnt buckets: 1 → {cat,mat,on,sat}=4; 2 → {c,d,the}=3; >2 → {a,b}=2
    assert rows[1]["n_tokens"] == 4
    assert rows[2]["n_tokens"] == 3
    assert rows[3]["n_tokens"] == 2  # the >max bucket is max_freq+1
    assert rows[1]["vocab_share"] == pytest.approx(4 / 9)


def _hits_numpy(edges, n_iter):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        a = np.zeros(n)
        for u, v in edges:
            a[idx[v]] += hub[idx[u]]
        if a.sum() > 0:
            a /= a.sum()
        h = np.zeros(n)
        for u, v in edges:
            h[idx[u]] += a[idx[v]]
        if h.sum() > 0:
            h /= h.sum()
        hub, auth = h, a
    return {nodes[i]: (hub[i], auth[i]) for i in range(n)}


def test_hits_matches_numpy(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    exp = _hits_numpy(edges, n_iter=4)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, n_iter=4).collect()}
    assert set(got) == set(exp)
    for node, (h, a) in exp.items():
        assert got[node][0] == pytest.approx(h, abs=1e-12), node
        assert got[node][1] == pytest.approx(a, abs=1e-12), node
    # L1 invariant: both vectors sum to 1
    assert sum(v[0] for v in got.values()) == pytest.approx(1.0)
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0)


def test_hits_dedupes_parallel_edges_and_self_loops(spark):
    edges = [("a", "b"), ("a", "b"), ("b", "b"), ("b", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    exp = _hits_numpy([("a", "b"), ("b", "a")], n_iter=3)
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, n_iter=3).collect()}
    for node, (h, a) in exp.items():
        assert got[node][0] == pytest.approx(h, abs=1e-12)
        assert got[node][1] == pytest.approx(a, abs=1e-12)


def test_vocab_richness_hand_computed(spark):
    """corpus tokens: a a a b b c d -> V=4, N=7, f1=2 (c,d), f2=1 (b);
    Chao1 = 4 + 4/2 = 6; P0 = 2/7; coverage = 5/7."""
    from baselinr_spark.operators.corpusstats import vocab_richness

    docs = spark.createDataFrame([("a a a b",), ("b c d",)], ["text"])
    (row,) = vocab_richness(docs, "text").collect()
    assert row["vocab"] == 4 and row["n_tokens"] == 7
    assert row["f1"] == 2 and row["f2"] == 1
    assert abs(row["chao1"] - 6.0) < 1e-9
    assert abs(row["gt_unseen_mass"] - 2 / 7) < 1e-9
    assert abs(row["coverage"] - 5 / 7) < 1e-9


def test_vocab_richness_no_doubletons_bias_corrected(spark):
    """f2 = 0 branch: tokens a b c (all hapax) -> V=3, f1=3, f2=0;
    bias-corrected Chao1 = 3 + 3*2/2 = 6."""
    from baselinr_spark.operators.corpusstats import vocab_richness

    docs = spark.createDataFrame([("a b c",)], ["text"])
    (row,) = vocab_richness(docs, "text").collect()
    assert row["f2"] == 0 and abs(row["chao1"] - 6.0) < 1e-9


def test_concentration_hand_computed(spark):
    """groups x:1, y:1, z:2 (N=4, G=3): ascending sizes (1,1,2),
    Gini = 2*(1*1+2*1+3*2)/(3*4) - 4/3 = 9/6 - 4/3 = 1/6;
    HHI = (1+1+4)/16 = 0.375; top z share 0.5."""
    from baselinr_spark.operators.corpusstats import concentration

    df = spark.createDataFrame(
        [("x",), ("y",), ("z",), ("z",)], ["g"])
    (row,) = concentration(df, "g").collect()
    assert row["n_groups"] == 3 and row["n_rows"] == 4
    assert abs(row["gini"] - 1 / 6) < 1e-9
    assert abs(row["hhi"] - 0.375) < 1e-9
    assert abs(row["effective_groups"] - 1 / 0.375) < 1e-9
    assert row["top_group"] == "z" and abs(row["top_share"] - 0.5) < 1e-9


def test_concentration_uniform_is_zero_gini(spark):
    from baselinr_spark.operators.corpusstats import concentration

    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["g"])
    (row,) = concentration(df, "g").collect()
    assert abs(row["gini"]) < 1e-9
    assert abs(row["effective_groups"] - 3.0) < 1e-9


def test_distinct_ngram_ratio_hand_computed(spark):
    """'a b a b' in one group: unigrams 4 tokens/2 types (0.5);
    bigrams 'a b','b a','a b' -> 3/2; trigrams 'a b a','b a b' -> 2/2.
    A second one-word doc adds a unigram token but no bigram/trigram."""
    from baselinr_spark.operators.corpusstats import distinct_ngram_ratio

    df = spark.createDataFrame(
        [("g", "a b a b"), ("g", "c")], ["src", "text"]
    )
    got = {r["n"]: r
           for r in distinct_ngram_ratio(df, "src", "text").collect()}
    assert got[1]["total_ngrams"] == 5 and got[1]["distinct_ngrams"] == 3
    assert got[2]["total_ngrams"] == 3 and got[2]["distinct_ngrams"] == 2
    assert got[3]["total_ngrams"] == 2 and got[3]["distinct_ngrams"] == 2
    assert abs(got[2]["distinct_ratio"] - 2.0 / 3.0) < 1e-12
