"""Spearman (tie-averaged ranks) and Chao1 unseen-class estimator."""

import pytest


def test_spearman_perfect_monotone(spark):
    from baselinr_spark.operators.evalmetrics import spearman_corr

    # y = x^3 : nonlinear but perfectly monotone -> spearman exactly 1
    df = spark.createDataFrame(
        [(float(i), float(i) ** 3) for i in range(-5, 6)], ["x", "y"]
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r["spearman"] == 1.0
    assert r["n"] == 11


def test_spearman_with_ties_textbook(spark):
    from baselinr_spark.operators.evalmetrics import spearman_corr
    import numpy as np

    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 5.0]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    got = spearman_corr(df, "x", "y").collect()[0]["spearman"]

    def avg_ranks(v):
        import collections
        order = sorted(v)
        first = {}
        cnt = collections.Counter(v)
        for i, val in enumerate(order):
            first.setdefault(val, i + 1)
        return [first[val] + (cnt[val] - 1) / 2.0 for val in v]

    rx, ry = np.array(avg_ranks(xs)), np.array(avg_ranks(ys))
    exp = np.corrcoef(rx, ry)[0, 1]
    assert abs(got - round(float(exp), 6)) < 1e-9


def test_spearman_anticorrelation(spark):
    from baselinr_spark.operators.evalmetrics import spearman_corr

    df = spark.createDataFrame(
        [(float(i), float(10 - i)) for i in range(10)], ["x", "y"]
    )
    assert spearman_corr(df, "x", "y").collect()[0]["spearman"] == -1.0


def test_chao1_textbook(spark):
    from baselinr_spark.operators.corpusstats import chao1_dup_estimate

    # 4 singletons, 2 doubletons, 1 tripleton -> f1=4 f2=2
    # unseen = 16/4 = 4; classes = 7; total = 11; coverage = 7/11
    texts = [f"single {i}" for i in range(4)]
    texts += [f"double {i}" for i in range(2)] * 2
    texts += ["triple"] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    r = chao1_dup_estimate(df, "doc_id", "text").collect()[0]
    assert (r["n_docs"], r["n_classes"], r["f1"], r["f2"]) == (11, 7, 4, 2)
    assert r["est_unseen"] == 4.0
    assert r["est_total_classes"] == 11.0
    assert abs(r["coverage"] - round(7 / 11, 6)) < 1e-9


def test_chao1_no_doubletons_bias_corrected(spark):
    from baselinr_spark.operators.corpusstats import chao1_dup_estimate

    texts = ["a", "b", "c"]  # f1=3, f2=0 -> unseen = 3*2/2 = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    r = chao1_dup_estimate(df, "doc_id", "text").collect()[0]
    assert r["est_unseen"] == 3.0


def test_bigram_entropy_deterministic_text(spark):
    """'a b a b a b': H(Y|X)=0 (next token fully determined);
    unigram entropy = ln 2 (two equiprobable tokens)."""
    import math
    from baselinr_spark.operators.corpusstats import bigram_entropy

    df = spark.createDataFrame([("a b a b a b",)], ["text"])
    r = bigram_entropy(df, "text").collect()[0]
    assert r["n_tokens"] == 6 and r["n_bigrams"] == 5
    assert r["h_cond"] == 0.0
    assert abs(r["h_unigram"] - round(math.log(2), 6)) < 1e-9
    assert r["mutual_info"] == r["h_unigram"]


def test_bigram_entropy_hand_computed(spark):
    """'a a a b': bigrams (a,a)x2 (a,b)x1; H(Y|X) =
    -[2/3·ln(2/3) + 1/3·ln(1/3)] (all mass conditioned on x='a')."""
    import math
    from baselinr_spark.operators.corpusstats import bigram_entropy

    df = spark.createDataFrame([("a a a b",)], ["text"])
    r = bigram_entropy(df, "text").collect()[0]
    exp = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert abs(r["h_cond"] - round(exp, 6)) < 1e-9


def test_bigram_entropy_single_token_docs(spark):
    from baselinr_spark.operators.corpusstats import bigram_entropy

    df = spark.createDataFrame([("hello",), ("",)], ["text"])
    r = bigram_entropy(df, "text").collect()[0]
    assert r["n_bigrams"] == 0
    assert r["n_tokens"] == 1


def test_benford_on_exponential_scale_data(spark):
    """Powers spanning several decades follow Benford closely; the
    expected column is exactly log10(1 + 1/d) and chi terms are
    finite/nonnegative."""
    import math
    from baselinr_spark.operators.corpusstats import benford_audit

    # 2^k for k=0..199 is a classic Benford-conforming sequence
    df = spark.createDataFrame(
        [(float(2 ** k),) for k in range(200)], ["v"]
    )
    rows = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(rows) == set(range(1, 10))
    for d, r in rows.items():
        assert abs(r["expected"] - round(math.log10(1 + 1 / d), 6)) < 1e-9
        assert r["chi_term"] >= 0
    # digit 1 most common, monotone-ish decline
    assert rows[1]["n"] > rows[9]["n"]
    total_chi = sum(r["chi_term"] for r in rows.values())
    assert total_chi < 16.0  # chi2(8df) 95% crit ~ 15.5: conforms


def test_benford_first_significant_digit_extraction(spark):
    from baselinr_spark.operators.corpusstats import benford_audit

    df = spark.createDataFrame(
        [(0.00052,), (1024.0,), (-92.0,), (0.0,), (None,)], ["v"]
    )
    rows = {r["digit"]: r["n"] for r in benford_audit(df, "v").collect()}
    assert rows == {5: 1, 1: 1, 9: 1}  # zero/null excluded, abs taken


def test_stump_finds_planted_threshold(spark):
    from baselinr_spark.operators.classifier import stump_threshold

    # perfectly separable at score <= 4.0 -> label True
    rows = [(float(s), s <= 4) for s in range(10)]
    df = spark.createDataFrame(rows, ["score", "label"])
    r = stump_threshold(df, "score", "label").collect()[0]
    assert r["threshold"] == 4.0
    assert r["gini_split"] == 0.0
    assert r["gain"] == r["gini_parent"] == 0.5
    assert (r["n_left"], r["n_right"]) == (5, 5)


def test_stump_tiebreak_smallest_threshold(spark):
    from baselinr_spark.operators.classifier import stump_threshold

    # all labels identical: every split has gain 0 -> smallest score
    df = spark.createDataFrame(
        [(1.0, True), (2.0, True), (3.0, True)], ["score", "label"]
    )
    r = stump_threshold(df, "score", "label").collect()[0]
    assert r["gain"] == 0.0
    assert r["threshold"] == 1.0
