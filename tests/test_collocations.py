"""Hand-computed expectations for PMI collocations and Gries' DP
term dispersion (operators/collocations.py)."""

import pytest

from baselinr_spark.operators.collocations import pmi_collocations, term_dispersion


def test_pmi_collocation_hand_computed(spark):
    # doc1 tokens: new york new york city; doc2: the city of new york
    # unigrams: new=3 york=3 city=2 the=1 of=1 (T=10); bigrams B=8,
    # (new, york) c12=3 is the only pair with count >= 2.
    df = spark.createDataFrame(
        [("new york new york city",), ("the city of new york",)], "text string"
    )
    rows = pmi_collocations(df, "text", min_count=2, delta=1.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["cnt"]) == ("new", "york", 3)
    import math

    assert r["pmi"] == pytest.approx(math.log((3 / 8) / ((3 / 10) * (3 / 10))))
    assert r["npmi"] == pytest.approx(r["pmi"] / -math.log(3 / 8))
    assert r["phrase_score"] == pytest.approx((3 - 1) / 3 / 3 * 10)


def test_pmi_min_count_filters_tail(spark):
    df = spark.createDataFrame(
        [("a b a b",), ("c d",)], "text string"
    )
    # bigram counts: (a,b)=2, (b,a)=1, (c,d)=1
    out = {(r["w1"], r["w2"]) for r in pmi_collocations(df, "text", min_count=2).collect()}
    assert out == {("a", "b")}


def test_term_dispersion_hand_computed(spark):
    # part a: "x x y" (n_a=3); part b: "x z z z" (n_b=4); N=7.
    # DP(x) = 0.5*(|2/3-3/7| + |1/3-4/7|) = 5/21
    # DP(z) = 0.5*(|0-3/7| + |1-4/7|) = 3/7  (absent-cell path)
    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "x z z z")], "part string, text string"
    )
    out = {r["word"]: r for r in term_dispersion(df, "part", "text", top_k=2).collect()}
    assert set(out) == {"x", "z"}  # y (f_w=1) excluded by top_k
    assert out["x"]["total"] == 3
    assert out["x"]["dp"] == pytest.approx(5 / 21)
    assert out["z"]["dp"] == pytest.approx(3 / 7)


def test_term_dispersion_uniform_term_is_zero(spark):
    # One doc per part, identical single-token text: v_i == s_i -> DP 0.
    df = spark.createDataFrame(
        [("a", "w"), ("b", "w")], "part string, text string"
    )
    out = term_dispersion(df, "part", "text", top_k=1).collect()
    assert len(out) == 1
    assert out[0]["word"] == "w"
    assert out[0]["dp"] == pytest.approx(0.0)
