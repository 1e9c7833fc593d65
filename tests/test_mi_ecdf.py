"""Hand-computed expectations for pairwise_mi (rater mutual
information) and grouped_score_ecdf (per-group score ECDF)."""

import math

import pytest

from baselinr_spark.operators.evalmetrics import pairwise_mi
from baselinr_spark.operators.selection import grouped_score_ecdf


def test_pairwise_mi_hand_computed(spark):
    rows = [(True, True)] * 3 + [(True, False)] + [(False, True)] + [(False, False)] * 3
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = pairwise_mi(df, ["a", "b"]).collect()[0]
    assert r["n"] == 8
    exp_mi = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    assert r["mi"] == pytest.approx(exp_mi)
    assert r["h_a"] == pytest.approx(math.log(2))
    assert r["h_b"] == pytest.approx(math.log(2))
    assert r["nmi"] == pytest.approx(exp_mi / math.log(2))


def test_pairwise_mi_perfect_disagreement_is_informative(spark):
    # A = NOT B: kappa would be -1, but MI = ln 2 (fully informative)
    rows = [(True, False)] * 2 + [(False, True)] * 2
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = pairwise_mi(df, ["a", "b"]).collect()[0]
    assert r["mi"] == pytest.approx(math.log(2))
    assert r["nmi"] == pytest.approx(1.0)


def test_pairwise_mi_constant_rater_zero(spark):
    rows = [(True, True), (True, False), (True, True)]
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = pairwise_mi(df, ["a", "b"]).collect()[0]
    assert r["h_a"] == pytest.approx(0.0)
    assert r["mi"] == pytest.approx(0.0)
    assert r["nmi"] == 0.0


def test_grouped_score_ecdf_hand_computed(spark):
    rows = [("x", 1.0), ("x", 1.0), ("x", 2.0), ("x", 3.0), ("y", 5.0), ("y", None)]
    df = spark.createDataFrame(rows, "g string, s double")
    out = {(r["grp"], r["s"]): r for r in grouped_score_ecdf(df, "g", "s").collect()}
    assert out[("x", 1.0)]["cnt"] == 2 and out[("x", 1.0)]["cum"] == 2
    assert out[("x", 1.0)]["ecdf"] == pytest.approx(0.5)
    assert out[("x", 2.0)]["ecdf"] == pytest.approx(0.75)
    assert out[("x", 3.0)]["ecdf"] == pytest.approx(1.0)
    assert out[("y", 5.0)]["cum"] == 1 and out[("y", 5.0)]["ecdf"] == pytest.approx(1.0)
    assert len(out) == 4  # the NULL score row is excluded
