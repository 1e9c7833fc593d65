"""Hand-computed expectations for re-crawl change stats
(operators/revisit.py) and per-domain unigram KL divergence
(operators/collocations.py:domain_unigram_kl)."""

import math

import pytest

from baselinr_spark.operators.collocations import domain_unigram_kl
from baselinr_spark.operators.revisit import page_versions, revisit_change_stats


def test_page_versions_flags_changes(spark):
    df = spark.createDataFrame(
        [("p1", 1, "ha"), ("p1", 2, "ha"), ("p1", 3, "hb")],
        "k string, t int, h string",
    )
    out = {r["visit_no"]: r for r in page_versions(df, "k", "t", "h").collect()}
    assert out[1]["changed"] == 0  # first visit is not a change
    assert out[2]["changed"] == 0  # identical re-visit
    assert out[3]["changed"] == 1  # content changed


def test_revisit_change_stats_hand_computed(spark):
    rows = [
        # d1/p1: 3 visits, 1 change; d1/p2: single visit
        ("d1", "p1", 1, "ha"), ("d1", "p1", 2, "ha"), ("d1", "p1", 3, "hb"),
        ("d1", "p2", 1, "hx"),
        # d2/p3: unchanged re-visit
        ("d2", "p3", 1, "h"), ("d2", "p3", 2, "h"),
        # d3/p4: no re-visits -> rate 0.0 guard
        ("d3", "p4", 1, "h"),
    ]
    df = spark.createDataFrame(rows, "grp string, k string, t int, h string")
    out = {
        r["grp"]: r
        for r in revisit_change_stats(df, "k", "t", "h", "grp").collect()
    }
    d1 = out["d1"]
    assert (d1["n_pages"], d1["n_visits"], d1["n_revisits"], d1["n_changes"]) == (
        2, 4, 2, 1,
    )
    assert d1["change_rate"] == pytest.approx(0.5)
    assert out["d2"]["change_rate"] == 0.0
    assert out["d3"]["n_revisits"] == 0 and out["d3"]["change_rate"] == 0.0


def test_domain_kl_hand_computed(spark):
    # part a: "x x y" (p = 2/3, 1/3); part b: "x z" (p = 1/2, 1/2)
    # corpus: x 3/5, y 1/5, z 1/5
    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "x z")], "part string, text string"
    )
    out = {r["part"]: r for r in domain_unigram_kl(df, "part", "text").collect()}
    a, b = out["a"], out["b"]
    assert (a["n_tokens"], a["n_types"]) == (3, 2)
    assert a["kl"] == pytest.approx(
        (2 / 3) * math.log((2 / 3) / (3 / 5)) + (1 / 3) * math.log((1 / 3) / (1 / 5))
    )
    assert b["kl"] == pytest.approx(
        0.5 * math.log(0.5 / (3 / 5)) + 0.5 * math.log(0.5 / (1 / 5))
    )


def test_domain_kl_identical_distributions_zero(spark):
    df = spark.createDataFrame(
        [("a", "x y"), ("b", "x y x y")], "part string, text string"
    )
    out = {r["part"]: r for r in domain_unigram_kl(df, "part", "text").collect()}
    assert out["a"]["kl"] == pytest.approx(0.0)
    assert out["b"]["kl"] == pytest.approx(0.0)
