"""Hand-computed expectations for robust_stats (trimmed/winsorized
profile) and cooccurrence_edges (TextRank graph construction)."""

import math

import pytest

from baselinr_spark.operators.collocations import cooccurrence_edges
from baselinr_spark.operators.profiling import robust_stats


def test_robust_stats_hand_computed(spark):
    # x = 1..9 plus outlier 100, trim 0.1:
    # q_lo = 1 + 0.9*(2-1) = 1.9 ; q_hi = 9 + 0.1*(100-9) = 18.1
    # trimmed mean = mean(2..9) = 5.5
    # winsorized = [1.9, 2..9, 18.1] -> mean 6.4
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = robust_stats(df, ("x",), trim=0.1).collect()[0]
    assert r["column_name"] == "x" and r["n"] == 10
    assert r["q_lo"] == pytest.approx(1.9)
    assert r["q_hi"] == pytest.approx(18.1)
    assert r["trimmed_mean"] == pytest.approx(5.5)
    assert r["winsor_mean"] == pytest.approx(6.4)
    wins = [1.9] + vals[1:-1] + [18.1]
    m = sum(wins) / 10
    exp_std = math.sqrt(sum((w - m) ** 2 for w in wins) / 9)
    assert r["winsor_std"] == pytest.approx(exp_std)
    assert r["n_trimmed"] == 2


def test_robust_stats_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "x double"
    )
    r = robust_stats(df, ("x",), trim=0.0).collect()[0]
    assert r["n"] == 3
    assert r["trimmed_mean"] == pytest.approx(2.0)
    assert r["winsor_mean"] == pytest.approx(2.0)
    assert r["n_trimmed"] == 0


def test_cooccurrence_edges_window2(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    edges = {
        (r["src"], r["dst"])
        for r in cooccurrence_edges(df, "text", window=2).collect()
    }
    assert edges == {
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("b", "a"), ("c", "b"), ("c", "a"),
    }


def test_cooccurrence_edges_short_doc_no_window_overrun(spark):
    df = spark.createDataFrame([("a b",), ("solo",)], "text string")
    edges = {
        (r["src"], r["dst"])
        for r in cooccurrence_edges(df, "text", window=2).collect()
    }
    assert edges == {("a", "b"), ("b", "a")}
