"""Histogram bin advisor (profiling.py:histogram_bin_plan)."""

import math

import pytest

from baselinr_spark.operators.profiling import histogram_bin_plan


def test_textbook_values(spark):
    # uniform 0..99, n=100: range=99, iqr=49.5, s~29.0115
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    r = histogram_bin_plan(df, ["x"]).collect()[0]
    assert r["n"] == 100
    assert r["sturges_bins"] == math.ceil(math.log2(100)) + 1  # 8
    n13 = 100 ** (1.0 / 3.0)
    fd = math.ceil(99 / (2 * 49.5 / n13))
    assert r["fd_bins"] == fd  # ceil(n^(1/3)) = 5
    assert r["chosen_bins"] == fd


def test_degenerate_columns(spark):
    # constant column: range 0, iqr 0, stddev 0 -> chosen 1
    df = spark.createDataFrame([(5.0,)] * 50, ["x"])
    r = histogram_bin_plan(df, ["x"]).collect()[0]
    assert r["fd_bins"] is None and r["scott_bins"] is None
    assert r["chosen_bins"] == 1


def test_clamp(spark):
    # heavy-tailed: tiny IQR, huge range -> FD explodes -> clamped
    rows = [(0.0001 * i,) for i in range(99)] + [(1e6,)]
    df = spark.createDataFrame(rows, ["x"])
    r = histogram_bin_plan(df, ["x"], max_bins=200).collect()[0]
    assert r["chosen_bins"] == 200
