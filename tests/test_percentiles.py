"""Exact continuous percentiles (operators/profiling.py:
numeric_percentiles) against numpy's linear-interpolation quantile."""

import numpy as np
import pytest

from baselinr_spark.operators.profiling import numeric_percentiles

A = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
B = [10.0, 20.0, None, 40.0]


@pytest.fixture(scope="module")
def pctls(spark):
    rows = [(a, B[i] if i < len(B) else None) for i, a in enumerate(A)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = numeric_percentiles(df, ("a", "b"), ps=(0.25, 0.5, 0.9))
    return {(r["column_name"], r["p"]): r["value"] for r in out.collect()}


def test_matches_numpy_linear(pctls):
    for p in (0.25, 0.5, 0.9):
        assert pctls[("a", p)] == pytest.approx(
            np.quantile(A, p), rel=1e-12
        ), p


def test_nulls_excluded_per_column(pctls):
    vals = [v for v in B if v is not None]
    for p in (0.25, 0.5, 0.9):
        assert pctls[("b", p)] == pytest.approx(
            np.quantile(vals, p), rel=1e-12
        ), p


def test_long_format_complete(pctls):
    assert len(pctls) == 6
    assert {c for c, _ in pctls} == {"a", "b"}
