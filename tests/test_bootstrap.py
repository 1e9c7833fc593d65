"""Deterministic Poisson bootstrap (operators/bootstrap.py): threshold
table, determinism, coverage sanity, and weight-distribution shape."""

import math

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.bootstrap import (
    POISSON1_CDF,
    bootstrap_mean_ci,
    _poisson1_expr,
)
from baselinr_spark.operators.selection import _md5_uniform


def test_poisson_cdf_thresholds():
    # CDF(0) = e^-1, CDF(1) = 2e^-1, increasing, -> 1
    assert abs(POISSON1_CDF[0] - math.exp(-1)) < 1e-15
    assert abs(POISSON1_CDF[1] - 2 * math.exp(-1)) < 1e-15
    assert all(a < b for a, b in zip(POISSON1_CDF, POISSON1_CDF[1:]))
    assert POISSON1_CDF[-1] > 0.99998  # CDF(7) = 0.99998975...


def test_bootstrap_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7) + 1.0) for i in range(60)], ["id", "v"])
    a = bootstrap_mean_ci(df, "id", "v", b=50).collect()[0]
    bsec = bootstrap_mean_ci(df, "id", "v", b=50).collect()[0]
    assert a == bsec
    # different salt -> different resample draws -> different CI
    c = bootstrap_mean_ci(df, "id", "v", b=50, salt="other").collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) != (c["ci_lo"], c["ci_hi"])


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    df = spark.createDataFrame(
        [(i, float(i % 11)) for i in range(200)], ["id", "v"])
    (row,) = bootstrap_mean_ci(df, "id", "v", b=100).collect()
    assert row["n"] == 200 and row["b_effective"] == 100
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]
    # rough sanity: bootstrap SE of the mean ~ sigma/sqrt(n); sigma of
    # 0..10 uniform-ish is ~3.16 -> SE ~0.22. Allow a wide band.
    assert 0.05 < row["boot_se"] < 1.0


def test_bootstrap_weights_mean_one(spark):
    """Poisson(1) weights from the md5 uniform should average ~1 (the
    property that makes each resample an unbiased pseudo-sample)."""
    df = spark.range(5000).select(
        _poisson1_expr(_md5_uniform(F.col("id"), "wtest")).alias("w"))
    m = df.agg(F.avg("w")).first()[0]
    assert 0.95 < m < 1.05


def test_bootstrap_null_values_excluded(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0)], "id int, v double")
    (row,) = bootstrap_mean_ci(df, "id", "v", b=30).collect()
    assert row["n"] == 2
    assert abs(row["mean"] - 15.0) < 1e-9
