"""Keep-rate parity audit + crawl snapshot diff."""

import pytest


def test_keep_rate_parity_flags_only_real_gaps(spark):
    from baselinr_spark.operators.evalmetrics import keep_rate_parity

    rows = []
    # 'en'/'fr': 200 docs each at 50% kept -> dominate the global rate
    rows += [("en", i % 2 == 0) for i in range(200)]
    rows += [("fr", i % 2 == 0) for i in range(200)]
    # 'sw': 30 docs, 10% kept -> real disparity, n large enough to show
    rows += [("sw", i < 3) for i in range(30)]
    # 'tiny': 3 docs, 0 kept -> wide Wilson interval, NOT flagged
    rows += [("tiny", False) for _ in range(3)]
    df = spark.createDataFrame(rows, ["lang", "keep"])
    got = {r["lang"]: r for r in keep_rate_parity(df, "lang", "keep").collect()}
    assert got["sw"]["disparate"] is True
    assert got["tiny"]["disparate"] is False   # n=3 cannot prove a gap
    assert got["en"]["disparate"] is False
    # Wilson interval is inside [0, 1] and contains the point estimate
    for r in got.values():
        assert 0.0 <= r["ci_lo"] <= r["keep_rate"] <= r["ci_hi"] <= 1.0


def test_keep_rate_parity_wilson_values(spark):
    from baselinr_spark.operators.evalmetrics import keep_rate_parity

    # n=10, k=5: Wilson 95% interval ~= (0.2366, 0.7634)
    df = spark.createDataFrame(
        [("g", i < 5) for i in range(10)], ["grp", "keep"]
    )
    r = keep_rate_parity(df, "grp", "keep").collect()[0]
    assert abs(r["ci_lo"] - 0.236593) < 1e-4
    assert abs(r["ci_hi"] - 0.763407) < 1e-4


def test_snapshot_diff_statuses(spark):
    from baselinr_spark.operators.revisit import snapshot_diff

    old = spark.createDataFrame(
        [(1, "h1", "d"), (2, "h2", "d"), (3, "h3", "d")],
        ["page", "h", "domain"],
    )
    new = spark.createDataFrame(
        [(2, "h2", "d"),        # unchanged
         (3, "h3x", "d"),       # changed
         (4, "h4", "d")],       # added; page 1 removed
        ["page", "h", "domain"],
    )
    r = snapshot_diff(old, new, "page", "h", "domain").collect()[0]
    assert (r["n_old"], r["n_new"]) == (3, 3)
    assert (r["added"], r["removed"], r["changed"], r["unchanged"]) == (1, 1, 1, 1)
    assert r["churn_rate"] == 0.75  # 3 touched / 4 in union
