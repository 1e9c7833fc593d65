"""As-of join: hand-computed backward/forward/tolerance fixtures plus
a plan-shape guard (one shuffle, no join node at all)."""

import math

from pyspark.sql import functions as F

from baselinr_spark.operators.asof import asof_join


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (1, 3.0, "z"), (2, 5.0, "c")],
        "k int, t double, lv string",
    )
    right = spark.createDataFrame(
        [(1, 9.0, 100), (1, 15.0, 200), (1, 20.0, 300), (2, 6.0, 400)],
        "k int, t double, rv int",
    )
    return left, right


def test_backward_basic(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "t")
    # (1,3): no right <= 3 -> null; (1,10): 9 -> 100;
    # (1,20): tie is inclusive -> 300; (2,5): no right <= 5 -> null
    assert _rows(out, "k", "t", "r_rv") == [
        (1, 3.0, None),
        (1, 10.0, 100),
        (1, 20.0, 300),
        (2, 5.0, None),
    ]
    # left columns and match ts survive
    assert _rows(out.filter("t = 10.0"), "lv", "r_t") == [("a", 9.0)]


def test_forward_and_tolerance(spark):
    left, right = _frames(spark)
    fwd = asof_join(left, right, "k", "t", direction="forward")
    # (1,3)->9; (1,10)->15; (1,20)->20 (inclusive); (2,5)->6
    assert _rows(fwd, "k", "t", "r_rv") == [
        (1, 3.0, 100),
        (1, 10.0, 200),
        (1, 20.0, 300),
        (2, 5.0, 400),
    ]
    tol = asof_join(left, right, "k", "t", direction="forward", tolerance=4.0)
    # (1,10)->15 has gap 5 > 4 -> nulled; others within 4
    assert _rows(tol, "k", "t", "r_rv") == [
        (1, 3.0, None),
        (1, 10.0, None),
        (1, 20.0, 300),
        (2, 5.0, 400),
    ]
    back_tol = asof_join(left, right, "k", "t", tolerance=0.5)
    assert _rows(back_tol, "k", "t", "r_rv") == [
        (1, 3.0, None),
        (1, 10.0, None),
        (1, 20.0, 300),
        (2, 5.0, None),
    ]


def test_multi_key_and_column_prefix(spark):
    left = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 10.0)], "k int, sub string, t double"
    )
    right = spark.createDataFrame(
        [(1, "x", 8.0, 7), (1, "y", 9.0, 8)], "k int, sub string, t double, rv int"
    )
    out = asof_join(left, right, ["k", "sub"], "t", right_prefix="m_")
    assert set(out.columns) == {"k", "sub", "t", "m_t", "m_rv"}
    assert _rows(out, "sub", "m_rv") == [("x", 7), ("y", 8)]


def test_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof (backward)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    lp = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "t": np.round(rng.uniform(0, 100, 200), 3),
    }).sort_values("t").reset_index(drop=True)
    lp["lid"] = range(200)
    rp = pd.DataFrame({
        "k": rng.integers(0, 5, 150),
        "t": np.round(rng.uniform(0, 100, 150), 3),
        "rv": rng.integers(0, 1000, 150),
    }).drop_duplicates(["k", "t"]).sort_values("t").reset_index(drop=True)
    expected = pd.merge_asof(lp, rp, on="t", by="k", suffixes=("", "_r"))

    out = asof_join(
        spark.createDataFrame(lp), spark.createDataFrame(rp), "k", "t"
    ).toPandas().sort_values("lid").reset_index(drop=True)
    exp = expected.sort_values("lid").reset_index(drop=True)
    for got, want in zip(out["r_rv"].tolist(), exp["rv"].tolist()):
        g_nan = got is None or (isinstance(got, float) and math.isnan(got))
        w_nan = want is None or (isinstance(want, float) and math.isnan(want))
        assert (g_nan and w_nan) or got == want


def test_plan_has_no_join(spark):
    """The whole operator is union + window: no join operator (and so
    no possibility of a join blowup) in the optimized plan."""
    left, right = _frames(spark)
    plan = asof_join(left, right, "k", "t")._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_empty_right(spark):
    left, right = _frames(spark)
    out = asof_join(left, right.filter("k = 99"), "k", "t")
    assert _rows(out, "k", "t", "r_rv") == [
        (1, 3.0, None), (1, 10.0, None), (1, 20.0, None), (2, 5.0, None),
    ]
