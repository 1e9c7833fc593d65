"""ml_based drift strategy — multivariate Gaussian anomaly scoring.

The reference declares this strategy and raises NotImplementedError
(reference drift/strategies.py:302-342); these tests pin the real
implementation's semantics with hand-computed expectations.
"""

import math

from baselinr_spark.operators.drift import ml_drift_scores


def _wh_p(chi2: float, dof: int) -> float:
    """Wilson–Hilferty + A&S erf — the exact arithmetic chi2_sf_expr runs."""
    z = ((chi2 / dof) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dof))) / math.sqrt(
        2.0 / (9.0 * dof)
    )
    x = z / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * abs(x))
    poly = (
        ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t
    e = 1.0 - poly * math.exp(-x * x)
    erf = e if x >= 0 else -e
    return min(max(0.5 * (1.0 - erf), 0.0), 1.0)


def _history(spark):
    rows = []
    # key A: metric 'count' over 5 runs -> mu=11, sd_samp=sqrt(2.5)
    for v in (10.0, 12.0, 11.0, 9.0, 13.0):
        rows.append(("A", "count", v))
    # key A: metric 'mean' constant -> sd=0 -> guard substitutes 1.0
    for _ in range(5):
        rows.append(("A", "mean", 5.0))
    # key B: only 3 runs -> below min_history, never modeled
    for v in (1.0, 2.0, 3.0):
        rows.append(("B", "count", v))
    return spark.createDataFrame(rows, "tbl string, metric_name string, metric_value double")


def test_ml_drift_hand_computed(spark):
    cur = spark.createDataFrame(
        [
            ("A", "count", 16.0),   # z = (16-11)/sqrt(2.5) -> z^2 = 10
            ("A", "mean", 6.0),     # sd=0 -> 1.0 -> z = 1 -> z^2 = 1
            ("A", "extra", 99.0),   # not in the model: ignored
            ("B", "count", 100.0),  # model below min_history: no row
        ],
        "tbl string, metric_name string, metric_value double",
    )
    out = ml_drift_scores(_history(spark), cur, ["tbl"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["tbl"] == "A"
    assert abs(r["score"] - 11.0) < 1e-9
    assert r["dof"] == 2
    expect_p = _wh_p(11.0, 2)  # exact chi2 sf = exp(-5.5) ~ 0.00409
    assert abs(r["p_value"] - expect_p) < 1e-9
    assert 0.001 < r["p_value"] < 0.01
    assert r["drift"] is True
    assert r["severity"] == "medium"
    # top contributor: count has |z|=sqrt(10) > mean's |z|=1
    assert r["top_metric"] == "count"
    assert abs(r["top_z"] - math.sqrt(10.0)) < 1e-9


def test_ml_drift_in_control_run(spark):
    cur = spark.createDataFrame(
        [("A", "count", 11.0), ("A", "mean", 5.0)],
        "tbl string, metric_name string, metric_value double",
    )
    r = ml_drift_scores(_history(spark), cur, ["tbl"]).collect()[0]
    assert r["score"] == 0.0 and r["drift"] is False and r["severity"] == "none"


def test_ml_drift_top_tiebreak_deterministic(spark):
    # two metrics with identical |z|: the lexicographically larger
    # metric name wins (struct-max), so reruns agree
    hist = spark.createDataFrame(
        [("A", m, v) for m in ("aa", "bb") for v in (1.0, 2.0, 3.0, 4.0, 5.0)],
        "tbl string, metric_name string, metric_value double",
    )
    cur = spark.createDataFrame(
        [("A", "aa", 6.0), ("A", "bb", 6.0)],
        "tbl string, metric_name string, metric_value double",
    )
    r = ml_drift_scores(hist, cur, ["tbl"]).collect()[0]
    assert r["top_metric"] == "bb"
