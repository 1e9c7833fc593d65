"""Hand-computed expectations for the final-session calibration and
budget operators: isotonic_bins (PAV via minimax), pairwise_kappa
(Cohen's κ), token_budget_threshold (token-budget quality cutoff)."""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.evalmetrics import isotonic_bins, pairwise_kappa
from baselinr_spark.operators.selection import token_budget_threshold


def test_isotonic_pav_merges_violating_bins(spark):
    # bins 0/1/2 with weights 5/5/10 and rates 0.8/0.2/0.6.
    # PAV: 0.8 > 0.2 -> pool bins 0+1 to (4+1)/10 = 0.5; 0.5 <= 0.6 stop.
    rows = (
        [(0.05, True)] * 4 + [(0.05, False)] * 1
        + [(0.15, True)] * 1 + [(0.15, False)] * 4
        + [(0.25, True)] * 6 + [(0.25, False)] * 4
    )
    df = spark.createDataFrame(rows, "prob double, y boolean")
    out = {
        r["bin"]: r
        for r in isotonic_bins(df, "prob", "y", n_bins=10).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["rate"] == pytest.approx(0.8)
    assert out[1]["rate"] == pytest.approx(0.2)
    assert out[2]["rate"] == pytest.approx(0.6)
    assert out[0]["iso"] == pytest.approx(0.5)
    assert out[1]["iso"] == pytest.approx(0.5)
    assert out[2]["iso"] == pytest.approx(0.6)
    assert out[0]["n"] == 5 and out[1]["n"] == 5 and out[2]["n"] == 10
    assert out[2]["bin_lo"] == pytest.approx(0.2)


def test_isotonic_already_monotone_is_identity(spark):
    rows = (
        [(0.05, False)] * 4 + [(0.05, True)] * 1
        + [(0.95, True)] * 4 + [(0.95, False)] * 1
    )
    df = spark.createDataFrame(rows, "prob double, y boolean")
    out = {
        r["bin"]: r
        for r in isotonic_bins(df, "prob", "y", n_bins=10).collect()
    }
    assert out[0]["iso"] == pytest.approx(out[0]["rate"]) == pytest.approx(0.2)
    assert out[9]["iso"] == pytest.approx(out[9]["rate"]) == pytest.approx(0.8)


def test_pairwise_kappa_hand_case(spark):
    # a,b: n11=4 n10=1 n01=1 n00=4 -> po=0.8, pe=0.5, kappa=0.6.
    # c is constant True: pe=pa1 -> kappa=0 for (a,c); null c row is
    # excluded from pairs involving c but counted for (a,b).
    rows = (
        [(True, True, True)] * 4
        + [(True, False, True)] * 1
        + [(False, True, True)] * 1
        + [(False, False, True)] * 3
        + [(False, False, None)] * 1
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    out = {
        (r["rater_a"], r["rater_b"]): r
        for r in pairwise_kappa(df, ["a", "b", "c"]).collect()
    }
    ab = out[("a", "b")]
    assert ab["n"] == 10
    assert ab["po"] == pytest.approx(0.8)
    assert ab["pe"] == pytest.approx(0.5)
    assert ab["kappa"] == pytest.approx(0.6)
    ac = out[("a", "c")]
    assert ac["n"] == 9  # null-c row excluded
    assert ac["kappa"] == pytest.approx(0.0)  # constant rater
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_token_budget_threshold_picks_highest_covering_bin(spark):
    # n_bins=10; bins 9/5/2 carry 30/50/20 tokens. budget=0.5*100=50:
    # descending cums 30, 80 -> chosen bin 5, threshold 0.5.
    rows = (
        [(0.95, 10)] * 3          # bin 9: 30 tokens
        + [(0.55, 25)] * 2        # bin 5: 50 tokens
        + [(0.25, 20)] * 1        # bin 2: 20 tokens
    )
    df = spark.createDataFrame(rows, "score double, n_tokens int")
    out = {
        r["bin"]: r
        for r in token_budget_threshold(
            df, "score", "n_tokens", budget_frac=0.5, n_bins=10
        ).collect()
    }
    assert set(out) == {9, 5, 2}
    assert out[9]["cum_tokens"] == 30 and out[5]["cum_tokens"] == 80
    assert out[2]["cum_tokens"] == 100
    assert out[9]["selected"] and out[5]["selected"] and not out[2]["selected"]
    for r in out.values():
        assert r["threshold"] == pytest.approx(0.5)
    assert out[5]["cum_docs"] == 5
    assert out[9]["bin_lo"] == pytest.approx(0.9)


def test_token_budget_threshold_full_budget_keeps_everything(spark):
    rows = [(0.95, 10), (0.05, 10)]
    df = spark.createDataFrame(rows, "score double, n_tokens int")
    out = token_budget_threshold(
        df, "score", "n_tokens", budget_frac=1.0, n_bins=10
    ).collect()
    assert all(r["selected"] for r in out)
    assert all(r["threshold"] == pytest.approx(0.0) for r in out)


def test_conformal_threshold_order_statistic(spark):
    """n=9 calibration scores 0.1..0.9, alpha=0.2 -> k=ceil(10*0.8)=8,
    threshold = 8th largest = 0.2; corpus keeps everything >= 0.2."""
    from baselinr_spark.operators.evalmetrics import conformal_keep_threshold

    cal = [(i / 10.0, True) for i in range(1, 10)]
    extra = [(0.05, False), (0.15, False), (0.95, False)]
    df = spark.createDataFrame(cal + extra, ["s", "is_cal"])
    (r,) = conformal_keep_threshold(df, "s", "is_cal", alpha=0.2).collect()
    assert r["n_cal"] == 9 and r["k"] == 8
    assert abs(r["threshold"] - 0.2) < 1e-12
    # kept: cal scores 0.2..0.9 (8 docs) + 0.95 -> 9 of 12
    assert r["total_docs"] == 12 and r["kept_docs"] == 9


def test_conformal_threshold_small_calibration_keeps_all(spark):
    """k > n -> NULL threshold, every document kept."""
    from baselinr_spark.operators.evalmetrics import conformal_keep_threshold

    df = spark.createDataFrame(
        [(0.5, True), (0.1, False), (0.9, False)], ["s", "is_cal"]
    )
    (r,) = conformal_keep_threshold(df, "s", "is_cal", alpha=0.1).collect()
    assert r["n_cal"] == 1 and r["k"] == 2  # ceil(2*0.9)=2 > 1
    assert r["threshold"] is None
    assert r["kept_docs"] == 3 and abs(r["kept_frac"] - 1.0) < 1e-12


def test_filter_churn_hand_computed(spark):
    """4 docs in one group: both-keep, lost, gained, both-drop ->
    churn 2/4; NULL new decision counts as drop."""
    from baselinr_spark.operators.evalmetrics import filter_churn

    rows = [("s", True, True), ("s", True, None), ("s", False, True),
            ("s", False, False)]
    df = spark.createDataFrame(rows, ["src", "v1", "v2"])
    (r,) = filter_churn(df, "v1", "v2", "src").collect()
    assert r["n"] == 4 and r["both_keep"] == 1
    assert r["gained"] == 1 and r["lost"] == 1
    assert abs(r["old_keep_rate"] - 0.5) < 1e-12
    assert abs(r["new_keep_rate"] - 0.5) < 1e-12
    assert abs(r["churn_frac"] - 0.5) < 1e-12


def test_filter_churn_ungrouped_total(spark):
    from baselinr_spark.operators.evalmetrics import filter_churn

    rows = [("a", True, False), ("b", False, True)]
    df = spark.createDataFrame(rows, ["src", "v1", "v2"])
    (r,) = filter_churn(df, "v1", "v2").collect()
    assert r["n"] == 2 and r["gained"] == 1 and r["lost"] == 1
    assert abs(r["churn_frac"] - 1.0) < 1e-12


def test_mcnemar_hand_computed(spark):
    """b=3 lost, c=1 gained -> chi2 = (|3-1|-1)^2 / 4 = 0.25; NULL new
    decision counts as drop (the first 'lost' row)."""
    from baselinr_spark.operators.evalmetrics import mcnemar_filters

    rows = [("s", True, None), ("s", True, False), ("s", True, False),
            ("s", False, True), ("s", True, True), ("s", False, False)]
    df = spark.createDataFrame(rows, ["src", "v1", "v2"])
    (r,) = mcnemar_filters(df, "v1", "v2", "src").collect()
    assert r["n"] == 6 and r["b_lost"] == 3 and r["c_gained"] == 1
    assert abs(r["chi2"] - 0.25) < 1e-12


def test_mcnemar_no_discordant_pairs_is_null(spark):
    """Identical filters -> b+c=0 -> chi2 undefined (NULL), not 0/0."""
    from baselinr_spark.operators.evalmetrics import mcnemar_filters

    rows = [("s", True, True), ("s", False, False)]
    df = spark.createDataFrame(rows, ["src", "v1", "v2"])
    (r,) = mcnemar_filters(df, "v1", "v2").collect()
    assert r["b_lost"] == 0 and r["c_gained"] == 0
    assert r["chi2"] is None


def test_mcnemar_symmetric_churn_small_chi2(spark):
    """Equal discordant counts b=c=2 -> chi2 = (0-1)^2/4 = 0.25 (the
    continuity correction's floor), far below the 3.84 alpha=.05 bar:
    churn without direction."""
    from baselinr_spark.operators.evalmetrics import mcnemar_filters

    rows = [("s", True, False)] * 2 + [("s", False, True)] * 2
    df = spark.createDataFrame(rows, ["src", "v1", "v2"])
    (r,) = mcnemar_filters(df, "v1", "v2", "src").collect()
    assert abs(r["chi2"] - 0.25) < 1e-12


def test_rule_shapley_hand_computed(spark):
    """doc1 fires A only (credit A+=1), doc2 fires A+B (each +=0.5),
    doc3 fires nothing. Credits sum to total drops (2)."""
    from baselinr_spark.operators.evalmetrics import (
        rule_shapley_attribution,
    )

    rows = [(True, False), (True, True), (False, False)]
    df = spark.createDataFrame(rows, ["ra", "rb"])
    got = {r["rule"]: r
           for r in rule_shapley_attribution(df, ["ra", "rb"]).collect()}
    assert got["ra"]["n_fires"] == 2 and got["rb"]["n_fires"] == 1
    assert abs(got["ra"]["drop_credit"] - 1.5) < 1e-12
    assert abs(got["rb"]["drop_credit"] - 0.5) < 1e-12
    assert abs(got["ra"]["credit_share"] - 0.75) < 1e-12
    assert abs(got["rb"]["credit_share"] - 0.25) < 1e-12


def test_rule_shapley_null_flags_and_no_drops(spark):
    from baselinr_spark.operators.evalmetrics import (
        rule_shapley_attribution,
    )

    df = spark.createDataFrame(
        [(None, False)], "ra boolean, rb boolean"
    )
    got = {r["rule"]: r
           for r in rule_shapley_attribution(df, ["ra", "rb"]).collect()}
    assert got["ra"]["n_fires"] == 0 and got["ra"]["drop_credit"] == 0.0
    assert got["ra"]["credit_share"] is None  # zero drops -> undefined


def test_keep_rate_by_score_decile_hand_computed(spark):
    """Scores 1..4 into 2 buckets: ECDF .25/.5/.75/1 -> buckets
    1,1,2,2; keeps (F,T,T,T) -> rates .5 and 1.0; tied scores share a
    bucket (all-equal-scores edge: everything lands in bucket B)."""
    from baselinr_spark.operators.evalmetrics import (
        keep_rate_by_score_decile,
    )

    df = spark.createDataFrame(
        [(1.0, False), (2.0, True), (3.0, True), (4.0, True)],
        ["sc", "keep"],
    )
    got = {r["bucket"]: r
           for r in keep_rate_by_score_decile(df, "sc", "keep",
                                              n_buckets=2).collect()}
    assert got[1]["n"] == 2 and abs(got[1]["keep_rate"] - 0.5) < 1e-12
    assert got[2]["n"] == 2 and abs(got[2]["keep_rate"] - 1.0) < 1e-12
    assert got[1]["score_min"] == 1.0 and got[1]["score_max"] == 2.0

    tied = spark.createDataFrame([(7.0, True)] * 3, ["sc", "keep"])
    out = keep_rate_by_score_decile(tied, "sc", "keep", 2).collect()
    assert len(out) == 1 and out[0]["bucket"] == 2 and out[0]["n"] == 3


def test_dawid_skene_perfect_raters_exact(spark):
    """3 perfect raters on a 3-keep/3-drop corpus: q0 is exact, M1
    gives prior .5, se=sp=4/5 (Laplace-capped); E1 posteriors are
    64/65 vs 1/65 (logit = 3·ln4), so M2 gives se=sp=257/325 exactly
    and prior stays .5."""
    from baselinr_spark.operators.evalmetrics import dawid_skene_binary

    rows = [(t, t, t) for t in (True,) * 3 + (False,) * 3]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    got = {r["rater"]: r
           for r in dawid_skene_binary(df, ["a", "b", "c"],
                                       n_iter=2).collect()}
    for r in ("a", "b", "c"):
        assert abs(got[r]["sensitivity"] - 257.0 / 325.0) < 1e-12
        assert abs(got[r]["specificity"] - 257.0 / 325.0) < 1e-12
        assert abs(got[r]["prior"] - 0.5) < 1e-12


def test_dawid_skene_contrarian_downweighted(spark):
    """Two consensus raters + one that always votes the opposite: the
    contrarian's sensitivity and specificity land below 1/2, the
    consensus raters' above."""
    from baselinr_spark.operators.evalmetrics import dawid_skene_binary

    rows = [(t, t, not t) for t in [True] * 5 + [False] * 5]
    df = spark.createDataFrame(rows, ["a", "b", "contra"])
    got = {r["rater"]: r
           for r in dawid_skene_binary(df, ["a", "b", "contra"],
                                       n_iter=2).collect()}
    assert got["contra"]["sensitivity"] < 0.5 < got["a"]["sensitivity"]
    assert got["contra"]["specificity"] < 0.5 < got["a"]["specificity"]


def test_dawid_skene_null_votes_finite(spark):
    from baselinr_spark.operators.evalmetrics import dawid_skene_binary
    import math

    df = spark.createDataFrame(
        [(None, True), (True, None)], "a boolean, b boolean"
    )
    for r in dawid_skene_binary(df, ["a", "b"], n_iter=2).collect():
        assert math.isfinite(r["sensitivity"])
        assert math.isfinite(r["specificity"])
        assert 0.0 < r["prior"] < 1.0
