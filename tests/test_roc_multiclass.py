"""Hand-computed expectations for roc_auc (tie-corrected rank-sum AUC)
and multiclass_prf (per-class precision/recall/F1)."""

import pytest

from baselinr_spark.operators.evalmetrics import multiclass_prf, roc_auc


def test_roc_auc_with_ties_hand_computed(spark):
    # pos scores {0.9, 0.8, 0.5}, neg {0.5, 0.3, 0.1}:
    # pooled midranks 0.1->1, 0.3->2, 0.5->3.5 (tie), 0.8->5, 0.9->6
    # R1 = 3.5+5+6 = 14.5 -> AUC = (14.5 - 6)/9 = 8.5/9
    rows = [(0.9, True), (0.8, True), (0.5, True), (0.5, False), (0.3, False), (0.1, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = roc_auc(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (3, 3)
    assert r["auc"] == pytest.approx(8.5 / 9)
    assert r["gini"] == pytest.approx(2 * 8.5 / 9 - 1)


def test_roc_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.1, False)], "s double, y boolean"
    )
    r = roc_auc(df, "s", "y").collect()[0]
    assert r["auc"] == pytest.approx(1.0)
    assert r["gini"] == pytest.approx(1.0)


def test_roc_auc_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(0.9, True), (None, True), (0.4, None), (0.1, False)],
        "s double, y boolean",
    )
    r = roc_auc(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (1, 1)
    assert r["auc"] == pytest.approx(1.0)


def test_multiclass_prf_hand_computed(spark):
    rows = (
        [("en", "en")] * 3
        + [("en", "fr"), ("en", "es"), ("fr", "en"), ("de", "en")]
        + [("fr", "fr")] * 2
    )
    df = spark.createDataFrame(rows, "lbl string, prd string")
    out = {r["cls"]: r for r in multiclass_prf(df, "lbl", "prd").collect()}
    assert set(out) == {"en", "fr", "de", "es"}
    en = out["en"]
    assert (en["support"], en["predicted"], en["tp"]) == (5, 5, 3)
    assert en["precision"] == pytest.approx(0.6)
    assert en["recall"] == pytest.approx(0.6)
    assert en["f1"] == pytest.approx(0.6)
    fr = out["fr"]
    assert (fr["support"], fr["predicted"], fr["tp"]) == (3, 3, 2)
    assert fr["f1"] == pytest.approx(2 / 3)
    de = out["de"]  # label never predicted: zero-denominator precision
    assert (de["support"], de["predicted"], de["tp"]) == (1, 0, 0)
    assert de["precision"] == 0.0 and de["recall"] == 0.0 and de["f1"] == 0.0
    es = out["es"]  # predicted-only class keeps a row via the full outer
    assert (es["support"], es["predicted"], es["tp"]) == (0, 1, 0)
    assert es["f1"] == 0.0
