"""Jensen-Shannon divergence (operators/drift.py:js_divergence) and
classifier threshold sweep (operators/evalmetrics.py) — hand-computed
expectations."""

import math

import pytest
from pyspark.sql import Row

from baselinr_spark.operators.drift import js_divergence
from baselinr_spark.operators.evalmetrics import confusion_sweep


def test_js_divergence_hand_computed(spark):
    base = spark.createDataFrame(
        [Row(category="a", count=2), Row(category="b", count=2)]
    )
    cur = spark.createDataFrame(
        [Row(category="a", count=3), Row(category="c", count=1)]
    )
    row = js_divergence(base, cur).collect()[0]
    # P=(a .5, b .5), Q=(a .75, c .25), M=(a .625, b .25, c .125)
    expected = 0.5 * (0.5 * math.log2(0.5 / 0.625) + 0.5 * 1.0) + 0.5 * (
        0.75 * math.log2(0.75 / 0.625) + 0.25 * 1.0
    )
    assert row["js"] == pytest.approx(expected)
    assert row["n_categories"] == 3
    assert row["drift"] is True
    assert row["severity"] == "high"


def test_js_divergence_identical_is_zero(spark):
    base = spark.createDataFrame(
        [Row(category="a", count=5), Row(category="b", count=5)]
    )
    row = js_divergence(base, base).collect()[0]
    assert row["js"] == pytest.approx(0.0)
    assert row["severity"] == "none" and row["drift"] is False


def test_js_divergence_disjoint_is_one(spark):
    base = spark.createDataFrame([Row(category="a", count=4)])
    cur = spark.createDataFrame([Row(category="b", count=9)])
    row = js_divergence(base, cur).collect()[0]
    assert row["js"] == pytest.approx(1.0)


def test_confusion_sweep_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(y=True, s=0.9),
            Row(y=True, s=0.6),
            Row(y=False, s=0.7),
            Row(y=False, s=0.2),
            Row(y=True, s=0.1),
            Row(y=None, s=0.5),  # null label excluded everywhere
        ]
    )
    rows = {r["threshold"]: r for r in
            confusion_sweep(df, "y", "s", [0.5, 0.8]).collect()}
    lo = rows[0.5]
    assert (lo["tp"], lo["fp"], lo["fn"], lo["tn"]) == (2, 1, 1, 1)
    assert lo["precision"] == pytest.approx(2 / 3)
    assert lo["recall"] == pytest.approx(2 / 3)
    assert lo["f1"] == pytest.approx(2 / 3)
    assert lo["accuracy"] == pytest.approx(3 / 5)
    hi = rows[0.8]
    assert (hi["tp"], hi["fp"], hi["fn"], hi["tn"]) == (1, 0, 2, 2)
    assert hi["precision"] == pytest.approx(1.0)
    assert hi["recall"] == pytest.approx(1 / 3)
    assert hi["f1"] == pytest.approx(0.5)


def test_confusion_sweep_zero_denominators(spark):
    df = spark.createDataFrame([Row(y=False, s=0.1)])
    row = confusion_sweep(df, "y", "s", [0.5]).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (0, 0, 0, 1)
    assert row["precision"] == 0.0 and row["recall"] == 0.0
    assert row["f1"] == 0.0 and row["accuracy"] == 1.0


def test_rule_ablation_hand_computed(spark):
    from baselinr_spark.operators.evalmetrics import rule_ablation

    df = spark.createDataFrame(
        [
            Row(r1=True, r2=False),
            Row(r1=False, r2=False),
            Row(r1=True, r2=True),
            Row(r1=False, r2=True),
            Row(r1=False, r2=False),
            Row(r1=None, r2=False),  # null counts as not-fired
        ]
    )
    rows = {r["rule_name"]: r for r in rule_ablation(df, ["r1", "r2"]).collect()}
    assert set(rows) == {"r1", "r2"}
    for r in rows.values():
        assert r["keep_rate_base"] == pytest.approx(0.5)  # 3 of 6 clean
    assert rows["r1"]["fire_count"] == 2
    assert rows["r1"]["sole_drop_count"] == 1  # row 1: only r1 fires
    assert rows["r1"]["keep_rate_without"] == pytest.approx(4 / 6, abs=1e-6)
    assert rows["r1"]["marginal_keep_gain"] == pytest.approx(1 / 6, abs=1e-6)
    assert rows["r2"]["fire_count"] == 2
    assert rows["r2"]["sole_drop_count"] == 1  # row 4: only r2 fires


def test_rule_ablation_single_rule_bank(spark):
    from baselinr_spark.operators.evalmetrics import rule_ablation

    df = spark.createDataFrame([Row(r1=True), Row(r1=False), Row(r1=False)])
    row = rule_ablation(df, ["r1"]).collect()[0]
    # with one rule, every fire is a sole drop and removing it keeps all
    assert row["fire_count"] == 1 and row["sole_drop_count"] == 1
    assert row["keep_rate_base"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["keep_rate_without"] == pytest.approx(1.0)
