"""Tests for GD logistic regression (operators/classifier.py:
logreg_train_gd / logreg_score) and calibration_bins
(operators/evalmetrics.py).

The GD spec test replays the exact update rule in plain Python over
the same hashed features (pulled once from the feature builder) — an
independent arithmetic reference, not a round-trip through the
implementation under test.
"""

import math

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.classifier import logreg_score, logreg_train_gd
from baselinr_spark.operators.evalmetrics import calibration_bins
from baselinr_spark.operators.selection import hashed_gram_buckets

DOCS = [
    ("a1", "good clean prose with many words", True),
    ("a2", "well written text with good words", True),
    ("a3", "clean good prose text here", True),
    ("b1", "spam spam buy now click here", False),
    ("b2", "click buy spam now spam", False),
    ("b3", "buy click spam here now", False),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string, y boolean")


def test_logreg_matches_python_reference(spark):
    n_buckets, steps, lr = 32, 3, 2.0
    df = _docs(spark)
    w_spark = {
        r["bucket"]: r["w"]
        for r in logreg_train_gd(
            df, "doc_id", "text", "y",
            n_buckets=n_buckets, steps=steps, lr=lr,
        ).collect()
    }

    # independent replay: same features, plain-Python GD
    feats = hashed_gram_buckets(df, "doc_id", "text", n_buckets=n_buckets).collect()
    by_doc = {}
    for r in feats:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["cnt"]
    xs, ys = [], []
    for doc_id, text, y in DOCS:
        cnts = by_doc.get(doc_id, {})
        tot = sum(cnts.values())
        x = {b: c / tot for b, c in cnts.items()} if tot else {}
        x[-1] = 1.0
        xs.append(x)
        ys.append(1.0 if y else 0.0)
    w = {b: 0.0 for b in range(-1, n_buckets)}
    n = float(len(xs))
    for _ in range(steps):
        grad = {b: 0.0 for b in w}
        for x, y in zip(xs, ys):
            m = sum(v * w[b] for b, v in x.items())
            r = 1.0 / (1.0 + math.exp(-m)) - y
            for b, v in x.items():
                grad[b] += v * r
        w = {b: w[b] - lr * grad[b] / n for b in w}

    assert set(w_spark) == set(w)
    for b in w:
        assert w_spark[b] == pytest.approx(w[b], abs=1e-12), b


def test_logreg_separates_training_set(spark):
    df = _docs(spark)
    model = logreg_train_gd(df, "doc_id", "text", "y", n_buckets=64, steps=25, lr=5.0)
    scored = {r["doc_id"]: r for r in logreg_score(df, model, "doc_id", "text", n_buckets=64).collect()}
    for doc_id, _, y in DOCS:
        assert scored[doc_id]["pred"] == y, doc_id
    # probabilities ordered: every positive scores above every negative
    pos = min(scored[d]["prob"] for d, _, y in DOCS if y)
    neg = max(scored[d]["prob"] for d, _, y in DOCS if not y)
    assert pos > neg


def test_logreg_empty_doc_scores_bias(spark):
    train = _docs(spark)
    model = logreg_train_gd(train, "doc_id", "text", "y", n_buckets=32, steps=2)
    bias = {r["bucket"]: r["w"] for r in model.collect()}[-1]
    empty = spark.createDataFrame([("e1", "")], "doc_id string, text string")
    got = logreg_score(empty, model, "doc_id", "text", n_buckets=32).collect()[0]
    assert got["prob"] == pytest.approx(1.0 / (1.0 + math.exp(-bias)), abs=1e-12)


def test_calibration_bins_hand_case(spark):
    rows = [
        (0.05, False), (0.15, False), (0.18, True),
        (0.55, True), (0.58, False), (0.95, True), (1.0, True),
    ]
    df = spark.createDataFrame(rows, "prob double, y boolean")
    out = {r["bin"]: r for r in calibration_bins(df, "prob", "y", n_bins=10).collect()}
    # bin 0: [0.05] -> conf .05, acc 0 ; bin 1: [.15,.18] -> conf .165, acc .5
    # bin 5: [.55,.58] -> conf .565, acc .5 ; bin 9: [.95, 1.0] (1.0 clamps)
    assert set(out) == {0, 1, 5, 9}
    assert out[0]["n"] == 1 and out[0]["acc"] == 0.0
    assert out[1]["conf"] == pytest.approx(0.165)
    assert out[1]["acc"] == pytest.approx(0.5)
    assert out[9]["n"] == 2 and out[9]["acc"] == 1.0
    assert out[9]["conf"] == pytest.approx(0.975)
    ece = (
        1 * abs(0.05 - 0.0)
        + 2 * abs(0.165 - 0.5)
        + 2 * abs(0.565 - 0.5)
        + 2 * abs(0.975 - 1.0)
    ) / 7
    for r in out.values():
        assert r["ece"] == pytest.approx(ece, abs=1e-12)


def test_calibration_perfect_classifier_zero_ece(spark):
    rows = [(1.0, True)] * 4 + [(0.0, False)] * 4
    df = spark.createDataFrame(rows, "prob double, y boolean")
    out = calibration_bins(df, "prob", "y").collect()
    assert all(r["ece"] == pytest.approx(0.0, abs=1e-12) for r in out)
