"""2-component GMM EM (operators/gmm.py) on planted mixtures."""

import pytest

from baselinr_spark.operators.gmm import gmm2_fit, gmm2_posteriors


@pytest.fixture(scope="module")
def bimodal(spark):
    lo = [0.0, 0.1, -0.1, 0.05, -0.05, 0.0]
    hi = [10.0, 10.1, 9.9, 10.05, 9.95, 10.0]
    rows = [(i, x) for i, x in enumerate(lo + hi)]
    return spark.createDataFrame(rows, ["id", "x"])


def test_fit_separates_planted_clusters(bimodal):
    p = gmm2_fit(bimodal, "x", iters=15).collect()[0]
    assert abs(p["mu1"] - 0.0) < 0.1
    assert abs(p["mu2"] - 10.0) < 0.1
    assert abs(p["w1"] - 0.5) < 0.05
    assert abs(p["w2"] - 0.5) < 0.05
    assert p["var1"] > 0 and p["var2"] > 0


def test_posteriors_map_assignment(bimodal):
    params = gmm2_fit(bimodal, "x")
    got = {r["id"]: r for r in
           gmm2_posteriors(bimodal, "id", "x", params).collect()}
    for i in range(6):
        assert got[i]["component"] == 1
        assert got[i]["p2"] < 0.01
    for i in range(6, 12):
        assert got[i]["component"] == 2
        assert got[i]["p2"] > 0.99
    assert all(0.0 <= r["p2"] <= 1.0 for r in got.values())


def test_weights_sum_to_one(bimodal):
    p = gmm2_fit(bimodal, "x", iters=3).collect()[0]
    assert abs(p["w1"] + p["w2"] - 1.0) < 1e-9


def test_null_scores_ignored(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, None), (3, 1.0), (4, 0.5)], ["id", "x"]
    )
    p = gmm2_fit(df, "x", iters=2).collect()
    assert len(p) == 1  # fits on the 3 non-null rows without error
    post = gmm2_posteriors(df, "id", "x", gmm2_fit(df, "x", iters=2))
    assert post.count() == 3  # null row excluded
