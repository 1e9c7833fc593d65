"""Embedding-group centroids and within-group outlier flags
(operators/embcurate.py) against hand-computed / numpy expectations."""

import numpy as np
import pytest

from baselinr_spark.operators.embcurate import (
    centroid_outliers,
    group_centroids,
)

# two groups in 2-d: group "g1" centered near (1, 0), "g2" near (0, 1);
# v5 is a g1-labeled vector pointing the g2 way — the planted outlier
VECS = [
    (1, "g1", [1.0, 0.0]),
    (2, "g1", [0.9, 0.1]),
    (3, "g1", [1.1, -0.1]),
    (5, "g1", [0.0, 1.0]),
    (4, "g2", [0.0, 1.0]),
    (6, "g2", [0.1, 0.9]),
    (7, "g2", None),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, ["vec_id", "grp", "embedding"])


def test_group_centroids(spark, vecs):
    rows = {r["group"]: r for r in group_centroids(vecs, "grp").collect()}
    assert set(rows) == {"g1", "g2"}
    np.testing.assert_allclose(rows["g1"]["centroid"], [0.75, 0.25])
    np.testing.assert_allclose(rows["g2"]["centroid"], [0.05, 0.95])
    assert rows["g1"]["n_members"] == 4
    assert rows["g2"]["n_members"] == 2  # NULL vector excluded


def test_centroid_outliers_flags_planted(spark, vecs):
    out = centroid_outliers(vecs, "vec_id", "grp", bottom_k=1).collect()
    rows = {r["vec_id"]: r for r in out}
    assert 7 not in rows  # NULL vector never scored
    # g1 centroid (0.75, 0.25): v5 = (0,1) is by far the least central
    flagged = [r for r in out if r["is_outlier"]]
    g1_flagged = [r for r in flagged if r["group"] == "g1"]
    assert [r["vec_id"] for r in g1_flagged] == [5]
    assert g1_flagged[0]["outlier_rank"] == 1
    # exact cosine for the planted outlier: (0,1)·(.75,.25)/(1·norm)
    cent = np.array([0.75, 0.25])
    exp = 0.25 / np.linalg.norm(cent)
    assert rows[5]["cent_cosine"] == pytest.approx(exp, rel=1e-12)
    # non-flagged members carry NULL rank
    assert rows[1]["outlier_rank"] is None
    assert not rows[1]["is_outlier"]
    # every group flags exactly bottom_k members
    g2_flagged = [r for r in flagged if r["group"] == "g2"]
    assert len(g2_flagged) == 1


def test_outlier_tie_breaks_by_id(spark):
    # two identical vectors → identical cosines; rank must break id-asc
    df = spark.createDataFrame(
        [(10, "g", [1.0, 0.0]), (11, "g", [1.0, 0.0]), (12, "g", [0.9, 0.1])],
        ["vec_id", "grp", "embedding"],
    )
    out = {r["vec_id"]: r for r in
           centroid_outliers(df, "vec_id", "grp", bottom_k=2).collect()}
    flagged = sorted(v["vec_id"] for v in out.values() if v["is_outlier"])
    assert len(flagged) == 2
    # v10/v11 tie; the id-asc rule makes ranks deterministic
    ranks = {v["vec_id"]: v["outlier_rank"] for v in out.values()
             if v["outlier_rank"] is not None}
    assert sorted(ranks.values()) == [1, 2]


def test_embedding_contamination_flags_planted(spark):
    from baselinr_spark.operators.embcurate import embedding_contamination

    # bench b10 = [1,0]; c1 aligned with it (cos 1.0), c2 orthogonal
    # (cos 0.0), c3 at 45 deg (cos ~0.7071)
    bench = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, -1.0])], ["vec_id", "embedding"])
    corpus = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.0, 3.0]), (3, [1.0, 1.0]), (4, None)],
        ["vec_id", "embedding"])
    rows = {r["vec_id"]: r for r in embedding_contamination(
        corpus, bench, threshold=0.7).collect()}
    assert set(rows) == {1, 2, 3}  # NULL vector excluded
    assert abs(rows[1]["max_cosine"] - 1.0) < 1e-9
    assert rows[1]["bench_id"] == 10 and rows[1]["contaminated"]
    assert abs(rows[2]["max_cosine"] - 0.0) < 1e-9
    assert rows[2]["bench_id"] == 10 and not rows[2]["contaminated"]
    assert abs(rows[3]["max_cosine"] - 2 ** -0.5) < 1e-9
    assert rows[3]["contaminated"]  # 0.7071 >= 0.7


def test_embedding_contamination_tie_breaks_low_bench_id(spark):
    from baselinr_spark.operators.embcurate import embedding_contamination

    # both bench vectors identical -> equal cosine; argmax must pick
    # the LOWER bench id
    bench = spark.createDataFrame(
        [(20, [1.0, 0.0]), (5, [1.0, 0.0])], ["vec_id", "embedding"])
    corpus = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    (row,) = embedding_contamination(corpus, bench, threshold=0.5).collect()
    assert row["bench_id"] == 5 and row["contaminated"]


def test_embedding_hygiene_hand_computed(spark):
    """One clean unit vector, one NULL, one wrong-dim, one NaN, one
    zero vector: each lands in exactly one bucket; norms come from
    the clean row only."""
    import math

    from baselinr_spark.operators.embcurate import embedding_hygiene

    rows = [
        (1, [3.0, 4.0]),          # clean, norm 5
        (2, None),                # null
        (3, [1.0]),               # wrong dim
        (4, [float("nan"), 1.0]), # non-finite
        (5, [0.0, 0.0]),          # zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    (r,) = embedding_hygiene(df, "embedding", expected_dim=2).collect()
    assert r["n_vectors"] == 5 and r["n_clean"] == 1
    assert r["n_null"] == 1 and r["n_wrong_dim"] == 1
    assert r["n_nonfinite"] == 1 and r["n_zero_norm"] == 1
    assert math.isclose(r["norm_min"], 5.0) and math.isclose(r["norm_max"], 5.0)


def test_embedding_hygiene_inf_is_nonfinite(spark):
    from baselinr_spark.operators.embcurate import embedding_hygiene

    df = spark.createDataFrame(
        [(1, [float("inf"), 0.0]), (2, [float("-inf"), 0.0])],
        "vec_id long, embedding array<double>",
    )
    (r,) = embedding_hygiene(df, "embedding", expected_dim=2).collect()
    assert r["n_nonfinite"] == 2 and r["n_clean"] == 0
