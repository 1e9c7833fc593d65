"""Lloyd k-means (operators/kmeans.py) — hand-computed expectations on
a tiny separable dataset plus invariants on the embeddings fixture."""

import pytest
from pyspark.sql import Row

from baselinr_spark.operators.kmeans import (
    assign_nearest,
    kmeans_inertia,
    kmeans_lloyd,
)
from baselinr_spark.operators.similarity import ivf_centroids


def _points(spark):
    # two tight groups on a line: {0.0, 0.2} and {10.0, 10.4}
    rows = [
        Row(vec_id=1, embedding=[0.0, 0.0]),
        Row(vec_id=2, embedding=[0.2, 0.0]),
        Row(vec_id=3, embedding=[10.0, 0.0]),
        Row(vec_id=4, embedding=[10.4, 0.0]),
    ]
    return spark.createDataFrame(rows)


def test_assign_nearest_ties_break_low_id(spark):
    pts = spark.createDataFrame([Row(vec_id=1, embedding=[0.5, 0.0])])
    cents = spark.createDataFrame(
        [
            Row(centroid_id=0, centroid_vec=[0.0, 0.0]),
            Row(centroid_id=1, centroid_vec=[1.0, 0.0]),
        ]
    )
    r = assign_nearest(pts, cents, "vec_id", "embedding").collect()[0]
    # equidistant (0.25 both sides) -> lowest centroid_id wins
    assert r["centroid_id"] == 0
    assert r["sqdist"] == pytest.approx(0.25)


def test_lloyd_converges_to_group_means(spark):
    df = _points(spark)
    out = {
        r["vec_id"]: r
        for r in kmeans_lloyd(
            df, "vec_id", "embedding", n_centroids=2, iters=2
        ).collect()
    }
    # the two groups must land in different clusters, co-members share
    assert out[1]["centroid_id"] == out[2]["centroid_id"]
    assert out[3]["centroid_id"] == out[4]["centroid_id"]
    assert out[1]["centroid_id"] != out[3]["centroid_id"]
    # after an update pass the centroids are the group means
    # (0.1, 0) and (10.2, 0) -> sqdist 0.1^2 for group one (spacing
    # 0.2) and 0.2^2 for group two (spacing 0.4)
    for vid in (1, 2):
        assert out[vid]["sqdist"] == pytest.approx(0.01)
    for vid in (3, 4):
        assert out[vid]["sqdist"] == pytest.approx(0.04)


def test_inertia_summary(spark):
    df = _points(spark)
    a = kmeans_lloyd(df, "vec_id", "embedding", n_centroids=2, iters=2)
    s = {r["centroid_id"]: r for r in kmeans_inertia(a).collect()}
    assert sorted(r["n_members"] for r in s.values()) == [2, 2]
    # one cluster holds the 0.2-spaced pair (WCSS 0.02), the other the
    # 0.4-spaced pair (WCSS 0.08)
    assert sorted(
        round(r["inertia"], 9) for r in s.values()
    ) == [pytest.approx(0.02), pytest.approx(0.08)]


def test_empty_cluster_keeps_seed(spark):
    # k = n points, but two points coincide -> one seed never wins;
    # its centroid must survive the update (coalesce path), so the
    # final assignment still references a valid vector for every id
    rows = [
        Row(vec_id=1, embedding=[0.0, 0.0]),
        Row(vec_id=2, embedding=[0.0, 0.0]),
        Row(vec_id=3, embedding=[5.0, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    out = kmeans_lloyd(df, "vec_id", "embedding", n_centroids=3, iters=2)
    rows_out = out.collect()
    assert len(rows_out) == 3
    assert all(r["sqdist"] is not None for r in rows_out)


def test_iteration_never_increases_inertia(spark):
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        pytest.skip("driver testdata not present")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = emb.limit(120)

    def total_inertia(iters):
        a = kmeans_lloyd(df, "vec_id", "embedding", n_centroids=4, iters=iters)
        return a.agg({"sqdist": "sum"}).collect()[0][0]

    seed_cents = ivf_centroids(df, "vec_id", "embedding", n_centroids=4)
    i0 = (
        assign_nearest(df, seed_cents, "vec_id", "embedding")
        .agg({"sqdist": "sum"})
        .collect()[0][0]
    )
    i1, i2 = total_inertia(1), total_inertia(2)
    assert i1 <= i0 + 1e-9
    assert i2 <= i1 + 1e-9


def test_simplified_silhouette_separated_clusters(spark):
    """Two tight, far-apart blobs with k=2: silhouettes near 1 for
    both clusters; every point has a = small, b = large."""
    from baselinr_spark.operators.kmeans import simplified_silhouette

    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(4)]
    rows += [(10 + i, [100.0 + 0.01 * i, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = simplified_silhouette(
        df, "vec_id", "embedding", n_centroids=2, iters=2
    ).collect()
    assert len(out) == 2
    assert sum(r["n_members"] for r in out) == 8
    for r in out:
        assert r["avg_silhouette"] > 0.99


def test_simplified_silhouette_single_blob_low(spark):
    """One blob split across k=2: points near the boundary score low,
    so the average silhouette sits well below the separated case."""
    from baselinr_spark.operators.kmeans import simplified_silhouette

    rows = [(i, [float(i), 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = simplified_silhouette(
        df, "vec_id", "embedding", n_centroids=2, iters=2
    ).collect()
    assert all(r["avg_silhouette"] < 0.9 for r in out)
