"""Hand-computed expectations for theil_sen (robust trend) and
triangle_stats (degree-oriented triangle counting)."""

import pytest

from baselinr_spark.operators.linkgraph import triangle_stats
from baselinr_spark.operators.trend import theil_sen


def test_theil_sen_resists_outlier(spark):
    # (0,0) (1,1) (2,2) (3,10): pairwise slopes [1,1,1,10/3,4.5,8]
    # median slope = (1 + 10/3)/2 = 13/6; residuals [0, -7/6, -7/3, 3.5]
    # median intercept = (-7/6 + 0)/2 = -7/12
    df = spark.createDataFrame(
        [("m", 0.0, 0.0), ("m", 1.0, 1.0), ("m", 2.0, 2.0), ("m", 3.0, 10.0)],
        "grp string, x double, y double",
    )
    r = theil_sen(df, ["grp"], "x", "y").collect()[0]
    assert r["n_points"] == 4
    assert r["slope"] == pytest.approx(13 / 6)
    assert r["intercept"] == pytest.approx(-7 / 12)


def test_theil_sen_exact_line(spark):
    rows = [("m", float(x), 2.0 * x + 3.0) for x in range(5)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    r = theil_sen(df, ["grp"], "x", "y").collect()[0]
    assert r["slope"] == pytest.approx(2.0)
    assert r["intercept"] == pytest.approx(3.0)


def test_theil_sen_single_point_group_dropped(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 1.0), ("b", 0.0, 1.0), ("b", 1.0, 2.0)],
        "grp string, x double, y double",
    )
    out = {r["grp"] for r in theil_sen(df, ["grp"], "x", "y").collect()}
    assert out == {"b"}


def test_triangle_stats_hand_computed(spark):
    # K3 {a,b,c} plus pendant edge c-d and a second triangle {c,d,e}
    # sharing vertex... graph: a-b, b-c, a-c, c-d, d-e, c-e
    # triangles: {a,b,c} and {c,d,e}
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("c", "e"),
         ("b", "a")],  # parallel reverse edge must collapse
        "src string, dst string",
    )
    out = {r["node"]: r for r in triangle_stats(edges).collect()}
    assert out["a"]["degree"] == 2 and out["a"]["triangles"] == 1
    assert out["b"]["degree"] == 2 and out["b"]["triangles"] == 1
    assert out["c"]["degree"] == 4 and out["c"]["triangles"] == 2
    assert out["d"]["degree"] == 2 and out["d"]["triangles"] == 1
    assert out["e"]["degree"] == 2 and out["e"]["triangles"] == 1
    # clustering: a = 2*1/(2*1) = 1.0; c = 2*2/(4*3) = 1/3
    assert out["a"]["clustering"] == pytest.approx(1.0)
    assert out["c"]["clustering"] == pytest.approx(1 / 3)


def test_triangle_stats_triangle_free(spark):
    # path graph a-b-c: no triangles, clustering 0 everywhere
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    out = {r["node"]: r for r in triangle_stats(edges).collect()}
    assert all(r["triangles"] == 0 for r in out.values())
    assert all(r["clustering"] == 0.0 for r in out.values())
    assert out["b"]["degree"] == 2


def test_triangle_stats_ignores_self_loops(spark):
    edges = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "c"), ("a", "c")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in triangle_stats(edges).collect()}
    assert out["a"]["degree"] == 2
    assert out["a"]["triangles"] == 1
