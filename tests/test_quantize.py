"""Hand-computed expectations for int8 scalar quantization (sq_stats)
and JL sign-projection distortion (jl_project / jl_distortion)."""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.quantize import jl_distortion, jl_project, sq_stats


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_sq_stats_hand_computed(spark):
    # dim0 over [0,1,2]: scale 2/255; x=1 -> code floor(127.5+0.5)=128,
    # recon 256/255 -> err 1/255; endpoints exact.
    # dim1 constant 5.0: degenerate -> scale 0, zero error.
    df = _emb_df(spark, [(0, [0.0, 5.0]), (1, [1.0, 5.0]), (2, [2.0, 5.0])])
    out = {r["dim"]: r for r in sq_stats(df, "embedding").collect()}
    d0 = out[0]
    assert d0["dmin"] == 0.0 and d0["dmax"] == 2.0
    assert d0["scale"] == pytest.approx(2 / 255)
    assert d0["max_abs_err"] == pytest.approx(1 / 255)
    assert d0["mse"] == pytest.approx((1 / 255) ** 2 / 3)
    d1 = out[1]
    assert d1["scale"] == 0.0
    assert d1["mse"] == 0.0 and d1["max_abs_err"] == 0.0


def test_jl_project_unit_vector_magnitudes(spark):
    # e_i projects to y_j = sign(i, j)/sqrt(k): every |y_j| = 1/sqrt(k)
    k = 8
    df = _emb_df(spark, [(0, [1.0, 0.0, 0.0])])
    rows = jl_project(df, "vec_id", "embedding", k=k).collect()
    assert len(rows) == k
    for r in rows:
        assert abs(r["y"]) == pytest.approx(1 / k**0.5)


def test_jl_distortion_single_axis_delta_is_exact(spark):
    # b = a + delta*e_0: d_orig = delta and d_proj = delta (sign^2 = 1),
    # so ratio is exactly 1.0 regardless of k.
    df = _emb_df(spark, [(0, [1.0, 2.0, 3.0]), (1, [4.0, 2.0, 3.0])])
    r = jl_distortion(df, "vec_id", "embedding", k=4).collect()[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert r["d_orig"] == pytest.approx(3.0)
    assert r["d_proj"] == pytest.approx(3.0)
    assert r["ratio"] == pytest.approx(1.0)


def test_jl_distortion_coincident_pair_ratio_zero(spark):
    df = _emb_df(spark, [(0, [1.0, 1.0]), (1, [1.0, 1.0])])
    r = jl_distortion(df, "vec_id", "embedding", k=4).collect()[0]
    assert r["d_orig"] == 0.0 and r["d_proj"] == pytest.approx(0.0)
    assert r["ratio"] == 0.0
