"""Range joins + time rollup: hand-computed fixtures, bucket-boundary
edges, dedup-by-construction (long intervals over many buckets), and
rollup-vs-direct-aggregation equality."""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.temporal import (
    interval_overlap_join,
    interval_point_join,
    time_rollup,
)


def _pairs(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_point_join_basic_and_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (1, 9.0), (1, 10.0), (1, 30.0), (2, 5.0)],
        "k int, pt double",
    )
    ivs = spark.createDataFrame(
        [(1, 0.0, 9.0, "A"), (1, 9.0, 30.0, "B"), (2, 6.0, 7.0, "C")],
        "k int, s double, e double, name string",
    )
    out = interval_point_join(pts, ivs, "pt", "s", "e", keys=["k"],
                              bucket_width=4.0)
    # closed intervals: pt=9 matches BOTH A (end-inclusive) and B
    # (start-inclusive); pt=30 matches B end; (2,5) outside C
    assert _pairs(out, "pt", "name") == [
        (0.0, "A"), (9.0, "A"), (9.0, "B"), (10.0, "B"), (30.0, "B"),
    ]


def test_point_join_no_duplicate_matches_across_buckets(spark):
    # one interval spanning 100 buckets must still match each point once
    pts = spark.createDataFrame([(i * 1.0,) for i in range(50)], "pt double")
    ivs = spark.createDataFrame([(0.0, 99.0, "wide")],
                                "s double, e double, name string")
    out = interval_point_join(pts, ivs, "pt", "s", "e", bucket_width=1.0)
    assert out.count() == 50
    assert out.select("pt").distinct().count() == 50


def test_point_join_left_and_clash_guard(spark):
    pts = spark.createDataFrame([(1, 1.0), (1, 50.0)], "k int, pt double")
    ivs = spark.createDataFrame([(1, 0.0, 2.0, "A")],
                                "k int, s double, e double, name string")
    out = interval_point_join(pts, ivs, "pt", "s", "e", keys=["k"],
                              bucket_width=10.0, how="left")
    assert _pairs(out, "pt", "name") == [(1.0, "A"), (50.0, None)]
    with pytest.raises(ValueError, match="share non-key"):
        interval_point_join(
            pts.withColumnRenamed("pt", "s"), ivs, "s", "s", "e", keys=["k"]
        )


def test_point_join_matches_naive_theta_join(spark):
    """Randomized cross-check vs the naive non-equi join."""
    import numpy as np

    rng = np.random.default_rng(11)
    pts = spark.createDataFrame(
        [(int(k), float(t)) for k, t in
         zip(rng.integers(0, 3, 120), np.round(rng.uniform(0, 200, 120), 2))],
        "k int, pt double",
    )
    starts = np.round(rng.uniform(0, 180, 40), 2)
    ivs = spark.createDataFrame(
        [(int(k), float(s), float(s + d), i) for i, (k, s, d) in
         enumerate(zip(rng.integers(0, 3, 40), starts,
                       np.round(rng.uniform(0, 40, 40), 2)))],
        "k int, s double, e double, iid int",
    )
    got = _pairs(
        interval_point_join(pts, ivs, "pt", "s", "e", keys=["k"],
                            bucket_width=13.0),
        "k", "pt", "iid",
    )
    want = _pairs(
        pts.alias("p").join(
            ivs.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("p.pt") >= F.col("i.s"))
            & (F.col("p.pt") <= F.col("i.e")),
        ).select(F.col("p.k").alias("k"), "pt", "iid"),
        "k", "pt", "iid",
    )
    assert got == want


def test_overlap_join_exact_once(spark):
    a = spark.createDataFrame(
        [(1, 0.0, 10.0, "x"), (1, 20.0, 30.0, "y"), (1, 5.0, 95.0, "long")],
        "k int, sa double, ea double, an string",
    )
    b = spark.createDataFrame(
        [(1, 5.0, 25.0, "p"), (1, 40.0, 50.0, "q"), (1, 200.0, 210.0, "far")],
        "k int, sb double, eb double, bn string",
    )
    out = interval_overlap_join(a, b, "sa", "ea", "sb", "eb", keys=["k"],
                                bucket_width=6.0)
    # x∩p, y∩p, long∩p, long∩q — each exactly once despite `long`
    # overlapping p and q across many buckets
    assert _pairs(out, "an", "bn") == [
        ("long", "p"), ("long", "q"), ("x", "p"), ("y", "p"),
    ]


def test_overlap_join_touching_endpoints(spark):
    a = spark.createDataFrame([(0.0, 10.0, "x")], "sa double, ea double, an string")
    b = spark.createDataFrame([(10.0, 20.0, "p"), (20.5, 21.0, "q")],
                              "sb double, eb double, bn string")
    out = interval_overlap_join(a, b, "sa", "ea", "sb", "eb", bucket_width=3.0)
    assert _pairs(out, "an", "bn") == [("x", "p")]  # closed: touch counts


def test_rollup_equals_direct_aggregation(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [
        (f"2024-{m:02d}-{d:02d} {h:02d}:{mi:02d}:00", float(v))
        for m, d, h, mi, v in zip(
            rng.integers(1, 4, 300), rng.integers(1, 28, 300),
            rng.integers(0, 24, 300), rng.integers(0, 60, 300),
            np.round(rng.uniform(-5, 100, 300), 3),
        )
    ]
    df = spark.createDataFrame(rows, "ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = time_rollup(df, "ts", "v", grains=("hour", "day", "month"))
    for g in ("hour", "day", "month"):
        got = _pairs(
            out.filter(F.col("grain") == g).select(
                F.col("bucket_start").cast("string").alias("b"),
                "n", F.round("sum", 6).alias("sum"),
                "min", "max", F.round("avg", 6).alias("avg"),
            ),
            "b", "n", "sum", "min", "max", "avg",
        )
        want = _pairs(
            df.groupBy(F.date_trunc(g, "ts").cast("string").alias("b")).agg(
                F.count("v").alias("n"), F.round(F.sum("v"), 6).alias("sum"),
                F.min("v").alias("min"), F.max("v").alias("max"),
                F.round(F.sum("v") / F.count("v"), 6).alias("avg"),
            ),
            "b", "n", "sum", "min", "max", "avg",
        )
        assert got == want, g


def test_rollup_keys_and_single_scan(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0), ("2024-01-01 03:00:00", "a", 2.0),
         ("2024-01-01 00:20:00", "b", 4.0)],
        "ts string, g string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_rollup(df, "ts", "v", grains=("hour", "day"), keys=["g"])
    day = _pairs(out.filter("grain = 'day'"), "g", "n", "sum")
    assert day == [("a", 2, 3.0), ("b", 1, 4.0)]
    with pytest.raises(ValueError, match="unknown grain"):
        time_rollup(df, "ts", "v", grains=("fortnight",))


def test_sessionize_hand_computed(spark):
    from baselinr_spark.operators.temporal import session_stats, sessionize

    rows = [
        ("u1", 0.0), ("u1", 100.0), ("u1", 1900.0),   # gap 1800 exact: SAME session
        ("u1", 3701.0),                                # gap 1801 -> new session
        ("u2", 50.0),
    ]
    df = spark.createDataFrame(rows, "u string, t double")
    sess = sessionize(df, "u", "t", gap=1800.0)
    got = sorted((r["u"], r["t"], r["session_idx"]) for r in sess.collect())
    assert got == [
        ("u1", 0.0, 1), ("u1", 100.0, 1), ("u1", 1900.0, 1),
        ("u1", 3701.0, 2), ("u2", 50.0, 1),
    ]
    stats = session_stats(sess, "u", "t")
    s = sorted((r["u"], r["session_idx"], r["n_events"], r["duration_s"])
               for r in stats.collect())
    assert s == [("u1", 1, 3, 1900.0), ("u1", 2, 1, 0.0), ("u2", 1, 1, 0.0)]


def test_sessionize_timestamp_column(spark):
    from baselinr_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00"), ("u", "2024-01-01 00:29:00"),
         ("u", "2024-01-01 01:00:01")],
        "u string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(r["session_idx"] for r in
                 sessionize(df, "u", "ts", gap=1800.0).collect())
    assert got == [1, 1, 2]
