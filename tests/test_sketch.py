"""Bloom filter + Z-order key: no-false-negative guarantee,
mergeability, hand-computed Morton interleave, and the locality
property that justifies z-ordering (range-chunked z-sorted data has
tighter per-chunk min/max than the naive single-column sort)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.sketch import (
    bloom_build,
    bloom_positions,
    bloom_probe,
    zorder_key,
)

M, K = 1 << 12, 5


def _py_positions(key: str) -> list[int]:
    return [
        int(hashlib.md5(f"{key}|bloom{i}".encode()).hexdigest()[:8], 16) % M
        for i in range(K)
    ]


def test_positions_match_reference_hash(spark):
    df = spark.createDataFrame([("alpha",), ("beta",)], "k string")
    got = {r["k"]: r["p"] for r in df.select(
        "k", bloom_positions(F.col("k"), M, K).alias("p")).collect()}
    assert got["alpha"] == _py_positions("alpha")
    assert got["beta"] == _py_positions("beta")


def test_no_false_negatives_and_fp_sane(spark):
    seen = spark.createDataFrame([(f"key{i}",) for i in range(300)], "k string")
    bloom = bloom_build(seen, "k", m=M, k=K)
    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(250, 350)]
        + [(f"other{i}",) for i in range(500)],
        "k string",
    )
    res = {r["k"]: r["maybe_seen"] for r in
           bloom_probe(probe, bloom, "k", m=M, k=K).collect()}
    # every seen key MUST hit (bloom guarantee)
    assert all(res[f"key{i}"] for i in range(250, 300))
    # unseen: fp rate at these sizings (n=300, m=4096, k=5 -> ~0.2%)
    fps = sum(1 for i in range(500) if res[f"other{i}"])
    unseen_keys = sum(1 for i in range(300, 350) if res[f"key{i}"])
    assert fps + unseen_keys <= 25  # generous 10x the expected rate


def test_bloom_merge_is_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
    merged = bloom_build(a, "k", m=M, k=K).unionByName(
        bloom_build(b, "k", m=M, k=K)).distinct()
    direct = bloom_build(a.unionByName(b), "k", m=M, k=K)
    assert sorted(r["pos"] for r in merged.collect()) == \
        sorted(r["pos"] for r in direct.collect())


def test_bloom_probe_plan_has_no_shuffle_of_probe(spark):
    seen = spark.createDataFrame([("x",)], "k string")
    bloom = bloom_build(seen, "k", m=M, k=K)
    probed = bloom_probe(
        spark.createDataFrame([("x",), ("y",)], "k string"),
        bloom, "k", m=M, k=K,
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == K
    assert "SortMergeJoin" not in plan


def test_zorder_hand_computed_interleave(spark):
    # 4 distinct values per column, bits=2 -> ranks 0..3 exactly;
    # cuts at 1/4,2/4,3/4 quantiles of {0,1,2,3} = 0.75,1.5,2.25 ->
    # rank(v) = #cuts <= v = v for v in 0..3
    rows = [(float(x), float(y)) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x double, y double")
    z = {(r["x"], r["y"]): r["zorder"] for r in
         zorder_key(df, ["x", "y"], bits=2).collect()}

    def morton(rx, ry):
        out = 0
        for b in range(2):
            out |= ((rx >> b) & 1) << (2 * b)
            out |= ((ry >> b) & 1) << (2 * b + 1)
        return out

    for x in range(4):
        for y in range(4):
            assert z[(float(x), float(y))] == morton(x, y), (x, y)


def test_zorder_locality_beats_single_column_sort(spark):
    """Chunk 1024 uniform 2-D points into 16 chunks: z-sorted chunks
    must have a smaller total y-extent than x-sorted chunks (which
    know nothing about y) — the min/max pruning win."""
    import numpy as np

    rng = np.random.default_rng(5)
    pts = [(float(x), float(y)) for x, y in
           zip(rng.uniform(0, 1, 1024), rng.uniform(0, 1, 1024))]
    df = spark.createDataFrame(pts, "x double, y double")
    z = zorder_key(df, ["x", "y"], bits=5).toPandas()

    def chunk_extent(pdf, sort_col):
        s = pdf.sort_values(sort_col).reset_index(drop=True)
        total = 0.0
        for i in range(0, 1024, 64):
            ch = s.iloc[i:i + 64]
            total += (ch["x"].max() - ch["x"].min()) + \
                     (ch["y"].max() - ch["y"].min())
        return total

    assert chunk_extent(z, "zorder") < 0.7 * chunk_extent(z, "x")


def test_zorder_guard(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(df, ["x"] * 8, bits=8)


# --------------------------------------------------------------- count-min
def _cms_ref_col(row: int, key: str, width: int) -> int:
    h = hashlib.md5(f"{row}|{key}".encode()).hexdigest()[:8]
    return int(h, 16) % width


def test_cms_cells_match_reference_hash(spark):
    from baselinr_spark.operators.sketch import cms_build

    keys = ["a", "b", "a", "c", "a", "b"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    cells = {(r["row"], r["col"]): r["cnt"]
             for r in cms_build(df, "k", width=32, depth=3).collect()}
    expect = {}
    for k in keys:
        for d in range(3):
            cell = (d, _cms_ref_col(d, k, 32))
            expect[cell] = expect.get(cell, 0) + 1
    assert cells == expect


def test_cms_never_undercounts_and_unique_keys_exact(spark):
    from baselinr_spark.operators.sketch import cms_build, cms_query

    rows = [(f"k{i % 7}",) for i in range(140)] + [("hot",)] * 60
    df = spark.createDataFrame(rows, "k string")
    true = {}
    for (k,) in rows:
        true[k] = true.get(k, 0) + 1
    sketch = cms_build(df, "k", width=256, depth=4)
    est = {r["k"]: r["est"] for r in cms_query(sketch, df, "k", width=256, depth=4).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, k
    # 8 distinct keys in 256*4 cells: collisions essentially impossible
    assert est == true


def test_cms_merge_is_union(spark):
    from baselinr_spark.operators.sketch import cms_build, cms_query

    a = spark.createDataFrame([("x",), ("y",), ("x",)], "k string")
    b = spark.createDataFrame([("x",), ("z",)], "k string")
    both = a.unionByName(b)
    merged = (
        cms_build(a, "k", width=64, depth=3)
        .unionByName(cms_build(b, "k", width=64, depth=3))
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(both, "k", width=64, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est = {r["k"]: r["est"]
           for r in cms_query(merged, both, "k", width=64, depth=3).collect()}
    assert est == {"x": 3, "y": 1, "z": 1}


def test_cms_heavy_keys_threshold(spark):
    from baselinr_spark.operators.sketch import cms_heavy_keys

    rows = [("hot",)] * 50 + [("warm",)] * 10 + [(f"c{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "k string")
    got = cms_heavy_keys(df, "k", width=512, depth=4, min_count=10).collect()
    assert [(r["k"], r["est"]) for r in got] == [("hot", 50), ("warm", 10)]


def test_cms_query_plan_broadcasts_sketch(spark):
    from baselinr_spark.operators.sketch import cms_build, cms_query

    df = spark.createDataFrame([(f"k{i}",) for i in range(30)], "k string")
    sketch = cms_build(df, "k", width=64, depth=3)
    plan = cms_query(sketch, df, "k", width=64, depth=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


# ------------------------------------------------------------- hyperloglog
def _hll_ref_register(key: str, p: int = 12):
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    m = 1 << p
    idx, w = h % m, h >> p
    rank = (60 - p) - w.bit_length() + 1 if w > 0 else (60 - p) + 1
    return idx, rank


def test_hll_registers_match_reference_hash(spark):
    from baselinr_spark.operators.sketch import hll_build

    keys = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["idx"]: r["rank"] for r in hll_build(df, "k").collect()}
    expect = {}
    for k in keys:
        idx, rank = _hll_ref_register(k)
        expect[idx] = max(expect.get(idx, 0), rank)
    assert got == expect


def test_hll_estimate_within_tolerance(spark):
    from baselinr_spark.operators.sketch import hll_build, hll_estimate

    n = 5000
    rows = [(f"u{i % n}",) for i in range(2 * n)]  # duplicates don't count
    df = spark.createDataFrame(rows, "k string")
    est = hll_estimate(hll_build(df, "k")).collect()[0]["estimate"]
    assert abs(est - n) / n < 0.05  # 3 sigma at p=12 is ~4.9%


def test_hll_merge_equals_union_build(spark):
    from baselinr_spark.operators.sketch import hll_build, hll_estimate, hll_merge

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)] + [("a0",)], "k string")
    merged = hll_merge(hll_build(a, "k"), hll_build(b, "k"))
    direct = hll_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    e_m = hll_estimate(merged).collect()[0]["estimate"]
    e_d = hll_estimate(direct).collect()[0]["estimate"]
    assert e_m == e_d


def test_hll_small_range_correction_exactish(spark):
    from baselinr_spark.operators.sketch import hll_build, hll_estimate

    df = spark.createDataFrame([(f"x{i}",) for i in range(20)], "k string")
    got = hll_estimate(hll_build(df, "k")).collect()[0]
    # linear counting regime: m ln(m/V) is near-exact for tiny n
    assert got["n_zero_registers"] >= 4076
    assert abs(got["estimate"] - 20) < 1.0


def test_hll_merge_of_halves_equals_single_build(spark):
    """Register-exact: merge(build(evens), build(odds)) == build(all)
    — the lossless-merge property that licenses per-snapshot
    sketching."""
    from baselinr_spark.operators.sketch import hll_build, hll_merge

    df = spark.createDataFrame(
        [(i, f"k{i % 97}") for i in range(500)], ["i", "k"]
    )
    whole = hll_build(df, "k", p=8)
    merged = hll_merge(
        hll_build(df.filter("i % 2 = 0"), "k", p=8),
        hll_build(df.filter("i % 2 = 1"), "k", p=8),
    )
    w = {r["idx"]: r["rank"] for r in whole.collect()}
    m = {r["idx"]: r["rank"] for r in merged.collect()}
    assert w == m
