"""Deterministic shard export (operators/sharding.py) — hand-computed
md5 expectations plus round-trip invariants."""

import hashlib
import os

import pytest
from pyspark.sql import Row

from baselinr_spark.operators.sharding import (
    assign_shards,
    mixture_interleave,
    shard_manifest,
    shard_positions,
    write_shards,
)


def _md5_long(s: str, nhex: int = 8) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def _corpus(spark, n=40):
    rows = [
        Row(doc_id=i, text=f"tok{i} alpha beta" if i % 7 else "", source=f"s{i % 3}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_assign_shards_matches_md5_and_is_partitioning_invariant(spark):
    df = _corpus(spark)
    got = {
        r["doc_id"]: (r["shard_id"], r["order_key"])
        for r in assign_shards(df, n_shards=4, salt="shard").collect()
    }
    for i in range(40):
        assert got[i][0] == _md5_long(f"{i}|shard") % 4
        assert got[i][1] == _md5_long(f"{i}|shard#o", nhex=15)
    # same assignment regardless of physical layout
    got2 = {
        r["doc_id"]: (r["shard_id"], r["order_key"])
        for r in assign_shards(df.repartition(7), n_shards=4).collect()
    }
    assert got == got2


def test_shard_positions_contiguous_and_ordered(spark):
    sharded = assign_shards(_corpus(spark), n_shards=4)
    pos = shard_positions(sharded).collect()
    by_shard = {}
    for r in pos:
        by_shard.setdefault(r["shard_id"], []).append(r)
    total = 0
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["shard_pos"])
        assert [r["shard_pos"] for r in rows] == list(range(len(rows)))
        keys = [r["order_key"] for r in rows]
        assert keys == sorted(keys)
        total += len(rows)
    assert total == 40


def test_shard_manifest_accounting(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b  c"),  # 3 tokens, 6 bytes
            Row(doc_id=2, text=""),  # 0 tokens
            Row(doc_id=3, text="  xx  "),  # 1 token
        ]
    )
    sharded = assign_shards(df, n_shards=1)
    m = shard_manifest(sharded).collect()
    assert len(m) == 1
    r = m[0]
    assert r["n_docs"] == 3
    assert r["total_tokens"] == 4
    assert r["total_bytes"] == len("a b  c") + 0 + len("  xx  ")
    # first_doc = the id with the smallest order key
    first = min(
        (1, 2, 3), key=lambda i: _md5_long(f"{i}|shard#o", nhex=15)
    )
    assert r["first_doc"] == first


def test_manifest_agrees_with_positions(spark):
    sharded = assign_shards(_corpus(spark), n_shards=4)
    firsts = {
        r["shard_id"]: r["doc_id"]
        for r in shard_positions(sharded).filter("shard_pos = 0").collect()
    }
    man = {r["shard_id"]: r for r in shard_manifest(sharded).collect()}
    assert set(man) == set(firsts)
    for sid, r in man.items():
        assert r["first_doc"] == firsts[sid]
    assert sum(r["n_docs"] for r in man.values()) == 40


def test_write_shards_roundtrip(spark, out_root):
    sharded = assign_shards(_corpus(spark), n_shards=3)
    path = os.path.join(out_root, "shards")
    write_shards(sharded, path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
    assert dirs == ["shard_id=0", "shard_id=1", "shard_id=2"]
    back = spark.read.parquet(path)
    assert back.count() == 40
    # every document lands in the shard the assignment dictates
    want = {
        r["doc_id"]: r["shard_id"] for r in sharded.collect()
    }
    got = {r["doc_id"]: r["shard_id"] for r in back.collect()}
    assert got == want


def test_mixture_interleave_key_formula_and_prefix_mixture(spark):
    df = _corpus(spark, n=300)
    weights = {"s0": 4.0, "s1": 1.0, "s2": 1.0}
    out = mixture_interleave(df, weights=weights, salt="mix").collect()
    for r in out:
        u = _md5_long(f"{r['doc_id']}|mix") / 16**8
        assert r["interleave_key"] == pytest.approx(
            u / weights[r["source"]], rel=1e-12
        )
    # prefix composition tilts toward the heavy source: in the first
    # quarter of the interleaved order, s0 (weight 4) should contribute
    # more documents than either unit-weight source
    ordered = sorted(out, key=lambda r: r["interleave_key"])[:75]
    counts = {}
    for r in ordered:
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    assert counts["s0"] > counts.get("s1", 0)
    assert counts["s0"] > counts.get("s2", 0)


def test_mixture_interleave_weight_column(spark):
    from pyspark.sql import functions as F

    df = _corpus(spark, n=20)
    out = mixture_interleave(
        df, weight=F.lit(2.0), salt="mix"
    ).collect()
    for r in out:
        u = _md5_long(f"{r['doc_id']}|mix") / 16**8
        assert r["interleave_key"] == pytest.approx(u / 2.0, rel=1e-12)


def test_hrw_minimal_movement(spark):
    """Removing a shard moves ONLY its keys; others stay put — the
    rendezvous property mod-N sharding lacks."""
    from baselinr_spark.operators.sharding import hrw_assign

    ids = spark.range(200).withColumnRenamed("id", "doc_id")
    all5 = {r["doc_id"]: r["shard"]
            for r in hrw_assign(ids, "doc_id",
                                ["a", "b", "c", "d", "e"]).collect()}
    no_c = {r["doc_id"]: r["shard"]
            for r in hrw_assign(ids, "doc_id",
                                ["a", "b", "d", "e"]).collect()}
    for k, s in all5.items():
        if s == "c":
            assert no_c[k] != "c"
        else:
            assert no_c[k] == s
    # and each shard actually owns something (balance sanity)
    assert len(set(all5.values())) == 5


def test_hrw_zero_shuffle_plan(spark):
    from baselinr_spark.operators.sharding import hrw_assign

    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    out = hrw_assign(ids, "doc_id", ["a", "b"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local argmax, no shuffle


def test_bloom_plan_textbook_values(spark):
    """n=1000, p=0.01 -> m=9586 bits, k=7, fpr ~= 0.0101."""
    from baselinr_spark.operators.sketch import bloom_plan

    counts = spark.createDataFrame([("g", 1000)], ["grp", "n"])
    r = bloom_plan(counts, "grp", "n", target_fpr=0.01).collect()[0]
    assert r["m_bits"] == 9586
    assert r["k_hashes"] == 7
    assert abs(r["actual_fpr"] - 0.01) < 0.001
