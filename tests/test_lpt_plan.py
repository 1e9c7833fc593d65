"""Hand-computed expectations for the greedy LPT shard balancer
(operators/sharding.py:lpt_shard_plan)."""

import pytest

from baselinr_spark.operators.sharding import lpt_shard_plan


def test_lpt_hand_computed(spark):
    # sizes 10,8,6,4,2 on 2 shards:
    # a->0 [10,0]; b->1 [10,8]; c->1 [10,14]; d->0 [14,14];
    # e->0 (tie breaks to first index) [16,14]
    df = spark.createDataFrame(
        [("a", 10.0), ("b", 8.0), ("c", 6.0), ("d", 4.0), ("e", 2.0)],
        "k string, n double",
    )
    out = {r["key"]: r for r in lpt_shard_plan(df, "k", "n", n_shards=2).collect()}
    assert out["a"]["shard"] == 0 and out["a"]["load_after"] == 10.0
    assert out["b"]["shard"] == 1 and out["b"]["load_after"] == 8.0
    assert out["c"]["shard"] == 1 and out["c"]["load_after"] == 14.0
    assert out["d"]["shard"] == 0 and out["d"]["load_after"] == 14.0
    assert out["e"]["shard"] == 0 and out["e"]["load_after"] == 16.0


def test_lpt_equal_sizes_tiebreak_on_key(spark):
    df = spark.createDataFrame([("b", 5.0), ("a", 5.0)], "k string, n double")
    out = {r["key"]: r for r in lpt_shard_plan(df, "k", "n", n_shards=2).collect()}
    # sorted (5, a), (5, b): a takes shard 0, b shard 1
    assert out["a"]["shard"] == 0
    assert out["b"]["shard"] == 1


def test_lpt_balances_vs_hash_worst_case(spark):
    # one giant key + many small: giant alone on a shard, makespan
    # = max(giant, sum(small)) which is optimal here
    rows = [("g", 100.0)] + [(f"s{i}", 10.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, n double")
    out = lpt_shard_plan(df, "k", "n", n_shards=2).collect()
    loads = {}
    for r in out:
        loads[r["shard"]] = max(loads.get(r["shard"], 0.0), r["load_after"])
    assert max(loads.values()) == pytest.approx(100.0)
