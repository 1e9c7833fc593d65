"""Salt planner + two-stage salted aggregation (operators/skewaudit.py)."""

import pytest

from baselinr_spark.operators.skewaudit import (
    apply_salt,
    salt_plan,
    salted_group_count,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 12 rows of key "hot", 2 of "warm", 1 of "cold" -> 15 rows, 3 keys
    rows = [("hot", i) for i in range(12)]
    rows += [("warm", i) for i in range(2)]
    rows += [("cold", 0)]
    return spark.createDataFrame(rows, ["k", "payload"])


def test_salt_plan_values(skewed):
    plan = {r["k"]: r for r in
            salt_plan(skewed, "k", target_rows_per_task=4).collect()}
    assert plan["hot"]["cnt"] == 12
    assert plan["hot"]["salt_factor"] == 3  # ceil(12/4)
    assert plan["hot"]["share"] == 0.8
    assert plan["hot"]["skew_ratio"] == 2.4  # 12 * 3 keys / 15 rows
    assert plan["warm"]["salt_factor"] == 1
    assert plan["cold"]["salt_factor"] == 1


def test_salt_plan_top_k_order(skewed):
    got = [r["k"] for r in
           salt_plan(skewed, "k", target_rows_per_task=4, top_k=2).collect()]
    assert got == ["hot", "warm"]


def test_apply_salt_bounded_and_deterministic(skewed):
    plan = salt_plan(skewed, "k", target_rows_per_task=4)
    a = apply_salt(skewed, "k", plan, entropy_col="payload").collect()
    b = apply_salt(skewed, "k", plan, entropy_col="payload").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        limit = 3 if r["k"] == "hot" else 1
        assert 0 <= r["__salt"] < limit
    # the hot key actually fans out across >1 salt bucket
    hot_salts = {r["__salt"] for r in a if r["k"] == "hot"}
    assert len(hot_salts) > 1


def test_salted_count_equals_unsalted(skewed):
    plan = salt_plan(skewed, "k", target_rows_per_task=4)
    salted = {
        r["k"]: r["cnt"]
        for r in salted_group_count(skewed, "k", plan,
                                    entropy_col="payload").collect()
    }
    plain = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    assert salted == plain


def test_salt_plan_shape(skewed):
    """Top-k must be TakeOrderedAndProject (no global sort) and the
    corpus is read by exactly one aggregate."""
    plan = (
        salt_plan(skewed, "k", target_rows_per_task=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan  # 1-row totals broadcast


def test_shard_spillover_values(spark):
    from baselinr_spark.operators.dedup import shard_spillover

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], ["id_a", "id_b"]
    )
    asg = spark.createDataFrame(
        [(1, "x"), (2, "x"),          # same shard
         (3, "x"), (4, "y"),          # cross
         (5, "y"), (6, "y"),          # same
         (7, "y"), (8, "x")],         # cross
        ["doc_id", "shard"],
    )
    r = shard_spillover(pairs, asg, "doc_id").collect()[0]
    assert r["n_pairs"] == 4
    assert r["n_same_shard"] == 2
    assert r["spillover_frac"] == 0.5
