"""Re-crawl interval planner (operators/revisit.py:revisit_schedule)."""

def test_revisit_schedule_planner(spark):
    from baselinr_spark.operators.revisit import revisit_schedule
    import math

    stats = spark.createDataFrame(
        [("never", 10, 20, 10, 0, 0.0),
         ("half", 10, 20, 10, 5, 0.5),
         ("always", 10, 20, 10, 10, 1.0)],
        ["grp", "n_pages", "n_visits", "n_revisits", "n_changes",
         "change_rate"],
    )
    got = {r["grp"]: r for r in
           revisit_schedule(stats, base_interval_days=7.0).collect()}
    # never-changing -> straight to the max interval
    assert got["never"]["next_interval_days"] == 365.0
    # r=0.5 at 7-day cadence, target p=0.5 -> SAME interval (7 days)
    lam = -math.log(0.5) / 7.0
    assert abs(got["half"]["lambda_per_day"] - round(lam, 6)) < 1e-9
    assert abs(got["half"]["next_interval_days"] - 7.0) < 1e-6
    # always-changing -> clamped to the min interval
    assert got["always"]["next_interval_days"] == 1.0


def test_revisit_schedule_clamps(spark):
    from baselinr_spark.operators.revisit import revisit_schedule

    stats = spark.createDataFrame(
        [("slow", 1, 2, 1, 1, 0.001)],
        ["grp", "n_pages", "n_visits", "n_revisits", "n_changes",
         "change_rate"],
    )
    r = revisit_schedule(stats, base_interval_days=7.0,
                         max_interval_days=30.0).collect()[0]
    # tiny change rate -> huge ideal interval -> clamped to max
    assert r["next_interval_days"] == 30.0
