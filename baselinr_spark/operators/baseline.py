"""Baseline selection over a metric history (SURVEY.md §2.6).

Recasts the reference's ``BaselineSelector`` strategies
(/root/reference/baselinr/drift/baseline_selector.py) as window
expressions over an ordered history DataFrame. The history here is any
(ts, value) series — the reference's "runs ordered by profiled_at".
All windows are per-key (`key_cols`) so one pass serves every
(dataset, column, metric) series at once — at scale this is a single
shuffle by key, not a per-series query loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _win(key_cols: list[str] | None, ts_col: str):
    return (W.partitionBy(*key_cols) if key_cols else W.partitionBy()).orderBy(ts_col)


def moving_average_baseline(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    n: int = 7,
) -> DataFrame:
    """Baseline for each point = mean of the previous `n` values
    (baseline_selector.py:140-191: moving average excludes the current
    run). Adds `baseline` (null until ≥1 prior point) and `n_prior`."""
    key_cols = key_cols or []
    w = _win(key_cols, ts_col).rowsBetween(-n, -1)
    return history.withColumn(
        "baseline", F.avg(F.col(value_col).cast("double")).over(w)
    ).withColumn("n_prior", F.count(value_col).over(w))


def stable_window_baseline(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    window: int = 5,
) -> DataFrame:
    """Find the most stable sliding window of `window` consecutive drift
    scores (min mean |percent change|) and average the `window`+1 run
    values that span those changes — the reference averages
    window_size + 1 runs over window_size drift scores
    (baseline_selector.py:303-316: ``stable_runs = runs[start : start +
    window_size + 1]``), with window_size = min(window, n_runs − 1) and a
    ≥3-runs floor (:287-290). Returns one row per key:
    (…key, baseline, window_score, window_end_ts)."""
    key_cols = key_cols or []
    ow = _win(key_cols, ts_col)
    kw = W.partitionBy(*key_cols) if key_cols else W.partitionBy()
    v = F.col(value_col).cast("double")
    prev = F.lag(v).over(ow)
    pct = F.when(
        prev.isNotNull() & (F.abs(prev) > 0), F.abs((v - prev) * 100.0 / prev)
    )
    h = history.withColumn("__pct", pct).withColumn(
        "__nruns", F.count(value_col).over(kw)
    )
    # effective window shrinks on short histories: min(window, n_runs − 1)
    eff = F.least(F.lit(window), F.col("__nruns") - 1)
    # `eff` consecutive changes ending here span eff+1 run values
    fw = _win(key_cols, ts_col).rowsBetween(-(window - 1), 0)
    vw = _win(key_cols, ts_col).rowsBetween(-window, 0)
    h = (
        h.withColumn("__score", F.avg("__pct").over(fw))
        .withColumn("__nchg", F.count("__pct").over(fw))
        .withColumn("__wavg", F.avg(v).over(vw))
        .withColumn("__nval", F.count(value_col).over(vw))
        .filter(
            (F.col("__nruns") >= 3)
            & (F.col("__nchg") == eff)
            & (F.col("__nval") == eff + 1)
        )
    )
    rank_w = (
        W.partitionBy(*key_cols) if key_cols else W.partitionBy()
    ).orderBy(F.asc("__score"), F.asc(ts_col))
    return (
        h.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            F.col("__wavg").alias("baseline"),
            F.col("__score").alias("window_score"),
            F.col(ts_col).alias("window_end_ts"),
        )
    )


def seasonality_check(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    ma_window: int = 7,
    ratio_threshold: float = 1.5,
) -> DataFrame:
    """Day-of-week seasonality: residuals from a trailing MA(7) trend,
    between-group variance of dow means / mean within-group variance;
    seasonal when ratio > 1.5 (baseline_selector.py:454-530). One row
    per key: (…key, variance_ratio, seasonal)."""
    key_cols = key_cols or []
    w = _win(key_cols, ts_col).rowsBetween(-(ma_window - 1), 0)
    v = F.col(value_col).cast("double")
    h = history.withColumn("__resid", v - F.avg(v).over(w)).withColumn(
        "__dow", F.dayofweek(ts_col)
    )
    groups = h.groupBy(*key_cols, "__dow").agg(
        F.avg("__resid").alias("__gmean"),
        F.var_pop("__resid").alias("__gvar"),
    )
    out = groups.groupBy(*key_cols).agg(
        F.var_pop("__gmean").alias("__between"),
        F.avg("__gvar").alias("__within"),
    )
    ratio = F.when(F.col("__within") > 0, F.col("__between") / F.col("__within"))
    return out.select(
        *key_cols,
        ratio.alias("variance_ratio"),
        F.coalesce(ratio > ratio_threshold, F.lit(False)).alias("seasonal"),
    )


def auto_baseline_decision(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    cv_threshold: float = 0.2,
    min_runs: int = 3,
) -> DataFrame:
    """Auto strategy selection (baseline_selector.py:342-437): CV > 0.2 →
    moving_average; seasonality → prior_period; else last_run (or
    insufficient_history below min_runs)."""
    key_cols = key_cols or []
    stats = history.groupBy(*key_cols).agg(
        F.count(value_col).alias("n_runs"),
        (F.stddev_samp(F.col(value_col).cast("double"))
         / F.avg(F.col(value_col).cast("double"))).alias("cv"),
    )
    seas = seasonality_check(history, ts_col, value_col, key_cols)
    j = stats.join(seas, key_cols) if key_cols else stats.crossJoin(seas)
    decision = (
        F.when(F.col("n_runs") < min_runs, F.lit("insufficient_history"))
        .when(F.col("cv") > cv_threshold, F.lit("moving_average"))
        .when(F.col("seasonal"), F.lit("prior_period"))
        .otherwise(F.lit("last_run"))
    )
    return j.select(
        *key_cols, "n_runs", "cv", "variance_ratio", "seasonal",
        decision.alias("decision"),
    )


def prior_period_baseline(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    period_days: int = 7,
) -> DataFrame:
    """Baseline = the point closest to (latest − period) within ±period/2
    (baseline_selector.py:193-270). One row per key:
    (…key, baseline, baseline_ts, days_off)."""
    key_cols = key_cols or []
    latest = history.groupBy(*key_cols).agg(F.max(ts_col).alias("__latest"))
    j = (
        history.join(F.broadcast(latest), key_cols)
        if key_cols else history.crossJoin(F.broadcast(latest))
    )
    off = F.abs(
        F.datediff(F.col("__latest"), F.col(ts_col)) - F.lit(period_days)
    )
    j = j.withColumn("__off", off).filter(
        F.col("__off") <= period_days / 2.0
    )
    w = (
        W.partitionBy(*key_cols) if key_cols else W.partitionBy()
    ).orderBy(F.asc("__off"), F.asc(ts_col))
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            F.col(value_col).cast("double").alias("baseline"),
            F.col(ts_col).alias("baseline_ts"),
            F.col("__off").alias("days_off"),
        )
    )
