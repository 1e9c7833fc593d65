"""Anomaly detection methods over metric history, as Column helpers and
DataFrame ops.

Recasts /root/reference/baselinr/anomaly/detection_methods.py (SURVEY.md
§2.13). The reference operates on one (table, column, metric) scalar
series at a time in driver Python; here each method is an expression over
a history DataFrame of (series keys..., ts, value) so thousands of series
evaluate in one pass.

Percentile interpolation: the reference uses linear interpolation on the
sorted sample (detection_methods.py:78-91) — exactly Spark's `percentile`
(and DuckDB's quantile_cont), NOT percentile_approx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def iqr_flags(
    history: DataFrame,
    value_col: str = "value",
    key_cols: list[str] | None = None,
    threshold: float = 1.5,
) -> DataFrame:
    """IQR outliers (detection_methods.py:34-151): Q1/Q3 linear-interp,
    outlier beyond Q ± threshold·IQR; needs ≥4 points and IQR>0; severity
    by deviation/IQR > 3·t high / > 2·t medium. Flags every row of the
    series against the series' own quartiles. Returns history columns +
    (q1, q3, iqr, lower_bound, upper_bound, is_anomaly, severity)."""
    key_cols = key_cols or []
    v = F.col(value_col).cast("double")
    stats = history.groupBy(*key_cols).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
        F.count(F.lit(1)).alias("__n"),
    )
    j = history.join(F.broadcast(stats), key_cols) if key_cols else history.crossJoin(
        F.broadcast(stats)
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - threshold * iqr
    hi = F.col("q3") + threshold * iqr
    eligible = (F.col("__n") >= 4) & (iqr > 0)
    out = (eligible & ((v < lo) | (v > hi)))
    dev = F.when(v < lo, (lo - v) / iqr).when(v > hi, (v - hi) / iqr).otherwise(0.0)
    sev = (
        F.when(~out, "none")
        .when(dev > 3 * threshold, "high")
        .when(dev > 2 * threshold, "medium")
        .otherwise("low")
    )
    return (
        j.withColumn("iqr", iqr)
        .withColumn("lower_bound", lo)
        .withColumn("upper_bound", hi)
        .withColumn("is_anomaly", out)
        .withColumn("severity", sev)
        .drop("__n")
    )


def mad_flags(
    history: DataFrame,
    value_col: str = "value",
    key_cols: list[str] | None = None,
    threshold: float = 3.0,
) -> DataFrame:
    """Modified z-score via MAD (detection_methods.py:154-246):
    0.6745·(x − median)/MAD, anomaly when |z| > threshold; needs ≥3
    points and MAD>0."""
    key_cols = key_cols or []
    v = F.col(value_col).cast("double")
    med = history.groupBy(*key_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__median"),
        F.count(F.lit(1)).alias("__n"),
    )
    j = history.join(F.broadcast(med), key_cols) if key_cols else history.crossJoin(
        F.broadcast(med)
    )
    dev = j.withColumn("__absdev", F.abs(v - F.col("__median")))
    mad = dev.groupBy(*key_cols).agg(F.expr("percentile(__absdev, 0.5)").alias("__mad"))
    jj = dev.join(F.broadcast(mad), key_cols) if key_cols else dev.crossJoin(
        F.broadcast(mad)
    )
    z = F.when(F.col("__mad") > 0, 0.6745 * (v - F.col("__median")) / F.col("__mad"))
    flag = (F.col("__n") >= 3) & F.col("__mad").isNotNull() & (F.abs(z) > threshold)
    return (
        jj.withColumn("modified_z", z)
        .withColumn("is_anomaly", F.coalesce(flag, F.lit(False)))
        .drop("__absdev", "__n")
        .withColumnRenamed("__median", "median")
        .withColumnRenamed("__mad", "mad")
    )


def ewma_series(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    lam: float = 0.2,
) -> DataFrame:
    """Iterative EWMA, oldest→newest, seeded with the first value:
    ewma = λ·x + (1−λ)·ewma (expectation_learner.py:281-300). Ordered
    recursion expressed with the `aggregate` higher-order function over
    the collected series — one shuffle, no Python (SURVEY.md §2.6)."""
    key_cols = key_cols or []
    collected = history.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(value_col).cast("double").alias("v")))
        ).alias("__series")
    )
    ew = F.aggregate(
        F.col("__series"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["v"]).otherwise(
            F.lit(lam) * x["v"] + F.lit(1.0 - lam) * acc
        ),
    )
    return collected.withColumn("ewma", ew).drop("__series")


def control_limit_flags(
    current: DataFrame,
    value_col: str,
    mean_col: str = "expected_mean",
    stddev_col: str = "expected_stddev",
    sigmas: float = 3.0,
):
    """Shewhart breach: value outside mean ± 3σ
    (/root/reference/baselinr/anomaly/detector.py:482-533 with limits
    from expectation_learner.py:254-279). Column-level helper."""
    v = F.col(value_col)
    lo = F.col(mean_col) - sigmas * F.col(stddev_col)
    hi = F.col(mean_col) + sigmas * F.col(stddev_col)
    return current.withColumn("lcl", lo).withColumn("ucl", hi).withColumn(
        "is_anomaly", (v < lo) | (v > hi)
    )


def regime_shift(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    recent_window: int = 3,
    alpha: float = 0.05,
) -> DataFrame:
    """Welch-style t-stat between the most recent `recent_window` points
    and the rest: |μ1−μ2| / sqrt(s1²/n1 + s2²/n2) vs critical z 1.96@0.05
    / 2.58@0.01 (detection_methods.py:485-635)."""
    key_cols = key_cols or []
    w = (W.partitionBy(*key_cols) if key_cols else W.partitionBy()).orderBy(
        F.desc(ts_col)
    )
    ranked = history.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__recent", F.col("__rn") <= recent_window
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.avg(F.when(F.col("__recent"), F.col(value_col))).alias("mean_recent"),
        F.var_samp(F.when(F.col("__recent"), F.col(value_col))).alias("var_recent"),
        F.sum(F.col("__recent").cast("long")).alias("n_recent"),
        F.avg(F.when(~F.col("__recent"), F.col(value_col))).alias("mean_base"),
        F.var_samp(F.when(~F.col("__recent"), F.col(value_col))).alias("var_base"),
        F.sum((~F.col("__recent")).cast("long")).alias("n_base"),
    )
    denom = F.sqrt(
        F.coalesce(F.col("var_recent"), F.lit(0.0)) / F.col("n_recent")
        + F.coalesce(F.col("var_base"), F.lit(0.0)) / F.col("n_base")
    )
    t = F.when(denom > 0, F.abs(F.col("mean_recent") - F.col("mean_base")) / denom)
    crit = 1.96 if alpha == 0.05 else 2.58
    return agg.withColumn("t_stat", t).withColumn(
        "is_shift", F.coalesce(F.col("t_stat") > crit, F.lit(False))
    )


def seasonal_residual_flags(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    ma_window: int = 7,
    sigma_mult: float = 2.0,
) -> DataFrame:
    """Seasonality-aware residual check (detection_methods.py:331-482):
    trend = trailing MA(7); residual = value − trend; compare each
    residual to the mean residual of the same day-of-week; anomaly if
    |residual − dow_mean| > 2σ of all residuals. Needs ≥7 points."""
    key_cols = key_cols or []
    w = (W.partitionBy(*key_cols) if key_cols else W.partitionBy()).orderBy(ts_col) \
        .rowsBetween(-(ma_window - 1), 0)
    with_trend = history.withColumn("trend", F.avg(value_col).over(w)).withColumn(
        "residual", F.col(value_col) - F.col("trend")
    ).withColumn("dow", F.dayofweek(ts_col))
    dow_stats = with_trend.groupBy(*key_cols, "dow").agg(
        F.avg("residual").alias("dow_mean_residual")
    )
    glob = with_trend.groupBy(*key_cols).agg(
        F.stddev_samp("residual").alias("resid_stddev"),
        F.count(F.lit(1)).alias("__n"),
    )
    j = with_trend.join(F.broadcast(dow_stats), key_cols + ["dow"])
    j = j.join(F.broadcast(glob), key_cols) if key_cols else j.crossJoin(F.broadcast(glob))
    dev = F.abs(F.col("residual") - F.col("dow_mean_residual"))
    return j.withColumn(
        "is_anomaly",
        (F.col("__n") >= 7)
        & F.col("resid_stddev").isNotNull()
        & (dev > sigma_mult * F.col("resid_stddev")),
    ).drop("__n")


def cusum_series(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    baseline_n: int = 5,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM control chart (Page 1954) over a run history —
    the sequential change-point detector that catches SLOW drifts the
    Shewhart limits (one-point breaches) and the recent-vs-rest t-test
    (`regime_shift`) both miss: a persistent 0.5σ shift accumulates in
    S+ within a handful of runs.

    Baseline mu0/sigma0 come from the OLDEST ``baseline_n`` points
    (the in-control period); allowance k = k_sigma·sigma0, decision
    interval h = h_sigma·sigma0 (0.5σ/4σ-5σ are the textbook
    settings). Recursion: S+_i = max(0, S+_{i-1} + (x_i − mu0 − k)),
    S-_i = max(0, S-_{i-1} − (x_i − mu0 + k)); alarm when either
    exceeds h. A constant baseline (sigma0 = 0, or < 2 points) makes
    any deviation alarm — the degenerate case is explicit, not NULL.

    Run histories are O(runs) per metric, so the per-key collected
    array + ordered `aggregate` fold (same shape as `ewma_series`) is
    the right plan: one shuffle, no Python, no per-row recursion the
    optimizer can't see. Returns one row per history point:
    (*key_cols, ts, value, s_pos, s_neg, alarm, mu0, sigma0)."""
    key_cols = key_cols or []
    collected = history.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(
                F.col(ts_col).alias("ts"),
                F.col(value_col).cast("double").alias("v"),
            ))
        ).alias("__series")
    )
    base = F.slice(F.col("__series"), 1, baseline_n)
    n_b = F.size(base).cast("double")
    mu0 = F.aggregate(base, F.lit(0.0), lambda a, x: a + x["v"]) / n_b
    # population variance of the baseline window (the in-control spread
    # estimate; n is tiny and fixed, bias is irrelevant to the chart)
    var0 = (
        F.aggregate(base, F.lit(0.0), lambda a, x: a + x["v"] * x["v"]) / n_b
        - mu0 * mu0
    )
    sigma0 = F.sqrt(F.greatest(var0, F.lit(0.0)))
    c = collected.withColumn("__mu0", mu0).withColumn("__sigma0", sigma0)
    k = F.col("__sigma0") * k_sigma
    h = F.col("__sigma0") * h_sigma
    step_t = ("array<struct<ts:" + dict(history.dtypes)[ts_col]
              + ",v:double,sp:double,sn:double>>")
    folded = F.aggregate(
        F.col("__series"),
        F.lit(None).cast(step_t),
        lambda acc, x: F.concat(
            F.coalesce(acc, F.array()),
            F.array(F.struct(
                x["ts"].alias("ts"),
                x["v"].alias("v"),
                F.greatest(
                    F.lit(0.0),
                    F.coalesce(F.element_at(acc, -1)["sp"], F.lit(0.0))
                    + (x["v"] - F.col("__mu0") - k),
                ).alias("sp"),
                F.greatest(
                    F.lit(0.0),
                    F.coalesce(F.element_at(acc, -1)["sn"], F.lit(0.0))
                    - (x["v"] - F.col("__mu0") + k),
                ).alias("sn"),
            )),
        ),
    )
    out = c.withColumn("__steps", folded).select(
        *key_cols, "__mu0", "__sigma0", F.col("__sigma0") * h_sigma,
        F.explode("__steps").alias("s"),
    ).toDF(*key_cols, "__mu0", "__sigma0", "__h", "s")
    return out.select(
        *key_cols,
        F.col("s.ts").alias(ts_col),
        F.col("s.v").alias(value_col),
        F.col("s.sp").alias("s_pos"),
        F.col("s.sn").alias("s_neg"),
        ((F.col("s.sp") > F.col("__h")) | (F.col("s.sn") > F.col("__h")))
        .alias("alarm"),
        F.col("__mu0").alias("mu0"),
        F.col("__sigma0").alias("sigma0"),
    )


def oracle_cusum_sql(
    history_sql: str,
    ts_col: str = "ts",
    value_col: str = "value",
    baseline_n: int = 5,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> str:
    """DuckDB replay via a recursive CTE (the fold is a true ordered
    recursion — max(0, ...) — that window functions cannot express).
    No key_cols: gate entries pass one series per call."""
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {ts_col} AS ts, {value_col}::double AS v,
         row_number() OVER (ORDER BY {ts_col}) AS i
  FROM ({history_sql})
),
base AS (
  SELECT avg(v) AS mu0,
         sqrt(greatest(avg(v * v) - avg(v) * avg(v), 0)) AS sigma0
  FROM ordered WHERE i <= {baseline_n}
),
steps AS (
  SELECT o.i, o.ts, o.v,
         greatest(0, o.v - b.mu0 - {k_sigma} * b.sigma0) AS sp,
         greatest(0, -(o.v - b.mu0 + {k_sigma} * b.sigma0)) AS sn
  FROM ordered o, base b WHERE o.i = 1
  UNION ALL
  SELECT o.i, o.ts, o.v,
         greatest(0, s.sp + (o.v - b.mu0 - {k_sigma} * b.sigma0)),
         greatest(0, s.sn - (o.v - b.mu0 + {k_sigma} * b.sigma0))
  FROM steps s JOIN ordered o ON o.i = s.i + 1
  CROSS JOIN base b
)
SELECT s.ts AS {ts_col}, s.v AS {value_col}, s.sp AS s_pos, s.sn AS s_neg,
       (s.sp > {h_sigma} * b.sigma0 OR s.sn > {h_sigma} * b.sigma0) AS alarm,
       b.mu0 AS mu0, b.sigma0 AS sigma0
FROM steps s CROSS JOIN base b
"""


def sprt_binomial(
    daily: DataFrame,
    ts_col: str,
    success_col: str,
    trial_col: str,
    *,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Wald's sequential probability ratio test over per-cohort
    binomial counts — "may I stop shadow-testing this filter yet?".
    H0: success rate = p0 vs H1: = p1; each cohort (day) adds
    k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) to the cumulative
    log-likelihood ratio; the test DECIDES the first time the LLR
    leaves (ln(β/(1−α)), ln((1−β)/α)) — typically far earlier than a
    fixed-horizon test with the same error rates, which is the whole
    point for expensive rollout monitoring.

    Returns one row per cohort: (ts_col, n_trials, n_success, llr,
    lower, upper, decision) — decision is 'accept_h1' / 'accept_h0' /
    'continue' at that cohort; the first non-continue row is the
    stopping time.

    Scale design: input is the per-cohort COUNT table (one row per
    day — bounded by the monitoring window, same contract as the other
    daily series ops), so the ordered cumulative window is over a
    metadata-scale table; corpus-scale work is whatever upstream
    aggregate produced the counts.
    """
    import math

    from pyspark.sql import Window as W

    la = math.log(p1 / p0)
    lb = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    w = W.orderBy(ts_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    k = F.col(success_col).cast("double")
    n = F.col(trial_col).cast("double")
    step = k * F.lit(la) + (n - k) * F.lit(lb)
    out = daily.select(
        ts_col,
        F.col(trial_col).cast("bigint").alias("n_trials"),
        F.col(success_col).cast("bigint").alias("n_success"),
        F.sum(step).over(w).alias("llr"),
    )
    return out.select(
        ts_col, "n_trials", "n_success", "llr",
        F.lit(lower).alias("lower"),
        F.lit(upper).alias("upper"),
        F.when(F.col("llr") >= upper, F.lit("accept_h1"))
        .when(F.col("llr") <= lower, F.lit("accept_h0"))
        .otherwise(F.lit("continue")).alias("decision"),
    )


def oracle_sprt_sql(
    rows_sql: str,
    ts_col: str,
    success_col: str,
    trial_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> str:
    """DuckDB twin of :func:`sprt_binomial`."""
    import math

    la = math.log(p1 / p0)
    lb = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    return f"""
WITH rows_in AS ({rows_sql}),
s AS (
  SELECT {ts_col},
         {trial_col}::bigint AS n_trials,
         {success_col}::bigint AS n_success,
         sum({success_col}::double * {la!r}
             + ({trial_col}::double - {success_col}::double) * {lb!r})
           OVER (ORDER BY {ts_col}) AS llr
  FROM rows_in
)
SELECT {ts_col}, n_trials, n_success, llr,
       {lower!r} AS lower, {upper!r} AS upper,
       CASE WHEN llr >= {upper!r} THEN 'accept_h1'
            WHEN llr <= {lower!r} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM s"""
