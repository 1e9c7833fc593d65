"""Expectation learning over metric history (SURVEY.md §2.14).

Recasts /root/reference/baselinr/learning/expectation_learner.py: per
(series keys) learn expected mean/var/stddev/min/max, Shewhart 3σ control
limits (:254-279), EWMA λ=0.2 (:281-300), and a normal-vs-empirical
distribution-fit heuristic using sample skewness
n/((n−1)(n−2))·Σ((x−μ)/σ)³ with |skew|<0.5 and |mean−median|/|mean|<0.2
(:302-354). All as one groupBy pass + the EWMA fold."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_SAMPLES = 5  # expectation_learner.py:93-115


def learn_expectations(
    history: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    lam: float = 0.2,
    sigmas: float = 3.0,
) -> DataFrame:
    key_cols = key_cols or []
    v = F.col(value_col).cast("double")
    # the EWMA series is collected in the SAME groupBy as the moment
    # aggregates (one shuffle instead of two plus a join): the fold over
    # the ts-sorted array is identical to ewma_series' and the reference's
    # iterative recursion (expectation_learner.py:281-300)
    agg = history.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.avg(v).alias("expected_mean"),
        F.var_samp(v).alias("expected_variance"),
        F.stddev_samp(v).alias("expected_stddev"),
        F.min(v).alias("expected_min"),
        F.max(v).alias("expected_max"),
        F.sum(v).alias("__s1"),
        F.sum(v * v).alias("__s2"),
        F.sum(v * v * v).alias("__s3"),
        F.expr(f"percentile({value_col}, 0.5)").alias("median"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), v.alias("v"))
            )
        ).alias("__series"),
    )
    # sample skewness G1 = n/((n−1)(n−2)) · Σ((x−μ)/s)³ — the reference's
    # formula (expectation_learner.py:302-354), expanded to moment sums so
    # it computes in the same single pass:
    # Σ(x−μ)³ = Σx³ − 3μΣx² + 3μ²Σx − nμ³
    n = F.col("n_samples").cast("double")
    mu = F.col("expected_mean")
    s = F.col("expected_stddev")
    m3 = F.col("__s3") - 3 * mu * F.col("__s2") + 3 * mu * mu * F.col("__s1") - n * mu * mu * mu
    g1 = F.when(
        (n > 2) & (s > 0), n / ((n - 1) * (n - 2)) * m3 / (s * s * s)
    ).otherwise(F.lit(0.0))
    agg = agg.withColumn("skewness", g1).drop("__s1", "__s2", "__s3")
    ew = F.aggregate(
        F.col("__series"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["v"]).otherwise(
            F.lit(lam) * x["v"] + F.lit(1.0 - lam) * acc
        ),
    )
    out = agg.withColumn("ewma", ew).drop("__series")
    sd = F.coalesce(F.col("expected_stddev"), F.lit(0.0))
    mean_med_ratio = F.when(
        F.abs(F.col("expected_mean")) > 0,
        F.abs(F.col("expected_mean") - F.col("median")) / F.abs(F.col("expected_mean")),
    ).otherwise(F.lit(0.0))
    return (
        out.withColumn("ucl", F.col("expected_mean") + sigmas * sd)
        .withColumn("lcl", F.col("expected_mean") - sigmas * sd)
        .withColumn(
            "distribution_type",
            F.when(
                (F.abs(F.coalesce(F.col("skewness"), F.lit(0.0))) < 0.5)
                & (mean_med_ratio < 0.2),
                "normal",
            ).otherwise("empirical"),
        )
        .filter(F.col("n_samples") >= MIN_SAMPLES)
    )


def learn_categorical_frequencies(
    history: DataFrame,
    run_col: str,
    category_col: str,
    count_col: str,
    last_n_runs: int = 10,
) -> DataFrame:
    """Sum category counts across the last N runs and normalize to
    frequencies (/root/reference/baselinr/learning/expectation_learner.py:
    356-425 — the reference sums top_values JSON across 10 runs). Input is
    long-format (run, category, count); output (category, total_count,
    frequency)."""
    recent = (
        history.select(run_col).distinct()
        .orderBy(F.desc(run_col)).limit(last_n_runs)
    )
    h = history.join(F.broadcast(recent), run_col)
    sums = h.groupBy(category_col).agg(F.sum(count_col).alias("total_count"))
    grand = sums.agg(F.sum("total_count").alias("__g"))
    return (
        sums.crossJoin(F.broadcast(grand))
        .select(
            category_col,
            F.col("total_count").cast("long").alias("total_count"),
            (F.col("total_count") / F.col("__g")).alias("frequency"),
        )
    )
