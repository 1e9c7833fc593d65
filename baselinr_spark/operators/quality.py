"""Weighted data-quality score (SURVEY.md §2.4 'quality-score aggregates').

Recasts /root/reference/baselinr/quality/scorer.py:52-537:
- completeness = 100·(1 − avg(null_ratio))               (:137-183)
- validity     = validation pass rate ·100               (:185-231)
- consistency  = max(0, min(100, (100 − severity-weighted drift penalty)
                 · schema_stability)); penalty high=10, med=5, low=2 per
                 event, schema_stability = avg column_stability_score
                 (:233-305, the ×stability factor at :294-305)
- freshness    = step+linear decay on hours since profile (:307-359)
- uniqueness   = 100·avg(unique_ratio)                   (:361-406)
- accuracy     = 100 − 5·anomaly_count                   (:408-448)
- overall      = weighted sum, default weights 25/25/20/15/10/5
                 (/root/reference/baselinr/config/schema.py:1286-1294);
  status healthy ≥80 / warning ≥60 (schema.py:1312-1317).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WEIGHTS = {
    "completeness": 0.25,
    "validity": 0.25,
    "consistency": 0.20,
    "freshness": 0.15,
    "uniqueness": 0.10,
    "accuracy": 0.05,
}

_SEV_PENALTY = {"high": 10.0, "medium": 5.0, "low": 2.0}


def severity_penalty_col(sev_col):
    return (
        F.when(sev_col == "high", _SEV_PENALTY["high"])
        .when(sev_col == "medium", _SEV_PENALTY["medium"])
        .when(sev_col == "low", _SEV_PENALTY["low"])
        .otherwise(0.0)
    )


def component_scores(
    metrics: DataFrame,
    validation: DataFrame | None = None,
    events: DataFrame | None = None,
    anomaly_count_col: str | None = None,
    group_cols: list[str] | None = None,
    stability: DataFrame | None = None,
) -> DataFrame:
    """Compute the six component scores per group from long-format
    metrics (column_name, metric_name, metric_value), a validation
    result table, an events table, and (optionally) a column-stability
    table carrying `column_stability_score` (see
    profiling.column_stability) whose per-group average multiplies the
    consistency score per reference scorer.py:294-305. Freshness
    defaults to 100 (batch context; the hours-decay applies when
    profiled_at history exists)."""
    group_cols = group_cols or []

    comp = metrics.groupBy(*group_cols).agg(
        (100.0 * (1.0 - F.coalesce(
            F.avg(F.when(F.col("metric_name") == "null_ratio", F.col("metric_value"))),
            F.lit(0.0),
        ))).alias("completeness"),
        (100.0 * F.coalesce(
            F.avg(F.when(F.col("metric_name") == "unique_ratio", F.col("metric_value"))),
            F.lit(1.0),
        )).alias("uniqueness"),
    )

    if validation is not None:
        val = validation.groupBy(*group_cols).agg(
            (100.0 * F.avg(
                F.when(F.col("failed_rows") == 0, 1.0).otherwise(
                    1.0 - F.col("failure_rate") / 100.0
                )
            )).alias("validity")
        )
        comp = comp.join(val, group_cols) if group_cols else comp.crossJoin(val)
    else:
        comp = comp.withColumn("validity", F.lit(100.0))

    if events is not None:
        ev = events.groupBy(*group_cols).agg(
            (100.0 - F.sum(severity_penalty_col(F.col("severity"))))
            .alias("__raw_consistency")
        )
        comp = (
            comp.join(ev, group_cols, "left") if group_cols else comp.crossJoin(ev)
        ).fillna({"__raw_consistency": 100.0})
    else:
        comp = comp.withColumn("__raw_consistency", F.lit(100.0))

    if stability is not None:
        st = stability.groupBy(*group_cols).agg(
            F.avg("column_stability_score").alias("__schema_stab")
        )
        comp = (
            comp.join(st, group_cols, "left") if group_cols else comp.crossJoin(st)
        ).fillna({"__schema_stab": 1.0})
    else:
        comp = comp.withColumn("__schema_stab", F.lit(1.0))

    # reference scorer.py:304: max(0, min(100, (100 − penalty) · stability))
    comp = comp.withColumn(
        "consistency",
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(100.0),
                    F.col("__raw_consistency") * F.col("__schema_stab")),
        ),
    ).drop("__raw_consistency", "__schema_stab")

    comp = comp.withColumn("freshness", F.lit(100.0))
    if anomaly_count_col:
        comp = comp.withColumn(
            "accuracy", F.greatest(F.lit(0.0), 100.0 - 5.0 * F.col(anomaly_count_col))
        )
    else:
        comp = comp.withColumn("accuracy", F.lit(100.0))
    return comp


def overall_score(comp: DataFrame, weights: dict[str, float] | None = None) -> DataFrame:
    w = weights or DEFAULT_WEIGHTS
    total = sum(w.values())
    expr = sum(
        (F.col(k) * (v / total) for k, v in w.items()), start=F.lit(0.0)
    )
    return comp.withColumn("overall_score", expr).withColumn(
        "status",
        F.when(F.col("overall_score") >= 80, "healthy")
        .when(F.col("overall_score") >= 60, "warning")
        .otherwise("critical"),
    )


def freshness_score_col(hours_since, excellent: float = 24.0,
                        good: float = 48.0, acceptable: float = 168.0):
    """Freshness step + linear decay
    (/root/reference/baselinr/quality/scorer.py:307-359): ≤24h → 100,
    ≤48h → 80, ≤168h → 60, then −10 points/day, floored at 0."""
    h = hours_since.cast("double")
    return (
        F.when(h.isNull(), 0.0)
        .when(h <= excellent, 100.0)
        .when(h <= good, 80.0)
        .when(h <= acceptable, 60.0)
        .otherwise(F.greatest(F.lit(0.0), 60.0 - (h - acceptable) * (10.0 / 24.0)))
    )
