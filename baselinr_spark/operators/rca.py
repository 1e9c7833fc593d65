"""Root-cause analysis: temporal correlation of anomalies with causes.

Recasts the reference RCA subsystem
(/root/reference/baselinr/rca/analysis/temporal_correlator.py:1-415,
root_cause_analyzer.py:271-327, pattern_matcher.py:122-200) as
set-oriented Spark plans. The reference analyzes ONE anomaly at a time
with driver-side SQL + Python loops; at warehouse scale you have
thousands of anomalies per day, so the Spark-first shape is a single
*time-range join* between the anomaly set and the candidate-cause set,
scored entirely in Catalyst expressions.

Scale design — the range join is bucketed, never a cross join:
- causes get ``bucket = floor(epoch_us / window_us)``;
- each anomaly looks at exactly two buckets (its own and the previous
  one, since the lookback window spans at most two bucket widths), via
  a 2-row ``explode`` — so the join is a plain equi-join on ``bucket``
  whose fan-out is bounded by event density × lookback window, not by
  |anomalies| × |causes|;
- scoring (exponential proximity decay, table-relevance bands,
  weighted confidence, failure boosts) is pure ``pyspark.sql.functions``
  inside WholeStageCodegen — no UDFs;
- per-anomaly top-k is one ``row_number`` window partitioned by
  anomaly id (shuffle on anomaly id, naturally balanced).

Deviation from the reference (documented): the reference pre-limits to
the ``2 × max_causes`` *most recent* in-window rows before scoring
(temporal_correlator.py:90-94) — an artifact of driver-side paging. We
score every in-window candidate and keep the top ``max_causes`` by
confidence, which is strictly more complete.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_US_PER_HOUR = 3_600_000_000.0


def temporal_proximity(diff_hours: Column, half_life_hours: float = 4.0) -> Column:
    """Exponential-decay proximity score in [0, 1]
    (temporal_correlator.py:333-360): exp(-ln2/half_life · Δh)."""
    decay = math.log(2.0) / half_life_hours
    return F.exp(F.lit(-decay) * diff_hours)


def table_relevance(target_table: Column, affected_tables: Column) -> Column:
    """Relevance of a cause's affected-table list to the anomalous table
    (temporal_correlator.py:362-388): exact 1.0, substring either way
    (case-insensitive) 0.7, non-empty-but-unrelated 0.4, unknown 0.3."""
    target_lower = F.lower(target_table)
    partial = F.exists(
        affected_tables,
        lambda t: F.lower(t).contains(target_lower)
        | target_lower.contains(F.lower(t)),
    )
    return (
        F.when(affected_tables.isNull() | (F.size(affected_tables) == 0), F.lit(0.3))
        .when(F.array_contains(affected_tables, target_table), F.lit(1.0))
        .when(partial, F.lit(0.7))
        .otherwise(F.lit(0.4))
    )


def _bucketed_window_join(
    anomalies: DataFrame,
    causes: DataFrame,
    anomaly_ts: str,
    cause_ts: str,
    lookback_hours: float,
) -> DataFrame:
    """Equi-join on time bucket + exact range filter: every (anomaly,
    cause) pair with cause_ts in [anomaly_ts − lookback, anomaly_ts]."""
    window_us = int(lookback_hours * _US_PER_HOUR)
    a = anomalies.withColumn(
        "_abkt",
        F.explode(
            F.array(
                (F.unix_micros(F.col(anomaly_ts).cast("timestamp")) / window_us).cast("long") - 1,
                (F.unix_micros(F.col(anomaly_ts).cast("timestamp")) / window_us).cast("long"),
            )
        ),
    )
    c = causes.withColumn(
        "_cbkt", (F.unix_micros(F.col(cause_ts).cast("timestamp")) / window_us).cast("long")
    )
    joined = a.join(c, a["_abkt"] == c["_cbkt"], "inner").where(
        (F.col(cause_ts) <= F.col(anomaly_ts))
        & (
            F.unix_micros(F.col(anomaly_ts).cast("timestamp")) - F.unix_micros(F.col(cause_ts).cast("timestamp"))
            <= window_us
        )
    )
    return joined.drop("_abkt", "_cbkt").withColumn(
        "_diff_hours",
        (
            F.unix_micros(F.col(anomaly_ts).cast("timestamp")) - F.unix_micros(F.col(cause_ts).cast("timestamp"))
        ).cast("double")
        / F.lit(_US_PER_HOUR),
    )


def _topk_per_anomaly(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    w = W.partitionBy("anomaly_id").orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def correlate_pipeline_runs(
    anomalies: DataFrame,
    runs: DataFrame,
    lookback_hours: float = 24.0,
    half_life_hours: float = 4.0,
    max_causes: int = 10,
) -> DataFrame:
    """Pipeline runs temporally correlated with each anomaly
    (temporal_correlator.py:45-194).

    anomalies: (anomaly_id, table_name, anomaly_ts:timestamp)
    runs: (run_id, pipeline_name, pipeline_type, started_at:timestamp,
           status, duration_seconds, affected_tables:array<string>)

    Returns per (anomaly, run): proximity/relevance evidence, combined
    ``confidence = 0.6·proximity + 0.4·relevance`` (failed runs boosted
    ×1.5 capped at 1.0), cause_type, and the per-anomaly rank (top
    ``max_causes`` by confidence).
    """
    j = _bucketed_window_join(anomalies, runs, "anomaly_ts", "started_at",
                              lookback_hours)
    prox = temporal_proximity(F.col("_diff_hours"), half_life_hours)
    rel = table_relevance(F.col("table_name"), F.col("affected_tables"))
    base_conf = prox * 0.6 + rel * 0.4
    conf = F.when(
        F.col("status") == "failed", F.least(F.lit(1.0), base_conf * 1.5)
    ).otherwise(base_conf)
    cause_type = (
        F.when(F.col("status") == "failed", F.lit("pipeline_failure"))
        .when(
            (F.col("status") == "success") & F.col("duration_seconds").isNotNull(),
            F.lit("pipeline_degradation"),
        )
        .otherwise(F.lit("data_quality"))
    )
    scored = j.select(
        "anomaly_id",
        "table_name",
        F.col("run_id").alias("cause_id"),
        "pipeline_name",
        "status",
        cause_type.alias("cause_type"),
        prox.alias("temporal_proximity"),
        rel.alias("table_relevance"),
        (F.col("_diff_hours") * 60.0).alias("time_before_anomaly_minutes"),
        conf.alias("confidence_score"),
    )
    return _topk_per_anomaly(
        scored, [F.col("confidence_score").desc(), F.col("cause_id")], max_causes
    )


def correlate_deployments(
    anomalies: DataFrame,
    deployments: DataFrame,
    lookback_hours: float = 24.0,
    half_life_hours: float = 4.0,
    max_causes: int = 10,
) -> DataFrame:
    """Code deployments temporally correlated with each anomaly
    (temporal_correlator.py:196-331).

    deployments: (deployment_id, deployed_at:timestamp, git_branch,
                  deployment_type, affected_pipelines:array<string>)

    relevance = 0.5 if the deployment lists affected pipelines else 0.3,
    ×1.5 (capped 1.0) for ``schema`` deployments;
    confidence = 0.7·proximity + 0.3·relevance.
    """
    j = _bucketed_window_join(anomalies, deployments, "anomaly_ts",
                              "deployed_at", lookback_hours)
    prox = temporal_proximity(F.col("_diff_hours"), half_life_hours)
    has_pipelines = F.col("affected_pipelines").isNotNull() & (
        F.size(F.col("affected_pipelines")) > 0
    )
    rel0 = F.when(has_pipelines, F.lit(0.5)).otherwise(F.lit(0.3))
    rel = F.when(
        F.col("deployment_type") == "schema", F.least(F.lit(1.0), rel0 * 1.5)
    ).otherwise(rel0)
    conf = prox * 0.7 + rel * 0.3
    scored = j.select(
        "anomaly_id",
        "table_name",
        F.col("deployment_id").alias("cause_id"),
        F.lit("code_change").alias("cause_type"),
        "deployment_type",
        "git_branch",
        prox.alias("temporal_proximity"),
        rel.alias("pipeline_relevance"),
        (F.col("_diff_hours") * 60.0).alias("time_before_anomaly_minutes"),
        conf.alias("confidence_score"),
    )
    return _topk_per_anomaly(
        scored, [F.col("confidence_score").desc(), F.col("cause_id")], max_causes
    )


def rank_causes(
    causes: DataFrame,
    min_confidence: float = 0.3,
    max_causes: int = 5,
) -> DataFrame:
    """Filter, dedup, and rank a (possibly unioned) cause set per anomaly
    (root_cause_analyzer.py:271-300): drop below ``min_confidence``,
    keep one row per (anomaly_id, cause_id) — the highest-confidence one
    — and return the top ``max_causes`` per anomaly.

    Expects at least (anomaly_id, cause_id, cause_type, confidence_score).
    """
    dedup_w = W.partitionBy("anomaly_id", "cause_id").orderBy(
        F.col("confidence_score").desc(), F.col("cause_type")
    )
    deduped = (
        causes.where(F.col("confidence_score") >= min_confidence)
        .withColumn("_dr", F.row_number().over(dedup_w))
        .where(F.col("_dr") == 1)
        .drop("_dr", "rank")
    )
    return _topk_per_anomaly(
        deduped, [F.col("confidence_score").desc(), F.col("cause_id")], max_causes
    )


def multi_signal_score(
    temporal: Column, lineage: Column, historical: Column
) -> Column:
    """Combined confidence from independent signals
    (root_cause_analyzer.py:302-327): 0.4·temporal + 0.3·lineage +
    0.3·historical, capped at 1.0; null signals count as 0."""
    z = F.lit(0.0)
    s = (
        F.coalesce(temporal, z) * 0.4
        + F.coalesce(lineage, z) * 0.3
        + F.coalesce(historical, z) * 0.3
    )
    return F.least(F.lit(1.0), s)


def recurring_patterns(
    incidents: DataFrame,
    min_pattern_occurrences: int = 3,
) -> DataFrame:
    """Recurring cause patterns across historical incidents
    (pattern_matcher.py:122-200): take each incident's top cause (max
    confidence), group by cause_type, and keep types seen at least
    ``min_pattern_occurrences`` times, with occurrence_count /
    avg_confidence / first_seen / last_seen.

    incidents: (incident_id, analyzed_at:timestamp, cause_type,
                confidence_score) — one row per (incident, cause).
    """
    top_w = W.partitionBy("incident_id").orderBy(
        F.col("confidence_score").desc(), F.col("cause_type")
    )
    top = (
        incidents.withColumn("_r", F.row_number().over(top_w))
        .where(F.col("_r") == 1)
        .drop("_r")
    )
    return (
        top.groupBy("cause_type")
        .agg(
            F.count("*").alias("occurrence_count"),
            F.avg("confidence_score").alias("avg_confidence"),
            F.min("analyzed_at").alias("first_seen"),
            F.max("analyzed_at").alias("last_seen"),
        )
        .where(F.col("occurrence_count") >= min_pattern_occurrences)
        .orderBy(F.col("occurrence_count").desc(), F.col("cause_type"))
    )
