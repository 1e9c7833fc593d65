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

    def bkt(ts_col: str):
        # True floor division on the long microsecond value. A double
        # division + long cast would truncate toward zero, so pre-1970
        # timestamps (negative micros) would land one bucket high and the
        # cause bucket could miss both probed anomaly buckets. pmod is
        # always non-negative, so (a − pmod(a, d)) is the exact largest
        # multiple of d ≤ a, and the final division is exact in doubles
        # (both operands and the integral quotient are < 2^53).
        us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        d = F.lit(window_us)
        return ((us - F.pmod(us, d)) / d).cast("long")

    a = anomalies.withColumn(
        "_abkt",
        F.explode(F.array(bkt(anomaly_ts) - 1, bkt(anomaly_ts))),
    )
    c = causes.withColumn("_cbkt", bkt(cause_ts))
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


# ---------------------------------------------------------------------------
# lineage-based RCA (reference rca/analysis/lineage_analyzer.py:20-501)
# ---------------------------------------------------------------------------

def lineage_closure(edges: DataFrame, max_depth: int = 5) -> DataFrame:
    """Bounded-depth transitive closure of the lineage graph:
    (table, upstream_table, distance) with distance 1 = direct parent,
    minimal distance kept for multiply-reachable ancestors.

    The reference re-traverses the graph per anomaly
    (lineage_analyzer.py:250-314, one SQL round-trip per node). Spark-
    first shape: compute the closure ONCE with ``max_depth`` self-joins
    — lineage is metadata-sized (tables, not rows), so the closure is
    small and amortizes over every anomaly in the batch.
    """
    hop = edges.select(
        F.col("downstream_table").alias("table"),
        F.col("upstream_table").alias("upstream_table"),
        F.lit(1).alias("distance"),
    ).distinct()
    closure = hop
    frontier = hop
    for d in range(2, max_depth + 1):
        frontier = (
            frontier.alias("f")
            .join(hop.alias("h"),
                  F.col("f.upstream_table") == F.col("h.table"))
            .select(
                F.col("f.table").alias("table"),
                F.col("h.upstream_table").alias("upstream_table"),
                F.lit(d).alias("distance"),
            )
            .distinct()
        )
        if frontier.isEmpty():
            break
        closure = closure.unionByName(frontier)
    return closure.groupBy("table", "upstream_table").agg(
        F.min("distance").alias("distance")
    )


def distance_score(distance: Column) -> Column:
    """1/(1 + 0.5·hops) (lineage_analyzer.py:449-467); ≤0 hops → 1.0."""
    return F.when(distance <= 0, F.lit(1.0)).otherwise(
        1.0 / (1.0 + distance.cast("double") * 0.5)
    )


def upstream_temporal_score(diff_hours: Column, lookback_hours: float) -> Column:
    """Peak 1.0 within 2h, then linear decay over the lookback window
    (lineage_analyzer.py:469-501); out-of-window handled by the join
    range filter."""
    return F.when(diff_hours <= 2.0, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (diff_hours - 2.0) / lookback_hours)
    )


def upstream_anomaly_causes(
    closure: DataFrame,
    anomalies: DataFrame,
    events: DataFrame,
    lookback_hours: float = 24.0,
    max_causes: int = 10,
) -> DataFrame:
    """Anomalies in upstream tables that may have propagated downstream
    (lineage_analyzer.py:46-159).

    closure: output of `lineage_closure`.
    anomalies: (anomaly_id, table_name, anomaly_ts[, column_name,
                metric_name]).
    events: (event_id, table_name, column_name, metric_name, severity,
             timestamp) — prior detected anomalies/events.

    confidence = min(1, 0.4·distance_score + 0.4·temporal_score
                     + 0.2·column_match + 0.2·metric_match); top
    ``max_causes`` per anomaly. The event join is keyed on
    (upstream_table, time bucket) — an equi-join, never a cross join.
    """
    window_us = int(lookback_hours * _US_PER_HOUR)
    a = anomalies
    if "column_name" not in a.columns:
        a = a.withColumn("column_name", F.lit(None).cast("string"))
    if "metric_name" not in a.columns:
        a = a.withColumn("metric_name", F.lit(None).cast("string"))
    a = (
        a.select(
            "anomaly_id", "table_name", "anomaly_ts",
            F.col("column_name").alias("a_column"),
            F.col("metric_name").alias("a_metric"),
        )
        .join(closure.withColumnRenamed("table", "table_name"),
              "table_name")
        .withColumn(
            "_bkt",
            F.explode(F.array(
                (F.unix_micros(F.col("anomaly_ts").cast("timestamp"))
                 / window_us).cast("long") - 1,
                (F.unix_micros(F.col("anomaly_ts").cast("timestamp"))
                 / window_us).cast("long"),
            )),
        )
    )
    ev = events.select(
        "event_id",
        F.col("table_name").alias("upstream_table"),
        F.col("column_name").alias("e_column"),
        F.col("metric_name").alias("e_metric"),
        F.col("severity").alias("upstream_severity"),
        F.col("timestamp").alias("event_ts"),
        (F.unix_micros(F.col("timestamp").cast("timestamp"))
         / window_us).cast("long").alias("_bkt"),
    )
    j = a.join(ev, ["upstream_table", "_bkt"]).where(
        (F.col("event_ts") <= F.col("anomaly_ts"))
        & (
            F.unix_micros(F.col("anomaly_ts").cast("timestamp"))
            - F.unix_micros(F.col("event_ts").cast("timestamp"))
            <= window_us
        )
    )
    diff_h = (
        F.unix_micros(F.col("anomaly_ts").cast("timestamp"))
        - F.unix_micros(F.col("event_ts").cast("timestamp"))
    ).cast("double") / F.lit(_US_PER_HOUR)
    dscore = distance_score(F.col("distance"))
    tscore = upstream_temporal_score(diff_h, lookback_hours)
    cmatch = F.when(
        F.col("a_column").isNotNull() & (F.col("a_column") == F.col("e_column")),
        F.lit(0.2),
    ).otherwise(F.lit(0.0))
    mmatch = F.when(
        F.col("a_metric").isNotNull() & (F.col("a_metric") == F.col("e_metric")),
        F.lit(0.2),
    ).otherwise(F.lit(0.0))
    conf = F.least(F.lit(1.0), dscore * 0.4 + tscore * 0.4 + cmatch + mmatch)
    scored = j.select(
        "anomaly_id",
        "table_name",
        F.col("event_id").alias("cause_id"),
        F.lit("upstream_anomaly").alias("cause_type"),
        "upstream_table",
        F.col("distance").alias("lineage_distance"),
        "upstream_severity",
        dscore.alias("distance_score"),
        tscore.alias("temporal_score"),
        (diff_h * 60.0).alias("time_before_anomaly_minutes"),
        conf.alias("confidence_score"),
    )
    return _topk_per_anomaly(
        scored, [F.col("confidence_score").desc(), F.col("cause_id")], max_causes
    )


def impact_analysis(edges: DataFrame, max_depth: int = 5) -> DataFrame:
    """Blast radius per table (lineage_analyzer.py:160-198): counts of
    transitive upstream/downstream tables and
    ``blast_radius = min(1, 0.1·n_downstream + 0.1·max_downstream_depth)``
    — computed for EVERY table in one pass over the two closures."""
    up = lineage_closure(edges, max_depth)
    down = up.select(
        F.col("upstream_table").alias("table"),
        F.col("table").alias("downstream_table"),
        "distance",
    )
    up_agg = up.groupBy("table").agg(F.count("*").alias("n_upstream"))
    down_agg = down.groupBy("table").agg(
        F.count("*").alias("n_downstream"),
        F.max("distance").alias("max_downstream_depth"),
    )
    all_tables = up_agg.join(down_agg, "table", "full_outer").fillna(
        0, subset=["n_upstream", "n_downstream", "max_downstream_depth"]
    )
    blast = F.least(
        F.lit(1.0),
        F.col("n_downstream") * 0.1 + F.col("max_downstream_depth") * 0.1,
    )
    return all_tables.select(
        "table", "n_upstream", "n_downstream", "max_downstream_depth",
        blast.alias("blast_radius_score"),
    )


def common_ancestors(
    closure: DataFrame, table_names: list[str]
) -> DataFrame:
    """Common upstream ancestors of several anomalous tables — the
    shared root-cause candidates (lineage_analyzer.py:200-249): an
    ancestor reachable from ALL of them, with its minimal distance,
    closest first."""
    hit = closure.filter(F.col("table").isin(table_names))
    return (
        hit.groupBy("upstream_table")
        .agg(
            F.count_distinct("table").alias("_n"),
            F.min("distance").alias("distance"),
        )
        .filter(F.col("_n") >= len(set(table_names)))
        .select("upstream_table", "distance")
        .orderBy("distance", "upstream_table")
    )
