"""Smart table selection: metadata-driven profiling-priority ranking
(SURVEY.md §2.7; /root/reference/baselinr/smart_selection/scorer.py).

Input is a metadata DataFrame with one row per candidate table:
(table, query_count, days_since_last_query, days_since_modified,
row_count). All sub-scores are the reference's exact formulas expressed
as native columns, so a million-table catalog ranks in one narrow pass:

- query frequency: log10(query_count)·33.33 capped at 100 (scorer.py:196-214)
- query recency:   100·2^(−days/7)   (half-life 7d, scorer.py:216-241)
- write activity:  100·2^(−days/14)  (half-life 14d, scorer.py:243-267)
- table size:      step bell curve peaking at 10K-100K rows (scorer.py:269-307)
- total = 0.4·freq + 0.25·recency + 0.2·write + 0.15·size (scorer.py:101-107)

Null metadata → neutral 50 (the reference's "no data" convention).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WEIGHTS = {"query_frequency": 0.4, "query_recency": 0.25,
                   "write_activity": 0.2, "table_size": 0.15}


def _freq_score(qc):
    return F.when(qc.isNull() | (qc <= 0), 0.0).otherwise(
        F.least(F.lit(100.0), F.log10(qc.cast("double")) * 33.33)
    )


def _decay_score(days, half_life: float):
    return F.when(days.isNull(), 50.0).otherwise(
        100.0 * F.exp(F.lit(-math.log(2) / half_life) * days.cast("double"))
    )


def _size_score(rows):
    return (
        F.when(rows.isNull(), 50.0)
        .when(rows < 100, 20.0)
        .when(rows < 1_000, 40.0)
        .when(rows < 10_000, 70.0)
        .when(rows < 100_000, 100.0)
        .when(rows < 1_000_000, 95.0)
        .when(rows < 10_000_000, 85.0)
        .when(rows < 100_000_000, 70.0)
        .otherwise(50.0)
    )


def score_tables(
    meta: DataFrame, weights: dict[str, float] | None = None
) -> DataFrame:
    """meta(table, query_count, days_since_last_query, days_since_modified,
    row_count) → scored + ranked (descending total_score)."""
    w = {**DEFAULT_WEIGHTS, **(weights or {})}
    out = meta.withColumn(
        "query_frequency_score", _freq_score(F.col("query_count"))
    ).withColumn(
        "query_recency_score", _decay_score(F.col("days_since_last_query"), 7.0)
    ).withColumn(
        "write_activity_score", _decay_score(F.col("days_since_modified"), 14.0)
    ).withColumn(
        "table_size_score", _size_score(F.col("row_count"))
    )
    total = (
        F.col("query_frequency_score") * w["query_frequency"]
        + F.col("query_recency_score") * w["query_recency"]
        + F.col("write_activity_score") * w["write_activity"]
        + F.col("table_size_score") * w["table_size"]
    )
    return out.withColumn("total_score", total).orderBy(
        F.desc("total_score"), F.asc("table")
    )


def lineage_aware_scores(
    scored: DataFrame,
    impact: DataFrame,
    lineage_weight: float = 0.4,
) -> DataFrame:
    """Phase-2 lineage-aware table prioritization
    (/root/reference/baselinr/smart_selection/lineage/lineage_scorer.py:273-324):
    combined = (1−w)·usage_score/100 + w·lineage_impact_score, scaled
    back to 0-100; default w = 0.4 (config.py:394-396). Tables with no
    lineage node keep their usage-based score unchanged (:304-308).

    ``scored`` is `score_tables` output (total_score 0-100); ``impact``
    is `lineage_impact` output (total_score 0-1) — one broadcastable
    join, so the combine adds nothing to the scoring passes' cost."""
    imp = impact.select(
        "table",
        F.col("total_score").alias("lineage_score"),
        "position",
        "estimated_user_impact",
    )
    j = scored.join(F.broadcast(imp), "table", "left")
    w = float(lineage_weight)
    combined = F.when(
        F.col("lineage_score").isNotNull(),
        ((1.0 - w) * F.col("total_score") / 100.0
         + w * F.col("lineage_score")) * 100.0,
    ).otherwise(F.col("total_score"))
    return j.select(
        "table",
        F.round("total_score", 6).alias("usage_score"),
        F.round(F.coalesce("lineage_score", F.lit(0.0)), 6)
        .alias("lineage_score"),
        F.round(combined, 6).alias("combined_score"),
        F.coalesce("position", F.lit("unknown")).alias("position"),
        F.coalesce("estimated_user_impact", F.lit("NONE"))
        .alias("estimated_user_impact"),
    )
