"""Schema drift: column-set diff + rename detection (SURVEY.md §2.5).

Recasts the reference's schema change detection
(/root/reference/baselinr/drift/detector.py:573-676 — set difference of
two runs' column sets) and the hash-registry rename detector
(/root/reference/baselinr/profiling/schema_detector.py:207-376 —
Levenshtein similarity ≥ 0.7 between added×removed, gated on type
compatibility). Snapshots are tiny (one row per column), so every join
here is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: normalization so Spark/DuckDB/warehouse type names compare equal
_TYPE_SYNONYMS = {"varchar": "string", "integer": "bigint",
                  "timestamp_ntz": "timestamp"}


def normalize_type(type_col):
    t = F.lower(type_col)
    for src, dst in _TYPE_SYNONYMS.items():
        t = F.when(t == src, dst).otherwise(t)
    return t


def schema_diff(cur: DataFrame, base: DataFrame) -> DataFrame:
    """cur/base: (column_name, data_type) snapshots → one row per column
    with status ∈ added|removed|type_changed|unchanged."""
    c = cur.select(
        F.col("column_name"), normalize_type(F.col("data_type")).alias("cur_type")
    )
    b = base.select(
        F.col("column_name"), normalize_type(F.col("data_type")).alias("base_type")
    )
    j = c.join(b, "column_name", "full_outer")
    status = (
        F.when(F.col("base_type").isNull(), F.lit("added"))
        .when(F.col("cur_type").isNull(), F.lit("removed"))
        .when(F.col("cur_type") != F.col("base_type"), F.lit("type_changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("column_name", "cur_type", "base_type", status.alias("status"))


def rename_candidates(
    diff: DataFrame, similarity_threshold: float = 0.7
) -> DataFrame:
    """Cross-compare added×removed columns; candidate when Levenshtein
    similarity = 1 − lev/max(len) ≥ threshold and types are compatible
    (schema_detector.py:268-331)."""
    added = diff.filter(F.col("status") == "added").select(
        F.col("column_name").alias("to_col"), F.col("cur_type").alias("to_type")
    )
    removed = diff.filter(F.col("status") == "removed").select(
        F.col("column_name").alias("from_col"), F.col("base_type").alias("from_type")
    )
    x = removed.crossJoin(F.broadcast(added))
    maxlen = F.greatest(F.length("from_col"), F.length("to_col"))
    sim = 1.0 - F.levenshtein("from_col", "to_col") / maxlen
    return (
        x.withColumn("similarity", sim)
        .filter(
            (F.col("similarity") >= similarity_threshold)
            & (F.col("from_type") == F.col("to_type"))
        )
        .select("from_col", "to_col", F.col("from_type").alias("data_type"),
                "similarity")
    )
