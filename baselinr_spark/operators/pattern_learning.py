"""Naming-convention pattern learner — existing column→check configs
in, learned (pattern, check, confidence) rules out, as aggregations.

Recasts /root/reference/baselinr/smart_selection/learning/
pattern_learner.py (~400 LoC of Counter/defaultdict accumulation): the
reference walks column configs one at a time, bucketing each column
under its FIRST matching common suffix and prefix plus a fixed exact-
name list, then emits a learned pattern per bucket whose checks are the
majority checks, with confidence from check-set consistency
(:255-384). Here each bucket is a groupBy and the majority/consistency
math is two windowed aggregates, so a catalog-wide config corpus learns
in one pass.

The companion `pattern_store.py` (CRUD over a config file) is storage
plumbing with no query semantics — not recast; learned patterns are
ordinary DataFrame rows a caller persists like any other table.

Semantics (pattern_learner.py line refs):
- bucket membership: first match in COMMON_SUFFIXES / COMMON_PREFIXES
  order, independently for suffix and prefix (:239-250); exact bucket
  for the 7 fixed names (:251-253).
- suffix/prefix rule (:285-352): occurrences = column instances
  (table, column) in the bucket; a check is "common" when it appears
  for >= 50% of them; consistency = Σ common-check counts /
  (occurrences × |common checks|); confidence = min(0.95,
  0.5 + 0.45·consistency); emitted when occurrences >=
  min_occurrences and confidence >= min_confidence.
- exact rule (:354-381): total = check ENTRIES (not columns); the top-3
  checks by count (ties → check name asc, a deterministic stand-in for
  Counter insertion order) with count/total >= 0.3 are kept;
  confidence = min(0.95, 0.6 + 0.35·top1/total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# pattern_learner.py:57-77 / :80-90 — order matters (first match wins)
COMMON_SUFFIXES = [
    "_at", "_on", "_date", "_time", "_timestamp", "_id", "_key", "_uuid",
    "_guid", "_email", "_phone", "_url", "_status", "_type", "_flag",
    "_count", "_amount", "_price",
]
COMMON_PREFIXES = [
    "is_", "has_", "can_", "should_", "created_", "updated_", "deleted_",
    "num_", "total_",
]
EXACT_NAMES = ("id", "uuid", "email", "status", "type", "created_at",
               "updated_at")


def _first_match_col(name_col, candidates: list[str], mode: str):
    expr = F.lit(None).cast("string")
    # build the when-cascade in reverse so the FIRST list entry wins
    for cand in reversed(candidates):
        cond = (name_col.endswith(cand) if mode == "suffix"
                else name_col.startswith(cand))
        expr = F.when(cond, cand).otherwise(expr)
    return expr


def _affix_rules(cfg: DataFrame, bucket_col: str, pattern_expr,
                 pattern_type: str, min_occurrences: int,
                 min_confidence: float) -> DataFrame:
    """Shared suffix/prefix aggregation: cfg has (table_name,
    column_name, check_type, <bucket_col>)."""
    b = cfg.filter(F.col(bucket_col).isNotNull())
    # occurrences per bucket = distinct column instances
    occ = b.groupBy(bucket_col).agg(
        F.count_distinct("table_name", "column_name").alias("occurrences"))
    per_check = b.groupBy(bucket_col, "check_type").agg(
        F.count_distinct("table_name", "column_name").alias("cnt"))
    j = per_check.join(occ, bucket_col)
    common = j.filter(F.col("cnt") / F.col("occurrences") >= 0.5)
    wb = W.partitionBy(bucket_col)
    common = (
        common.withColumn(
            "consistency",
            F.sum("cnt").over(wb)
            / (F.col("occurrences") * F.count(F.lit(1)).over(wb)))
        .withColumn("confidence",
                    F.least(F.lit(0.95), 0.5 + F.col("consistency") * 0.45))
        .filter((F.col("occurrences") >= min_occurrences)
                & (F.col("confidence") >= min_confidence))
    )
    return common.select(
        pattern_expr.alias("pattern"),
        F.lit(pattern_type).alias("pattern_type"),
        "check_type",
        F.round("confidence", 6).alias("confidence"),
        F.col("occurrences").cast("int").alias("occurrence_count"),
    )


def learn_patterns(
    config: DataFrame,
    min_occurrences: int = 2,
    min_confidence: float = 0.5,
) -> DataFrame:
    """config(table_name, column_name, check_type) → learned rules
    (pattern, pattern_type ∈ {suffix, prefix, exact}, check_type,
    confidence, occurrence_count)."""
    nm = F.lower(F.col("column_name"))
    cfg = config.select(
        "table_name", "column_name", "check_type",
        _first_match_col(nm, COMMON_SUFFIXES, "suffix").alias("__suffix"),
        _first_match_col(nm, COMMON_PREFIXES, "prefix").alias("__prefix"),
        F.when(nm.isin(*EXACT_NAMES), nm).alias("__exact"),
    )

    suf = _affix_rules(cfg, "__suffix",
                       F.concat(F.lit("*"), F.col("__suffix")),
                       "suffix", min_occurrences, min_confidence)
    pre = _affix_rules(cfg, "__prefix",
                       F.concat(F.col("__prefix"), F.lit("*")),
                       "prefix", min_occurrences, min_confidence)

    # exact: totals are check ENTRIES; top-3 by (count desc, name asc),
    # kept when count/total >= 0.3
    e = cfg.filter(F.col("__exact").isNotNull())
    etot = e.groupBy("__exact").agg(F.count(F.lit(1)).alias("total"))
    ec = (e.groupBy("__exact", "check_type")
          .agg(F.count(F.lit(1)).alias("cnt"))
          .join(etot, "__exact"))
    we = W.partitionBy("__exact").orderBy(F.desc("cnt"), F.asc("check_type"))
    ec = (
        ec.withColumn("__rn", F.row_number().over(we))
        .withColumn("top1", F.max("cnt").over(W.partitionBy("__exact")))
        .filter((F.col("__rn") <= 3)
                & (F.col("cnt") / F.col("total") >= 0.3))
        .withColumn("confidence",
                    F.least(F.lit(0.95),
                            0.6 + F.col("top1") / F.col("total") * 0.35))
        .filter((F.col("total") >= min_occurrences)
                & (F.col("confidence") >= min_confidence))
    )
    exa = ec.select(
        F.col("__exact").alias("pattern"),
        F.lit("exact").alias("pattern_type"),
        "check_type",
        F.round("confidence", 6).alias("confidence"),
        F.col("total").cast("int").alias("occurrence_count"),
    )
    return suf.unionByName(pre).unionByName(exa)


def oracle_learn_sql(config_sql: str, min_occurrences: int = 2,
                     min_confidence: float = 0.5) -> str:
    """DuckDB twin generated from the same affix/exact spec;
    ``config_sql`` must yield (table_name, column_name, check_type)."""
    def first_match(cands, mode):
        out = "NULL"
        for c in reversed(cands):
            cond = (f"ends_with(lower(column_name), '{c}')" if mode == "suffix"
                    else f"starts_with(lower(column_name), '{c}')")
            out = f"CASE WHEN {cond} THEN '{c}' ELSE {out} END"
        return out

    exacts = "', '".join(EXACT_NAMES)

    def affix(bucket, pat_expr, ptype):
        return f"""
  SELECT {pat_expr} AS pattern, '{ptype}' AS pattern_type, check_type,
         round(confidence, 6) AS confidence,
         occurrences::int AS occurrence_count
  FROM (
    SELECT *, least(0.95, 0.5 + consistency * 0.45) AS confidence
    FROM (
      SELECT *,
             sum(cnt) OVER (PARTITION BY {bucket})
             / (occurrences * count(*) OVER (PARTITION BY {bucket}))
               AS consistency
      FROM (
        SELECT c.{bucket}, c.check_type,
               count(DISTINCT (c.table_name, c.column_name)) AS cnt,
               any_value(o.occurrences) AS occurrences
        FROM cfg c JOIN (
          SELECT {bucket},
                 count(DISTINCT (table_name, column_name)) AS occurrences
          FROM cfg WHERE {bucket} IS NOT NULL GROUP BY 1
        ) o USING ({bucket})
        WHERE c.{bucket} IS NOT NULL
        GROUP BY c.{bucket}, c.check_type
      ) WHERE cnt::double / occurrences >= 0.5
    )
  ) WHERE occurrences >= {min_occurrences}
    AND confidence >= {min_confidence}"""

    return f"""
WITH rawcfg AS (
  {config_sql}
), cfg AS (
  SELECT table_name, column_name, check_type,
         {first_match(COMMON_SUFFIXES, "suffix")} AS sfx,
         {first_match(COMMON_PREFIXES, "prefix")} AS pfx,
         CASE WHEN lower(column_name) IN ('{exacts}')
              THEN lower(column_name) END AS exa
  FROM rawcfg
)
{affix("sfx", "'*' || sfx", "suffix")}
UNION ALL
{affix("pfx", "pfx || '*'", "prefix")}
UNION ALL
SELECT exa AS pattern, 'exact' AS pattern_type, check_type,
       round(confidence, 6) AS confidence, total::int AS occurrence_count
FROM (
  SELECT *, least(0.95, 0.6 + top1::double / total * 0.35) AS confidence
  FROM (
    SELECT exa, check_type, cnt, total,
           row_number() OVER (PARTITION BY exa
                              ORDER BY cnt DESC, check_type) AS rn,
           max(cnt) OVER (PARTITION BY exa) AS top1
    FROM (
      SELECT exa, check_type, count(*) AS cnt,
             sum(count(*)) OVER (PARTITION BY exa) AS total
      FROM cfg WHERE exa IS NOT NULL GROUP BY exa, check_type
    )
  ) WHERE rn <= 3 AND cnt::double / total >= 0.3
) WHERE total >= {min_occurrences} AND confidence >= {min_confidence}
"""
