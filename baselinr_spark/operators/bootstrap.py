"""Deterministic Poisson-bootstrap confidence intervals.

The drift registry's parametric p-values (z-score, KS asymptotics,
Wilson-Hilferty chi-square) all assume a distributional form; the
bootstrap is the assumption-free companion every metrics platform
eventually needs ("is this cohort's mean REALLY different, given our
skew?"). The reference carries no resampling machinery at all — its
confidence story stops at learned control limits
(/root/reference/baselinr/learning/expectation_learner.py:24-67);
this closes that gap Spark-first.

Poisson bootstrap (Hanley & MacGibbon 2006; the classic trick for
distributed data): instead of multinomial resampling — which needs a
global coordinated draw — each row enters resample ``b`` with an
independent Poisson(1) weight. Weights come from the md5-uniform
inverse-CDF transform (same determinism contract as every sampler in
this repo: engine-, run- and partitioning-independent), so the WHOLE
bootstrap distribution is exactly replayable in SQL.

Scale shape: the explode multiplies input rows by B, so this operator
is meant for ALREADY-AGGREGATED inputs — per-partition metric rows,
per-cohort samples, O(cohorts · samples) — not raw corpus docs (at
10^12 docs you bootstrap the per-partition aggregates the metrics
table already holds, which is exactly how the pipeline stores them).
Per-resample means are one map-side-combining groupBy; the CI
percentiles run over B rows per key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .selection import _md5_uniform

#: Poisson(1) CDF thresholds for k = 0..7; u >= threshold[7] -> k = 8.
#: Computed once here and embedded verbatim in both engines' plans so
#: the inverse-CDF draws are bit-identical.
POISSON1_CDF: tuple[float, ...] = tuple(
    math.exp(-1.0) * sum(1.0 / math.factorial(j) for j in range(k + 1))
    for k in range(8)
)


def _poisson1_expr(u):
    """Inverse-CDF Poisson(1) draw from a U[0,1) column (capped at 8 —
    P(k > 8) ~ 1e-7, and the cap is applied identically in the SQL
    twin, so determinism is unaffected)."""
    k = F.lit(8)
    for i in range(7, -1, -1):
        k = F.when(u < F.lit(POISSON1_CDF[i]), F.lit(i)).otherwise(k)
    return k


def _poisson1_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {POISSON1_CDF[i]!r} THEN {i}" for i in range(8)
    )
    return f"(CASE {cases} ELSE 8 END)"


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    b: int = 200,
    alpha: float = 0.05,
    salt: str = "boot",
) -> DataFrame:
    """Percentile-bootstrap CI for the mean of ``value_col`` per key:
    B deterministic Poisson(1)-weighted resamples, each reduced to a
    weighted mean, then the (alpha/2, 1-alpha/2) percentiles and the
    bootstrap SE of those B means. Resamples whose total weight is 0
    are dropped (b_effective reports how many survived). NULL values
    are excluded up front. Returns (*key_cols, mean, ci_lo, ci_hi,
    boot_se, b_effective, n)."""
    key_cols = key_cols or []
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols,
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("double").alias("__v"),
    )
    ex = rows.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("__b")
    )
    u = _md5_uniform(
        F.concat(F.col("__id").cast("string"), F.lit(":"),
                 F.col("__b").cast("string")),
        salt,
    )
    ex = ex.withColumn("__w", _poisson1_expr(u).cast("double"))
    per_b = ex.groupBy(*key_cols, "__b").agg(
        F.sum(F.col("__w") * F.col("__v")).alias("__wv"),
        F.sum("__w").alias("__wsum"),
    ).filter(F.col("__wsum") > 0).select(
        *key_cols, (F.col("__wv") / F.col("__wsum")).alias("__mean_b")
    )
    cis = per_b.groupBy(*key_cols).agg(
        F.percentile("__mean_b", F.lit(alpha / 2)).alias("ci_lo"),
        F.percentile("__mean_b", F.lit(1 - alpha / 2)).alias("ci_hi"),
        F.stddev_samp("__mean_b").alias("boot_se"),
        F.count(F.lit(1)).alias("b_effective"),
    )
    point = rows.groupBy(*key_cols).agg(
        F.avg("__v").alias("mean"), F.count(F.lit(1)).alias("n")
    )
    j = point.join(F.broadcast(cis), key_cols) if key_cols else \
        point.crossJoin(F.broadcast(cis))
    return j.select(*key_cols, "mean", "ci_lo", "ci_hi", "boot_se",
                    "b_effective", "n")


def oracle_bootstrap_mean_ci_sql(
    rows_sql: str,
    id_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    b: int = 200,
    alpha: float = 0.05,
    salt: str = "boot",
) -> str:
    """DuckDB replay: same md5 uniform, same Poisson thresholds, same
    quantile_cont (= Spark's exact `percentile`)."""
    keys = ", ".join(key_cols or [])
    sel = f"{keys}, " if keys else ""
    grp_b = f"GROUP BY {keys}, __b" if keys else "GROUP BY __b"
    grp = f"GROUP BY {keys}" if keys else ""
    on = f"USING ({keys})" if keys else "ON TRUE"
    u = (f"(('0x' || substring(md5({id_col}::varchar || ':' || t.b::varchar"
         f" || '|{salt}'), 1, 8))::bigint / 4294967296.0)")
    w = _poisson1_sql(u)
    return f"""
WITH rows_in AS (
  SELECT * FROM ({rows_sql}) WHERE {value_col} IS NOT NULL
),
ex AS (
  SELECT {sel}{id_col}, {value_col}::double AS v, t.b AS __b,
         {w}::double AS w
  FROM rows_in, range({b}) t(b)
),
per_b AS (
  SELECT {sel}__b, sum(w * v) / sum(w) AS mean_b
  FROM ex {grp_b}
  HAVING sum(w) > 0
),
cis AS (
  SELECT {sel}quantile_cont(mean_b, {alpha / 2!r}) AS ci_lo,
         quantile_cont(mean_b, {1 - alpha / 2!r}) AS ci_hi,
         stddev_samp(mean_b) AS boot_se,
         count(*)::bigint AS b_effective
  FROM per_b {grp}
),
point AS (
  SELECT {sel}avg(v) AS mean, count(*)::bigint AS n
  FROM (SELECT {sel}{value_col}::double AS v FROM rows_in) {grp}
)
SELECT {sel}mean, ci_lo, ci_hi, boot_se, b_effective, n
FROM point JOIN cis {on}
"""
