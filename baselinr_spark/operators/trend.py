"""Robust trend estimation for metric time series.

:func:`theil_sen` — the Theil-Sen estimator (Theil 1950; Sen 1968):
slope = median of all pairwise slopes, intercept = median residual
offset. The robust replacement for the OLS trend in drift monitoring —
a single anomalous day (which is exactly what a drift monitor expects
to see) moves an OLS slope arbitrarily but moves Theil-Sen only past a
29% breakdown point. Complements the reference's moving-average /
prior-period baselines (reference baselinr/drift/baseline.py, recast
in operators/baseline.py) with a trend DIRECTION + RATE number.

Scale design: the pairwise self-join is O(d^2) per group where d is
the series length — bounded by the metric retention window (90 days =
4,005 pairs), NEVER corpus-scale; the join shuffles on the group key
only, so 10^6 (table, column, metric) series parallelize across the
cluster with each group's quadratic work local to one task. Medians
use exact linear-interpolation percentile (Spark `percentile` ==
DuckDB `quantile_cont`), so the oracle replays bit-compatibly at 6dp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theil_sen(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Theil-Sen trend: (group..., n_points, slope,
    intercept) with slope = median_{i<j} (y_j-y_i)/(x_j-x_i) and
    intercept = median_i (y_i - slope * x_i). Groups with < 2 distinct
    x values are dropped (no defined slope)."""
    g = list(group_cols)
    pts = df.select(
        *g,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    a = pts.select(*g, F.col("__x").alias("x1"), F.col("__y").alias("y1"))
    b = pts.select(*g, F.col("__x").alias("x2"), F.col("__y").alias("y2"))
    pairs = a.join(b, g).filter(F.col("x2") > F.col("x1"))
    slopes = pairs.groupBy(*g).agg(
        F.expr("percentile((y2 - y1) / (x2 - x1), 0.5)").alias("slope")
    )
    resid = pts.join(slopes, g).groupBy(*g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.first("slope").alias("slope"),
        F.expr("percentile(__y - slope * __x, 0.5)").alias("intercept"),
    )
    return resid.select(*g, "n_points", "slope", "intercept")


def oracle_theil_sen_sql(
    rows_sql: str,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> str:
    """DuckDB twin of :func:`theil_sen` over ``rows_sql``."""
    g = ", ".join(group_cols)
    on = " AND ".join(f"a.{c} = b.{c}" for c in group_cols)
    ga = ", ".join(f"a.{c}" for c in group_cols)
    return f"""
WITH rows_in AS ({rows_sql}),
pts AS (
  SELECT {g}, ({x_col})::double AS x, ({y_col})::double AS y
  FROM rows_in
  WHERE ({x_col}) IS NOT NULL AND ({y_col}) IS NOT NULL
),
slopes AS (
  SELECT {ga}, quantile_cont((b.y - a.y) / (b.x - a.x), 0.5) AS slope
  FROM pts a JOIN pts b ON {on} AND b.x > a.x
  GROUP BY {ga}
),
resid AS (
  SELECT {', '.join('pts.' + c for c in group_cols)},
         count(*)::bigint AS n_points,
         any_value(slope) AS slope,
         quantile_cont(pts.y - slope * pts.x, 0.5) AS intercept
  FROM pts JOIN slopes USING ({g})
  GROUP BY {', '.join('pts.' + c for c in group_cols)}
)
SELECT {g}, n_points, slope, intercept FROM resid"""
