"""Two-component 1-D Gaussian-mixture EM over a document score.

CCNet buckets perplexity by hard percentile thirds
(operators/selection.py:ccnet_buckets); a 2-component GMM instead
LEARNS where a quality score splits into a low and a high population
and gives each document a posterior membership — the data-driven
keep-threshold when the score distribution is a mixture (clean pages
vs template/spam mass). Classic EM (Dempster et al. 1977, public),
run for a FIXED number of iterations with deterministic moment-based
initialization so the result is replayable in SQL — the same
fixed-step discipline as the GD logistic regression
(operators/classifier.py) and k-means (operators/kmeans.py) oracles.

Model: p(x) = w1·N(x; mu1, var1) + w2·N(x; mu2, var2).
Init: mu1/mu2 at the lower/upper quartile MIDPOINTS of the range
(min + ¼·span, min + ¾·span — pure min/max arithmetic, exact in both
engines), var1 = var2 = var_pop(x), w1 = w2 = 0.5.
M-step uses the algebraic variance  Σr·x²/Σr − mu²  (one pass), with
a 1e-9 floor against component collapse. Parameters are rounded to 12
decimals after every M-step ON BOTH ENGINES: summation order differs
between Spark partitions and DuckDB, and without a per-iteration
quantization the ~1-ulp disagreement would be re-amplified through
every following E-step's exp() (the cross-engine analogue of the
per-iteration float discipline in the BPE/PageRank oracles).

Scale design (10^12 docs):

* Parameters live in a ONE-ROW DataFrame threaded through the plan by
  broadcast crossJoin (the package's 1-row house rule) — no driver
  collect inside the loop, no growing lineage beyond the fixed T
  iterations (T=5 default).
* Each iteration is ONE aggregate over the corpus (map-side partial
  sums); the E-step responsibilities are row-local expressions inside
  WholeStageCodegen — never materialized.
* Posterior assignment is a final row-local projection against the
  broadcast fitted parameters.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SQRT_2PI = math.sqrt(2.0 * math.pi)


def _pdf(x, mu, var):
    return F.exp(-(x - mu) * (x - mu) / (2.0 * var)) / (
        F.lit(_SQRT_2PI) * F.sqrt(var)
    )


def gmm2_fit(
    df: DataFrame,
    x_col: str,
    *,
    iters: int = 5,
    var_floor: float = 1e-9,
) -> DataFrame:
    """Fit the 2-component mixture; returns ONE row
    (w1, mu1, var1, w2, mu2, var2) after ``iters`` EM steps."""
    xs = df.select(F.col(x_col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    p = xs.agg(
        F.min("x").alias("__lo"),
        F.max("x").alias("__hi"),
        F.var_pop("x").alias("__v"),
    ).select(
        F.lit(0.5).alias("w1"),
        F.round(
            F.col("__lo") + 0.25 * (F.col("__hi") - F.col("__lo")), 12
        ).alias("mu1"),
        F.round(F.greatest(F.col("__v"), F.lit(var_floor)), 12).alias("var1"),
        F.lit(0.5).alias("w2"),
        F.round(
            F.col("__lo") + 0.75 * (F.col("__hi") - F.col("__lo")), 12
        ).alias("mu2"),
        F.round(F.greatest(F.col("__v"), F.lit(var_floor)), 12).alias("var2"),
    )
    for _ in range(iters):
        j = xs.crossJoin(F.broadcast(p))
        d1 = F.col("w1") * _pdf(F.col("x"), F.col("mu1"), F.col("var1"))
        d2 = F.col("w2") * _pdf(F.col("x"), F.col("mu2"), F.col("var2"))
        r2 = d2 / (d1 + d2)
        e = j.select(
            F.col("x"),
            r2.alias("r2"),
            (F.lit(1.0) - r2).alias("r1"),
        )
        agg = e.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("r1").alias("s1"),
            F.sum(F.col("r1") * F.col("x")).alias("sx1"),
            F.sum(F.col("r1") * F.col("x") * F.col("x")).alias("sxx1"),
            F.sum("r2").alias("s2"),
            F.sum(F.col("r2") * F.col("x")).alias("sx2"),
            F.sum(F.col("r2") * F.col("x") * F.col("x")).alias("sxx2"),
        )
        mu1 = F.col("sx1") / F.col("s1")
        mu2 = F.col("sx2") / F.col("s2")
        p = agg.select(
            F.round(F.col("s1") / F.col("n"), 12).alias("w1"),
            F.round(mu1, 12).alias("mu1"),
            F.round(
                F.greatest(
                    F.col("sxx1") / F.col("s1") - mu1 * mu1, F.lit(var_floor)
                ),
                12,
            ).alias("var1"),
            F.round(F.col("s2") / F.col("n"), 12).alias("w2"),
            F.round(mu2, 12).alias("mu2"),
            F.round(
                F.greatest(
                    F.col("sxx2") / F.col("s2") - mu2 * mu2, F.lit(var_floor)
                ),
                12,
            ).alias("var2"),
        )
    return p


def gmm2_posteriors(
    df: DataFrame,
    id_col: str,
    x_col: str,
    params: DataFrame,
) -> DataFrame:
    """Posterior component-2 membership per row under fitted params.
    Returns (id_col, x_col, p2, component) with component = the MAP
    assignment (1 or 2)."""
    j = df.select(id_col, F.col(x_col).cast("double").alias(x_col)).filter(
        F.col(x_col).isNotNull()
    ).crossJoin(F.broadcast(params))
    d1 = F.col("w1") * _pdf(F.col(x_col), F.col("mu1"), F.col("var1"))
    d2 = F.col("w2") * _pdf(F.col(x_col), F.col("mu2"), F.col("var2"))
    p2 = d2 / (d1 + d2)
    return j.select(
        id_col,
        x_col,
        F.round(p2, 6).alias("p2"),
        F.when(p2 >= 0.5, F.lit(2)).otherwise(F.lit(1)).alias("component"),
    )


def _oracle_em_cte(
    source_sql: str, iters: int, var_floor: float
) -> str:
    """Shared CTE chain: xs, p0 … p{iters} (MATERIALIZED — inlined
    re-evaluation would be exponential in iters, the HITS-oracle
    lesson)."""
    parts = [
        f"""xs AS MATERIALIZED (
  SELECT x::double AS x FROM ({source_sql}) WHERE x IS NOT NULL
),
p0 AS MATERIALIZED (
  SELECT 0.5 AS w1,
         round(min(x) + 0.25 * (max(x) - min(x)), 12) AS mu1,
         round(greatest(var_pop(x), {var_floor!r}), 12) AS var1,
         0.5 AS w2,
         round(min(x) + 0.75 * (max(x) - min(x)), 12) AS mu2,
         round(greatest(var_pop(x), {var_floor!r}), 12) AS var2
  FROM xs
)"""
    ]
    pdf = (
        "(exp(-(x - {mu}) * (x - {mu}) / (2.0 * {var}))"
        f" / ({_SQRT_2PI!r} * sqrt({{var}})))"
    )
    for i in range(1, iters + 1):
        d1 = "(w1 * " + pdf.format(mu="mu1", var="var1") + ")"
        d2 = "(w2 * " + pdf.format(mu="mu2", var="var2") + ")"
        parts.append(
            f"""e{i} AS (
  SELECT x, {d2} / ({d1} + {d2}) AS r2
  FROM xs CROSS JOIN p{i-1}
),
a{i} AS (
  SELECT count(*)::double AS n,
         sum(1.0 - r2) AS s1, sum((1.0 - r2) * x) AS sx1,
         sum((1.0 - r2) * x * x) AS sxx1,
         sum(r2) AS s2, sum(r2 * x) AS sx2, sum(r2 * x * x) AS sxx2
  FROM e{i}
),
p{i} AS MATERIALIZED (
  SELECT round(s1 / n, 12) AS w1, round(sx1 / s1, 12) AS mu1,
         round(greatest(sxx1 / s1 - (sx1 / s1) * (sx1 / s1),
                        {var_floor!r}), 12) AS var1,
         round(s2 / n, 12) AS w2, round(sx2 / s2, 12) AS mu2,
         round(greatest(sxx2 / s2 - (sx2 / s2) * (sx2 / s2),
                        {var_floor!r}), 12) AS var2
  FROM a{i}
)"""
        )
    return "WITH " + ",\n".join(parts)


def oracle_gmm2_fit_sql(
    source_sql: str,
    *,
    iters: int = 5,
    var_floor: float = 1e-9,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of :func:`gmm2_fit`; ``source_sql`` must yield one
    column named x."""
    cte = _oracle_em_cte(source_sql, iters, var_floor)
    r = round_dp
    return cte + f"""
SELECT round(w1, {r}) AS w1, round(mu1, {r}) AS mu1,
       round(var1, {r}) AS var1, round(w2, {r}) AS w2,
       round(mu2, {r}) AS mu2, round(var2, {r}) AS var2
FROM p{iters}"""


def oracle_gmm2_posteriors_sql(
    source_sql: str,
    *,
    iters: int = 5,
    var_floor: float = 1e-9,
) -> str:
    """DuckDB twin of :func:`gmm2_posteriors`; ``source_sql`` must
    yield (id, x)."""
    cte = _oracle_em_cte(
        f"SELECT x FROM ({source_sql})", iters, var_floor
    )
    pdf = (
        "(exp(-(x - {mu}) * (x - {mu}) / (2.0 * {var}))"
        f" / ({_SQRT_2PI!r} * sqrt({{var}})))"
    )
    d1 = "(w1 * " + pdf.format(mu="mu1", var="var1") + ")"
    d2 = "(w2 * " + pdf.format(mu="mu2", var="var2") + ")"
    return cte + f"""
SELECT s.id, s.x, round({d2} / ({d1} + {d2}), 6) AS p2,
       CASE WHEN {d2} / ({d1} + {d2}) >= 0.5 THEN 2 ELSE 1 END AS component
FROM ({source_sql}) s CROSS JOIN p{iters}
WHERE s.x IS NOT NULL"""
