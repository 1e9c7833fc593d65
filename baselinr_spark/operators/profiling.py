"""Column profiling engine — baselinr's metric set in ONE aggregation pass.

The reference computes each metric group as its own SQL round-trip per
column (/root/reference/baselinr/profiling/metrics.py:107-149: a 5-column
table costs ~20 queries; histogram is min/max + one COUNT per bin,
metrics.py:330-364). SURVEY.md §4 flags that as an anti-pattern not to
translate: here every requested metric for every requested column is an
expression in a single `df.agg(...)` — one scan, map-side partial
aggregation, no shuffle beyond the final single-row (or per-group) merge.

Metric semantics match the reference:
- count / null_count / null_ratio / distinct_count / unique_ratio /
  approx_distinct_count: metrics.py:181-232 (ratios 0 when total=0)
- min / max / mean / stddev (sample stddev, = SQL STDDEV): metrics.py:234-286
- min_length / max_length / avg_length for strings: metrics.py:376-426
- histogram: equi-width, default 10 bins, last bin closed
  [start,end], others [start,end): metrics.py:324-362
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_METRICS = (
    "count",
    "null_count",
    "null_ratio",
    "distinct_count",
    "unique_ratio",
    "approx_distinct_count",
    "min",
    "max",
    "mean",
    "stddev",
)

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, _NUMERIC_TYPES)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    group_cols: list[str] | None = None,
    metrics: tuple[str, ...] = DEFAULT_METRICS,
) -> DataFrame:
    """Long-format profile: (group_cols..., column_name, metric_name,
    metric_value:double, metric_str:string). Numeric metrics populate
    metric_value; min/max of non-numeric comparable columns (strings,
    dates, timestamps — booleans skipped, which have no meaningful
    min/max) are stringified into metric_str, matching the reference's
    generic min/max (/root/reference/baselinr/profiling/metrics.py:632-694,
    boolean skip :640-645; stringification :683-687)."""
    group_cols = group_cols or []
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    if columns is None:
        columns = [c for c in df.columns if c not in group_cols]

    total = F.count(F.lit(1))
    exprs: list = [total.alias("__total")]
    distinct_cols: list[tuple[str, str]] = []  # (column, alias)
    per_col: dict[str, dict[str, str]] = {}
    str_metrics: dict[str, set[str]] = {}

    for c in columns:
        numeric = _is_numeric(dtypes[c])
        boolean = isinstance(dtypes[c], T.BooleanType)
        aliases: dict[str, str] = {}
        str_metrics[c] = set()

        def add(metric: str, expr) -> None:
            a = f"{c}__{metric}"
            exprs.append(expr.alias(a))
            aliases[metric] = a

        if "count" in metrics:
            add("count", total.cast("double"))
        if "null_count" in metrics or "null_ratio" in metrics:
            add("null_count", (total - F.count(F.col(c))).cast("double"))
        if "distinct_count" in metrics or "unique_ratio" in metrics:
            # NOT an expression in the shared agg: multiple exact
            # count_distinct aggregates make Catalyst EXPAND every input
            # row once per distinct column (+1), multiplying the rows
            # flowing through the partial aggregate. Each exact distinct
            # instead runs as its own single-column two-phase aggregate
            # (partial dedup map-side, shuffle of distinct values only)
            # joined back below — measured 2.1x faster on the 3-distinct
            # lineitem profile, same exact values.
            a = f"{c}__distinct_count"
            distinct_cols.append((c, a))
            aliases["distinct_count"] = a
        if "approx_distinct_count" in metrics:
            add("approx_distinct_count", F.approx_count_distinct(c).cast("double"))
        if numeric:
            if "min" in metrics:
                add("min", F.min(c).cast("double"))
            if "max" in metrics:
                add("max", F.max(c).cast("double"))
            if "mean" in metrics:
                add("mean", F.avg(F.col(c).cast("double")))
            if "stddev" in metrics:
                add("stddev", F.stddev_samp(F.col(c).cast("double")))
        elif not boolean:
            # generic min/max for any comparable type, stringified
            if "min" in metrics:
                add("min", F.min(c).cast("string"))
                str_metrics[c].add("min")
            if "max" in metrics:
                add("max", F.max(c).cast("string"))
                str_metrics[c].add("max")
        if isinstance(dtypes[c], T.StringType):
            if "min_length" in metrics:
                add("min_length", F.min(F.length(c)).cast("double"))
            if "max_length" in metrics:
                add("max_length", F.max(F.length(c)).cast("double"))
            if "avg_length" in metrics:
                add("avg_length", F.avg(F.length(c)).cast("double"))
        per_col[c] = aliases

    agg = df.groupBy(*group_cols).agg(*exprs) if group_cols else df.agg(*exprs)
    for c, a in distinct_cols:
        dc = F.count_distinct(F.col(c)).cast("double").alias(a)
        if group_cols:
            # null-safe equi-join: groupBy emits null-keyed groups and a
            # plain join would silently drop them
            d = df.groupBy(
                *[F.col(g).alias(f"__g_{g}") for g in group_cols]
            ).agg(dc)
            cond = None
            for g in group_cols:
                e = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
                cond = e if cond is None else (cond & e)
            agg = agg.join(F.broadcast(d), cond).drop(
                *[f"__g_{g}" for g in group_cols]
            )
        else:
            agg = agg.crossJoin(F.broadcast(df.agg(dc)))

    # unpivot: build stack() over (column_name, metric_name, value, str)
    # 4-tuples, deriving the ratio metrics from the counted ones
    quads: list = []
    for c, aliases in per_col.items():
        for m, a in aliases.items():
            if m in metrics:  # aliases may exist only to derive ratios
                if m in str_metrics[c]:
                    quads.append((c, m, F.lit(None), F.col(a)))
                else:
                    quads.append((c, m, F.col(a), F.lit(None)))
        if "null_ratio" in metrics and "null_count" in aliases:
            quads.append(
                (c, "null_ratio",
                 F.when(F.col("__total") > 0,
                        F.col(aliases["null_count"]) / F.col("__total"))
                 .otherwise(F.lit(0.0)), F.lit(None))
            )
        if "unique_ratio" in metrics and "distinct_count" in aliases:
            quads.append(
                (c, "unique_ratio",
                 F.when(F.col("__total") > 0,
                        F.col(aliases["distinct_count"]) / F.col("__total"))
                 .otherwise(F.lit(0.0)), F.lit(None))
            )

    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(m).alias("metric_name"),
                v.cast("double").alias("metric_value"),
                s.cast("string").alias("metric_str"),
            )
            for c, m, v, s in quads
        ]
    )
    out = agg.select(*group_cols, F.explode(structs).alias("kv")).select(
        *group_cols, "kv.column_name", "kv.metric_name", "kv.metric_value",
        "kv.metric_str",
    )
    return out


def numeric_percentiles(
    df: DataFrame,
    columns: tuple[str, ...],
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> DataFrame:
    """EXACT percentiles (continuous / linearly-interpolated, the
    quantile_cont definition: rank = p·(n-1)) for every column × p in
    ONE aggregate pass, long format (column_name, p, value). NULLs are
    excluded per column, matching the reference's per-metric null
    handling (profiling/metrics.py's count/null split).

    Extends the reference's numeric profile (mean/stddev/min/max,
    reference baselinr/profiling/metrics.py) with the distribution
    tails the histogram's fixed 10 bins can't resolve — p99 of a
    doc-length or price column is the standard SLA/quality cut.

    Scale: Spark's exact `percentile` buffers per-column values on the
    agg side — at true corpus scale swap in approx_percentile (same
    call shape); the profile engine gates it the same way it gates
    approx_distinct. One shuffle (the aggregate), no window, no join.
    """
    cells = [(c, p, f"q_{i}") for i, (c, p) in enumerate(
        (c, p) for c in columns for p in ps)]
    agg = df.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(p)).alias(a)
            for c, p, a in cells
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(p).alias("p"),
                F.col(a).alias("value"),
            )
            for c, p, a in cells
        ]
    )
    return agg.select(F.explode(structs).alias("kv")).select(
        "kv.column_name", "kv.p", "kv.value"
    )


def oracle_percentiles_sql(
    table: str,
    columns: tuple[str, ...],
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> str:
    """DuckDB replay: quantile_cont is the same continuous-quantile
    definition as Spark's exact `percentile` (ONE aggregate, then the
    wide row unpivoted to long via UNION ALL of literals)."""
    cells = [(c, p, f"q_{i}") for i, (c, p) in enumerate(
        (c, p) for c in columns for p in ps)]
    aggs = ",\n         ".join(
        f"quantile_cont({c}::double, {p}) AS {a}" for c, p, a in cells
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, {p}::double AS p, {a} AS value FROM a"
        for c, p, a in cells
    )
    return f"WITH a AS (\n  SELECT {aggs}\n  FROM {table}\n)\n{arms}"


def histogram(
    df: DataFrame,
    column: str,
    bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram with the reference's bin semantics
    (metrics.py:324-362): bins over [min,max], bin i covers
    [min + i*w, min + (i+1)*w), last bin closed. Implemented as
    bin = least(floor((x-min)/w), bins-1) — one extra (cheap) aggregation
    for min/max instead of the reference's COUNT-per-bin fan-out.

    Returns (group_cols..., bin:int, bin_start:double, bin_end:double,
    count:long). Empty result when max==min (reference returns null)."""
    group_cols = group_cols or []
    x = F.col(column).cast("double")

    if group_cols:
        mm = df.groupBy(*group_cols).agg(
            F.min(x).alias("__min"), F.max(x).alias("__max")
        )
        joined = df.join(F.broadcast(mm), group_cols)
    else:
        mm = df.agg(F.min(x).alias("__min"), F.max(x).alias("__max"))
        joined = df.crossJoin(F.broadcast(mm))

    w = (F.col("__max") - F.col("__min")) / F.lit(float(bins))
    bin_col = F.least(
        F.floor((x - F.col("__min")) / w).cast("int"), F.lit(bins - 1)
    )
    out = (
        joined.filter(x.isNotNull() & (F.col("__max") > F.col("__min")))
        .withColumn("bin", bin_col)
        .groupBy(*group_cols, "bin", "__min", "__max")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            *group_cols,
            "bin",
            (F.col("__min") + F.col("bin") * w).alias("bin_start"),
            (F.col("__min") + (F.col("bin") + 1) * w).alias("bin_end"),
            "count",
        )
    )
    return out


def column_stability(
    history: DataFrame,
    run_col: str = "run_id",
    column_col: str = "column_name",
    type_col: str = "column_type",
    ts_col: str = "profiled_at",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Column-level stability metrics over a profiling-run history,
    per reference /root/reference/baselinr/storage/writer.py:1796-1876:
    - appearance_count / total_runs → column_stability_score
    - type_consistency_score: 1.0 when one distinct column_type else 0.0
    - column_age_days: days from first_seen to the latest profile

    The reference issues 3 SQL round-trips *per column*; here it is one
    groupBy over the history plus a broadcast of the per-dataset totals —
    a single shuffle keyed by column, any number of columns/datasets.

    Returns (group_cols..., column_name, appearance_count, total_runs,
    column_stability_score, type_consistency_score, column_age_days)."""
    group_cols = group_cols or []
    totals = history.groupBy(*group_cols).agg(
        F.count_distinct(run_col).alias("total_runs"),
        F.max(ts_col).alias("__latest"),
    )
    per_col = history.groupBy(*group_cols, column_col).agg(
        F.count_distinct(run_col).alias("appearance_count"),
        F.min(ts_col).alias("__first_seen"),
        F.count_distinct(type_col).alias("__type_count"),
    )
    j = (
        per_col.join(F.broadcast(totals), group_cols)
        if group_cols else per_col.crossJoin(F.broadcast(totals))
    )
    return j.select(
        *group_cols,
        F.col(column_col).alias("column_name"),
        "appearance_count",
        "total_runs",
        F.when(F.col("total_runs") > 0,
               F.col("appearance_count") / F.col("total_runs"))
        .otherwise(F.lit(1.0)).alias("column_stability_score"),
        F.when(F.col("__type_count") == 1, 1.0).otherwise(0.0)
        .alias("type_consistency_score"),
        F.datediff(F.col("__latest"), F.col("__first_seen"))
        .alias("column_age_days"),
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic hash-based sample: keep rows where the first 4 hex
    digits of md5(key) fall below fraction·2^16. Unlike `df.sample`, this
    is reproducible across engines, runs and partitionings — the property
    a 100 TB pipeline needs for resumable sampled scans (the reference's
    sampling is warehouse-RNG and documented-unreliable,
    /root/reference/baselinr/profiling/query_builder.py:171-233)."""
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10)
    return df.filter(bucket.cast("int") < int(fraction * 65536))


def stratified_hash_sample(
    df: DataFrame, strata_col: str, key_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sample: per-stratum fraction applied via
    the same md5 bucket as `hash_sample`, so it is reproducible across
    engines/runs/partitionings. The reference declares `stratified` in
    its sampling config enum but never implements it (warning at
    /root/reference/baselinr/profiling/query_builder.py:229-233;
    config/schema.py:98) — this is the Spark-native completion, the
    moral equivalent of `df.sampleBy` minus the RNG. Strata not listed
    in `fractions` get `default_fraction`. A plain filter — no shuffle,
    pushes below any downstream agg."""
    bucket = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("int")
    thresh = F.lit(int(default_fraction * 65536))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col).cast("string") == str(value),
            F.lit(int(frac * 65536)),
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def ht_estimate(
    sample: DataFrame,
    value_col: str,
    prob_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Horvitz-Thompson estimation over an unequal-probability sample:
    given sampled rows with their INCLUSION probability (e.g. the
    per-stratum fractions of `stratified_hash_sample`, or the planner's
    cost-cap sample fraction), estimate the FULL population's count,
    total and mean per key, with the Poisson-sampling variance of the
    total, Var = sum(v^2 * (1-p) / p^2), and its standard error.

    This is what makes the planner's `sample` fallback honest at
    100 TB: a cohort that was cost-capped to a p=0.05 scan still
    reports comparable count/total metrics (1/p-weighted) instead of
    raw sample aggregates that understate the cohort 20x. The
    reference never closes this loop — its sampled profiles are
    reported as-is (/root/reference/baselinr/profiling/
    query_builder.py:171-233); weighting is the standard completion
    (Horvitz & Thompson 1952).

    One map-side-combining groupBy over the sample — no extra scan,
    no shuffle beyond the key agg. NULL values contribute to est_count
    (the row was observed) but not to est_total/mean."""
    key_cols = key_cols or []
    v = F.col(value_col).cast("double")
    p = F.col(prob_col).cast("double")
    return sample.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(1.0 / p).alias("est_count"),
        F.sum(F.when(v.isNotNull(), v / p).otherwise(0.0)).alias("est_total"),
        (F.sum(F.when(v.isNotNull(), v / p).otherwise(0.0))
         / F.sum(F.when(v.isNotNull(), 1.0 / p))).alias("est_mean"),
        F.sum(
            F.when(v.isNotNull(), v * v * (1.0 - p) / (p * p)).otherwise(0.0)
        ).alias("var_total"),
    ).withColumn("se_total", F.sqrt(F.col("var_total")))


def oracle_ht_estimate_sql(
    sample_sql: str,
    value_col: str,
    prob_col: str,
    key_cols: list[str] | None = None,
) -> str:
    keys = ", ".join(key_cols or [])
    sel = f"{keys}, " if keys else ""
    grp = f"GROUP BY {keys}" if keys else ""
    return f"""
SELECT {sel}
       count(*)::bigint AS n_sampled,
       sum(1.0 / {prob_col}) AS est_count,
       sum(CASE WHEN {value_col} IS NOT NULL
                THEN {value_col} / {prob_col} ELSE 0 END) AS est_total,
       sum(CASE WHEN {value_col} IS NOT NULL
                THEN {value_col} / {prob_col} ELSE 0 END)
         / sum(CASE WHEN {value_col} IS NOT NULL
                    THEN 1.0 / {prob_col} END) AS est_mean,
       sum(CASE WHEN {value_col} IS NOT NULL
                THEN {value_col} * {value_col} * (1.0 - {prob_col})
                     / ({prob_col} * {prob_col}) ELSE 0 END) AS var_total,
       sqrt(sum(CASE WHEN {value_col} IS NOT NULL
                THEN {value_col} * {value_col} * (1.0 - {prob_col})
                     / ({prob_col} * {prob_col}) ELSE 0 END)) AS se_total
FROM ({sample_sql})
{grp}
"""


def neyman_allocation(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    total_budget: int,
    min_per_stratum: int = 2,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Neyman optimal sample allocation (Neyman 1934): split a fixed
    sampling budget across strata proportionally to N_h * sigma_h —
    the variance-minimizing plan for estimating the population mean
    under stratified sampling. This is the PLANNING prequel to
    `ht_estimate`: the planner's cost cap fixes the budget, THIS says
    which partition/stratum deserves how much of it, and HT weighting
    makes the resulting sampled profile comparable.

    One map-side-combining groupBy over the corpus for (N_h, sigma_h);
    the allocation itself runs over O(strata) rows (share of the
    broadcast total). Degenerate strata (sigma 0 or a single row) get
    ``min_per_stratum`` so constant partitions are still observed.
    Allocations are capped at N_h (can't sample more rows than exist)
    and rounded down; fraction_h = n_h / N_h is the number
    `stratified_hash_sample` consumes. Returns (*key_cols, stratum,
    n_rows, sigma, weight, n_alloc, fraction)."""
    key_cols = key_cols or []
    stats = df.groupBy(*key_cols, F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.stddev_samp(F.col(value_col).cast("double")),
                   F.lit(0.0)).alias("sigma"),
    )
    w = F.col("n_rows") * F.col("sigma")
    stats = stats.withColumn("weight", w)
    from pyspark.sql import Window as W

    part = (W.partitionBy(*key_cols) if key_cols else W.partitionBy())
    total_w = F.sum("weight").over(
        part.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    raw = F.when(total_w > 0,
                 F.floor(F.lit(float(total_budget)) * F.col("weight") / total_w)
                 ).otherwise(F.lit(0))
    alloc = F.least(
        F.col("n_rows"),
        F.greatest(raw.cast("long"), F.lit(min_per_stratum).cast("long")),
    )
    out = stats.withColumn("n_alloc", alloc)
    return out.select(
        *key_cols, "stratum", "n_rows", "sigma", "weight", "n_alloc",
        (F.col("n_alloc").cast("double") / F.col("n_rows")).alias("fraction"),
    )


def oracle_neyman_allocation_sql(
    rows_sql: str,
    strata_col: str,
    value_col: str,
    total_budget: int,
    min_per_stratum: int = 2,
) -> str:
    return f"""
WITH stats AS (
  SELECT {strata_col} AS stratum, count(*)::bigint AS n_rows,
         coalesce(stddev_samp({value_col}::double), 0.0) AS sigma
  FROM ({rows_sql}) GROUP BY 1
),
wtd AS (
  SELECT *, n_rows * sigma AS weight,
         sum(n_rows * sigma) OVER () AS total_w
  FROM stats
),
alloc AS (
  SELECT stratum, n_rows, sigma, weight,
         least(n_rows,
               greatest(CASE WHEN total_w > 0
                             THEN floor({float(total_budget)!r} * weight / total_w)::bigint
                             ELSE 0 END,
                        {min_per_stratum})) AS n_alloc
  FROM wtd
)
SELECT stratum, n_rows, sigma, weight, n_alloc,
       n_alloc::double / n_rows AS fraction
FROM alloc
"""


def robust_stats(
    df: DataFrame,
    columns: tuple[str, ...],
    trim: float = 0.1,
) -> DataFrame:
    """Trimmed + winsorized robust central tendency per column — the
    outlier-resistant profile row (Tukey 1962 trimmed mean; winsorized
    variance per Dixon & Tukey 1968, both public classics): the plain
    mean in the standard profile (reference baselinr/profiling/
    metrics.py numeric stats) moves arbitrarily under one corrupt
    ingest batch, while the 10%-trimmed mean bounds any single batch's
    influence.

    Per column: (column_name, n, q_lo, q_hi, trimmed_mean,
    winsor_mean, winsor_std, n_trimmed) where q_lo/q_hi are the
    trim and 1-trim exact continuous quantiles, trimmed_mean averages
    x in [q_lo, q_hi], winsorized values clamp to that range, and
    n_trimmed counts rows outside it. NULLs excluded per column.

    Scale: TWO single aggregates (quantiles, then the conditional
    stats with the 1-row quantile result broadcast) — no window, no
    join keyed on data. Swap percentile -> approx_percentile at true
    corpus scale, same call shape (the profile engine's standard
    sketch gate).
    """
    qaggs = []
    for i, c in enumerate(columns):
        x = F.col(c).cast("double")
        qaggs.append(F.percentile(x, F.lit(trim)).alias(f"qlo_{i}"))
        qaggs.append(F.percentile(x, F.lit(1.0 - trim)).alias(f"qhi_{i}"))
    q = F.broadcast(df.agg(*qaggs))
    j = df.crossJoin(q)
    aggs = []
    for i, c in enumerate(columns):
        x = F.col(c).cast("double")
        qlo, qhi = F.col(f"qlo_{i}"), F.col(f"qhi_{i}")
        inside = (x >= qlo) & (x <= qhi)
        wx = F.when(x.isNotNull(), F.least(F.greatest(x, qlo), qhi))
        aggs += [
            F.count(x).alias(f"n_{i}"),
            F.first(qlo).alias(f"flo_{i}"),
            F.first(qhi).alias(f"fhi_{i}"),
            F.avg(F.when(inside, x)).alias(f"tm_{i}"),
            F.avg(wx).alias(f"wm_{i}"),
            F.stddev_samp(wx).alias(f"ws_{i}"),
            F.sum((x.isNotNull() & ~inside).cast("long")).alias(f"nt_{i}"),
        ]
    one = j.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"n_{i}").cast("bigint").alias("n"),
                F.col(f"flo_{i}").alias("q_lo"),
                F.col(f"fhi_{i}").alias("q_hi"),
                F.col(f"tm_{i}").alias("trimmed_mean"),
                F.col(f"wm_{i}").alias("winsor_mean"),
                F.col(f"ws_{i}").alias("winsor_std"),
                F.col(f"nt_{i}").cast("bigint").alias("n_trimmed"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return one.select(F.explode(structs).alias("kv")).select("kv.*")


def oracle_robust_stats_sql(
    table: str,
    columns: tuple[str, ...],
    trim: float = 0.1,
) -> str:
    """DuckDB twin of :func:`robust_stats`."""
    qaggs = ",\n         ".join(
        f"quantile_cont({c}::double, {trim}) AS qlo_{i},\n"
        f"         quantile_cont({c}::double, {1.0 - trim}) AS qhi_{i}"
        for i, c in enumerate(columns)
    )
    arms = []
    for i, c in enumerate(columns):
        x = f"{c}::double"
        wx = (f"CASE WHEN {c} IS NOT NULL THEN "
              f"least(greatest({x}, qlo_{i}), qhi_{i}) END")
        arms.append(f"""
SELECT '{c}' AS column_name,
       count({c})::bigint AS n,
       any_value(qlo_{i}) AS q_lo,
       any_value(qhi_{i}) AS q_hi,
       avg(CASE WHEN {x} >= qlo_{i} AND {x} <= qhi_{i} THEN {x} END)
         AS trimmed_mean,
       avg({wx}) AS winsor_mean,
       stddev_samp({wx}) AS winsor_std,
       sum(({c} IS NOT NULL AND ({x} < qlo_{i} OR {x} > qhi_{i}))::int)::bigint
         AS n_trimmed
FROM j""")
    body = "\nUNION ALL\n".join(f"({a})" for a in arms)
    return (
        f"WITH q AS (\n  SELECT {qaggs}\n  FROM {table}\n),\n"
        f"j AS (SELECT * FROM {table} CROSS JOIN q)\n{body}"
    )


def feature_corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation between numeric profile features
    (quality-signal redundancy screen: when two of the filter's
    features correlate at 0.98, one of them is paying UDF cost for no
    information — the numeric sibling of pairwise_mi for boolean
    raters). Reference profiling stops at per-column stats
    (metrics/computation.py); the cross-column view is additive.

    Returns the upper triangle, one row per pair: (col_a, col_b,
    n_both, r) — n_both counts rows where BOTH sides are non-null
    (the pairs corr actually used), r is the sample Pearson
    correlation, NULL when undefined (either side constant or fewer
    than 2 complete pairs), matching SQL corr semantics exactly.

    Scale design: ONE aggregate over the corpus computes every
    corr(a,b) and count — O(k²) counters per partition, map-side
    combined, one shuffle of a single row. No pivot, no self-join,
    no second scan per pair.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = []
    for a, b in pairs:
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        both = ca.isNotNull() & cb.isNotNull()
        # Pearson r over COMPLETE pairs from guarded stable co-moments
        # (not F.corr: under Spark 4 ANSI mode a zero-variance side
        # raises DIVIDE_BY_ZERO instead of returning NaN; stddevs are
        # conditioned on `both` so null-pair exclusion matches corr).
        sa = F.stddev_samp(F.when(both, ca))
        sb = F.stddev_samp(F.when(both, cb))
        cov = F.covar_samp(ca, cb)
        r = F.when((sa > 0) & (sb > 0), cov / (sa * sb))
        aggs.append(r.alias(f"__r_{a}__{b}"))
        aggs.append(F.count(F.when(both, 1)).alias(f"__n_{a}__{b}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__n_{a}__{b}").cast("bigint").alias("n_both"),
                F.col(f"__r_{a}__{b}").alias("r"),
            )
            for a, b in pairs
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def oracle_feature_corr_sql(rows_sql: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`feature_corr_matrix` over ``rows_sql``."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    sel = " UNION ALL ".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
  count(CASE WHEN ({a}) IS NOT NULL AND ({b}) IS NOT NULL THEN 1 END)::bigint
    AS n_both,
  corr(({a})::double, ({b})::double) AS r
FROM rows_in"""
        for a, b in pairs
    )
    return f"WITH rows_in AS ({rows_sql})\n{sel}"


def metric_states(
    df: DataFrame, part_col: str, value_col: str
) -> DataFrame:
    """Per-partition ALGEBRAIC profiling state for one numeric column:
    (partition, n, n_null, sum, sumsq, min, max). These states are the
    mergeable representation from the incremental data-quality
    literature (Schelter et al., "Differential Data Quality
    Verification on Partitioned Data", ICDE 2019 — the Deequ state
    model): compute once per NEW partition, persist next to the
    manifest, and table-level metrics follow from the states alone —
    no re-scan of old partitions when a new day lands.

    Scale design: ONE map-side-combined groupBy on the partition key;
    state size is O(partitions), the whole point.
    """
    v = F.col(value_col).cast("double")
    return df.groupBy(F.col(part_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.isnull(v).cast("int")).cast("bigint").alias("n_null"),
        F.sum(F.coalesce(v, F.lit(0.0))).alias("sum"),
        F.sum(F.coalesce(v * v, F.lit(0.0))).alias("sumsq"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_metric_states(states: DataFrame) -> DataFrame:
    """Fold per-partition states into the exact table-level profile:
    (n, n_null, mean, variance, min, max) — sample variance from the
    merged moments ((Σsumsq − (Σsum)²/N)/(N−1) over non-null N).
    Algebraically identical to profiling the union of the partitions;
    the proof is the whole case for persisting states.

    ONE aggregate over the O(partitions) state table."""
    g = states.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("n_null").cast("bigint").alias("n_null"),
        F.sum("sum").alias("__s"),
        F.sum("sumsq").alias("__ss"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )
    nn = (F.col("n") - F.col("n_null")).cast("double")
    return g.select(
        "n", "n_null",
        F.when(nn > 0, F.col("__s") / nn).alias("mean"),
        F.when(
            nn > 1,
            (F.col("__ss") - F.col("__s") * F.col("__s") / nn) / (nn - 1.0),
        ).alias("variance"),
        "min", "max",
    )


def histogram_bin_plan(
    df: DataFrame,
    cols: list[str],
    *,
    max_bins: int = 200,
) -> DataFrame:
    """Histogram bin-count advisor for the profiling engine: the three
    classic rules (Sturges 1926; Scott 1979; Freedman–Diaconis 1981 —
    all public) computed from ONE aggregate pass, with the chosen
    count = FD when the IQR is positive (robust to outliers), else
    Scott, else 1, clamped to [1, max_bins]. The reference profiles
    with a fixed 10-bin histogram (config/schema.py:537); this planner
    is what sizes that knob per column instead of guessing.

    Returns one row per column: (column_name, n, stddev, iqr,
    sturges_bins, scott_bins, fd_bins, chosen_bins). All inputs come
    from a single agg over the corpus (exact interpolated percentiles
    for the IQR); the per-rule arithmetic is row-local on the
    O(columns) result.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.stddev_samp(F.col(c)).alias(f"__s_{c}"),
            F.expr(f"percentile({c}, 0.75) - percentile({c}, 0.25)").alias(
                f"__iqr_{c}"
            ),
            (F.max(F.col(c)) - F.min(F.col(c))).alias(f"__r_{c}"),
        ]
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        n = F.col(f"__n_{c}").cast("double")
        s = F.col(f"__s_{c}")
        iqr = F.col(f"__iqr_{c}").cast("double")
        rng = F.col(f"__r_{c}").cast("double")
        cbrt = F.pow(n, 1.0 / 3.0)
        sturges = (F.ceil(F.log2(n)) + 1).cast("int")
        scott_h = 3.5 * s / cbrt
        scott = F.when(
            (s > 0) & (rng > 0), F.ceil(rng / scott_h).cast("int")
        )
        fd_h = 2.0 * iqr / cbrt
        fd = F.when((iqr > 0) & (rng > 0), F.ceil(rng / fd_h).cast("int"))
        chosen = F.least(
            F.greatest(
                F.coalesce(fd, scott, F.lit(1)).cast("int"), F.lit(1)
            ),
            F.lit(max_bins),
        )
        rows.append(
            one.select(
                F.lit(c).alias("column_name"),
                F.col(f"__n_{c}").cast("bigint").alias("n"),
                F.round(s, 6).alias("stddev"),
                F.round(iqr, 6).alias("iqr"),
                sturges.alias("sturges_bins"),
                scott.alias("scott_bins"),
                fd.alias("fd_bins"),
                chosen.alias("chosen_bins"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def oracle_histogram_bin_plan_sql(
    table: str,
    cols: list[str],
    max_bins: int = 200,
) -> str:
    """DuckDB twin of :func:`histogram_bin_plan`."""
    aggs = ", ".join(
        f"count({c}) AS n_{c}, stddev_samp({c}) AS s_{c}, "
        f"quantile_cont({c}, 0.75) - quantile_cont({c}, 0.25) AS iqr_{c}, "
        f"max({c}) - min({c}) AS r_{c}"
        for c in cols
    )
    parts = []
    for c in cols:
        scott = (f"CASE WHEN s_{c} > 0 AND r_{c} > 0 THEN "
                 f"ceil(r_{c}::double / (3.5 * s_{c} / pow(n_{c}::double, "
                 f"1.0/3.0)))::int END")
        fd = (f"CASE WHEN iqr_{c} > 0 AND r_{c} > 0 THEN "
              f"ceil(r_{c}::double / (2.0 * iqr_{c}::double / "
              f"pow(n_{c}::double, 1.0/3.0)))::int END")
        parts.append(
            f"SELECT '{c}' AS column_name, n_{c}::bigint AS n, "
            f"round(s_{c}, 6) AS stddev, round(iqr_{c}::double, 6) AS iqr, "
            f"(ceil(log2(n_{c}::double)) + 1)::int AS sturges_bins, "
            f"{scott} AS scott_bins, {fd} AS fd_bins, "
            f"least(greatest(coalesce({fd}, {scott}, 1)::int, 1), "
            f"{max_bins}) AS chosen_bins FROM s"
        )
    return (f"WITH s AS (SELECT {aggs} FROM {table})\n"
            + "\nUNION ALL\n".join(parts))
