"""Statistical drift tests over aggregated cohort distributions.

Recasts /root/reference/baselinr/drift/statistical_tests.py as DataFrame
ops over bucket/category count tables (one row per cohort x bucket).
Where the reference loop-compares two in-memory dicts, we full-outer-join
two (or N, via lag) cohort distributions and reduce with native
aggregates — the shape that survives 10^12 rows because the inputs here
are already tiny aggregates.

Implemented tests (registry parity with statistical_tests.py:1304-1311):
psi, z_score, chi_square, entropy, top_k — see each function's docstring
for the exact reference semantics. ks_test operates on histogram data via
the same bucket tables (ECDF max-diff, the reference's manual fallback
path statistical_tests.py:344-381).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_FLOOR = 0.0001


def psi(
    base: DataFrame,
    cur: DataFrame,
    bucket_col: str = "bucket",
    count_col: str = "count",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Population Stability Index between two bucket-count tables.

    Reference semantics (statistical_tests.py:588-611): normalize each
    side by its own total (or 1.0), union bucket keys, missing bucket →
    prob floor 1e-4, psi = Σ (p_cur − p_base)·ln(p_cur / p_base).
    Severity (statistical_tests.py:468-477): drift if psi > 0.2;
    high > 0.5, medium > 0.3, else low.

    Returns one row per key group: (key_cols..., psi:double,
    drift:boolean, severity:string)."""
    key_cols = key_cols or []

    def _norm(df: DataFrame, p_name: str) -> DataFrame:
        w_tot = df.groupBy(*key_cols).agg(F.sum(count_col).alias("__tot"))
        joined = df.join(F.broadcast(w_tot), key_cols) if key_cols else df.crossJoin(
            F.broadcast(w_tot)
        )
        return joined.select(
            *key_cols,
            F.col(bucket_col).alias("bucket"),
            (F.col(count_col) / F.when(F.col("__tot") > 0, F.col("__tot")).otherwise(1.0)).alias(p_name),
        )

    b = _norm(base, "p_base")
    c = _norm(cur, "p_cur")
    on = key_cols + ["bucket"]
    j = b.join(c, on, "full_outer").select(
        *key_cols,
        F.coalesce(
            F.when(F.col("p_base") > 0, F.col("p_base")), F.lit(PSI_FLOOR)
        ).alias("pb"),
        F.coalesce(
            F.when(F.col("p_cur") > 0, F.col("p_cur")), F.lit(PSI_FLOOR)
        ).alias("pc"),
    )
    agg = j.groupBy(*key_cols).agg(
        F.sum((F.col("pc") - F.col("pb")) * F.log(F.col("pc") / F.col("pb"))).alias("psi")
    )
    return agg.select(
        *key_cols,
        "psi",
        (F.col("psi") > 0.2).alias("drift"),
        psi_severity(F.col("psi")).alias("severity"),
    )


def psi_severity(psi_col):
    return (
        F.when(psi_col > 0.5, "high")
        .when(psi_col > 0.3, "medium")
        .when(psi_col > 0.2, "low")
        .otherwise("none")
    )


def psi_pairwise_lag(
    dist: DataFrame,
    cohort_col: str,
    bucket_col: str,
    count_col: str,
) -> DataFrame:
    """PSI of every cohort vs its predecessor (ordered by cohort value) in
    one plan: pivot cohort→prob map per bucket is avoided; instead
    collect each cohort's distribution as a sorted array and lag it.
    Cohort count is small (per-day partitions), so the collect_list per
    cohort is bounded by the bucket count (10)."""
    from pyspark.sql import Window as W

    tot = dist.groupBy(cohort_col).agg(F.sum(count_col).alias("__tot"))
    probs = (
        dist.join(F.broadcast(tot), cohort_col)
        .select(
            F.col(cohort_col).alias("cohort"),
            F.col(bucket_col).alias("bucket"),
            (F.col(count_col) / F.when(F.col("__tot") > 0, F.col("__tot")).otherwise(1.0)).alias("p"),
        )
    )
    per_cohort = probs.groupBy("cohort").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("bucket", "p")))
        ).alias("dist")
    )
    w = W.orderBy("cohort")
    lagged = per_cohort.withColumn("base_dist", F.lag("dist").over(w)).filter(
        F.col("base_dist").isNotNull()
    )
    # union of keys, floor missing/zero at 1e-4, sum terms
    keys = F.array_distinct(
        F.concat(F.map_keys(F.col("dist")), F.map_keys(F.col("base_dist")))
    )
    term = F.transform(
        keys,
        lambda k: (
            (_floored(F.col("dist")[k]) - _floored(F.col("base_dist")[k]))
            * F.log(_floored(F.col("dist")[k]) / _floored(F.col("base_dist")[k]))
        ),
    )
    psi_col = F.aggregate(term, F.lit(0.0), lambda acc, x: acc + x)
    return lagged.select(
        F.col("cohort"),
        psi_col.alias("psi"),
        (psi_col > 0.2).alias("drift"),
        psi_severity(psi_col).alias("severity"),
    )


def _floored(p):
    return F.when(p.isNotNull() & (p > 0), p).otherwise(F.lit(PSI_FLOOR))


def z_score(
    base_mean, base_stddev, cur_mean
):
    """|cur − base| / base_stddev (stddev→1 when 0); drift > 2.0, severity
    >3.0 high / >2.5 medium (statistical_tests.py:614-753). Column-level
    helper usable in any select."""
    sd = F.when(F.abs(base_stddev) > 0, base_stddev).otherwise(F.lit(1.0))
    z = F.abs(cur_mean - base_mean) / sd
    sev = (
        F.when(z > 3.0, "high").when(z > 2.5, "medium").when(z > 2.0, "low").otherwise("none")
    )
    return z, z > 2.0, sev


def chi_square(
    base: DataFrame,
    cur: DataFrame,
    category_col: str = "category",
    count_col: str = "count",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """2×k contingency chi² with expected counts from pooled margins
    (statistical_tests.py:761-950). Drift if χ² > 2·df (the p-value gate
    needs scipy's CDF; we implement the χ²>2·df branch which the
    reference also applies); severity χ² > 5·df high, > 3·df medium.

    Returns (key_cols..., chi2:double, dof:long, drift, severity)."""
    key_cols = key_cols or []
    b = base.select(*key_cols, F.col(category_col).alias("cat"),
                    F.col(count_col).cast("double").alias("n_b"))
    c = cur.select(*key_cols, F.col(category_col).alias("cat"),
                   F.col(count_col).cast("double").alias("n_c"))
    j = (
        b.join(c, key_cols + ["cat"], "full_outer")
        .fillna(0.0, subset=["n_b", "n_c"])
    )
    tot = j.groupBy(*key_cols).agg(
        F.sum("n_b").alias("Nb"), F.sum("n_c").alias("Nc"),
        F.count(F.lit(1)).alias("k"),
    )
    jj = j.join(F.broadcast(tot), key_cols) if key_cols else j.crossJoin(F.broadcast(tot))
    row_tot = F.col("n_b") + F.col("n_c")
    grand = F.col("Nb") + F.col("Nc")
    e_b = row_tot * F.col("Nb") / grand
    e_c = row_tot * F.col("Nc") / grand
    term = (
        F.when(e_b > 0, F.pow(F.col("n_b") - e_b, 2) / e_b).otherwise(0.0)
        + F.when(e_c > 0, F.pow(F.col("n_c") - e_c, 2) / e_c).otherwise(0.0)
    )
    agg = jj.groupBy(*key_cols).agg(
        F.sum(term).alias("chi2"), (F.first("k") - 1).cast("long").alias("dof")
    )
    return agg.select(
        *key_cols, "chi2", "dof",
        (F.col("chi2") > 2 * F.col("dof")).alias("drift"),
        F.when(F.col("chi2") > 5 * F.col("dof"), "high")
        .when(F.col("chi2") > 3 * F.col("dof"), "medium")
        .when(F.col("chi2") > 2 * F.col("dof"), "low")
        .otherwise("none")
        .alias("severity"),
    )


def entropy_drift(
    base: DataFrame,
    cur: DataFrame,
    category_col: str = "category",
    count_col: str = "count",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """|ΔShannon entropy| (log2) of the two category distributions
    (statistical_tests.py:953-1126): drift > 0.1; severity > 0.3 high,
    > 0.2 medium."""
    key_cols = key_cols or []

    def _h(df: DataFrame, name: str) -> DataFrame:
        tot = df.groupBy(*key_cols).agg(F.sum(count_col).alias("__tot"))
        j = df.join(F.broadcast(tot), key_cols) if key_cols else df.crossJoin(F.broadcast(tot))
        p = F.col(count_col) / F.col("__tot")
        return j.groupBy(*key_cols).agg(
            F.sum(F.when(p > 0, -p * F.log2(p)).otherwise(0.0)).alias(name)
        )

    hb = _h(base, "h_base")
    hc = _h(cur, "h_cur")
    j = hb.join(hc, key_cols) if key_cols else hb.crossJoin(hc)
    d = F.abs(F.col("h_cur") - F.col("h_base"))
    return j.select(
        *key_cols,
        F.col("h_base"), F.col("h_cur"), d.alias("entropy_diff"),
        (d > 0.1).alias("drift"),
        F.when(d > 0.3, "high").when(d > 0.2, "medium").when(d > 0.1, "low")
        .otherwise("none").alias("severity"),
    )


def top_k_jaccard(
    base: DataFrame,
    cur: DataFrame,
    category_col: str = "category",
    count_col: str = "count",
    k: int = 10,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Jaccard similarity of the two cohorts' top-k category sets
    (statistical_tests.py:1129-1297): drift if sim < 0.7; severity
    < 0.3 high, < 0.5 medium."""
    from pyspark.sql import Window as W

    key_cols = key_cols or []

    def _topk(df: DataFrame, name: str) -> DataFrame:
        w = W.partitionBy(*key_cols).orderBy(
            F.desc(count_col), F.asc(category_col)
        ) if key_cols else W.orderBy(F.desc(count_col), F.asc(category_col))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .groupBy(*key_cols)
            .agg(F.collect_set(category_col).alias(name))
        )

    tb = _topk(base, "set_base")
    tc = _topk(cur, "set_cur")
    j = tb.join(tc, key_cols) if key_cols else tb.crossJoin(tc)
    inter = F.size(F.array_intersect("set_base", "set_cur")).cast("double")
    union = F.size(F.array_union("set_base", "set_cur")).cast("double")
    sim = F.when(union > 0, inter / union).otherwise(1.0)
    return j.select(
        *key_cols,
        sim.alias("jaccard"),
        (sim < 0.7).alias("drift"),
        F.when(sim < 0.3, "high").when(sim < 0.5, "medium").when(sim < 0.7, "low")
        .otherwise("none").alias("severity"),
    )


def ks_from_histograms(
    base: DataFrame,
    cur: DataFrame,
    bucket_col: str = "bucket",
    count_col: str = "count",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample KS statistic from aligned histogram buckets: max |ΔECDF|
    (the reference's manual fallback, statistical_tests.py:344-381).
    Drift if D > 0.2; severity D > 0.3 high / > 0.2 medium."""
    key_cols = key_cols or []
    b = base.select(*key_cols, F.col(bucket_col).alias("bucket"),
                    F.col(count_col).cast("double").alias("n_b"))
    c = cur.select(*key_cols, F.col(bucket_col).alias("bucket"),
                   F.col(count_col).cast("double").alias("n_c"))
    j = b.join(c, key_cols + ["bucket"], "full_outer").fillna(0.0, ["n_b", "n_c"])
    tot = j.groupBy(*key_cols).agg(F.sum("n_b").alias("Nb"), F.sum("n_c").alias("Nc"))
    jj = j.join(F.broadcast(tot), key_cols) if key_cols else j.crossJoin(F.broadcast(tot))
    from pyspark.sql import Window as W

    w = (W.partitionBy(*key_cols) if key_cols else W.partitionBy()).orderBy("bucket") \
        .rowsBetween(W.unboundedPreceding, 0)
    ecdf = jj.select(
        *key_cols,
        (F.sum(F.col("n_b") / F.col("Nb")).over(w)).alias("F_b"),
        (F.sum(F.col("n_c") / F.col("Nc")).over(w)).alias("F_c"),
    )
    agg = ecdf.groupBy(*key_cols).agg(F.max(F.abs(F.col("F_b") - F.col("F_c"))).alias("ks_d"))
    return agg.select(
        *key_cols, "ks_d",
        (F.col("ks_d") > 0.2).alias("drift"),
        F.when(F.col("ks_d") > 0.3, "high").when(F.col("ks_d") > 0.2, "medium")
        .otherwise("none").alias("severity"),
    )


def absolute_threshold(
    joined: DataFrame,
    base_col: str = "base_value",
    cur_col: str = "cur_value",
    low: float = 5.0,
    medium: float = 15.0,
    high: float = 30.0,
) -> DataFrame:
    """The reference's default drift strategy
    (/root/reference/baselinr/drift/strategies.py:61-173):
    change% = (cur − base) / |base| · 100; drift when |change%| ≥ low;
    severity bands ≥30 high / ≥15 medium / ≥5 low. Input: one row per
    (…, base_value, cur_value) metric pair — e.g. the drift-compare join
    of two runs' metrics (SURVEY.md §2.5)."""
    b = F.col(base_col).cast("double")
    c = F.col(cur_col).cast("double")
    change = F.when(F.abs(b) > 0, (c - b) * 100.0 / F.abs(b)).otherwise(
        F.when(c != b, F.lit(100.0)).otherwise(F.lit(0.0))
    )
    out = joined.withColumn("change_pct", change)
    a = F.abs(F.col("change_pct"))
    return out.withColumn("drift", a >= low).withColumn(
        "severity",
        F.when(a >= high, "high").when(a >= medium, "medium")
        .when(a >= low, "low").otherwise("none"),
    )


def standard_deviation_strategy(
    joined: DataFrame,
    base_col: str = "base_value",
    cur_col: str = "cur_value",
) -> DataFrame:
    """The reference's standard_deviation strategy
    (/root/reference/baselinr/drift/strategies.py:176-299): proxy
    std-devs = |change%| / 10; drift at ≥1σ, severity bands 1/2/3σ."""
    b = F.col(base_col).cast("double")
    c = F.col(cur_col).cast("double")
    change = F.when(F.abs(b) > 0, (c - b) * 100.0 / F.abs(b)).otherwise(
        F.when(c != b, F.lit(100.0)).otherwise(F.lit(0.0))
    )
    out = joined.withColumn("change_pct", change).withColumn(
        "std_devs", F.abs(F.col("change_pct")) / 10.0
    )
    s = F.col("std_devs")
    return out.withColumn("drift", s >= 1.0).withColumn(
        "severity",
        F.when(s >= 3.0, "high").when(s >= 2.0, "medium")
        .when(s >= 1.0, "low").otherwise("none"),
    )
