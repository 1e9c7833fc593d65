"""Shuffle key-skew audit and salt planner.

Every wide operation in this engine shuffles on some key (dedup on a
content hash, per-domain aggregation on domain, joins on url). At
10^12 documents a zipf-distributed key — "the top domain holds 4% of
the corpus" — melts the one reducer that receives it while 999
executors idle. The standard fix is salting: split each hot key into
``salt_factor`` sub-keys, aggregate partially per sub-key, then merge.
AQE's skew-join handles the JOIN case at runtime; a salt plan is still
needed for groupBy-heavy stages and for choosing bucketing layouts up
front. The reference repo plans per-warehouse concurrency but has no
shuffle-skew surface (its engines push aggregation to the warehouse:
/root/reference/baselinr/profiling/core.py:112-139), so this module is
additive scale tooling for the Spark recast.

Scale design (10^12 rows):

* The ONLY corpus-wide operation is ``groupBy(key).count()`` — the
  exact shuffle under audit, but with map-side partial aggregation the
  hot key arrives at its reducer as one row per upstream task, not as
  its raw rows. Everything downstream runs on the O(distinct keys)
  counts table.
* Corpus totals (row count, key count) are a 1-row aggregate of the
  counts table, broadcast back via the house-rule 1-row crossJoin —
  no second scan of the corpus.
* The emitted plan is top-k only (TakeOrderedAndProject, no global
  sort): keys outside the top-k by construction hold less than the
  smallest listed share and never need salting at a sane target size.
* ``salted_group_count`` demonstrates the two-stage pattern the plan
  feeds: stage 1 groups by (key, salt) — hot keys fan out across
  ``salt_factor`` reducers — stage 2 re-aggregates the partials by
  key. For algebraic aggregates (count/sum/min/max) the result is
  bit-identical to the unsalted single-stage answer, which the unit
  test asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_plan(
    df: DataFrame,
    key_col: str,
    *,
    target_rows_per_task: int,
    top_k: int = 20,
) -> DataFrame:
    """Per-hot-key salting plan: the top-``top_k`` keys by row count
    with their corpus share, skew ratio vs the mean key, and the salt
    factor ``ceil(cnt / target_rows_per_task)`` (1 = no salting
    needed). Deterministic order ties broken by key value.

    Returns (key_col, cnt, share, skew_ratio, salt_factor).
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    plan = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            key_col,
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("cnt") * F.col("__nkeys") / F.col("__total"), 6
            ).alias("skew_ratio"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("cnt") / F.lit(float(target_rows_per_task))),
            ).cast("int").alias("salt_factor"),
        )
        .orderBy(F.desc("cnt"), key_col)
        .limit(top_k)
    )
    return plan


def apply_salt(
    df: DataFrame,
    key_col: str,
    plan: DataFrame,
    *,
    salt_col: str = "__salt",
    entropy_col: str | None = None,
) -> DataFrame:
    """Attach a deterministic salt in [0, salt_factor) to each row.

    The plan (O(top_k) rows) is broadcast; keys absent from it get
    salt 0. Salt is derived from a stable row attribute
    (``entropy_col``, default: a hash of all columns) so replays are
    deterministic — never from rand().
    """
    src = (
        F.xxhash64(F.col(entropy_col))
        if entropy_col
        else F.xxhash64(*[F.col(c) for c in df.columns])
    )
    factors = F.broadcast(plan.select(key_col, "salt_factor"))
    return df.join(factors, key_col, "left").withColumn(
        salt_col,
        F.pmod(src, F.coalesce(F.col("salt_factor"), F.lit(1))).cast("int"),
    ).drop("salt_factor")


def salted_group_count(
    df: DataFrame,
    key_col: str,
    plan: DataFrame,
    *,
    entropy_col: str | None = None,
) -> DataFrame:
    """Two-stage salted count: groupBy(key, salt) → groupBy(key).

    Equals ``df.groupBy(key).count()`` exactly (count is algebraic);
    the value is the shuffle shape — no reducer receives more than
    ~``target_rows_per_task`` rows of a salted key in stage 1.
    Returns (key_col, cnt).
    """
    salted = apply_salt(df, key_col, plan, entropy_col=entropy_col)
    stage1 = salted.groupBy(key_col, "__salt").agg(
        F.count(F.lit(1)).alias("pc")
    )
    return stage1.groupBy(key_col).agg(F.sum("pc").alias("cnt"))


def oracle_salt_plan_sql(
    source_sql: str,
    key_col: str,
    *,
    target_rows_per_task: int,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`salt_plan`."""
    return f"""
WITH src AS ({source_sql}),
counts AS (SELECT {key_col}, count(*)::bigint AS cnt FROM src GROUP BY 1),
tot AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM counts)
SELECT c.{key_col}, c.cnt,
       round(c.cnt / t.total, 6) AS share,
       round(c.cnt * t.nkeys / t.total, 6) AS skew_ratio,
       greatest(1, ceil(c.cnt / {float(target_rows_per_task)}))::int
         AS salt_factor
FROM counts c CROSS JOIN tot t
ORDER BY c.cnt DESC, c.{key_col}
LIMIT {top_k}"""
