"""As-of (point-in-time) join — for every left row, the single most
recent right row at-or-before its timestamp (backward), or the earliest
at-or-after (forward), per key, with an optional tolerance bound.

Spark has no ASOF JOIN operator (DuckDB/Polars/pandas.merge_asof do;
kdb+ calls it aj). The naive recasts do not scale: a correlated
max-subquery re-scans the right side per left row, and the
"non-equi range join then keep latest" plan is O(L·R) per key before
its window prunes. This implementation is the union-tag pattern:

    1. tag left rows (side=1) and right rows (side=0) into ONE frame,
       right payload wrapped in a struct (null on left rows);
    2. ONE shuffle by key, sort by (ts, side) — a right row ties ahead
       of a left row at equal ts, so `ts_r <= ts_l` matches inclusively;
    3. running `last(payload, ignorenulls=True)` carries the most
       recent right payload forward onto each left row;
    4. keep left rows; a tolerance nulls out carried payloads older
       than `ts_l - tolerance` (pandas.merge_asof semantics: the row
       stays, its match goes).

Cost = one sort-merge-shaped shuffle of |L|+|R| rows — the same
exchange a plain equi-join would pay, with no join blowup at all.
At 100 TB the frame is hash-partitioned by key across executors and
each window sorts only its own key groups; a pathologically hot key
degrades to that key's rows on one executor (same bound as any
per-key sequential semantics), which AQE cannot split — pre-bucket
the hot key upstream if one key owns a material corpus share.

The reference has no as-of operator (its temporal logic is the
cohort-lag drift compare, recast in operators/drift.py); this is one
of the "operators Spark lacks" the build brief names, added for the
metrics/events time-series surface (e.g. "metric value in force at
each event's timestamp").

Oracle parity: DuckDB `ASOF JOIN` (gate query `asof_events`), plus
hand-computed fixtures in tests/test_asof.py for forward + tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    *,
    direction: str = "backward",
    tolerance: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Return `left` with the as-of matching `right` row's columns
    appended (each non-key, non-ts right column prefixed with
    ``right_prefix``, plus ``<right_prefix><right_ts>`` itself).
    Unmatched left rows keep nulls — LEFT OUTER asof semantics.

    direction='backward': latest right with ts_r <= ts_l.
    direction='forward':  earliest right with ts_r >= ts_l.
    tolerance (seconds): match only within |ts_l - ts_r| <= tolerance.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    right_ts = right_ts or left_ts

    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__ts_r"),
        *[F.col(c) for c in payload_cols],
    )

    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__pay", F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        )
    ).withColumn("__ts", F.col(left_ts))
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.lit(0).alias("__side"),
        payload.alias("__pay"),
        F.col(right_ts).alias("__ts"),
    )
    # align schemas: right rows carry nulls for every left-only column
    for c in left.columns:
        if c not in keys and c != left_ts:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.withColumn(left_ts, F.col("__ts").cast(dict(left.dtypes)[left_ts]))
    both = lhs.unionByName(rhs.select(*lhs.columns))

    if direction == "backward":
        # right row sorts BEFORE a left row at the same ts → inclusive <=
        order = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn(
        "__match", F.last("__pay", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    if tolerance is not None:
        gap = F.abs(
            F.col(left_ts).cast("double")
            - F.col("__match.__ts_r").cast("double")
        )
        carried = carried.withColumn(
            "__match",
            F.when(gap <= F.lit(float(tolerance)), F.col("__match")),
        )

    out = carried.select(
        *[F.col(c) for c in left.columns],
        F.col("__match.__ts_r").alias(f"{right_prefix}{right_ts}"),
        *[
            F.col(f"__match.{c}").alias(f"{right_prefix}{c}")
            for c in payload_cols
        ],
    )
    return out
