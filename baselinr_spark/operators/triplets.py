"""Contrastive training-triplet construction from the near-dup graph.

Embedding models for retrieval/dedup (SimCSE-style, E5, GTE — all
public recipes) train on (anchor, positive, negative) triplets. A web
corpus already CONTAINS the positives: near-duplicate pairs from the
MinHash-LSH pass are naturally-occurring paraphrase/mirror pairs. This
operator turns the dedup candidate table into a training set: each
near-dup pair becomes a triplet with a deterministically-sampled
random negative (in-batch negatives are the trainer's job; this is
the corpus-side hard-positive mining step).

Negative sampling is md5-derived — ``neg = H(a,b,salt) mod n_docs``,
re-rolled with an incremented salt while it collides with the anchor
or positive (≤ a bounded number of rolls; collision probability per
roll is 2/n) — so replays and the SQL oracle agree exactly.

Scale design: negatives are drawn from the DENSE RANK SPACE of the id
table via an equi-join on the sampled rank (pairs ⋈ ranked ids on
rank, shuffle bounded by the pair count) — never a cross join. With
``ids_are_dense=True`` (ids already 0..n-1, the shard-export layout
this package produces) the rank table is the id projection itself:
zero extra work. The generic-id fallback derives global sorted ranks
with a distributed range-repartition + per-partition offsets
(``_sorted_ranks``): no unpartitioned window, so generic ids scale the
same as dense ones (the only global window is over O(partitions)
count rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _sorted_ranks(distinct_ids: DataFrame) -> DataFrame:
    """(__nid, __rank) where __rank is the 0-based position of __nid in
    global sorted order — the same assignment as
    ``row_number().over(W.orderBy("__nid")) - 1`` but WITHOUT the
    unpartitioned window that funnels every distinct corpus id through
    one task. Two-level construction: range-repartition + local sort put
    ids in globally sorted partition order; ``monotonically_increasing_id``
    then encodes (partition, position); per-partition counts (O(num
    partitions) rows) yield cumulative offsets via a metadata-scale
    window; rank = partition offset + position. The rank values are
    identical for any choice of range boundaries, so the sampling inside
    the range partitioner cannot affect results."""
    spark = distinct_ids.sparkSession
    k = max(2, spark.sparkContext.defaultParallelism)
    part = (
        distinct_ids.repartitionByRange(k, "__nid")
        .sortWithinPartitions("__nid")
        .withColumn("__mono", F.monotonically_increasing_id())
    )
    pid = F.shiftrightunsigned(F.col("__mono"), 33)
    counts = part.groupBy(pid.alias("__pid")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offs = counts.select(
        "__pid", F.coalesce(F.sum("__c").over(w), F.lit(0)).alias("__off")
    )
    return part.join(F.broadcast(offs), pid == F.col("__pid")).select(
        "__nid",
        (F.col("__off")
         + F.col("__mono").bitwiseAND(F.lit((1 << 33) - 1))).alias("__rank"),
    )


def _h(cols, salt: str):
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *cols, F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def contrastive_triplets(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    n_rolls: int = 3,
    salt: str = "neg",
    ids_are_dense: bool = False,
) -> DataFrame:
    """Build (anchor, positive, negative) rows from a near-dup pair
    table and the corpus id set. The negative for (a, b) is the doc at
    md5-rank ``H(a,b,salt+roll) mod n``; the first roll that hits
    neither a nor b wins (roll index is deterministic, so the oracle
    replays the same choice). Pairs whose every roll collided (only
    possible in toy corpora with n ≤ 2) are dropped.

    Returns (anchor, positive, negative).
    """
    distinct_ids = ids.select(F.col(id_col).alias("__nid")).distinct()
    if ids_are_dense:
        ranked = distinct_ids.select(
            "__nid", F.col("__nid").cast("long").alias("__rank")
        )
    else:
        ranked = _sorted_ranks(distinct_ids)
    n = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("__n")))
    p = pairs.select(
        F.col(a_col).alias("anchor"), F.col(b_col).alias("positive")
    ).crossJoin(n)
    for r in range(n_rolls):
        roll = _h([F.col("anchor"), F.col("positive")], f"{salt}{r}") % F.col(
            "__n"
        )
        p = p.withColumn(f"__r{r}", roll)
    out = None
    remaining = p
    for r in range(n_rolls):
        cand = remaining.join(
            ranked, remaining[f"__r{r}"] == ranked["__rank"]
        ).withColumnRenamed("__nid", "__neg")
        ok = cand.filter(
            (F.col("__neg") != F.col("anchor"))
            & (F.col("__neg") != F.col("positive"))
        ).select("anchor", "positive", F.col("__neg").alias("negative"))
        out = ok if out is None else out.unionByName(ok)
        remaining = cand.filter(
            (F.col("__neg") == F.col("anchor"))
            | (F.col("__neg") == F.col("positive"))
        ).drop("__neg", "__rank")
    return out


def oracle_contrastive_triplets_sql(
    pairs_sql: str,
    ids_sql: str,
    id_col: str,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    n_rolls: int = 3,
    salt: str = "neg",
    ids_are_dense: bool = False,
) -> str:
    """DuckDB twin of :func:`contrastive_triplets`."""
    rank_expr = (
        "nid::bigint AS rnk"
        if ids_are_dense
        else "row_number() OVER (ORDER BY nid) - 1 AS rnk"
    )
    rolls = ", ".join(
        f"(('0x' || substring(md5(anchor::varchar || '|' || "
        f"positive::varchar || '|{salt}{r}'), 1, 15))::bigint % nn.n) AS r{r}"
        for r in range(n_rolls)
    )
    first_ok = "CASE " + " ".join(
        f"WHEN nid{r} != anchor AND nid{r} != positive THEN nid{r}"
        for r in range(n_rolls)
    ) + " END"
    nid_joins = "\n".join(
        f"  LEFT JOIN ranked rk{r} ON rk{r}.rnk = p.r{r}"
        for r in range(n_rolls)
    )
    nid_sels = ", ".join(f"rk{r}.nid AS nid{r}" for r in range(n_rolls))
    return f"""
WITH pairs_in AS ({pairs_sql}),
ids_in AS (SELECT DISTINCT {id_col} AS nid FROM ({ids_sql})),
ranked AS (
  SELECT nid, {rank_expr} FROM ids_in
),
nn AS (SELECT count(*) AS n FROM ranked),
p AS (
  SELECT {a_col} AS anchor, {b_col} AS positive, {rolls}
  FROM pairs_in, nn
),
withn AS (
  SELECT p.anchor, p.positive, {nid_sels}
  FROM p
{nid_joins}
)
SELECT anchor, positive, ({first_ok}) AS negative
FROM withn
WHERE ({first_ok}) IS NOT NULL"""
