"""Deterministic training-shard export: hash-shard assignment, stable
within-shard ordering, shard manifests, and a weighted mixture-interleave
key — the last mile of a web-scale training-data pipeline (write the kept,
scrubbed corpus as S reproducible shards that a data loader streams in a
fixed order, mixing sources in target proportions).

Additive coverage: the reference (baselinrhq/baselinr) has no shard
writer — its closest surface is partition-granular profiling
(`/root/reference/baselinr/profiling/partition.py`) which motivates the
manifest shape (per-shard row/byte/token accounting, like the reference's
per-partition metrics rows).

Scale design (the part that matters at 100 TB):
* `assign_shards` is ROW-LOCAL — shard id and order key are md5-derived
  from the document id, so the assignment is reproducible regardless of
  input partitioning, task scheduling, or cluster size, and costs zero
  shuffle.
* `shard_positions` / `write_shards` do ONE shuffle keyed by shard_id.
  Parallelism equals the shard count, so size S to the cluster — real
  exports use thousands of shards (file-size targets, loader fan-out),
  which is exactly what keeps every core busy here too.
* `shard_manifest` is one partial-aggregating groupBy (map-side combine;
  O(S) result rows).
* `mixture_interleave` is ROW-LOCAL: ordering the output by the returned
  key realizes the requested source mixture in every prefix without a
  per-source window (a window partitioned by the handful of sources
  would bottleneck parallelism at |sources| — the md5-uniform order key
  avoids that shuffle entirely).

All randomness is md5-derived (the repo-wide '0x'-hex idiom), so DuckDB
replays every decision exactly — see the paired oracle SQL builders.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _md5_long(col: Column, salt: str, nhex: int = 8) -> Column:
    """Deterministic non-negative integer from md5(col|salt): first
    `nhex` hex chars as a bigint (8 hex = 32 bits for bucketing, 15 hex
    = 60 bits where collisions must be negligible)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit("|" + salt))), 1, nhex
        ),
        16,
        10,
    ).cast("long")


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shard",
) -> DataFrame:
    """Add (shard_id, order_key) to every row.

    shard_id   = md5(id|salt)    % n_shards          (32-bit bucket)
    order_key  = md5(id|salt#o)  as a 60-bit bigint  (within-shard order)

    The 60-bit order key makes ties vanishingly unlikely (birthday bound
    ~1e-9 at 50k docs/shard); consumers still break ties by id for a
    total order. Row-local, zero shuffle.
    """
    h = _md5_long(F.col(id_col), salt)
    ok = _md5_long(F.col(id_col), salt + "#o", nhex=15)
    return df.withColumn(
        "shard_id", (h % F.lit(n_shards)).cast("int")
    ).withColumn("order_key", ok)


def shard_positions(sharded: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """0-based stable position of each document within its shard
    (order_key ascending, ties by id). ONE shuffle keyed by shard_id;
    parallelism = shard count, so size n_shards to the cluster."""
    w = Window.partitionBy("shard_id").orderBy("order_key", id_col)
    return sharded.withColumn(
        "shard_pos", (F.row_number().over(w) - F.lit(1)).cast("long")
    )


def _ws_token_count(text: Column) -> Column:
    # whitespace tokens, empty strings dropped (split("") -> [""])
    return F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda x: F.length(x) > 0))


def shard_manifest(
    sharded: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-shard accounting a loader (or a resume/verify pass) consumes:
    (shard_id, n_docs, total_tokens, total_bytes, first_doc). first_doc
    is the id at shard_pos 0 — min_by over the 60-bit order key (ties
    impossible at export scale, see assign_shards). One groupBy with
    map-side partial aggregation; O(n_shards) result rows."""
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_ws_token_count(F.col(text_col)).cast("long")).alias(
                "total_tokens"
            ),
            F.sum(F.octet_length(F.col(text_col)).cast("long")).alias(
                "total_bytes"
            ),
            F.min_by(F.col(id_col), F.col("order_key")).alias("first_doc"),
        )
        .orderBy("shard_id")
    )


def write_shards(
    sharded: DataFrame, path: str, id_col: str = "doc_id"
) -> None:
    """Materialize the export: one shuffle keyed by shard_id, each task
    sorts its shard by (order_key, id) and writes exactly one
    shard_id=N directory — reproducible bytes for a fixed input."""
    (
        sharded.repartition("shard_id")
        .sortWithinPartitions("shard_id", "order_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def mixture_interleave(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    weights: Mapping[str, float] | None = None,
    weight: Column | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Weighted deterministic interleave key: reading the corpus in
    ascending `interleave_key` order realizes the requested source
    mixture in every prefix.

    key = u / w(source), with u = md5-uniform(id|salt) in [0,1). For any
    cut t <= 1/max(w), the expected count of source s in the prefix is
    |s| * w_s * t — i.e. prefix composition is proportional to
    (weight x source size); to hit target proportions p_s, pass
    w_s ∝ p_s / |s|.

    Row-local (zero shuffle; no per-source window — a window partitioned
    by a handful of sources would cap parallelism at |sources| at 100 TB).
    Pass either a `weights` mapping (becomes a literal map lookup, O(1)
    per row, missing sources get weight 1.0) or a `weight` Column
    expression for formula-derived weights.
    """
    if weight is None:
        if weights is None:
            weight = F.lit(1.0)
        else:
            pairs: list[Column] = []
            for k, v in weights.items():
                pairs.append(F.lit(k))
                pairs.append(F.lit(float(v)))
            weight = F.coalesce(
                F.create_map(*pairs)[F.col(source_col)], F.lit(1.0)
            )
    u = _md5_long(F.col(id_col), salt) / F.lit(float(16**8))
    return df.withColumn("interleave_key", u / weight)


# ---------------------------------------------------------------------------
# DuckDB oracle builders (exact replay of the md5-derived decisions)
# ---------------------------------------------------------------------------

_DUCK_TOKENS = (
    "len(list_filter(string_split_regex(trim({t}), '\\s+'), "
    "x -> length(x) > 0))::bigint"
)


def _duck_md5_long(expr: str, salt: str, nhex: int = 8) -> str:
    return (
        f"('0x' || substring(md5({expr}::varchar || '|{salt}'), 1, {nhex}))::bigint"
    )


def oracle_sharded_cte(
    table: str = "documents",
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shard",
) -> str:
    """CTE `sharded` = the table plus (shard_id, order_key)."""
    return f"""WITH sharded AS (
  SELECT *,
         ({_duck_md5_long(id_col, salt)} % {n_shards})::int AS shard_id,
         {_duck_md5_long(id_col, salt + '#o', 15)} AS order_key
  FROM {table}
)"""


def oracle_positions_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shard",
) -> str:
    return (
        oracle_sharded_cte(table, id_col, n_shards, salt)
        + f"""
SELECT {id_col}, shard_id,
       (row_number() OVER (PARTITION BY shard_id
                           ORDER BY order_key, {id_col}) - 1)::bigint
         AS shard_pos
FROM sharded ORDER BY shard_id, shard_pos"""
    )


def oracle_manifest_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    salt: str = "shard",
) -> str:
    toks = _DUCK_TOKENS.format(t=text_col)
    return (
        oracle_sharded_cte(table, id_col, n_shards, salt)
        + f"""
SELECT shard_id,
       count(*)::bigint AS n_docs,
       sum({toks})::bigint AS total_tokens,
       sum(strlen({text_col}))::bigint AS total_bytes,
       arg_min({id_col}, order_key) AS first_doc
FROM sharded GROUP BY shard_id ORDER BY shard_id"""
    )


def oracle_interleave_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    weight_expr: str = "1.0",
    salt: str = "mix",
) -> str:
    """weight_expr is a DuckDB scalar expression over the table's columns
    mirroring the Spark-side weight Column."""
    u = _duck_md5_long(id_col, salt)
    return f"""SELECT {id_col},
       round(({u} / {float(16**8)}) / ({weight_expr}), 6) AS interleave_key
FROM {table} ORDER BY {id_col}"""


def lpt_shard_plan(
    sizes: DataFrame,
    key_col: str,
    size_col: str,
    *,
    n_shards: int,
) -> DataFrame:
    """Greedy LPT (longest-processing-time) bin packing of work keys
    (domains / partitions) onto ``n_shards`` output shards: sort keys
    by size descending, assign each to the currently-least-loaded
    shard. Graham (1969) — the classic 4/3-approximate makespan
    balancer, and the standard fix for the "one giant domain makes one
    straggler shard" problem hash assignment (assign_shards) can't
    avoid.

    Input is the per-key SIZE TABLE (one row per key), NOT the corpus:
    at 10^12 documents the caller aggregates doc counts/bytes per
    domain first (one map-side-combined groupBy), and this planner
    folds over the O(n_keys) result inside a single aggregate — the
    fold state is (loads[n_shards], assignments) and never leaves the
    executor. Bound: n_keys must fit one agg buffer (planning-scale,
    documented contract — same bound as the reference's plan builder,
    reference baselinr/profiling/planner.py, which loads all partition
    metadata to plan).

    Ties (equal loads / equal sizes) break on first-least-loaded shard
    index and key order, so the DuckDB recursive-CTE oracle replays
    the assignment exactly.

    Returns (key, size, shard, load_after) — shard is 0-based.
    """
    items = sizes.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col(size_col).cast("double")).alias("negsize"),
                    F.col(key_col).cast("string").alias("key"),
                    F.col(size_col).cast("double").alias("size"),
                )
            )
        ).alias("items")
    )
    out_t = "array<struct<key:string,size:double,shard:int,load_after:double>>"
    init = F.struct(
        F.array_repeat(F.lit(0.0), n_shards).alias("loads"),
        F.lit(None).cast(out_t).alias("out"),
    )

    def step(st, it):
        idx = F.array_position(st["loads"], F.array_min(st["loads"]))
        new_load = F.element_at(st["loads"], idx.cast("int")) + it["size"]
        loads2 = F.transform(
            F.sequence(F.lit(1), F.lit(n_shards)),
            lambda j: F.when(j == idx, new_load).otherwise(
                F.element_at(st["loads"], j.cast("int"))
            ),
        )
        rec = F.struct(
            it["key"].alias("key"),
            it["size"].alias("size"),
            (idx - 1).cast("int").alias("shard"),
            new_load.alias("load_after"),
        )
        return F.struct(
            loads2.alias("loads"),
            F.concat(
                F.coalesce(st["out"], F.array().cast(out_t)), F.array(rec)
            ).alias("out"),
        )

    folded = items.select(
        F.aggregate(F.col("items"), init, step).alias("st")
    )
    return folded.select(F.explode("st.out").alias("r")).select("r.*")


def oracle_lpt_shard_plan_sql(
    sizes_sql: str,
    key_col: str,
    size_col: str,
    *,
    n_shards: int,
) -> str:
    """DuckDB recursive-CTE twin of :func:`lpt_shard_plan`."""
    zeros = "[" + ", ".join(["0.0"] * n_shards) + "]::double[]"
    return f"""
WITH RECURSIVE ordered AS (
  SELECT ({key_col})::varchar AS key, ({size_col})::double AS size,
         row_number() OVER (ORDER BY ({size_col})::double DESC,
                            ({key_col})::varchar) AS rn
  FROM ({sizes_sql})
),
fold AS (
  SELECT 0::bigint AS rn, {zeros} AS loads,
         NULL::varchar AS key, NULL::double AS size,
         NULL::int AS shard, NULL::double AS load_after
  UNION ALL
  SELECT o.rn,
         list_transform(generate_series(1, {n_shards}),
           j -> CASE WHEN j = list_position(f.loads, list_min(f.loads))
                     THEN f.loads[list_position(f.loads, list_min(f.loads))] + o.size
                     ELSE f.loads[j] END) AS loads,
         o.key, o.size,
         (list_position(f.loads, list_min(f.loads)) - 1)::int AS shard,
         f.loads[list_position(f.loads, list_min(f.loads))] + o.size AS load_after
  FROM fold f JOIN ordered o ON o.rn = f.rn + 1
)
SELECT key, size, shard, load_after FROM fold WHERE rn >= 1"""


def hrw_assign(
    df: DataFrame,
    id_col: str,
    shards: list[str],
    *,
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment
    (Thaler & Ravishankar 1998; public). Unlike ``assign_shards``'
    mod-N bucketing — where changing N remaps ~(N-1)/N of all keys —
    HRW guarantees MINIMAL MOVEMENT: removing one shard reassigns
    ONLY the keys that lived on it, and adding one steals only the
    keys the new shard now wins. That is the property an incremental
    dedup/index state store (scripts/run_dedup.py) needs to grow its
    shard set without rehashing history.

    assigned(k) = argmax_s md5(k|salt|s), ties (2^-60) broken by
    shard name descending.

    Scale design: the shard list is a LITERAL array (O(#shards),
    constant); the argmax is a row-local array_max over
    struct(weight, shard) inside WholeStageCodegen — zero shuffle,
    zero join, no matter how many rows. Returns df + (shard).
    """
    pairs = F.array(
        *[
            F.struct(
                _md5_long(
                    F.concat(F.col(id_col).cast("string"),
                             F.lit(f"|{salt}|{s}")),
                    salt="",
                    nhex=15,
                ).alias("w"),
                F.lit(s).alias("s"),
            )
            for s in shards
        ]
    )
    return df.withColumn("shard", F.array_max(pairs)["s"])


def oracle_hrw_assign_sql(
    source_sql: str,
    id_col: str,
    shards: list[str],
    *,
    salt: str = "hrw",
) -> str:
    """DuckDB twin of :func:`hrw_assign` (weight replay + max_by)."""
    terms = ", ".join(
        "{s: '" + s + "', w: ('0x' || substring(md5("
        f"{id_col}::varchar || '|{salt}|{s}' || '|'), 1, 15))::bigint}}"
        for s in shards
    )
    return f"""
WITH src AS ({source_sql}),
cand AS (
  SELECT {id_col}, unnest([{terms}]) AS c FROM src
),
win AS (
  -- lpad keeps string order == numeric order (60-bit w < 10^19),
  -- '|' separator then replays the struct(w, s) tiebreak
  SELECT {id_col},
         max_by(c.s, lpad(c.w::varchar, 19, '0') || '|' || c.s) AS shard
  FROM cand GROUP BY 1
)
SELECT s.*, w.shard FROM src s JOIN win w USING ({id_col})"""
