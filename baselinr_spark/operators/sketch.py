"""Deterministic sketch primitives: Bloom filter build/probe and a
Z-order (Morton) clustering key.

Both are 100-TB layout/pruning tools rather than per-query operators:

* The Bloom filter is the scale path for `incremental_exact_dedup`'s
  seen-state: at 10^12 accepted documents the exact (hash, id) table
  is ~30 TB and the anti-join shuffles the new batch against all of
  it; a bloom of the same keys at 10 bits/key is ~1.2 TB, and — far
  more important — probing is a BROADCAST row-local filter for any
  batch size the driver can hold, with the exact anti-join kept only
  for the survivors (false positives), which is |batch| × fp_rate
  rows. All k hash positions are md5-derived, so build and probe are
  engine-independent and SQL-replayable (the gate hashes the exact
  positions, not a serialized bitset).
  Spark's own `bloomFilter` DataFrameStatFunctions sketch cannot be
  used here: its hash seeds are JVM-internal (not replayable in
  DuckDB) and the sketch object lives on the driver, not in a table.
  This one is a TABLE of set bit positions — mergeable by union,
  persistable as parquet next to the manifest, incrementally growable
  by appending the delta batch's positions.

* The Z-order key linearizes N range-filtered dimensions into one
  sort key so file-level min/max statistics prune on EVERY dimension
  (the Delta/Iceberg OPTIMIZE ZORDER story). The key here interleaves
  the bits of fixed-width per-column quantile ranks — rank buckets,
  not raw values, so skewed columns still spread over the full curve.
  Writing `df.repartitionByRange(F.col(zkey))` then sorting within
  partitions is what turns the key into actual file pruning.

Reference: no sketch surface exists in baselinrhq/baselinr (its
approx path stops at warehouse-native approx_count_distinct —
SURVEY.md §2.4); these are additive for the 100 TB design like the
dedup/ANN suite.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions",
    "bloom_build",
    "bloom_probe",
    "zorder_key",
    "cms_build",
    "cms_query",
    "cms_heavy_keys",
    "bloom_plan",
]


def bloom_positions(key: Column, m: int, k: int) -> Column:
    """Array of ``k`` bit positions in [0, m) for a key — position i is
    md5(key || '|bloom' || i) taken as a 32-bit int mod m. Fully
    deterministic and replayable in any engine with md5."""
    return F.array(*[
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit(f"|bloom{i}"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % m
        )
        for i in range(k)
    ])


def bloom_build(
    df: DataFrame, key_col: str, *, m: int = 1 << 20, k: int = 5
) -> DataFrame:
    """The filter as a TABLE of distinct set positions: (pos). Size is
    ≤ min(m, k·|keys|) rows of one long each — the sparse encoding of
    the bitset, exactly mergeable by union+distinct and persistable as
    parquet. One explode + distinct (map-side combined)."""
    return (
        df.select(F.explode(bloom_positions(F.col(key_col), m, k)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    m: int = 1 << 20,
    k: int = 5,
    result_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``result_col``: True iff ALL k positions of the key are
    set (definite-no guarantees no false negatives). k broadcast hash
    joins of the (distinct-pos) filter table, one per hash function —
    entirely row-local, ZERO shuffle of ``df``, no row ids, no
    re-evaluation hazards. m sized to the broadcast budget: sparse
    positions are one long each, so even m = 2^26 fully saturated is
    ~0.5 GB, under the executor broadcast ceiling."""
    out = df
    for i in range(k):
        pos_i = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(key_col).cast("string"),
                                   F.lit(f"|bloom{i}"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % m
        )
        side = F.broadcast(
            bloom.select(F.col("pos").alias(f"__p{i}"))
            .withColumn(f"__s{i}", F.lit(1))
        )
        out = out.withColumn(f"__q{i}", pos_i).join(
            side, F.col(f"__q{i}") == F.col(f"__p{i}"), "left"
        )
    all_set = F.lit(True)
    for i in range(k):
        all_set = all_set & F.col(f"__s{i}").isNotNull()
    return out.select(*df.columns, all_set.alias(result_col))


def zorder_key(
    df: DataFrame, cols: list[str], *, bits: int = 8
) -> DataFrame:
    """Append ``zorder`` — the Morton interleave of each column's
    ``bits``-bit quantile rank. Ranks come from ONE exact
    `percentile_approx`-free pass: ntile over each column would need
    one window per column, so instead each column's 2^bits - 1 exact
    percentile cut points are computed in a single agg, broadcast, and
    the bucket is a row-local searchsorted via `F.width_bucket`-style
    aggregation over the cut array. Total cost: one aggregate + one
    row-local projection, no per-column shuffle.

    ``len(cols) * bits`` must fit in 63 bits."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    levels = (1 << bits) - 1
    qs = [i / (levels + 1) for i in range(1, levels + 1)]
    # exact `percentile` (linear interpolation) — the same math as
    # DuckDB quantile_cont, so cut points replay in the gate oracle
    cuts = df.agg(*[
        F.percentile(F.col(c).cast("double"), F.array(*[F.lit(q) for q in qs]))
        .alias(f"__cuts_{c}")
        for c in cols
    ])
    out = df.crossJoin(F.broadcast(cuts))
    rank_cols = []
    for c in cols:
        # bucket = # cut points <= value  (0..levels), null -> 0
        rank = F.aggregate(
            F.col(f"__cuts_{c}"),
            F.lit(0),
            lambda acc, cut: acc + F.when(
                F.col(c).cast("double") >= cut, 1
            ).otherwise(0),
        )
        rank_cols.append(F.coalesce(rank, F.lit(0)).alias(f"__rank_{c}"))
    out = out.select(*df.columns, *rank_cols)
    # Morton interleave: output bit (b*n + j) = bit b of rank_j,
    # low bits first, column 0 in the lowest lane
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftrightunsigned(
                F.col(f"__rank_{c}").cast("long"), b
            ).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + j)
    return out.select(*df.columns, z.alias("zorder"))


def _cms_col(key: Column, row: Column, width: int) -> Column:
    """Deterministic CMS column for a key under hash row d:
    md5(d || '|' || key) first 8 hex chars mod width — the same
    engine-independent construction as bloom_positions."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit("|"), key.cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % F.lit(width)
    )


def cms_build(
    df: DataFrame, key_col: str, *, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005 — public) of a
    key column's frequencies, as a TABLE of (row, col, cnt) with
    ≤ depth·width rows. Same design stance as the Bloom filter above:
    a table, not a driver object — mergeable by union + re-sum,
    persistable as parquet next to the manifest, incrementally
    growable by appending a delta batch's sketch.

    Why at 100 TB: the skew decisions this repo takes everywhere
    (salting factors, AQE skew thresholds, `max_bucket` caps) need the
    hot-key frequency profile of a corpus-sized column WITHOUT paying
    a full groupBy over it per diagnostic run. The sketch costs one
    map-side-combined shuffle bounded by depth·width rows per map
    partition (keys collapse into cells long before the wire), and
    answers point queries from a broadcastable table forever after.

    Estimates NEVER undercount (one-sided error: est ≥ true, and
    est ≤ true + εN with ε = e/width at the standard depth).
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    cells = df.select(F.col(key_col).alias("__k")).select(
        rows, F.col("__k")
    )
    return (
        cells.select("row", _cms_col(F.col("__k"), F.col("row"), width).alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query frequency estimates for ``keys`` under a built
    sketch: est(key) = min over hash rows of the cell count (0 when a
    cell was never touched). The sketch join is broadcast (≤
    depth·width rows); the key side only fans out ×depth row-locally —
    zero corpus shuffle. Returns (key_col, est)."""
    probes = keys.select(F.col(key_col)).distinct().select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    probes = probes.withColumn(
        "col", _cms_col(F.col(key_col), F.col("row"), width)
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_heavy_keys(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    min_count: int,
) -> DataFrame:
    """Keys whose CMS frequency estimate is ≥ ``min_count`` — the
    skew-diagnostic shape (which urls/domains/grams are hot enough to
    need salting). Because CMS never undercounts, every truly-heavy
    key IS returned (no false negatives); false positives are bounded
    by the εN overcount. Build + self-query in one plan; candidates
    are the distinct keys of ``df`` (at corpus scale, pass a sampled
    or pre-aggregated candidate frame through ``cms_query`` instead).
    Returns (key_col, est) filtered and sorted for stable output."""
    sketch = cms_build(df, key_col, width=width, depth=depth)
    est = cms_query(sketch, df, key_col, width=width, depth=depth)
    return est.filter(F.col("est") >= F.lit(int(min_count))).orderBy(
        F.desc("est"), F.col(key_col)
    )


def hll_build(df: DataFrame, key_col: str, *, p: int = 12) -> DataFrame:
    """HyperLogLog sketch (Flajolet et al. 2007 — public) of a key
    column's distinct count, as a TABLE of (idx, rank) registers —
    ≤ 2^p rows. Same stance as the Bloom/CMS tables above: mergeable
    (union + max per idx), persistable as parquet, incrementally
    growable — unlike Spark's native `approx_count_distinct`, whose
    HLL++ buffer lives inside an aggregation and can't be stored,
    merged across snapshots, or replayed in another engine.

    Documented hash spec (replayed exactly by the DuckDB oracle):
    h = first 15 hex chars of md5(key) as a 60-bit integer;
    idx = h mod 2^p; w = h div 2^p (a 60−p bit value);
    rank = (60−p) − bit_length(w) + 1, with rank = 60−p+1 for w = 0.
    bit_length is computed EXACTLY via the binary-string length
    (`bin(w)`) in both engines — no float log2, no libm drift.

    Build cost: one map-side-combined groupBy — keys collapse into at
    most 2^p register rows per map partition before the shuffle.
    """
    m = 1 << p
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = F.shiftright(h, p)  # exact integer div by 2^p (h is 60-bit)
    rank = F.when(w > 0, F.lit(60 - p) - F.length(F.bin(w)) + 1).otherwise(
        F.lit(60 - p + 1)
    )
    return (
        df.select((h % F.lit(m)).alias("idx"), rank.alias("rank"))
        .groupBy("idx")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union registers and keep the max rank per idx — HLL's lossless
    merge (the property that lets each crawl snapshot sketch its keys
    independently and the union answer corpus-wide distincts)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("idx").agg(F.max("rank").alias("rank"))


def hll_estimate(sketch: DataFrame, *, p: int = 12) -> DataFrame:
    """One-row distinct-count estimate from a register table:
    raw = alpha_m·m² / Σ 2^(−M_j) over ALL m registers (absent rows
    count as rank 0), with the standard small-range correction
    E = m·ln(m/V) when raw < 2.5m and V (zero registers) > 0.
    Returns (estimate, raw_estimate, n_zero_registers). Relative error
    ≈ 1.04/√m (~1.6% at p=12)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rank"))).alias("touched_sum"),
        F.count(F.lit(1)).alias("n_touched"),
    )
    return agg.select(
        (
            F.lit(alpha * m * m)
            / (F.col("touched_sum") + (F.lit(m) - F.col("n_touched")))
        ).alias("raw_estimate"),
        (F.lit(m) - F.col("n_touched")).alias("n_zero_registers"),
    ).select(
        F.when(
            (F.col("raw_estimate") < F.lit(2.5 * m))
            & (F.col("n_zero_registers") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero_registers")),
        )
        .otherwise(F.col("raw_estimate"))
        .alias("estimate"),
        "raw_estimate",
        "n_zero_registers",
    )


def bloom_plan(
    counts: DataFrame,
    group_col: str,
    n_col: str,
    *,
    target_fpr: float,
) -> DataFrame:
    """Bloom-filter sizing planner (classic Bloom 1970 formulas;
    the design-time companion to ``bloom_build``/``bloom_probe`` the
    way ``lsh_plan_grid`` is to the MinHash band join): for each
    group's expected item count n, the optimal bit count
    m = ceil(-n·ln p / ln²2), hash count k = round(m/n · ln 2), and
    the achieved FPR (1 - e^(-k·n/m))^k — so a dedup stage can size
    its per-partition filters before building them instead of
    discovering saturation at probe time.

    Returns (group_col, n, m_bits, k_hashes, actual_fpr). Input is
    already-aggregated counts (metadata-scale); everything here is
    row-local arithmetic.
    """
    ln2 = math.log(2.0)
    n = F.col(n_col).cast("double")
    m = F.ceil(-n * math.log(target_fpr) / (ln2 * ln2)).cast("bigint")
    k = F.greatest(
        F.lit(1), F.round(m.cast("double") / n * ln2, 0).cast("int")
    )
    fpr = F.pow(
        F.lit(1.0) - F.exp(-k.cast("double") * n / m.cast("double")),
        k.cast("double"),
    )
    return counts.select(
        group_col,
        F.col(n_col).cast("bigint").alias("n"),
        m.alias("m_bits"),
        k.alias("k_hashes"),
        F.round(fpr, 6).alias("actual_fpr"),
    )


def oracle_bloom_plan_sql(
    counts_sql: str,
    group_col: str,
    n_col: str,
    target_fpr: float,
) -> str:
    """DuckDB twin of :func:`bloom_plan`."""
    ln2 = math.log(2.0)
    lnp = math.log(target_fpr)
    return f"""
WITH counts_in AS ({counts_sql}),
plan AS (
  SELECT {group_col}, {n_col}::bigint AS n,
         ceil(-({n_col}::double) * {lnp!r} / ({ln2!r} * {ln2!r}))::bigint
           AS m_bits
  FROM counts_in
),
withk AS (
  SELECT *, greatest(1, round(m_bits::double / n * {ln2!r})::int)
              AS k_hashes
  FROM plan
)
SELECT {group_col}, n, m_bits, k_hashes,
       round(pow(1.0 - exp(-(k_hashes::double) * n / m_bits),
                 k_hashes::double), 6) AS actual_fpr
FROM withk"""
