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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions",
    "bloom_build",
    "bloom_probe",
    "zorder_key",
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
