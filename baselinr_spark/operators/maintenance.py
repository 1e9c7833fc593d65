"""Table-maintenance planners over file-level storage metadata.

The north star frames inputs as Iceberg tables; at 100 TB the silent
killer is small-file proliferation (every streaming micro-batch and
every skew-split task writes one), which multiplies scan task count,
file-open cost, and manifest size. Iceberg answers with
rewrite_data_files (bin-pack to a target file size); the reference's
storage-metadata collector (reference
baselinr/profiling/storage_metadata.py — per-table file counts/bytes)
gathers exactly the inputs this planner consumes, but the reference
never plans the rewrite. This recasts that decision as a DataFrame op
over the file listing (our `sources/catalog.py:collect_table_metadata`
gathers the same shape).

Scale design: the input is FILE metadata (one row per data file —
metadata-scale, not corpus-scale); ONE groupBy per partition key,
O(partitions) output, all decisions closed-form (no bin assignment is
materialized — ceil(total/target) IS the bin-pack output count for
size-bounded bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "compaction_plan",
    "snapshot_expiry_plan",
    "orphan_file_audit",
    "partition_spec_plan",
    "file_prune_audit",
]


def compaction_plan(
    files: DataFrame,
    part_col: str,
    size_col: str,
    *,
    target_bytes: int,
    small_frac: float = 0.5,
) -> DataFrame:
    """Per-partition small-file compaction plan.

    A file is SMALL when it is under ``small_frac * target_bytes``
    (Iceberg's rewrite_data_files MIN_FILE_SIZE default semantics).
    The partition needs compaction when rewriting would actually
    reduce file count (n_files > ceil(total/target)) AND there are at
    least 2 small files to merge. ``files_saved`` is the file-count
    reduction the rewrite buys.

    Returns (part_col, n_files, n_small_files, total_bytes,
    n_output_files, files_saved, needs_compaction).
    """
    small_cut = float(small_frac) * float(target_bytes)
    sz = F.col(size_col).cast("bigint")
    g = files.groupBy(F.col(part_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum((sz < F.lit(small_cut)).cast("int")).cast("bigint")
        .alias("n_small_files"),
        F.sum(sz).cast("bigint").alias("total_bytes"),
    )
    n_out = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(F.col("total_bytes") / F.lit(float(target_bytes)))
        .cast("bigint"),
    )
    needs = (F.col("n_files") > n_out) & (F.col("n_small_files") >= 2)
    return g.select(
        part_col,
        "n_files",
        "n_small_files",
        "total_bytes",
        n_out.alias("n_output_files"),
        F.when(needs, F.col("n_files") - n_out).otherwise(F.lit(0))
        .cast("bigint").alias("files_saved"),
        needs.alias("needs_compaction"),
    )


def oracle_compaction_plan_sql(
    rows_sql: str,
    part_col: str,
    size_col: str,
    target_bytes: int,
    small_frac: float = 0.5,
) -> str:
    """DuckDB twin of :func:`compaction_plan`."""
    small_cut = float(small_frac) * float(target_bytes)
    return f"""
WITH rows_in AS ({rows_sql}),
g AS (
  SELECT {part_col},
         count(*)::bigint AS n_files,
         sum(({size_col}::bigint < {small_cut!r})::int)::bigint AS n_small_files,
         sum({size_col}::bigint)::bigint AS total_bytes
  FROM rows_in GROUP BY 1
)
SELECT {part_col}, n_files, n_small_files, total_bytes,
       greatest(1, ceil(total_bytes / {float(target_bytes)!r}))::bigint
         AS n_output_files,
       CASE WHEN n_files > greatest(1, ceil(total_bytes / {float(target_bytes)!r}))
                 AND n_small_files >= 2
            THEN n_files - greatest(1, ceil(total_bytes / {float(target_bytes)!r}))
            ELSE 0 END::bigint AS files_saved,
       (n_files > greatest(1, ceil(total_bytes / {float(target_bytes)!r}))
        AND n_small_files >= 2) AS needs_compaction
FROM g"""


def snapshot_expiry_plan(
    snaps: DataFrame,
    table_col: str,
    snap_col: str,
    ts_col: str,
    *,
    retain_last: int,
    max_age_days: float,
    now_ts: str,
) -> DataFrame:
    """Iceberg expire_snapshots twin: per-snapshot keep/expire
    decisions. A snapshot expires only when BOTH conditions hold —
    it is not among the table's ``retain_last`` newest (Iceberg
    retain_last) AND it is older than ``max_age_days`` before
    ``now_ts`` (older_than). ``now_ts`` is an explicit 'YYYY-MM-DD
    HH:MM:SS' string so plans are deterministic and replayable.

    Returns (table_col, snap_col, ts_col, rank, expire) with rank 1 =
    newest (ties broken by snapshot id descending, so the later id of
    two same-instant snapshots is considered newer).

    Scale design: ONE window partitioned by table — per-partition work
    is the table's snapshot count (metadata-scale, bounded by commit
    frequency × retention, never corpus rows); the age test is
    row-local.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(table_col).orderBy(
        F.col(ts_col).desc(), F.col(snap_col).desc()
    )
    # seconds arithmetic instead of INTERVAL: Spark rejects fractional
    # interval units, and integer seconds replay identically in DuckDB
    age_s = int(float(max_age_days) * 86400.0)
    cutoff = F.timestamp_add(
        "SECOND", F.lit(-age_s), F.to_timestamp(F.lit(now_ts))
    )
    ranked = snaps.select(
        table_col, snap_col, ts_col,
        F.row_number().over(w).alias("rank"),
    )
    return ranked.select(
        table_col, snap_col, ts_col, "rank",
        ((F.col("rank") > F.lit(int(retain_last)))
         & (F.col(ts_col) < cutoff)).alias("expire"),
    )


def oracle_snapshot_expiry_sql(
    rows_sql: str,
    table_col: str,
    snap_col: str,
    ts_col: str,
    retain_last: int,
    max_age_days: float,
    now_ts: str,
) -> str:
    """DuckDB twin of :func:`snapshot_expiry_plan`."""
    age_s = int(float(max_age_days) * 86400.0)
    return f"""
WITH rows_in AS ({rows_sql}),
r AS (
  SELECT {table_col}, {snap_col}, {ts_col},
         row_number() OVER (PARTITION BY {table_col}
                            ORDER BY {ts_col} DESC, {snap_col} DESC)
           AS rank
  FROM rows_in
)
SELECT {table_col}, {snap_col}, {ts_col}, rank::int AS rank,
       (rank > {int(retain_last)}
        AND {ts_col} < TIMESTAMP '{now_ts}' - INTERVAL {age_s} SECONDS)
         AS expire
FROM r"""


def orphan_file_audit(
    files: DataFrame,
    manifest: DataFrame,
    file_col: str,
    *,
    size_col: str | None = None,
) -> DataFrame:
    """Iceberg remove_orphan_files twin, audit half: files present in
    the storage listing but referenced by NO manifest entry — the
    leftovers of failed/zombie writes that inflate storage and (worse)
    get double-read by naive directory-scan consumers. Returns the
    per-file orphan table (``file_col`` plus ``size_col`` if given);
    summarize with a count/sum downstream. The deletion half stays
    operational (an action, not a query) — this op is the safe
    dry-run.

    Scale design: ONE left-anti join keyed on the file path — both
    sides are METADATA-scale (one row per file, not per record);
    Spark broadcasts the manifest side when it is small, and the
    anti-join degrades gracefully to a shuffle join when a table has
    millions of files.
    """
    cols = [file_col] + ([size_col] if size_col else [])
    return files.select(*cols).join(
        manifest.select(F.col(file_col)).distinct(),
        on=file_col,
        how="left_anti",
    )


def oracle_orphan_file_audit_sql(
    files_sql: str,
    manifest_sql: str,
    file_col: str,
    size_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`orphan_file_audit`.

    Known edge divergence (round-5 advisor): this NOT IN drops listing
    rows whose file path is NULL (NULL NOT IN (...) is NULL), while the
    Spark left_anti join keeps NULL-keyed rows. Real file listings never
    carry NULL paths (the fixtures never do), and the oracle text is
    hash-frozen, so the divergence is documented rather than changed."""
    cols = file_col + (f", {size_col}" if size_col else "")
    return f"""
WITH files_in AS ({files_sql}),
manifest_in AS ({manifest_sql})
SELECT {cols} FROM files_in
WHERE {file_col} NOT IN (SELECT {file_col} FROM manifest_in
                         WHERE {file_col} IS NOT NULL)"""


def partition_spec_plan(
    files: DataFrame,
    part_col: str,
    bytes_col: str,
    *,
    target_bytes: int,
    small_ratio: float = 0.25,
    large_ratio: float = 4.0,
    coarsen_frac: float = 0.5,
    split_frac: float = 0.2,
) -> DataFrame:
    """Partition-spec evolution advisor (the Iceberg docs' own sizing
    guidance, made a query): partitions far BELOW the target size mean
    the spec is too granular (day -> month, or drop a bucket column);
    partitions far ABOVE it mean too coarse (month -> day, or add
    bucket(N)). Iceberg supports in-place spec evolution, so this
    planner's verdict is directly actionable without a rewrite.

    A partition is `small` when its bytes < small_ratio x target,
    `large` when > large_ratio x target. Verdict: ``coarsen`` when
    more than ``coarsen_frac`` of partitions are small, else ``split``
    when more than ``split_frac`` are large, else ``keep``.

    Returns ONE row: (n_partitions, total_bytes, avg_partition_bytes,
    small_frac, large_frac, recommendation).

    Scale design: input is the file manifest (METADATA-scale, one row
    per file); one groupBy(part) + one single-row aggregate. Never
    touches data files.
    """
    per = files.groupBy(part_col).agg(
        F.sum(bytes_col).cast("bigint").alias("pbytes")
    )
    small = (F.col("pbytes") < float(small_ratio) * target_bytes).cast("int")
    large = (F.col("pbytes") > float(large_ratio) * target_bytes).cast("int")
    agg = per.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("pbytes").cast("bigint").alias("total_bytes"),
        F.round(F.avg("pbytes"), 6).alias("avg_partition_bytes"),
        F.round(F.avg(small), 6).alias("small_frac"),
        F.round(F.avg(large), 6).alias("large_frac"),
    )
    return agg.select(
        "*",
        F.when(F.col("small_frac") > coarsen_frac, F.lit("coarsen"))
        .when(F.col("large_frac") > split_frac, F.lit("split"))
        .otherwise(F.lit("keep"))
        .alias("recommendation"),
    )


def oracle_partition_spec_plan_sql(
    files_sql: str,
    part_col: str,
    bytes_col: str,
    target_bytes: int,
    small_ratio: float = 0.25,
    large_ratio: float = 4.0,
    coarsen_frac: float = 0.5,
    split_frac: float = 0.2,
) -> str:
    """DuckDB twin of :func:`partition_spec_plan`."""
    return f"""
WITH files_in AS ({files_sql}),
per AS (
  SELECT {part_col}, sum({bytes_col})::bigint AS pbytes
  FROM files_in GROUP BY 1
),
agg AS (
  SELECT count(*)::bigint AS n_partitions,
         sum(pbytes)::bigint AS total_bytes,
         round(avg(pbytes), 6) AS avg_partition_bytes,
         round(avg((pbytes < {float(small_ratio)} * {target_bytes})::int), 6)
           AS small_frac,
         round(avg((pbytes > {float(large_ratio)} * {target_bytes})::int), 6)
           AS large_frac
  FROM per
)
SELECT *,
       CASE WHEN small_frac > {coarsen_frac} THEN 'coarsen'
            WHEN large_frac > {split_frac} THEN 'split'
            ELSE 'keep' END AS recommendation
FROM agg"""


def file_prune_audit(
    file_stats: DataFrame,
    part_col: str,
    min_col: str,
    max_col: str,
    *,
    lo,
    hi,
) -> DataFrame:
    """Min/max data-skipping effectiveness for a range predicate
    ``value BETWEEN lo AND hi`` — the scan-planning question "how many
    files does this filter actually prune?" evaluated from manifest
    column stats alone (Iceberg manifests / parquet footers both carry
    per-file min/max). A file must be SCANNED when its [min, max]
    interval intersects [lo, hi]; NULL stats force a scan
    (stats-missing files can never be pruned).

    Returns per-partition (part_col, n_files, n_scanned, prune_frac).

    Scale design: metadata-only — one row per file in, one groupBy on
    the partition key; the answer for a 100 TB table costs a manifest
    read, not a data scan.
    """
    must_scan = (
        F.col(min_col).isNull()
        | F.col(max_col).isNull()
        | ((F.col(min_col) <= hi) & (F.col(max_col) >= lo))
    ).cast("int")
    return (
        file_stats.groupBy(part_col)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(must_scan).cast("bigint").alias("n_scanned"),
            F.round(F.lit(1.0) - F.sum(must_scan) / F.count(F.lit(1)), 6)
            .alias("prune_frac"),
        )
    )


def oracle_file_prune_audit_sql(
    stats_sql: str,
    part_col: str,
    min_col: str,
    max_col: str,
    lo,
    hi,
) -> str:
    """DuckDB twin of :func:`file_prune_audit`."""
    scan = (
        f"({min_col} IS NULL OR {max_col} IS NULL OR "
        f"({min_col} <= {hi} AND {max_col} >= {lo}))::int"
    )
    return f"""
WITH stats_in AS ({stats_sql})
SELECT {part_col}, count(*)::bigint AS n_files,
       sum({scan})::bigint AS n_scanned,
       round(1.0 - sum({scan})::double / count(*), 6) AS prune_frac
FROM stats_in GROUP BY 1"""
