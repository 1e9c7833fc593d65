"""Incremental run planner: per-partition run/sample/skip/defer decisions.

Recasts the reference IncrementalPlanner's decision cascade
(/root/reference/baselinr/incremental/planner.py:141-295) at partition
granularity, declaratively:

1. ``fresh_within_interval`` — adaptive scheduling: a partition profiled
   within its (clamped, per-partition-overridable) interval is skipped
   before any change detection runs (`_is_due`, planner.py:227-238).
2. ``snapshot_match`` — input fingerprint unchanged since the last
   commit → skip (planner.py:159-165 via change_detection).
3. Cost controls (`_check_costs`/`_cost_response`, planner.py:276-295):
   a runnable partition whose estimated bytes/rows exceed the caps is
   downgraded per ``fallback_strategy`` — ``sample`` (run on a
   deterministic hash sample), ``defer`` (skip, should_run=False), or
   ``full`` (run anyway, reason recorded).
4. Otherwise run in full (``never_profiled`` / ``change_detected``).

Spark-first shape: partition metadata (bytes from file stats, rows from
parquet footers — never a data scan, mirroring the reference's
metadata-only contract) joins against the manifest's latest state, and
the whole cascade is ONE `F.when` chain over that join — no driver loop
over partitions, so the plan itself scales to catalogs with millions of
partitions and Catalyst can prune/push it like any other query.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import change_detection, manifest


@dataclass(frozen=True)
class AdaptiveScheduling:
    """Mirror of the reference adaptive_scheduling config
    (/root/reference/baselinr/incremental/planner.py:227-238): skip a
    partition re-profiled within `interval` minutes; per-partition
    overrides, clamped to [min, max]."""

    enabled: bool = False
    default_interval_minutes: int = 1440
    min_interval_minutes: int = 5
    max_interval_minutes: int = 7 * 1440
    priority_overrides: dict[str, int] = field(default_factory=dict)


@dataclass(frozen=True)
class CostControls:
    """Mirror of the reference cost_controls config
    (/root/reference/baselinr/incremental/planner.py:276-295)."""

    enabled: bool = False
    max_bytes_scanned: int | None = None
    max_rows_scanned: int | None = None
    fallback_strategy: str = "sample"  # sample | defer | full
    sample_fraction: float = 0.1


def partition_stats(input_path: str, partitions: list[str]) -> list[tuple]:
    """(partition, bytes, rows) from file stats + parquet footers only.

    Reference `_estimate_cost` (planner.py:269-274) uses warehouse
    metadata (bytes_scanned, else rows·1KB); the parquet-warehouse
    analog is the file listing for bytes and the footer `num_rows` for
    rows — O(files) driver-side metadata reads, never a data scan. A
    footer that cannot be read falls back to the reference's bytes/1KB
    heuristic.
    """
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        pq = None

    def one(p: str) -> tuple:
        d = os.path.join(input_path, f"dt={p}")
        nbytes = 0
        nrows = 0
        rows_known = False
        unread_bytes = 0  # files whose footer failed: estimate, don't drop
        if os.path.isdir(d):
            for root, _, files in os.walk(d):
                for f in sorted(files):
                    if f.startswith(("_", ".")):
                        continue
                    full = os.path.join(root, f)
                    try:
                        sz = os.stat(full).st_size
                    except OSError:
                        continue
                    nbytes += sz
                    if pq is not None and f.endswith(".parquet"):
                        try:
                            nrows += pq.ParquetFile(full).metadata.num_rows
                            rows_known = True
                        except Exception:
                            # a single bad footer must not silently
                            # undercount the partition below the rows
                            # cap: fall back to the ~1KB/row heuristic
                            # for THIS file's bytes
                            unread_bytes += sz
        if not rows_known:
            nrows = nbytes // 1024  # reference heuristic: ~1KB/row
        else:
            nrows += unread_bytes // 1024
        return (p, nbytes, nrows)

    # footer/stat reads are I/O-bound; a thread pool keeps planning at
    # ~constant wall time into the thousands-of-partitions regime (on an
    # object store each stat is a round-trip, so this matters more there)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as ex:
        return list(ex.map(one, partitions))


PLAN_DDL = (
    "partition string, action string, reason string, "
    "estimated_bytes long, estimated_rows long, sample_fraction double"
)


def plan_partitions(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    partitions: list[str] | None = None,
    now: datetime | None = None,
    scheduling: AdaptiveScheduling | None = None,
    cost: CostControls | None = None,
    reprocess_changed: bool = False,
) -> DataFrame:
    """One decision row per input partition.

    Columns: partition, action (run|sample|skip|defer), reason,
    estimated_bytes, estimated_rows, sample_fraction (non-null only for
    action=sample). ``skip``/``defer`` rows have should-not-run
    semantics; ``defer`` specifically means "wanted to run, cost caps
    said no" (reference planner.py:291-293).
    """
    from ..sources import catalog

    scheduling = scheduling or AdaptiveScheduling()
    cost = cost or CostControls()
    now = now or datetime.now(timezone.utc)
    parts = partitions if partitions is not None else catalog.list_partitions(input_path)

    stats = partition_stats(input_path, parts)
    fps = [(p, change_detection.partition_fingerprint(input_path, p))
           for p in parts]
    import pandas as pd

    meta = spark.createDataFrame(
        pd.DataFrame(
            [(p, b, r, fp) for (p, b, r), (_, fp) in zip(stats, fps)],
            columns=["partition", "estimated_bytes", "estimated_rows",
                     "current_fp"],
        ),
        schema="partition string, estimated_bytes long, estimated_rows long, "
               "current_fp string",
    )

    state = (
        manifest.latest_state(manifest.read_manifest(spark, output_root))
        .filter(F.col("status").isin("done", "sampled"))
        .select(
            "partition",
            F.col("status").alias("stored_status"),
            F.col("fingerprint").alias("stored_fp"),
            F.col("completed_at").alias("last_profiled_at"),
            F.col("sample_fraction").alias("stored_fraction"),
        )
    )
    joined = meta.join(F.broadcast(state), "partition", "left")

    # per-partition interval, clamped (reference _is_due)
    interval = F.lit(float(scheduling.default_interval_minutes))
    if scheduling.priority_overrides:
        kv = []
        for k, v in sorted(scheduling.priority_overrides.items()):
            kv += [F.lit(str(k)), F.lit(float(v))]
        interval = F.coalesce(
            F.create_map(*kv)[F.col("partition")], interval
        )
    interval = F.least(
        F.greatest(interval, F.lit(float(scheduling.min_interval_minutes))),
        F.lit(float(scheduling.max_interval_minutes)),
    )
    age_minutes = (
        F.lit(now.timestamp())
        - F.unix_micros(F.col("last_profiled_at").cast("timestamp")) / 1e6
    ) / 60.0
    is_fresh = (
        F.lit(scheduling.enabled)
        & F.col("last_profiled_at").isNotNull()
        & (age_minutes < interval)
    )

    fp_match = F.col("stored_fp").isNotNull() & (
        F.col("stored_fp") == F.col("current_fp")
    )
    ever_profiled = F.col("last_profiled_at").isNotNull()
    done = ever_profiled & (F.col("stored_status") == "done")
    # without reprocess_changed, FULLY-done partitions never re-run
    # (legacy manifest-only resume); with it, only a fingerprint match
    # skips. Partitions whose latest run was cost-cap SAMPLED are never
    # terminally done: they skip only while the same cap + fraction
    # still applies (re-sampling the same deterministic url-hash cohort
    # would reproduce the identical output), and are otherwise promoted
    # to a full run.
    would_skip_done = done & (fp_match | F.lit(not reprocess_changed))
    stored_sampled = ever_profiled & (F.col("stored_status") == "sampled")

    over_bytes = (
        F.lit(cost.enabled and cost.max_bytes_scanned is not None)
        & (F.col("estimated_bytes") > F.lit(cost.max_bytes_scanned or 0))
    )
    over_rows = (
        F.lit(cost.enabled and cost.max_rows_scanned is not None)
        & (F.col("estimated_rows") > F.lit(cost.max_rows_scanned or 0))
    )
    capped_action = {"sample": "sample", "defer": "defer"}.get(
        cost.fallback_strategy, "run"
    )
    sampled_cap_unchanged = (
        stored_sampled & fp_match & (over_bytes | over_rows)
        & F.lit(capped_action == "sample")
        & (F.col("stored_fraction") == F.lit(float(cost.sample_fraction)))
    )

    decision = (
        # reference order: freshness gate FIRST (cheapest — no change
        # detection), then snapshot match, then cost caps on the rest
        F.when(is_fresh, F.struct(
            F.lit("skip").alias("action"),
            F.lit("fresh_within_interval").alias("reason")))
        .when(would_skip_done & fp_match, F.struct(
            F.lit("skip").alias("action"),
            F.lit("snapshot_match").alias("reason")))
        .when(would_skip_done, F.struct(
            F.lit("skip").alias("action"),
            F.lit("already_profiled").alias("reason")))
        .when(sampled_cap_unchanged, F.struct(
            F.lit("skip").alias("action"),
            F.lit("sampled_cap_unchanged").alias("reason")))
        .when(over_bytes, F.struct(
            F.lit(capped_action).alias("action"),
            F.lit("bytes_cap_exceeded").alias("reason")))
        .when(over_rows, F.struct(
            F.lit(capped_action).alias("action"),
            F.lit("rows_cap_exceeded").alias("reason")))
        .when(stored_sampled & fp_match, F.struct(
            F.lit("run").alias("action"),
            F.lit("promote_sampled_to_full").alias("reason")))
        .when(ever_profiled, F.struct(
            F.lit("run").alias("action"),
            F.lit("change_detected").alias("reason")))
        .otherwise(F.struct(
            F.lit("run").alias("action"),
            F.lit("never_profiled").alias("reason")))
    )

    return (
        joined.withColumn("_d", decision)
        .select(
            "partition",
            F.col("_d.action").alias("action"),
            F.col("_d.reason").alias("reason"),
            "estimated_bytes",
            "estimated_rows",
            F.when(
                F.col("_d.action") == "sample",
                F.lit(float(cost.sample_fraction)),
            ).alias("sample_fraction"),
        )
        .orderBy("partition")
    )
