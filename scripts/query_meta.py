#!/usr/bin/env python
"""Read-side metadata CLI over a pipeline output root.

Maps the reference CLI's query surface
(/root/reference/baselinr/cli.py:3908-4046 `query runs|drift|run|table`,
:3992-4046 `lineage upstream|downstream|path`) onto the tables the
pipeline writes under --output (docs/metrics/events/lineage/
processed_partitions). Prints one JSON line per result row.

Usage:
  spark-submit scripts/query_meta.py --output /path/out runs [--status done]
  ... query drift   [--partition P] [--severity high] [--limit N]
  ... query run     --run-id R
  ... query table   --partition P
  ... lineage upstream|downstream --table T [--max-depth D]
  ... lineage path --from-table A --to-table B
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _emit(df: DataFrame) -> list[dict]:
    rows = [
        {k: (v.isoformat() if hasattr(v, "isoformat") else v)
         for k, v in r.asDict().items()}
        for r in df.collect()
    ]
    for r in rows:
        print(json.dumps(r, default=str))
    return rows


def _lineage_edges(spark: SparkSession, output_root: str) -> DataFrame:
    """Pipeline lineage rows as a generic edge table: input partition
    path feeds output partition path."""
    lin = spark.read.parquet(os.path.join(output_root, "lineage"))
    return lin.select(
        F.col("input_path").alias("upstream_table"),
        F.col("output_path").alias("downstream_table"),
        F.lit("pipeline").alias("lineage_type"),
        F.lit(1.0).alias("confidence_score"),
    )


def cmd_runs(spark, out_root, args) -> list[dict]:
    from baselinr_spark.sources import manifest

    m = manifest.latest_state(manifest.read_manifest(spark, out_root))
    if args.status:
        m = m.filter(F.col("status") == args.status)
    return _emit(
        m.orderBy(F.desc("completed_at"), "partition").limit(args.limit)
    )


def cmd_drift(spark, out_root, args) -> list[dict]:
    ev = spark.read.parquet(os.path.join(out_root, "events"))
    if args.partition:
        ev = ev.filter(F.col("partition") == args.partition)
    if args.severity:
        ev = ev.filter(F.col("severity") == args.severity)
    if args.event_type:
        ev = ev.filter(F.col("event_type") == args.event_type)
    ev = ev.drop("partition_key")
    return _emit(ev.orderBy(F.desc("ts"), "event_id").limit(args.limit))


def cmd_run(spark, out_root, args) -> list[dict]:
    met = spark.read.parquet(os.path.join(out_root, "metrics"))
    met = met.filter(F.col("run_id") == args.run_id).drop("partition_key")
    return _emit(met.orderBy("partition", "column_name", "metric_name"))


def cmd_table(spark, out_root, args) -> list[dict]:
    met = spark.read.parquet(os.path.join(out_root, "metrics"))
    met = met.filter(
        (F.col("partition") == args.partition)
        & F.col("metric_name").isin("count", "kept_count", "keep_rate")
    ).drop("partition_key")
    return _emit(met.orderBy(F.desc("profiled_at"), "metric_name"))


def cmd_status(spark, out_root, args) -> list[dict]:
    """Health rollup per partition (reference cli.py:3967-3991 `status`):
    worst severity, event count per type, latest event time."""
    from baselinr_spark.severity import severity_rank_expr

    ev = spark.read.parquet(os.path.join(out_root, "events"))
    sev_rank = severity_rank_expr(F.col("severity"))
    agg = ev.groupBy("partition").agg(
        F.max(sev_rank).alias("_sev"),
        F.count("*").alias("event_count"),
        F.sum((F.col("event_type") == "validation_failed").cast("int")
              ).alias("validation_failed"),
        F.sum((F.col("event_type") == "distribution_drift").cast("int")
              ).alias("distribution_drift"),
        F.sum((F.col("event_type") == "anomaly_detected").cast("int")
              ).alias("anomaly_detected"),
        F.max("ts").alias("latest_event"),
    )
    status = (
        F.when(F.col("_sev") >= 3, "critical")
        .when(F.col("_sev") == 2, "warning")
        .otherwise("healthy")
    )
    return _emit(
        agg.select("partition", status.alias("status"), "event_count",
                   "validation_failed", "distribution_drift",
                   "anomaly_detected", "latest_event", "_sev")
        # worst first: order by the numeric rank, not the label string
        .orderBy(F.desc("_sev"), "partition")
        .drop("_sev")
    )


def cmd_lineage(spark, out_root, args) -> list[dict]:
    from baselinr_spark.query.lineage import (
        get_downstream_tables,
        get_lineage_path,
        get_upstream_tables,
    )

    edges = _lineage_edges(spark, out_root)
    if args.lineage_command == "upstream":
        return _emit(get_upstream_tables(edges, args.table, args.max_depth))
    if args.lineage_command == "downstream":
        return _emit(get_downstream_tables(edges, args.table, args.max_depth))
    return _emit(get_lineage_path(edges, args.from_table, args.to_table))


def cmd_plan(spark, out_root, args) -> list[dict]:
    """Dry-run the incremental planner over an input warehouse: one
    decision row per partition (reference cli.py plan surface /
    incremental/planner.py:95-138 IncrementalPlan)."""
    from baselinr_spark.plans.planner import (
        AdaptiveScheduling, CostControls, plan_partitions,
    )

    scheduling = cost = None
    if args.freshness_interval_minutes is not None:
        scheduling = AdaptiveScheduling(
            enabled=True,
            default_interval_minutes=args.freshness_interval_minutes,
            min_interval_minutes=0,
        )
    if args.max_bytes_scanned is not None or args.max_rows_scanned is not None:
        cost = CostControls(
            enabled=True,
            max_bytes_scanned=args.max_bytes_scanned,
            max_rows_scanned=args.max_rows_scanned,
            fallback_strategy=args.fallback_strategy,
            sample_fraction=args.sample_fraction,
        )
    return _emit(plan_partitions(
        spark, args.input, out_root,
        scheduling=scheduling, cost=cost,
        reprocess_changed=args.reprocess_changed,
    ))


def cmd_recommend(spark, out_root, args) -> list[dict]:
    """Smart-selection recommendation surface (reference cli.py
    recommend-checks): profile the given table once, emit prioritized
    check recommendations with confidence — one JSON row per check,
    plus per-column confidence rows with --confidence."""
    from baselinr_spark.operators.recommender import (
        column_confidence, column_stats, prioritize_checks,
        recommend_checks,
    )

    name = args.table_name or os.path.basename(args.input.rstrip("/"))
    df = spark.read.parquet(args.input)
    stats = column_stats(df, name)
    rec = recommend_checks(stats)
    if args.confidence:
        return _emit(column_confidence(rec, stats)
                     .orderBy("table_name", "column_name"))
    out = prioritize_checks(
        rec, stats, max_checks_per_table=args.max_checks_per_table)
    return _emit(out.orderBy("table_name", "column_name", "col_rank"))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="query_meta")
    p.add_argument("--output", required=True, help="pipeline output root")
    sub = p.add_subparsers(dest="command", required=True)

    rec = sub.add_parser("recommend")
    rec.add_argument("--input", required=True,
                     help="parquet table dir to profile")
    rec.add_argument("--table-name", default=None)
    rec.add_argument("--max-checks-per-table", type=int, default=50)
    rec.add_argument("--confidence", action="store_true",
                     help="emit per-column confidence rows instead")

    runs = sub.add_parser("runs")
    runs.add_argument("--status")
    runs.add_argument("--limit", type=int, default=100)

    drift = sub.add_parser("drift")
    drift.add_argument("--partition")
    drift.add_argument("--severity")
    drift.add_argument("--event-type")
    drift.add_argument("--limit", type=int, default=100)

    run = sub.add_parser("run")
    run.add_argument("--run-id", required=True)

    table = sub.add_parser("table")
    table.add_argument("--partition", required=True)

    sub.add_parser("status")

    plan = sub.add_parser("plan")
    plan.add_argument("--input", required=True, help="pages warehouse path")
    plan.add_argument("--freshness-interval-minutes", type=int, default=None)
    plan.add_argument("--max-bytes-scanned", type=int, default=None)
    plan.add_argument("--max-rows-scanned", type=int, default=None)
    plan.add_argument("--fallback-strategy", default="sample",
                      choices=["sample", "defer", "full"])
    plan.add_argument("--sample-fraction", type=float, default=0.1)
    plan.add_argument("--reprocess-changed", action="store_true")

    lin = sub.add_parser("lineage")
    lsub = lin.add_subparsers(dest="lineage_command", required=True)
    for name in ("upstream", "downstream"):
        lp = lsub.add_parser(name)
        lp.add_argument("--table", required=True)
        lp.add_argument("--max-depth", type=int, default=None)
    path = lsub.add_parser("path")
    path.add_argument("--from-table", required=True)
    path.add_argument("--to-table", required=True)
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None):
    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        from baselinr_spark.session import build_session

        spark = build_session(app_name="query_meta")
    try:
        fn = {
            "runs": cmd_runs,
            "drift": cmd_drift,
            "run": cmd_run,
            "table": cmd_table,
            "status": cmd_status,
            "plan": cmd_plan,
            "recommend": cmd_recommend,
            "lineage": cmd_lineage,
        }[args.command]
        return fn(spark, args.output, args)
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    main()
