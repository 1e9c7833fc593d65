#!/usr/bin/env python
"""Standalone snapshot-incremental near-dup dedup job over the
dt-partitioned pages warehouse — the second production entry point
next to run_filter.py, covering the rolling-CommonCrawl workflow:
each day's partition is deduped against the persisted LSH state of
every previously accepted day WITHOUT re-reading accepted text
(operators/dedup.py:incremental_minhash_dedup).

State layout under --output:
  dedup_state/batches/   one row per committed partition (dt, counts)
  dedup_state/index/     (band, key, id) LSH band index rows, dt-tagged
  dedup_state/sigs/      (id, sigs) MinHash signatures, dt-tagged
  kept/dt=<dt>/          kept (url) rows per partition

Crash-idempotent resume: index/sigs deltas carry the dt that produced
them, and every load anti-filters to COMMITTED dts (semi-join with the
batches table, which is written LAST) — a crash between a delta append
and its batch commit leaves orphan rows that are ignored and
overwritten on re-run. Same commit-ordering discipline as the filter
pipeline's manifest (sources/manifest.py).

Prints one JSON summary line:
  {"partitions_total", "partitions_skipped", "partitions_processed",
   "docs_in", "docs_kept", "dup_rate"}
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _read_or_none(spark, path, committed_dts):
    from pyspark.sql import functions as F

    if not os.path.isdir(path):
        return None
    df = spark.read.parquet(path)
    if not committed_dts:
        return None
    return df.filter(F.col("batch_dt").isin(list(committed_dts)))


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--gen-docs", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--k", type=int, default=None,
                    help="MinHash signature length (default: operator default)")
    ap.add_argument("--bands", type=int, default=None)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--max-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    own_session = spark is None
    if own_session:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    if args.gen_docs and not os.path.isdir(args.input):
        from baselinr_spark.sources.pages import write_pages_warehouse

        write_pages_warehouse(spark, args.input, args.gen_docs, seed=args.seed)
    if not os.path.isdir(args.input):
        print(f"error: input path does not exist: {args.input}", file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from baselinr_spark.operators.dedup import (
        DEFAULT_BANDS,
        DEFAULT_MINHASH_K,
        incremental_minhash_dedup,
    )
    from baselinr_spark.sources.catalog import list_partitions

    k = args.k or DEFAULT_MINHASH_K
    bands = args.bands or DEFAULT_BANDS

    state = os.path.join(args.output, "dedup_state")
    batches_path = os.path.join(state, "batches")
    index_path = os.path.join(state, "index")
    sigs_path = os.path.join(state, "sigs")

    committed: list[str] = []
    if os.path.isdir(batches_path):
        committed = [
            r["dt"] for r in spark.read.parquet(batches_path).collect()
        ]
    parts = list_partitions(args.input)
    todo = [dt for dt in parts if dt not in committed]
    if args.max_partitions is not None:
        todo = todo[: args.max_partitions]

    docs_in = docs_kept = 0
    processed = []
    for dt in todo:
        batch = (
            spark.read.parquet(args.input)
            .filter(F.col("dt") == dt)
            .select("url", "text")
        )
        index = _read_or_none(spark, index_path, committed)
        sigs = _read_or_none(spark, sigs_path, committed)
        if index is not None:
            index = index.select("band", "key", "id")
        if sigs is not None:
            sigs = sigs.select("id", "sigs")
        kept, index_delta, sigs_delta = incremental_minhash_dedup(
            batch,
            index,
            sigs,
            "url",
            "text",
            k=k,
            bands=bands,
            shingle_n=args.shingle_n,
            threshold=args.threshold,
        )
        kept_rows = kept.select("url").localCheckpoint()
        n_in = batch.count()
        n_kept = kept_rows.count()
        # deltas first (dt-tagged), batch commit LAST — orphans from a
        # crash in between are filtered out by the committed-dt load
        kept_rows.write.mode("overwrite").parquet(
            os.path.join(args.output, "kept", f"dt={dt}")
        )
        index_delta.withColumn("batch_dt", F.lit(dt)).write.mode("append").parquet(
            index_path
        )
        sigs_delta.withColumn("batch_dt", F.lit(dt)).write.mode("append").parquet(
            sigs_path
        )
        spark.createDataFrame(
            [(dt, n_in, n_kept)], "dt string, n_in long, n_kept long"
        ).write.mode("append").parquet(batches_path)
        committed.append(dt)
        docs_in += n_in
        docs_kept += n_kept
        processed.append(dt)

    summary = {
        "partitions_total": len(parts),
        "partitions_skipped": len(parts) - len(todo),
        "partitions_processed": processed,
        "docs_in": docs_in,
        "docs_kept": docs_kept,
        "dup_rate": round(1.0 - docs_kept / docs_in, 6) if docs_in else 0.0,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
