"""End-to-end quality-filter job (SURVEY.md §3 'Spark lifecycle').

One declarative pass per chunk of partitions:

    read pages (partition-pruned by the manifest anti-join)
      → native-expression features (WholeStageCodegen)
      → langid + perplexity pandas UDFs (broadcast models, Arrow batches)
      → rule booleans → keep/drop_reasons → scrubbed_text
      → write docs/ (dynamic partition overwrite = idempotent)
    read back docs (cheap columnar projection)
      → per-partition metrics (long format) → metrics/
      → PSI drift vs predecessor cohorts → events/
      → lineage rows → lineage/
    commit manifest rows (checkpoint; crash before this = partition redone)

This mirrors the reference lifecycle (profile → write results → enrich →
drift → events → state update, /root/reference/baselinr/cli.py:275-362 and
storage/writer.py:120-167) collapsed into Spark jobs, with the incremental
planner's skip/partial semantics (/root/reference/baselinr/incremental/
planner.py:140-225) provided by the processed-partition manifest.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, RULE_NAMES, FilterConfig
from ..functions import textfeat
from ..functions.langid import CLASSES
from ..operators import profiling
from ..operators.drift import psi_pairwise_lag
from ..sources import catalog, manifest

#: reference partial-profiling cap: max partitions per run
#: (/root/reference/baselinr/config/schema.py:898)
MAX_PARTITIONS_PER_RUN = 64

DOCS_COLS = (
    "url", "warc_ts", "keep", "drop_reasons", "lang", "lang_conf",
    "perplexity", "scrubbed_text", "run_id",
)

def psi_bucket_expr():
    """Fixed log10 half-decade buckets for cross-cohort PSI comparability
    (the reference synthesizes comparable buckets from range overlap,
    statistical_tests.py:560-586; fixed edges are the streaming-friendly
    equivalent)."""
    return F.least(
        F.lit(9),
        F.greatest(
            F.lit(0),
            F.floor(F.log10(F.greatest(F.col("perplexity"), F.lit(1.0))) * 2),
        ),
    ).cast("int")


def transform_pages(
    spark: SparkSession,
    pages: DataFrame,
    cfg: FilterConfig = DEFAULT_CONFIG,
    run_id: str = "run-0",
    scrub_mode: str = "pandas",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang[, dt]) → docs_out.

    scrub_mode: 'pandas' (byte-identical to the Python oracle — default)
    or 'native' (JVM regexp_replace chain; same output for the ASCII-safe
    pattern bank, asserted by tests).

    All model scores (langid, perplexity) and the pandas-mode scrub run in
    ONE fused pandas UDF (functions/scoring.py) so the text column crosses
    the JVM↔Python boundary once instead of three times."""
    from ..functions.scoring import FEATURE_FIELDS, make_scoring_udf

    include_scrub = scrub_mode != "native"
    scoring_udf = make_scoring_udf(spark, include_scrub=include_scrub)

    df = pages
    if "dt" not in df.columns:
        df = df.withColumn("dt", F.to_date("warc_ts"))

    # n_chars/symbol_ratio are cheap JVM expressions; the word/line
    # features ride the fused UDF (functions/scoring.py — the text is
    # already crossing the boundary for the model scores, and a python
    # split+set pass beats the anchored stopword regexp ~7x). Values are
    # identical to textfeat.with_features (parity-tested).
    text = F.coalesce(F.col("text"), F.lit(""))
    n_chars = F.length(text)
    n_symbols = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    df = df.withColumn("n_chars", n_chars).withColumn(
        "symbol_ratio",
        F.when(n_chars > 0, n_symbols / n_chars).otherwise(F.lit(0.0)),
    )
    if cfg.repetition_rules:
        df = textfeat.with_repetition_features(
            df,
            top_ns=tuple(cfg.max_top_ngram_char_fraction),
            dup_ns=tuple(cfg.max_dup_ngram_char_fraction),
        )
    if cfg.line_rules:
        df = textfeat.with_line_features(df)
    if cfg.cc_rule:
        df = textfeat.with_cc_features(df)
    score_cols = ["lang_pred", "lang_conf", "perplexity", *FEATURE_FIELDS] + (
        ["scrubbed_text"] if include_scrub else []
    )
    df = df.withColumn("_score", scoring_udf(F.col("text"))).select(
        "*", *[F.col(f"_score.{c}").alias(c) for c in score_cols]
    ).drop("_score")
    if include_scrub:
        # the fused UDF returns NULL when the scrub was the identity so
        # unchanged text never crosses the Python→JVM boundary twice;
        # restore the original here (byte-identical to scrubbing in place)
        df = df.withColumn(
            "scrubbed_text", F.coalesce(F.col("scrubbed_text"), F.col("text"))
        )

    rules = {**textfeat.rule_columns(cfg), **textfeat.model_rule_columns(cfg)}
    if cfg.repetition_rules:
        rules.update(textfeat.repetition_rule_columns(cfg))
    if cfg.line_rules:
        rules.update(textfeat.line_rule_columns(cfg))
    if cfg.cc_rule:
        rules.update(textfeat.cc_rule_columns(cfg))
    df = textfeat.with_verdict(df, rules)

    if scrub_mode == "native":
        from ..functions.scrub import scrub_expr

        df = df.withColumn("scrubbed_text", scrub_expr(F.col("text")))

    df = df.withColumn("run_id", F.lit(run_id)).withColumn(
        "lang", F.col("lang_pred")
    )
    rule_cols = [f"rule_{n}" for n in RULE_NAMES if f"rule_{n}" in df.columns]
    return df.select(*DOCS_COLS, *rule_cols, "dt")


def partition_metrics(docs: DataFrame, run_id: str) -> DataFrame:
    """Long-format per-partition metrics (FIXTURES.md §2 `metrics` shape):
    (run_id, partition, column_name, metric_name, metric_value,
    metric_json, profiled_at).

    TWO aggregation passes over the (narrow) read-back of docs_out
    instead of the previous three: pass A computes every scalar, the
    four perplexity percentiles from ONE shared t-digest sketch (an
    array-quantile call builds the identical deterministic sketch a
    per-quantile call would, so the estimates are unchanged), the fixed
    PSI bucket counts as conditional aggregates (a row per bucket is
    emitted only when its count > 0 — exactly the rows the old
    groupBy(bucket) produced), and the per-partition perplexity min/max
    that pass B's equi-width histogram needs — so the histogram skips
    its own min/max scan and broadcast-joins pass A's."""
    part = F.col("dt").cast("string")

    has_text = (
        F.col("__has_text") if "__has_text" in docs.columns
        else F.col("scrubbed_text").isNotNull()
    )
    pq_names = ("p25", "p50", "p75", "p95")
    scalar_exprs = [
        F.count(F.lit(1)).cast("double").alias("count"),
        F.sum(F.col("keep").cast("long")).cast("double").alias("kept_count"),
        F.avg(F.col("keep").cast("double")).alias("keep_rate"),
        F.sum((~has_text).cast("long")).cast("double").alias("null_count"),
        F.avg((~has_text).cast("double")).alias("null_ratio"),
        F.avg(F.col("perplexity")).alias("perplexity_mean"),
    ]
    for r in RULE_NAMES:
        scalar_exprs.append(
            F.avg(F.array_contains("drop_reasons", r).cast("double")).alias(
                f"rule_fire_rate:{r}"
            )
        )
    for lang in CLASSES:
        scalar_exprs.append(
            F.avg((F.col("lang") == lang).cast("double")).alias(f"lang_frac:{lang}")
        )
    scalar_names = [
        "count", "kept_count", "keep_rate", "null_count", "null_ratio",
        "perplexity_mean",
    ] + [f"rule_fire_rate:{r}" for r in RULE_NAMES] + [
        f"lang_frac:{lang}" for lang in CLASSES
    ]
    extra_exprs = [
        F.percentile_approx(
            "perplexity", [0.25, 0.5, 0.75, 0.95]
        ).alias("__pq"),
        F.min(F.col("perplexity").cast("double")).alias("__hmin"),
        F.max(F.col("perplexity").cast("double")).alias("__hmax"),
    ]
    bucket = psi_bucket_expr()
    psi_exprs = [
        F.count(F.when(bucket == b, F.lit(1))).alias(f"__b{b}")
        for b in range(10)
    ]

    agg = docs.groupBy(part.alias("partition")).agg(
        *scalar_exprs, *extra_exprs, *psi_exprs
    )

    def _scalar_struct(name, col):
        return F.struct(
            F.lit("document").alias("column_name"),
            F.lit(name).alias("metric_name"),
            col.cast("double").alias("metric_value"),
            F.lit(None).cast("string").alias("metric_json"),
        )

    structs = [_scalar_struct(n, F.col(n)) for n in scalar_names]
    structs += [
        _scalar_struct(f"perplexity_{n}", F.col("__pq")[i])
        for i, n in enumerate(pq_names)
    ]
    # fixed-bucket perplexity distribution for PSI between cohorts: a
    # zero count means the bucket had no rows, i.e. the old per-bucket
    # groupBy emitted no row — filtered out below
    structs += [
        F.when(
            F.col(f"__b{b}") > 0,
            F.struct(
                F.lit("perplexity").alias("column_name"),
                F.lit(f"ppl_bucket:{b}").alias("metric_name"),
                F.col(f"__b{b}").cast("double").alias("metric_value"),
                F.lit(None).cast("string").alias("metric_json"),
            ),
        )
        for b in range(10)
    ]
    long_rows = agg.select(
        "partition",
        F.explode(F.array_compact(F.array(*structs))).alias("kv"),
    ).select("partition", "kv.*")

    # per-partition equi-width perplexity histogram (reference semantics:
    # bins over [min,max], bin i = [min+i*w, min+(i+1)*w), last closed,
    # empty when max == min) reusing pass A's min/max
    mm = F.broadcast(agg.select("partition", "__hmin", "__hmax"))
    x = F.col("perplexity").cast("double")
    w = (F.col("__hmax") - F.col("__hmin")) / F.lit(10.0)
    bin_col = F.least(
        F.floor((x - F.col("__hmin")) / w).cast("int"), F.lit(9)
    )
    hist = (
        docs.select(part.alias("partition"), "perplexity")
        .join(mm, "partition")
        .filter(x.isNotNull() & (F.col("__hmax") > F.col("__hmin")))
        .withColumn("bin", bin_col)
        .groupBy("partition", "bin", "__hmin", "__hmax")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "partition",
            "bin",
            (F.col("__hmin") + F.col("bin") * w).alias("bin_start"),
            (F.col("__hmin") + (F.col("bin") + 1) * w).alias("bin_end"),
            "count",
        )
    )
    hist_json = hist.groupBy("partition").agg(
        F.to_json(
            F.array_sort(F.collect_list(F.struct("bin", "bin_start", "bin_end", "count")))
        ).alias("metric_json")
    ).select(
        "partition",
        F.lit("perplexity").alias("column_name"),
        F.lit("perplexity_histogram").alias("metric_name"),
        F.lit(None).cast("double").alias("metric_value"),
        "metric_json",
    )

    out = long_rows.unionByName(hist_json)
    return out.select(
        F.lit(run_id).alias("run_id"),
        "partition",
        "column_name",
        "metric_name",
        "metric_value",
        "metric_json",
        F.current_timestamp().alias("profiled_at"),
    )


def drift_events(
    spark: SparkSession,
    output_root: str,
    run_id: str,
    metrics: DataFrame | None = None,
) -> DataFrame:
    """PSI between each partition cohort and its predecessor, computed
    from the stored ppl_bucket:* metric rows. Emits the FIXTURES.md §2
    `events` shape; analogue of DataDriftDetected events
    (/root/reference/baselinr/events/events.py). Pass ``metrics`` (the
    stored metrics table, possibly cached) to share one scan with the
    other event builders."""
    if metrics is None:
        metrics = spark.read.parquet(os.path.join(output_root, "metrics"))
    m = metrics
    buckets = (
        m.filter(F.col("metric_name").startswith("ppl_bucket:"))
        .select(
            F.col("partition"),
            # PSI sequences are per-metric family; keying the lag window
            # by the family DERIVED FROM DATA (not a literal — Catalyst
            # constant-folds a lit() key right back out of the window
            # spec) keeps the window partitioned, so adding more bucket
            # families later parallelizes instead of single-partitioning
            F.split(F.col("metric_name"), ":")[0].alias("metric"),
            F.split(F.col("metric_name"), ":")[1].cast("int").alias("bucket"),
            F.col("metric_value").alias("count"),
        )
        # latest metrics per partition survive via overwrite; dedupe anyway
        .groupBy("partition", "metric", "bucket")
        .agg(F.max("count").alias("count"))
    )
    psi_df = psi_pairwise_lag(buckets, "partition", "bucket", "count",
                              key_cols=["metric"])
    return psi_df.select(
        F.concat(F.lit("evt-"), F.md5(F.concat_ws("|", F.lit(run_id), F.col("cohort")))).alias("event_id"),
        F.lit("distribution_drift").alias("event_type"),
        F.col("cohort").alias("partition"),
        F.lit("perplexity_psi").alias("metric_name"),
        F.lit(None).cast("double").alias("baseline_value"),
        F.lit(None).cast("double").alias("current_value"),
        F.col("psi").alias("score"),
        F.col("severity"),
        F.current_timestamp().alias("ts"),
        F.lit(None).cast("string").alias("metadata_json"),
    )


def _needed_metric_partitions(metrics_dir: str, chunk_strs: list[str]) -> list[str]:
    """dt partitions the DRIFT pass must scan: the chunk itself plus each
    chunk cohort's immediate predecessor (PSI lag pairs touch nothing
    older). Stored cohorts come from a driver-side directory listing —
    O(partitions), no Spark job — and dt strings are ISO dates, so
    lexicographic order IS date order. Pruning preserves lag semantics:
    by construction no stored dt lies strictly between a cohort and its
    included predecessor, and rows whose cohort is outside the chunk are
    filtered from the event output anyway."""
    needed = set(chunk_strs)
    try:
        stored = sorted(
            d.split("=", 1)[1]
            for d in os.listdir(metrics_dir)
            if d.startswith("partition_key=")
        )
    except OSError:
        return sorted(needed)
    for c in chunk_strs:
        preds = [d for d in stored if d < c]
        if preds:
            needed.add(preds[-1])
    return sorted(needed)


def _chunk_bytes(input_path: str, chunk) -> int:
    """On-disk bytes of the chunk's dt partitions (drives the AQE advisory
    partition size). Driver-side directory stat — O(files), no Spark job."""
    total = 0
    for p in chunk:
        d = os.path.join(input_path, f"dt={p}")
        if not os.path.isdir(d):
            continue
        for root, _, files in os.walk(d):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def _resolve_skew_mode(input_path: str, chunk, par: int) -> str:
    """skew_mode='auto': pick scan-split balancing when the layout can
    actually be split finely enough, else fall back to the rebalance
    shuffle. Parquet scan splits cannot be smaller than a row group, so
    the decisive stat is the largest per-row-group granule (file bytes /
    row groups) and whether the chunk yields enough granules to smooth
    waves across `par` slots. Driver-side footer reads — O(files), no
    data scan (same contract as the incremental planner's estimates)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return "rebalance"
    max_granule = 0
    n_granules = 0
    for p in chunk:
        d = os.path.join(input_path, f"dt={p}")
        if not os.path.isdir(d):
            continue
        for root, _, files in os.walk(d):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(root, f)
                try:
                    rgs = max(pq.ParquetFile(full).metadata.num_row_groups, 1)
                    max_granule = max(max_granule,
                                      os.path.getsize(full) // rgs)
                    n_granules += rgs
                except Exception:
                    return "rebalance"  # unreadable footer → play safe
    if n_granules >= 4 * par and max_granule <= (64 << 20):
        return "split"
    return "rebalance"


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    cfg: FilterConfig = DEFAULT_CONFIG,
    run_id: str | None = None,
    max_partitions: int = MAX_PARTITIONS_PER_RUN,
    checkpoint_every: int | None = None,
    scrub_mode: str = "pandas",
    reprocess_changed: bool = False,
    hooks: list | None = None,
    hook_min_severity: str = "medium",
    scheduling=None,
    cost=None,
    skew_mode: str = "auto",
    _fail_before_commit_chunk: int | None = None,
) -> dict:
    """Run the filter over all not-yet-processed partitions. Returns a
    summary dict. `checkpoint_every` chunks the todo list so the manifest
    commits every N partitions (partition-granular resume);
    `reprocess_changed` additionally re-runs done partitions whose input
    fingerprint changed since their manifest commit (upstream backfill —
    reference incremental/change_detection.py semantics);
    `_fail_before_commit_chunk` is a test hook that simulates a crash
    after data writes but before the manifest commit of chunk i."""
    from ..sources import change_detection

    run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"
    all_parts = catalog.list_partitions(input_path)
    fractions: dict[str, float] = {}
    deferred: list[str] = []
    if scheduling is not None or cost is not None:
        # full decision cascade (freshness interval → snapshot match →
        # cost caps → sample/defer/full fallback); one row per partition
        from . import planner as planner_mod

        plan_rows = planner_mod.plan_partitions(
            spark, input_path, output_root, partitions=all_parts,
            scheduling=scheduling, cost=cost,
            reprocess_changed=reprocess_changed,
        ).collect()
        todo = [r["partition"] for r in plan_rows
                if r["action"] in ("run", "sample")][:max_partitions]
        fractions = {r["partition"]: r["sample_fraction"] for r in plan_rows
                     if r["action"] == "sample" and r["partition"] in todo}
        deferred = [r["partition"] for r in plan_rows
                    if r["action"] == "defer"]
    else:
        # fast path: manifest-only resume (± fingerprint change detection)
        done = set(manifest.done_partitions(spark, output_root))
        if reprocess_changed and done:
            done -= set(change_detection.changed_partitions(
                spark, input_path, output_root, sorted(done)
            ))
        todo = [p for p in all_parts if p not in done][:max_partitions]

    summary = {
        "run_id": run_id,
        "partitions_total": len(all_parts),
        "partitions_skipped": len(all_parts) - len(todo),
        "partitions_processed": [],
        "doc_count": 0,
        "kept_count": 0,
        "phase_s": {},
    }
    if deferred:
        summary["partitions_deferred"] = deferred
    if fractions:
        summary["partitions_sampled"] = sorted(fractions)
    if not todo:
        return summary

    step = checkpoint_every or len(todo)
    # sampled partitions get their own chunks: a chunk applies ONE
    # sample fraction to its whole read, so mixing full and sampled
    # partitions in a chunk would sample the full ones too
    full_todo = [p for p in todo if p not in fractions]
    chunks = [full_todo[i : i + step] for i in range(0, len(full_todo), step)]
    samp_todo = [p for p in todo if p in fractions]
    for frac in sorted({fractions[p] for p in samp_todo}):
        grp = [p for p in samp_todo if fractions[p] == frac]
        chunks += [grp[i : i + step] for i in range(0, len(grp), step)]

    docs_dir = os.path.join(output_root, "docs")
    metrics_dir = os.path.join(output_root, "metrics")
    events_dir = os.path.join(output_root, "events")
    lineage_dir = os.path.join(output_root, "lineage")
    schema_dir = os.path.join(output_root, "schema")

    def _tick(name, t0):
        ph = summary["phase_s"]
        ph[name] = round(ph.get(name, 0.0) + time.time() - t0, 2)
        return time.time()

    for ci, chunk in enumerate(chunks):
        t0 = time.time()
        chunk_skew = skew_mode
        if skew_mode == "auto":
            chunk_skew = _resolve_skew_mode(
                input_path, chunk, spark.sparkContext.defaultParallelism
            )
            summary.setdefault("skew_mode_used", {})[",".join(chunk)] = chunk_skew
        prior_split = spark.conf.get(
            "spark.sql.files.maxPartitionBytes", str(128 << 20)
        )
        if chunk_skew == "split":
            # scan-split balancing: with a well-laid-out warehouse
            # (bounded file sizes, splittable row groups — what Iceberg's
            # target-file-size maintenance guarantees at scale) sizing the
            # INPUT splits to ~12 waves/core yields the same byte-balanced
            # UDF stage as the rebalance shuffle with ZERO shuffle — at
            # 100 TB that shuffle is ~2x the input in disk+network, the
            # single largest avoidable cost in the job. Each split belongs
            # to exactly one dt (input is dt-partitioned), so the dynamic
            # partition overwrite still writes one file per task into one
            # dt dir. Use rebalance mode for pathological layouts (many
            # tiny unsplittable skewed files).
            par0 = spark.sparkContext.defaultParallelism
            nbytes = _chunk_bytes(input_path, chunk)
            # floor: small inputs would otherwise clamp to so few splits
            # that the UDF stage runs ~1 wave with stragglers doing 2x
            # duty; guarantee >=3 waves before giving up on balance, but
            # never go below 256 KB (per-task overhead swamps compute).
            # At real scale nbytes/(12*par) >> 4 MB and the floor is inert.
            lo = max(256 << 10, min(4 << 20, nbytes // (3 * par0)))
            split = max(lo, min(128 << 20, nbytes // (12 * par0)))
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
        pages = spark.read.parquet(input_path).filter(
            F.col("dt").cast("string").isin(chunk)
        )
        # prune to the columns the filter actually consumes BEFORE the
        # shuffle — the raw `html` blob is as large as `text` and is never
        # read downstream, so carrying it through would double shuffle bytes
        pages = pages.select("url", "warc_ts", "text", "dt")
        chunk_frac = fractions.get(chunk[0])
        if chunk_frac is not None:
            # cost-cap downgrade: deterministic hash sample (reference
            # fallback_strategy='sample', incremental/planner.py:287-289)
            # — a plain filter below the shuffle, reproducible across
            # runs so resume/backfill see the same sampled cohort
            from ..operators.profiling import hash_sample

            pages = hash_sample(pages, "url", chunk_frac)
        # ONE size-aware shuffle: AQE REBALANCE by dt. The zipf-skewed days
        # are split into ~advisory-sized tasks (skew-split) and small days
        # coalesced, so the expensive UDF stage is byte-balanced — the
        # size-awareness a fixed (dt, salt) key lacks (measured round 1: one
        # straggler with ~40% of the data) — while every output task writes
        # into ONE dt dir, keeping file count ≈ task count instead of
        # tasks × dts (file-commit time is driver-serial and was eating
        # scaling efficiency). Advisory size targets ~12 waves per core —
        # measured: the UDF stage scales at 0.90 with 12 waves vs 0.69 with
        # 2-4 (last-wave tail idles cores); the 128 MB cap keeps real-scale
        # file sizes sane where waves are plentiful anyway.
        par = spark.sparkContext.defaultParallelism
        # fingerprint the inputs BEFORE reading them: a backfill landing
        # while the chunk is processing must be detected by the NEXT
        # reprocess_changed run, so the manifest must record what was
        # actually read, not whatever is on disk at commit time
        chunk_fps = {
            p: change_detection.partition_fingerprint(input_path, p)
            for p in chunk
        }
        adv = max(1 << 20, min(128 << 20,
                               _chunk_bytes(input_path, chunk) // (12 * par)))
        prior_adv = spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(64 << 20)
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(adv))
        try:
            if chunk_skew != "split":
                pages = pages.hint("rebalance", "dt")
            docs = transform_pages(spark, pages, cfg, run_id,
                                   scrub_mode=scrub_mode)
            catalog.write_partitioned(docs, docs_dir, "dt")
        finally:
            # restore the caller's sizes even when the transform or write
            # raises, so other queries on this shared session keep their
            # configuration
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                           prior_adv)
            spark.conf.set("spark.sql.files.maxPartitionBytes", prior_split)
        t0 = _tick("transform_write", t0)

        # Post-transform phases operate on metadata-scale frames (metric
        # rows are O(|chunk| x metrics), events O(cohorts)): 32+ shuffle
        # partitions and AQE's per-stage re-optimization rounds are pure
        # scheduling overhead there (measured ~11s of fixed cost per
        # chunk at local[32] regardless of SF — guide §1.2 step 3). Pin
        # a small shuffle width and plan each tiny query in one pass;
        # restored before the next chunk's transform. Parameterised via
        # SPARK_GRAFT_META_SHUFFLE for clusters where cohort counts are
        # genuinely large.
        prior_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
        prior_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        meta_parts = os.environ.get("SPARK_GRAFT_META_SHUFFLE", "8")
        spark.conf.set("spark.sql.shuffle.partitions", meta_parts)
        spark.conf.set("spark.sql.adaptive.enabled", "false")

        # metrics from the written output (columnar projection; avoids
        # recomputing UDF scores and avoids caching the full text at scale).
        # No cache on the narrow read-back: its two aggregation passes
        # (scalars+buckets, histogram) re-scan cheap columnar parquet,
        # and a persist costs a full materialization job plus cache
        # memory — measured 1-4s SLOWER than the double scan at 1M docs.
        try:
            docs_back = spark.read.parquet(docs_dir).filter(
                F.col("dt").cast("string").isin(chunk)
            ).select("dt", "keep", "drop_reasons", "lang", "perplexity",
                     F.col("scrubbed_text").isNotNull().alias("__has_text"))
            mrows = partition_metrics(docs_back, run_id).withColumn(
                "partition_key", F.col("partition")
            ).persist()
            # metric rows are tiny (hundreds); single writer task so the
            # commit moves |dts| files, not |dts|·shuffle_partitions
            mrows.repartition(1).write.mode("overwrite").partitionBy("partition_key").option(
                "partitionOverwriteMode", "dynamic"
            ).parquet(metrics_dir)
            t0 = _tick("metrics", t0)

            # event taxonomy (reference events/events.py:31-349): drift events
            # for the processed cohorts need all stored metrics; validation +
            # anomaly events come straight from the cached metric rows; schema
            # events diff this run's snapshot vs the previous run's.
            from . import events as ev_mod

            chunk_strs = [str(p) for p in chunk]
            # drift (PSI lag) needs only the chunk cohorts plus each one's
            # immediate predecessor — prune the metrics scan to those dt
            # partitions so the read stays O(chunk), not O(history): a year
            # of daily cohorts would otherwise be rescanned on every chunk.
            # anomaly (leave-one-out rowcount control limits) genuinely needs
            # every cohort's count, but only the metric_name='count' rows —
            # it gets its OWN scan with that filter pushed to parquet instead
            # of sharing the (now-pruned) drift frame.
            # no persist: the pruned frame feeds exactly one plan (the
            # events write; the hook dispatch re-reads it only when hooks
            # are configured), and a cache materialization is itself a
            # full job on this metadata-scale frame
            drift_metrics = spark.read.parquet(metrics_dir).filter(
                F.col("partition_key").isin(
                    _needed_metric_partitions(metrics_dir, chunk_strs)
                )
            )
            ev = drift_events(spark, output_root, run_id,
                              metrics=drift_metrics).filter(
                F.col("partition").isin(chunk_strs)
            )
            ev = ev.unionByName(
                ev_mod.validation_events(mrows, run_id)
            )
            ev = ev.unionByName(
                ev_mod.anomaly_events(spark, metrics_dir, run_id).filter(
                    F.col("partition").isin(chunk_strs)
                )
            )
            if ci == 0:
                ev_mod.write_schema_snapshot(spark, docs, schema_dir, run_id)
                ev = ev.unionByName(
                    ev_mod.schema_change_events(spark, schema_dir, run_id)
                )
            ev = ev.withColumn("partition_key", F.col("partition"))
            ev.repartition(1).write.mode("overwrite").partitionBy("partition_key").option(
                "partitionOverwriteMode", "dynamic"
            ).parquet(events_dir)
            if hooks:
                # alert on THIS run's event plan, not a read-back of the
                # events dir: the '__schema__' partition is only overwritten
                # when a run produces schema events, so a disk read would
                # re-alert a previous run's (or previous chunk's) stale
                # schema changes as if they just happened
                from .hooks import dispatch_events

                dispatch_events(ev, hooks, min_severity=hook_min_severity)
            t0 = _tick("drift", t0)

            # per-partition (doc, kept) counts come straight from the cached
            # metrics rows — no extra scan of docs
            counts: dict[str, tuple[int, int]] = {}
            for r in mrows.filter(
                F.col("metric_name").isin("count", "kept_count")
            ).collect():
                n, k = counts.get(r["partition"], (0, 0))
                if r["metric_name"] == "count":
                    n = int(r["metric_value"])
                else:
                    k = int(r["metric_value"])
                counts[r["partition"]] = (n, k)
            mrows.unpersist()

            import pandas as pd

            lineage_pdf = pd.DataFrame(
                [
                    (
                        run_id,
                        p,
                        os.path.join(input_path, f"dt={p}"),
                        os.path.join(docs_dir, f"dt={p}"),
                        counts.get(p, (0, 0))[0],
                        counts.get(p, (0, 0))[1],
                    )
                    for p in chunk
                ],
                columns=["run_id", "partition", "input_path", "output_path",
                         "doc_count", "kept_count"],
            )
            lineage = spark.createDataFrame(
                lineage_pdf,
                schema="run_id string, partition string, input_path string, "
                "output_path string, doc_count long, kept_count long",
            ).withColumn("ts", F.current_timestamp()).withColumn(
                "partition_key", F.col("partition")
            )
            lineage.write.mode("overwrite").partitionBy("partition_key").option(
                "partitionOverwriteMode", "dynamic"
            ).parquet(lineage_dir)
            t0 = _tick("counts_lineage", t0)

            if _fail_before_commit_chunk is not None and ci == _fail_before_commit_chunk:
                raise RuntimeError(f"injected failure before manifest commit of chunk {ci}")

            now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            # cost-cap downgraded chunks commit as status='sampled' with the
            # fraction recorded, NOT 'done': the planner skips them only
            # while the same cap+fraction still applies and promotes them to
            # a full run once caps are lifted — a 'done' commit would
            # silently freeze the partition at ~fraction of its docs forever
            manifest.commit_partitions(
                spark,
                output_root,
                run_id,
                [
                    {
                        "partition": p,
                        "status": "done" if chunk_frac is None else "sampled",
                        "doc_count": counts.get(p, (0, 0))[0],
                        "kept_count": counts.get(p, (0, 0))[1],
                        "completed_at": now,
                        "snapshot_id": f"{run_id}:{ci}",
                        "fingerprint": chunk_fps[p],
                        "sample_fraction": chunk_frac,
                    }
                    for p in chunk
                ],
            )
            _tick("manifest", t0)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prior_parts)
            spark.conf.set("spark.sql.adaptive.enabled", prior_aqe)
        summary["partitions_processed"].extend(chunk)
        summary["doc_count"] += sum(v[0] for v in counts.values())
        summary["kept_count"] += sum(v[1] for v in counts.values())

    return summary
