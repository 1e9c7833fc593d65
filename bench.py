#!/usr/bin/env python
"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR plus the
flagship quality-filter pipeline throughput (docs/sec).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": 0.1, "docs_per_sec": X, ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_PIPELINE_DOCS (override doc count
for the synthetic pages run).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline subset of __spark_entry__.queries(): one per operator family,
# weighted toward the shapes that stress shuffle/agg/join at scale.
HEADLINE = (
    "tpch_q1",
    "top_customers_revenue",
    "profile_lineitem",
    "histogram_quantity",
    "validation_suite",
    "psi_value",
    "ks_value",
    "learn_expectations",
    "doc_stats",
    "keep_drop_docs",
    "dedup_exact_summary",
    "minhash_signatures",
    "simhash_docs",
    "knn_cosine",
)


def _force(df) -> None:
    # noop sink: full execution, no driver collect cost
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    import __spark_entry__ as entrymod
    from baselinr_spark.session import build_session
    from baselinr_spark.sources.pages import PAGES_LAYOUT_VERSION, write_pages_warehouse
    from baselinr_spark.plans.pipeline import run_pipeline

    spark = build_session(app_name="bench", master=f"local[{cpus}]")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.count()  # warm plan (file listing, broadcast)
        t0 = time.time()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # flagship pipeline: synthetic pages warehouse at this SF
    # (1M docs/SF; sf0.1 -> 100k docs over 10 daily partitions — large
    # enough that steady-state throughput, not fixed cost, is measured)
    n_docs = int(os.environ.get("BENCH_PIPELINE_DOCS", str(max(5000, int(1_000_000 * sf)))))
    pages_dir = os.path.join(tempfile.gettempdir(),
                         f"bench_pages_v{PAGES_LAYOUT_VERSION}_{n_docs}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        shutil.rmtree(pages_dir, ignore_errors=True)
        write_pages_warehouse(spark, pages_dir, n_docs=n_docs, seed=42)
    # warmup: one FULL untimed pass. A single-partition warmup leaves most
    # of the 32 Python workers cold (imports + broadcast-model unpickle)
    # and whole-stage codegen un-JITed for the wide stages; on a contended
    # host that first-run-in-JVM cost was measured at +25-30s of wall —
    # 2.5x the steady-state run itself. Steady-state throughput is the
    # regime that matters for a long-running 100 TB job, so the timed run
    # is the second full pass (same warehouse, fresh output dir).
    wdir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        run_pipeline(spark, pages_dir, wdir, run_id="warm",
                     skew_mode="split")
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    out_dir = tempfile.mkdtemp(prefix="bench_out_")
    try:
        t0 = time.time()
        # split mode: the bench warehouse has bounded splittable files,
        # so scan-split balancing beats the rebalance shuffle (measured
        # 24.3s -> 19.3s at local[32], 100k docs)
        summary = run_pipeline(spark, pages_dir, out_dir, run_id="bench",
                               skew_mode="split")
        pipeline_sec = time.time() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    timings["pipeline"] = round(pipeline_sec, 3)
    docs_per_sec = summary["doc_count"] / pipeline_sec if pipeline_sec > 0 else 0.0

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": round(docs_per_sec, 1),
        "pipeline_docs": summary["doc_count"],
        "pipeline_phases": summary.get("phase_s", {}),
        "cpus": cpus,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
