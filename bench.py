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


# Host-contention probe (same idea as tools/bench_scaling.py's
# calibration): a FIXED pure-CPU sha256 chain whose idle-host timing is
# recorded below. The probe runs before the headline loop, between
# headline and pipeline, and after the pipeline, and lands in the JSON
# artifact — so a slow reading is attributable (probe elevated => the
# shared VM was contended during THIS run; probe at reference => the
# code regressed). Round-4's 2.4x driver-vs-idle bench spread was
# unexplainable precisely because the artifact carried no such signal.
HOST_PROBE_N = 2_000_000       # single-process chain length
HOST_PROBE_IDLE_REF_S = 0.79   # median of 5, idle host, 2026-08-20
HOST_SAT_PER_PROC_N = 1_000_000
HOST_SAT_IDLE_REF_S = 0.68     # 32 procs x 1M chain, median of 3, idle, 2026-08-20


def _sha_chain(n: int) -> int:
    import hashlib

    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def _host_probe_single() -> float:
    t0 = time.time()
    _sha_chain(HOST_PROBE_N)
    return round(time.time() - t0, 3)


def _host_probe_saturated(procs: int) -> float:
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_sha_chain, [HOST_SAT_PER_PROC_N] * procs)
    return round(time.time() - t0, 3)


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

    host_probes = [_host_probe_single()]
    host_sat = _host_probe_saturated(min(cpus, os.cpu_count() or cpus))

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.count()  # warm plan (file listing, broadcast)
        # best-of-2: this host is a shared VM with measured steal-time
        # bursts up to ~20% (see BASELINE.md round-5 notes); min-of-2
        # reports steady-state throughput, the regime a long-running
        # 100 TB job lives in, instead of whichever run a burst hit
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    host_probes.append(_host_probe_single())

    # flagship pipeline: synthetic pages warehouse at this SF
    # (1M docs/SF; sf0.1 -> 100k docs over 10 daily partitions — large
    # enough that steady-state throughput, not fixed cost, is measured)
    n_docs = int(os.environ.get("BENCH_PIPELINE_DOCS", str(max(5000, int(1_000_000 * sf)))))
    pages_dir = os.path.join(tempfile.gettempdir(),
                         f"bench_pages_v{PAGES_LAYOUT_VERSION}_{n_docs}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        shutil.rmtree(pages_dir, ignore_errors=True)
        write_pages_warehouse(spark, pages_dir, n_docs=n_docs, seed=42)
    # warmup: TWO full untimed passes. A single-partition warmup leaves
    # most of the 32 Python workers cold (imports + broadcast-model
    # unpickle) and whole-stage codegen un-JITed for the wide stages; and
    # measured convergence shows C2 JIT tiering takes 2-3 full passes to
    # reach steady state (run sequence 45s -> 20s -> 16.5s at 100k docs).
    # Steady-state throughput is the regime that matters for a
    # long-running 100 TB job.
    for wi in range(2):
        wdir = tempfile.mkdtemp(prefix="bench_warm_")
        try:
            run_pipeline(spark, pages_dir, wdir, run_id=f"warm{wi}",
                         skew_mode="split")
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

    # timed: best of 3 (this shared VM shows steal-time bursts to ~20%
    # and sys-time spikes from memory reclaim; min-of-3 reports the
    # steady state rather than whichever pass a burst landed on — the
    # host probes bracketing the block quantify what the host offered)
    pipeline_runs: list[float] = []
    summary = None
    for ti in range(3):
        out_dir = tempfile.mkdtemp(prefix="bench_out_")
        try:
            t0 = time.time()
            # split mode: the bench warehouse has bounded splittable files,
            # so scan-split balancing beats the rebalance shuffle (measured
            # 24.3s -> 19.3s at local[32], 100k docs)
            s = run_pipeline(spark, pages_dir, out_dir, run_id=f"bench{ti}",
                             skew_mode="split")
            took = round(time.time() - t0, 3)
            pipeline_runs.append(took)
            # compare the ROUNDED value against the rounded list, so the
            # reported phase split always belongs to the reported best run
            if summary is None or took <= min(pipeline_runs):
                summary = s
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    pipeline_sec = min(pipeline_runs)
    timings["pipeline"] = round(pipeline_sec, 3)
    docs_per_sec = summary["doc_count"] / pipeline_sec if pipeline_sec > 0 else 0.0

    host_probes.append(_host_probe_single())
    # contention factor: >1.0 means the host delivered less CPU than the
    # idle reference during this run (e.g. 1.4 => readings ~1.4x slow).
    # min over the three probes: probes taken mid-bench also see our own
    # Spark JVM's background threads (GC, shuffle cleanup), so the max
    # overstates EXTERNAL contention; if even the min is elevated, the
    # host was contended for the whole run. The full list is reported.
    host_factor = round(
        min(host_probes) / HOST_PROBE_IDLE_REF_S, 3
    )

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
        "pipeline_runs": pipeline_runs,
        "cpus": cpus,
        "host_probe_s": host_probes,
        "host_probe_idle_ref_s": HOST_PROBE_IDLE_REF_S,
        "host_probe_saturated_s": host_sat,
        "host_probe_saturated_idle_ref_s": HOST_SAT_IDLE_REF_S,
        "host_contention_factor": host_factor,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
