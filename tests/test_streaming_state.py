"""Stateful streaming operators: watermarked dedup + running totals."""

import datetime as dt
import os
import time

import pandas as pd
from pyspark.sql import functions as F

from baselinr_spark.streaming.dedup_stream import (
    latest_totals,
    start_running_totals,
    start_streaming_dedup,
)

D1 = dt.datetime(2025, 6, 1, 12, 0, 0)


def _write_pages_file(spark, path, rows, mtime):
    """One parquet file of pages rows with a controlled mtime so the
    file stream source processes files in a deterministic order."""
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "dt"]
    )
    df = spark.createDataFrame(
        pdf,
        schema="url string, warc_ts timestamp, html binary, text string, "
        "lang string, dt date",
    )
    df.coalesce(1).write.mode("append").parquet(path)
    for f in os.listdir(path):
        full = os.path.join(path, f)
        if f.endswith(".parquet") and abs(os.path.getmtime(full) - mtime) > 0.5:
            if os.path.getmtime(full) > mtime:
                os.utime(full, (mtime, mtime))


def test_streaming_dedup_within_watermark(spark, tmp_path):
    inp = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    base = time.time() - 1000

    def row(url, ts):
        return (url, ts, b"", "text of " + url, "en", ts.date())

    # batch 1: first sightings of u1/u2 (+ u3 as a control)
    _write_pages_file(
        spark, inp,
        [row("u1", D1), row("u2", D1), row("u3", D1)],
        base,
    )
    # batch 2: a re-crawl of u1 one hour later (inside the 1-day horizon
    # -> must be dropped) and a fresh u4; max event time D1+5d advances
    # the watermark far past D1+1d, evicting u2's state afterwards
    _write_pages_file(
        spark, inp,
        [row("u1", D1 + dt.timedelta(hours=1)),
         row("u4", D1 + dt.timedelta(days=5))],
        base + 10,
    )
    # batch 3: filler — state cleanup runs at END of a batch with that
    # batch's watermark (D1+4d here), which evicts u2 (expiry D1+1d)
    _write_pages_file(
        spark, inp, [row("u5", D1 + dt.timedelta(days=6))], base + 20
    )
    # batch 4: u2 re-crawled 10 days later — its state is gone, so this
    # is a legitimate re-snapshot and must survive
    _write_pages_file(
        spark, inp, [row("u2", D1 + dt.timedelta(days=10))], base + 30
    )

    q = start_streaming_dedup(spark, inp, out, watermark="1 day",
                              max_files_per_trigger=1)
    q.awaitTermination(120)

    got = spark.read.parquet(os.path.join(out, "deduped"))
    by_url = {
        r["url"]: r["n"]
        for r in got.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    assert by_url["u1"] == 1          # in-horizon re-crawl dropped
    assert by_url["u3"] == 1 and by_url["u4"] == 1 and by_url["u5"] == 1
    assert by_url["u2"] == 2          # post-eviction re-snapshot kept


def test_running_totals_stateful(spark, tmp_path):
    docs = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    base = time.time() - 1000

    def _write_docs(rows, mtime):
        pdf = pd.DataFrame(rows, columns=["url", "keep", "dt"])
        df = spark.createDataFrame(pdf, schema="url string, keep boolean, dt date")
        df.coalesce(1).write.mode("append").parquet(docs)
        for f in os.listdir(docs):
            full = os.path.join(docs, f)
            if f.endswith(".parquet") and os.path.getmtime(full) > mtime:
                os.utime(full, (mtime, mtime))

    d_a, d_b = dt.date(2025, 6, 1), dt.date(2025, 6, 2)
    _write_docs([("u1", True, d_a), ("u2", False, d_a), ("u3", True, d_b)],
                base)
    _write_docs([("u4", True, d_a), ("u5", False, d_b)], base + 10)

    q = start_running_totals(spark, docs, out, max_files_per_trigger=1)
    q.awaitTermination(120)

    totals = {r["dt"]: (r["docs"], r["kept"])
              for r in latest_totals(spark, out).collect()}
    # cumulative across both micro-batches
    assert totals["2025-06-01"] == (3, 2)
    assert totals["2025-06-02"] == (2, 1)

    # restart on new data only: totals keep accumulating from state
    _write_docs([("u6", True, d_a)], base + 20)
    q2 = start_running_totals(spark, docs, out, max_files_per_trigger=1)
    q2.awaitTermination(120)
    totals = {r["dt"]: (r["docs"], r["kept"])
              for r in latest_totals(spark, out).collect()}
    assert totals["2025-06-01"] == (4, 3)
