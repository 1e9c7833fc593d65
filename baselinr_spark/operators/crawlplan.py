"""Crawl-frontier politeness scheduler.

A fetch frontier at web scale must respect per-domain politeness: at
most one request per ``crawl_delay`` seconds per domain (the robots.txt
``Crawl-delay`` directive / RFC 9309 companion convention), highest
priority pages first, optionally capped at a per-domain page budget.
This is the planning half that sits between :func:`~baselinr_spark.
functions.urltools.robots_filter` (which URLs MAY be fetched) and the
fetcher (which URLs WILL be fetched, when). The reference repo has no
crawl surface — its scheduling is warehouse-job concurrency
(/root/reference/baselinr/config/schema.py:862-867) — so this module is
additive frontier tooling for the webtext tier.

Scale design (10^10-URL frontiers):

* ONE shuffle, on the domain key — the inherent cost of per-domain
  ordering. The per-partition working set is one domain's frontier,
  which the ``max_per_domain`` budget keeps bounded in the OUTPUT;
  the transient rank runs inside Spark's external sort (spillable),
  never a driver or executor in-memory structure.
* Hot domains (crawl frontiers are zipf in domain too) are exactly the
  salt-planner's case (operators/skewaudit.py) — but salting is
  unusable here because politeness is a strict per-domain serial
  order; instead the budget cap bounds the damage and AQE splits the
  residual skew on the downstream exchange.
* Schedule times are pure arithmetic on the rank (slot × delay): the
  concatenated timeline is never materialized, and the global
  concurrency histogram is a second small groupBy over time buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def crawl_schedule(
    urls: DataFrame,
    *,
    domain_col: str = "domain",
    url_col: str = "url",
    priority_col: str | None = None,
    delay_col: str = "crawl_delay_s",
    max_per_domain: int | None = None,
) -> DataFrame:
    """Assign each URL its politeness slot and fetch time.

    Slot = per-domain rank (priority desc, then url for determinism),
    0-based; fetch_time_s = slot × that domain's crawl delay. URLs
    ranked past ``max_per_domain`` are dropped (budget exhausted).

    Returns (domain_col, url_col, slot, fetch_time_s).
    """
    order = (
        [F.desc(priority_col), F.asc(url_col)]
        if priority_col
        else [F.asc(url_col)]
    )
    w = W.partitionBy(domain_col).orderBy(*order)
    out = urls.withColumn("slot", (F.row_number().over(w) - 1).cast("int"))
    if max_per_domain is not None:
        out = out.filter(F.col("slot") < max_per_domain)
    return out.select(
        domain_col,
        url_col,
        "slot",
        F.round(F.col("slot") * F.col(delay_col).cast("double"), 6).alias(
            "fetch_time_s"
        ),
    )


def crawl_concurrency(
    schedule: DataFrame,
    *,
    bucket_s: float,
    domain_col: str = "domain",
) -> DataFrame:
    """Global fetcher load profile: per time bucket, how many fetches
    land in it and how many distinct domains are active — the
    capacity-planning view of a schedule (is the fleet's request rate
    flat, or does everything pile into bucket 0?).

    Returns (bucket, n_fetches, n_domains) over occupied buckets.
    """
    b = F.floor(F.col("fetch_time_s") / F.lit(float(bucket_s))).cast("bigint")
    return (
        schedule.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.countDistinct(domain_col).alias("n_domains"),
        )
    )


def oracle_crawl_schedule_sql(
    urls_sql: str,
    *,
    domain_col: str = "domain",
    url_col: str = "url",
    priority_col: str | None = None,
    delay_col: str = "crawl_delay_s",
    max_per_domain: int | None = None,
) -> str:
    """DuckDB twin of :func:`crawl_schedule`."""
    order = (
        f"{priority_col} DESC, {url_col}" if priority_col else f"{url_col}"
    )
    cap = f"WHERE slot < {max_per_domain}" if max_per_domain is not None else ""
    return f"""
WITH src AS ({urls_sql}),
ranked AS (
  SELECT {domain_col}, {url_col}, {delay_col},
         (row_number() OVER (PARTITION BY {domain_col}
                             ORDER BY {order}) - 1)::int AS slot
  FROM src
)
SELECT {domain_col}, {url_col}, slot,
       round(slot * {delay_col}::double, 6) AS fetch_time_s
FROM ranked {cap}"""
