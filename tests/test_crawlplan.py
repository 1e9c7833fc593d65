"""Politeness scheduler (operators/crawlplan.py) on hand-built frontiers."""

import pytest

from baselinr_spark.operators.crawlplan import crawl_concurrency, crawl_schedule


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        # (domain, url, priority, crawl_delay_s)
        ("a.com", "https://a.com/1", 5, 2.0),
        ("a.com", "https://a.com/2", 9, 2.0),
        ("a.com", "https://a.com/3", 9, 2.0),  # tie with /2 -> url order
        ("b.com", "https://b.com/x", 1, 0.5),
        ("b.com", "https://b.com/y", 2, 0.5),
    ]
    return spark.createDataFrame(
        rows, ["domain", "url", "priority", "crawl_delay_s"]
    )


def test_slots_priority_then_url(frontier):
    got = {
        r["url"]: (r["slot"], r["fetch_time_s"])
        for r in crawl_schedule(frontier, priority_col="priority").collect()
    }
    assert got["https://a.com/2"] == (0, 0.0)  # tie broken by url asc
    assert got["https://a.com/3"] == (1, 2.0)
    assert got["https://a.com/1"] == (2, 4.0)
    assert got["https://b.com/y"] == (0, 0.0)
    assert got["https://b.com/x"] == (1, 0.5)


def test_budget_cap(frontier):
    sched = crawl_schedule(frontier, priority_col="priority",
                           max_per_domain=2)
    per_dom = {}
    for r in sched.collect():
        per_dom.setdefault(r["domain"], []).append(r["slot"])
    assert sorted(per_dom["a.com"]) == [0, 1]  # third URL dropped
    assert sorted(per_dom["b.com"]) == [0, 1]


def test_concurrency_histogram(frontier):
    sched = crawl_schedule(frontier, priority_col="priority")
    # bucket_s=1: a.com fetches at 0,2,4; b.com at 0,0.5
    got = {r["bucket"]: (r["n_fetches"], r["n_domains"])
           for r in crawl_concurrency(sched, bucket_s=1.0).collect()}
    assert got[0] == (3, 2)  # a/2 at 0, b/y at 0, b/x at 0.5
    assert got[2] == (1, 1)
    assert got[4] == (1, 1)
    assert 1 not in got and 3 not in got


def test_schedule_single_shuffle(frontier):
    """Exactly ONE Exchange (the inherent domain-key shuffle) feeds
    the per-domain rank window."""
    plan = (
        crawl_schedule(frontier, priority_col="priority")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort
