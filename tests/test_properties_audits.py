"""Property tests for the closing-session audit operators: salted
aggregation exactness, GMM posterior laws, snapshot-diff conservation.
Batched per example (the test_url_properties.py discipline)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from baselinr_spark.operators.dedup import shard_spillover
from baselinr_spark.operators.gmm import gmm2_fit, gmm2_posteriors
from baselinr_spark.operators.revisit import snapshot_diff
from baselinr_spark.operators.skewaudit import salt_plan, salted_group_count

_key = st.sampled_from(["hot", "warm", "cold", "k4", "k5"])


@settings(max_examples=8, deadline=None)
@given(st.lists(_key, min_size=1, max_size=60))
def test_salted_count_exact_for_any_distribution(spark, keys):
    """Two-stage salted count == plain count for ANY key distribution
    and ANY target size (count is algebraic)."""
    df = spark.createDataFrame(list(enumerate(keys)), "payload int, k string")
    plan = salt_plan(df, "k", target_rows_per_task=3)
    salted = {r["k"]: r["cnt"]
              for r in salted_group_count(df, "k", plan,
                                          entropy_col="payload").collect()}
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert salted == plain


@settings(max_examples=6, deadline=None)
@given(st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False, allow_infinity=False),
                min_size=4, max_size=40))
def test_gmm_posterior_laws(spark, xs):
    """For ANY data: weights sum to 1, variances >= floor, posteriors
    in [0,1], MAP component consistent with p2."""
    df = spark.createDataFrame(list(enumerate(xs)), "id int, x double")
    params = gmm2_fit(df, "x", iters=3)
    p = params.collect()[0]
    assert abs(p["w1"] + p["w2"] - 1.0) < 1e-6
    assert p["var1"] >= 1e-9 and p["var2"] >= 1e-9
    for r in gmm2_posteriors(df, "id", "x", params).collect():
        assert 0.0 <= r["p2"] <= 1.0
        # component is MAP over the RAW posterior; the returned p2 is
        # rounded to 6dp, so within half an ulp of the 0.5 boundary the
        # rounded value can land on the other side (hypothesis found
        # p2_raw=0.49999996 -> component 1, p2=0.5) — only assert
        # consistency away from the rounding boundary
        if abs(r["p2"] - 0.5) > 1e-6:
            assert r["component"] == (2 if r["p2"] >= 0.5 else 1)


_page = st.integers(min_value=0, max_value=15)


@settings(max_examples=8, deadline=None)
@given(st.sets(_page, min_size=0, max_size=12),
       st.sets(_page, min_size=0, max_size=12),
       st.sets(_page, min_size=0, max_size=12))
def test_snapshot_diff_conservation(spark, old_pages, new_pages, changed):
    """added+unchanged+changed == n_new, removed+unchanged+changed ==
    n_old, and churn <= 1 — for ANY pair of snapshots."""
    if not old_pages and not new_pages:
        return
    old = spark.createDataFrame(
        [(p, f"h{p}", "d") for p in old_pages] or [(None, None, None)],
        "page int, h string, domain string",
    ).filter("page is not null")
    new = spark.createDataFrame(
        [(p, f"h{p}x" if p in changed else f"h{p}", "d")
         for p in new_pages] or [(None, None, None)],
        "page int, h string, domain string",
    ).filter("page is not null")
    rows = snapshot_diff(old, new, "page", "h", "domain").collect()
    if not rows:
        return
    r = rows[0]
    assert r["added"] + r["unchanged"] + r["changed"] == r["n_new"]
    assert r["removed"] + r["unchanged"] + r["changed"] == r["n_old"]
    assert 0.0 <= r["churn_rate"] <= 1.0


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 19), st.integers(0, 19)),
                min_size=1, max_size=15).map(
                    lambda ps: [(a, b) for a, b in ps if a != b]))
def test_spillover_bounds_any_pairs(spark, pairs):
    """Spillover fraction is in [0,1] and n_same + crossings = n_pairs
    for ANY pair set under ANY assignment."""
    if not pairs:
        return
    asg = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(20)], ["doc_id", "shard"]
    )
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    r = shard_spillover(pdf, asg, "doc_id").collect()[0]
    assert r["n_pairs"] == len(pairs)
    assert 0 <= r["n_same_shard"] <= r["n_pairs"]
    assert 0.0 <= r["spillover_frac"] <= 1.0


from baselinr_spark.operators.crawlplan import crawl_schedule
from baselinr_spark.operators.linkgraph import trustrank


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a.com", "b.com", "c.com"]),
                          st.integers(0, 999), st.integers(0, 5)),
                min_size=1, max_size=25, unique_by=lambda t: (t[0], t[1])))
def test_crawl_slots_are_dense_permutation(spark, rows):
    """Per domain: slots are exactly 0..n-1 and fetch times strictly
    increase with slot — for ANY frontier and priorities."""
    df = spark.createDataFrame(
        [(d, f"https://{d}/p/{u}", pr, 1.5) for d, u, pr in rows],
        ["domain", "url", "priority", "crawl_delay_s"],
    )
    per = {}
    for r in crawl_schedule(df, priority_col="priority").collect():
        per.setdefault(r["domain"], []).append((r["slot"], r["fetch_time_s"]))
    for dom, sl in per.items():
        slots = sorted(s for s, _ in sl)
        assert slots == list(range(len(sl)))
        ordered = sorted(sl)
        times = [t for _, t in ordered]
        assert times == sorted(times)
        assert times[0] == 0.0


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                min_size=1, max_size=20).map(
                    lambda es: [(f"n{a}", f"n{b}") for a, b in es if a != b]))
def test_trustrank_mass_conservation_any_graph(spark, edges):
    """Total trust == 1 and no negative trust for ANY digraph."""
    if not edges:
        return
    e = spark.createDataFrame(edges, ["src", "dst"])
    tr = trustrank(e, ["n0", "n3"], n_iter=4).collect()
    total = sum(r["trust"] for r in tr)
    assert abs(total - 1.0) < 1e-9
    assert all(r["trust"] >= 0.0 for r in tr)
