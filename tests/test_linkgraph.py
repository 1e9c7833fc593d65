"""PageRank / link-graph tests (operators/linkgraph.py)."""

import pytest
from pyspark.sql import Row

from baselinr_spark.operators.linkgraph import normalize_edges, pagerank


def _edges(spark, *pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _py_pagerank(pairs, n_iter, d=0.85):
    """Driver-side reference implementation of the same spec."""
    e = {(a, b) for a, b in pairs if a != b}
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    out = {}
    for a, _ in e:
        out[a] = out.get(a, 0) + 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dang = sum(r[v] for v in nodes if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for a, b in e:
            contrib[b] += r[a] / out[a]
        r = {v: (1 - d) / n + d * (contrib[v] + dang / n) for v in nodes}
    return r


def test_normalize_edges_dedup_and_self_loops(spark):
    e = normalize_edges(_edges(spark, ("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")))
    assert sorted(tuple(r) for r in e.collect()) == [("a", "b"), ("b", "c")]


def test_two_node_cycle_is_uniform(spark):
    r = {x["node"]: x["rank"] for x in
         pagerank(_edges(spark, ("a", "b"), ("b", "a")), n_iter=3).collect()}
    assert r["a"] == pytest.approx(0.5)
    assert r["b"] == pytest.approx(0.5)
    assert sum(r.values()) == pytest.approx(1.0)


def test_matches_reference_with_dangling(spark):
    # 'c' is dangling (no out-edges): its mass redistributes uniformly.
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a"), ("c", "c")]
    r = {x["node"]: x["rank"] for x in
         pagerank(_edges(spark, *pairs), n_iter=5).collect()}
    exp = _py_pagerank(pairs, n_iter=5)
    assert set(r) == set(exp)
    for v in exp:
        assert r[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_hub_collects_rank(spark):
    # star graph: everyone links to 'hub'; hub is dangling.
    pairs = [(s, "hub") for s in ("a", "b", "c", "d")]
    r = {x["node"]: x["rank"] for x in
         pagerank(_edges(spark, *pairs), n_iter=10).collect()}
    assert r["hub"] > r["a"] * 3
    exp = _py_pagerank(pairs, n_iter=10)
    for v in exp:
        assert r[v] == pytest.approx(exp[v], abs=1e-12)

def test_label_propagation_two_cliques(spark):
    """Two triangles joined by nothing: each collapses onto its min
    node label after one sweep and stays there."""
    from baselinr_spark.operators.linkgraph import label_propagation

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("x", "y"), ("y", "z"), ("z", "x")],
        ["src", "dst"],
    )
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, n_iter=2).collect()}
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"


def test_label_propagation_tie_breaks_min_label(spark):
    """Star center with two leaves carrying labels 'a' and 'c': equal
    neighbor counts, center adopts the smaller label."""
    from baselinr_spark.operators.linkgraph import label_propagation

    edges = spark.createDataFrame([("m", "a"), ("m", "c")], ["src", "dst"])
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, n_iter=1).collect()}
    assert got["m"] == "a"
    # leaves each see only the center
    assert got["a"] == "m" and got["c"] == "m"


def test_trustrank_seeds_hold_mass(spark):
    """Star spam farm pointing at 'spam' vs a trusted chain: spam gets
    high uniform-PageRank in-mass but ~zero trust (no seed path)."""
    from baselinr_spark.operators.linkgraph import pagerank, trustrank

    edges = [("seed", "good1"), ("good1", "good2")]
    edges += [(f"farm{i}", "spam") for i in range(20)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    tr = {r["node"]: r["trust"]
          for r in trustrank(e, ["seed"], n_iter=8).collect()}
    pr = {r["node"]: r["rank"] for r in pagerank(e, n_iter=8).collect()}
    # uniform PageRank rewards the farm target...
    assert pr["spam"] > pr["good2"]
    # ...TrustRank does not: no trusted page links toward it
    assert tr["spam"] < 1e-9
    assert tr["good2"] > 0.1
    # total trust conserved (seeds reabsorb dangling mass)
    assert abs(sum(tr.values()) - 1.0) < 1e-9


def test_trustrank_seed_not_in_graph(spark):
    """A seed absent from the edge set still teleports its share —
    added as an isolated node, not silently dropped."""
    from baselinr_spark.operators.linkgraph import trustrank

    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    tr = {r["node"]: r["trust"]
          for r in trustrank(e, ["a", "ghost"], n_iter=3).collect()}
    assert "ghost" in tr and tr["ghost"] > 0
    assert abs(sum(tr.values()) - 1.0) < 1e-9
