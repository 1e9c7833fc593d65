"""Lineage impact scorer: hand-computed diamond DAG
(A→{B,C}→D→dash, plus orphan O) covering every score component,
boost rule, position, and the greedy critical path."""

import math

import pytest

from baselinr_spark.operators.lineage_impact import (
    descendant_sets, greedy_critical_path_from_edges, lineage_impact,
    node_depths,
)


@pytest.fixture(scope="module")
def graph(spark):
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "dash")],
        "upstream_table string, downstream_table string",
    )
    nodes = spark.createDataFrame(
        [("A", "source"), ("B", "staging"), ("C", "staging"),
         ("D", "mart"), ("dash", "dashboard"), ("O", "source")],
        "table string, node_type string",
    )
    return edges, nodes


def test_descendant_sets_and_depths(spark, graph):
    edges, _ = graph
    ds = {r["node"]: sorted(r["ds"]) for r in descendant_sets(edges).collect()}
    assert ds["A"] == ["B", "C", "D", "dash"]
    assert ds["B"] == ["D", "dash"]
    assert ds["D"] == ["dash"]
    assert "dash" not in ds  # leaves have no descendant row
    dp = {r["node"]: r["depth"] for r in node_depths(edges).collect()}
    assert dp == {"A": 0, "B": 1, "C": 1, "D": 2, "dash": 3}


def test_node_depths_one_round_trip_per_iteration(spark, graph, monkeypatch):
    """Convergence costs exactly ONE driver aggregate per round: the
    (count, sum) signature of the new frame; the previous round's pair
    is remembered, never recomputed. Diamond depth 3 -> 1 initial
    signature + 4 propagation rounds (3 growth + 1 fixed-point) = 5."""
    import baselinr_spark.operators.lineage_impact as li

    edges, _ = graph
    calls = {"n": 0}
    real = li._depth_signature

    def counting(df):
        calls["n"] += 1
        return real(df)

    monkeypatch.setattr(li, "_depth_signature", counting)
    li.node_depths(edges)
    assert calls["n"] == 5


def test_impact_scores_hand_computed(spark, graph):
    edges, nodes = graph
    out = {r["table"]: r for r in lineage_impact(edges, nodes).collect()}
    assert set(out) == {"A", "B", "C", "D", "dash", "O"}

    a = out["A"]
    assert a["position"] == "root"
    assert a["total_downstream"] == 4
    assert a["fanout_factor"] == 1  # one reachable leaf (dash)
    assert a["exposures_affected"] == 1
    assert a["critical_assets_affected"] == 2  # dash + mart D
    assert a["estimated_user_impact"] == "MEDIUM"
    assert a["downstream_score"] == pytest.approx(1.0)  # log5/log5
    assert a["depth_score"] == pytest.approx(1.0)  # (3-0)/3
    # criticality: (1 exposure + 0.5*1 mart)/4 descendants
    assert a["criticality_score"] == pytest.approx(0.375)
    assert a["fanout_score"] == pytest.approx(1.0)
    # boosts: root 1.25, then high-fanout ×1.15
    assert a["boost_factor"] == pytest.approx(1.25 * 1.15)
    raw = 0.4 * 1.0 + 0.3 * 0.375 + 0.2 * 1.0 + 0.1 * 1.0
    assert a["total_score"] == pytest.approx(min(1.0, raw * 1.25 * 1.15))

    d = out["D"]
    assert d["position"] == "intermediate"
    assert d["total_downstream"] == 1
    assert d["downstream_score"] == pytest.approx(
        math.log(2) / math.log(5), abs=1e-6)
    assert d["depth_score"] == pytest.approx(1 / 3, abs=1e-6)
    assert d["criticality_score"] == pytest.approx(1.0)  # dash/1, capped
    assert d["boost_factor"] == pytest.approx(1.15)  # high fanout only

    o = out["O"]
    assert o["position"] == "orphaned"
    assert o["estimated_user_impact"] == "NONE"
    assert o["boost_factor"] == pytest.approx(0.5)
    assert o["total_score"] == pytest.approx(0.2 * 1.0 * 0.5)  # depth only

    leaf = out["dash"]
    assert leaf["position"] == "leaf"
    assert leaf["boost_factor"] == pytest.approx(0.6)
    # exposure with no downstream: criticality 1.0, everything else 0
    assert leaf["criticality_score"] == pytest.approx(1.0)
    assert leaf["depth_score"] == pytest.approx(0.0)
    assert leaf["total_score"] == pytest.approx(0.3 * 1.0 * 0.6)


def test_greedy_critical_path(spark, graph):
    edges, _ = graph
    # A is the only non-orphan root; B and C tie on total_downstream=2
    # → lexicographically smaller B; then D → dash
    assert greedy_critical_path_from_edges(edges) == ["A", "B", "D", "dash"]


def test_critical_path_boost_applied(spark, graph):
    edges, nodes = graph
    path = greedy_critical_path_from_edges(edges)
    out = {r["table"]: r
           for r in lineage_impact(edges, nodes,
                                   critical_path=path).collect()}
    assert out["B"]["is_critical_path"] and not out["C"]["is_critical_path"]
    # B: ×1.20 critical-path on top of its ×1.15 high-fanout boost
    # (every node here reaches the single leaf, so fanout == max_fanout)
    assert out["B"]["boost_factor"] == pytest.approx(1.20 * 1.15)
    assert out["C"]["boost_factor"] == pytest.approx(1.15)
    # A: root floor 1.25, ×1.20 critical, ×1.15 high-fanout
    assert out["A"]["boost_factor"] == pytest.approx(1.25 * 1.20 * 1.15)
