"""Lineage graph export tests (reference graph_builder semantics:
nodes_dict dedup, edge back-fill, confidence filter, root retention)."""

from pyspark.sql import Row

from baselinr_spark.operators.graph_export import lineage_graph_export


def _edges(spark, rows):
    return spark.createDataFrame(
        [Row(upstream_table=u, downstream_table=d, lineage_type=t,
             confidence_score=c) for (u, d, t, c) in rows]
    )


DIAMOND = [
    ("src_a", "stg", "fk", 1.0),
    ("src_b", "stg", "fk", 0.8),
    ("stg", "mart", "aggregation", 1.0),
    ("mart", "dash", "exposure", 0.6),
    ("other", "elsewhere", "fk", 1.0),
]


def test_graph_levels_root_and_backfill(spark):
    out = lineage_graph_export(_edges(spark, DIAMOND), "stg", max_depth=2)
    rows = out.collect()
    nodes = {r["id"]: r for r in rows if r["kind"] == "node"}
    edges = {(r["source"], r["target"]) for r in rows if r["kind"] == "edge"}
    # 2 hops both ways from stg: sources at -1, mart +1, dash +2
    assert {k: v["level"] for k, v in nodes.items()} == {
        "src_a": -1, "src_b": -1, "stg": 0, "mart": 1, "dash": 2,
    }
    assert nodes["stg"]["is_root"] and not nodes["mart"]["is_root"]
    # back-fill: every edge within the neighborhood, none outside
    assert edges == {("src_a", "stg"), ("src_b", "stg"),
                     ("stg", "mart"), ("mart", "dash")}


def test_graph_confidence_filter_prunes_unreferenced(spark):
    out = lineage_graph_export(
        _edges(spark, DIAMOND), "stg", max_depth=2, min_confidence=0.9
    )
    rows = out.collect()
    node_ids = {r["id"] for r in rows if r["kind"] == "node"}
    edges = {(r["source"], r["target"]) for r in rows if r["kind"] == "edge"}
    # 0.8 and 0.6 edges dropped; dash and src_b lose their only edge and
    # are pruned; the root always survives (filter_by_confidence)
    assert edges == {("src_a", "stg"), ("stg", "mart")}
    assert node_ids == {"src_a", "stg", "mart"}


def test_graph_dual_reachability_dedups_upstream_first(spark):
    # cycle stg -> mart -> stg: mart is downstream at +1 AND upstream at
    # -1 of the root; exactly one node row survives, the upstream one
    cyc = [("stg", "mart", "fk", 1.0), ("mart", "stg", "fk", 1.0)]
    out = lineage_graph_export(_edges(spark, cyc), "stg", max_depth=3)
    mart = [r for r in out.collect() if r["kind"] == "node" and r["id"] == "mart"]
    assert len(mart) == 1 and mart[0]["level"] == -1


def test_graph_annotations_and_direction(spark):
    ann = spark.createDataFrame([Row(table="mart", score=0.75)])
    out = lineage_graph_export(
        _edges(spark, DIAMOND), "stg", direction="downstream",
        max_depth=1, annotations=ann,
    )
    rows = out.collect()
    nodes = {r["id"]: r for r in rows if r["kind"] == "node"}
    # downstream-only, one hop: no sources, no dash
    assert set(nodes) == {"stg", "mart"}
    assert nodes["mart"]["impact_score"] == 0.75
    assert nodes["stg"]["impact_score"] is None


def test_exporters_render_deterministic(spark):
    import json

    from baselinr_spark.operators.graph_export import (
        to_dot, to_json, to_mermaid,
    )

    ann = spark.createDataFrame([Row(table="stg", score=0.5)])
    g = lineage_graph_export(_edges(spark, DIAMOND), "stg", max_depth=1,
                             annotations=ann)

    mer = to_mermaid(g, direction="LR")
    lines = mer.split("\n")
    assert lines[0] == "graph LR"
    # nodes ordered by (level, id): sources first, bold root, then mart
    assert lines[1:4] == ["    src_a[src_a]", "    src_b[src_b]",
                          "    stg[**stg**]"]
    assert "    src_b -->|fk (0.80)|stg" in mer    # 0.8 -> solid + conf
    assert "    src_a -->|fk|stg" in mer           # 1.0 -> solid, no conf
    assert "    stg -->|aggregation|mart" in mer

    dot = to_dot(g)
    assert dot.startswith("digraph lineage {")
    assert '    stg [label="stg", penwidth=2, tooltip="impact=0.5000"];' in dot
    assert '    src_b -> stg [label="fk"];' in dot  # 0.8: at the solid cutoff
    assert '    src_a -> stg [label="fk"];' in dot
    assert dot.rstrip().endswith("}")

    doc = json.loads(to_json(g))
    assert doc["root_id"] == "stg"
    assert [n["id"] for n in doc["nodes"]] == ["src_a", "src_b", "stg", "mart"]
    assert doc["nodes"][2]["metrics"] == {"impact_score": 0.5}
    assert doc["nodes"][0]["metrics"] is None
    assert {(e["source"], e["target"]) for e in doc["edges"]} == {
        ("src_a", "stg"), ("src_b", "stg"), ("stg", "mart"),
    }
