"""Lineage graph export — the serializable nodes+edges graph the
reference's visualization layer builds, as one long-format DataFrame.

Recasts /root/reference/baselinr/visualization/graph_builder.py
(LineageGraphBuilder.build_table_graph:146-215, LineageGraph:73-117):
the reference walks the lineage table per node via LineageQueryClient,
accumulates driver-side dataclass lists, then back-fills edges with a
full-table scan keeping only pairs whose endpoints are in the node map
(graph_builder.py:455-541). Here the same graph comes from two
level-synchronous BFS closures (query/lineage.py — O(depth) joins, not
O(nodes) queries) plus ONE semi-join of the edge table against the node
set; at catalog scale (10^6 tables) the node set of a bounded-depth
neighborhood is small, so both endpoint probes broadcast.

Output is long format (`kind` = 'node' | 'edge') so a single DataFrame
carries the whole graph to any exporter (JSON/mermaid/graphviz in the
reference — visualization/exporters/); levels are the signed hop
distance from the root (upstream negative, root 0, downstream
positive), which is exactly the left-to-right layering the reference's
layout.py derives from node depth metadata.

Semantics matched to the reference:
- node identity dedup: a table reachable both upstream and downstream
  keeps ONE node row (graph_builder.py nodes_dict) — here the minimal
  |level|, ties to the upstream side, which is deterministic where the
  reference keeps whichever direction it processed first.
- `is_root` marks the root node (metadata {"is_root": True}).
- edge back-fill: every edge of the input whose BOTH endpoints are in
  the node set is emitted (graph_builder.py:497-516), not just the
  tree edges the traversal walked.
- confidence filter: edges below `min_confidence` are dropped and
  nodes left unreferenced (except the root) are pruned
  (LineageGraph.filter_by_confidence:98-117).
- impact annotation: optional (table, score) frame left-joined onto
  node rows (the add_drift_annotations / metrics-annotation pattern,
  graph_builder.py:290-346, generalized to any per-table score).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.query.lineage import (
    get_downstream_tables,
    get_upstream_tables,
)


def lineage_graph_export(
    edges: DataFrame,
    root_table: str,
    *,
    direction: str = "both",
    max_depth: int = 3,
    min_confidence: float = 0.0,
    annotations: DataFrame | None = None,
) -> DataFrame:
    """Bounded-neighborhood lineage graph around ``root_table``.

    ``edges``: (upstream_table, downstream_table, lineage_type,
    confidence_score). ``max_depth`` counts hops from the root (the
    reference's max_depth). ``annotations``: optional ("table",
    "score") per-table frame; node rows carry it as ``impact_score``.

    Returns (kind, id, source, target, label, level, is_root,
    relationship_type, confidence, impact_score): node rows have
    source/target/relationship_type/confidence null; edge rows have
    id/label/level/is_root/impact_score null.
    """
    spark = edges.sparkSession
    if direction not in ("upstream", "downstream", "both"):
        raise ValueError(f"direction must be upstream|downstream|both: {direction}")

    # closure depth convention in query/lineage.py: depth 0 = direct
    # neighbors, so hop = depth + 1 and max_depth hops = depth max_depth-1
    levels = [
        spark.createDataFrame([(root_table, 0)], "id string, level int")
    ]
    if direction in ("upstream", "both"):
        up = get_upstream_tables(edges, root_table, max_depth=max_depth - 1)
        levels.append(
            up.select(
                F.col("table").alias("id"),
                (-(F.col("depth") + 1)).cast("int").alias("level"),
            )
        )
    if direction in ("downstream", "both"):
        dn = get_downstream_tables(edges, root_table, max_depth=max_depth - 1)
        levels.append(
            dn.select(
                F.col("table").alias("id"),
                (F.col("depth") + 1).cast("int").alias("level"),
            )
        )
    all_levels = levels[0]
    for lv in levels[1:]:
        all_levels = all_levels.unionByName(lv)
    # one node per id: minimal |level|, upstream (negative) on ties —
    # min over (|level|, level) structs is exactly that ordering
    nodes = (
        all_levels.groupBy("id")
        .agg(F.min(F.struct(F.abs("level").alias("a"), F.col("level").alias("l"))).alias("m"))
        .select("id", F.col("m.l").alias("level"))
    )

    # edge back-fill: both endpoints in the node set; the node set is a
    # bounded neighborhood, so both probes broadcast
    ids = nodes.select("id")
    graph_edges = (
        edges.join(
            F.broadcast(ids.withColumnRenamed("id", "upstream_table")),
            "upstream_table",
        )
        .join(
            F.broadcast(ids.withColumnRenamed("id", "downstream_table")),
            "downstream_table",
        )
        .where(F.col("confidence_score") >= F.lit(float(min_confidence)))
        .select(
            F.col("upstream_table").alias("source"),
            F.col("downstream_table").alias("target"),
            F.col("lineage_type").alias("relationship_type"),
            F.round(F.col("confidence_score"), 6).alias("confidence"),
        )
        .distinct()
    )

    if min_confidence > 0.0:
        referenced = (
            graph_edges.select(F.col("source").alias("id"))
            .unionByName(graph_edges.select(F.col("target").alias("id")))
            .distinct()
        )
        nodes = nodes.join(F.broadcast(referenced), "id", "left_semi").unionByName(
            nodes.where(F.col("id") == root_table)
        ).distinct()

    if annotations is not None:
        ann = annotations.select(
            F.col("table").alias("id"),
            F.col("score").cast("double").alias("impact_score"),
        )
        nodes = nodes.join(F.broadcast(ann), "id", "left")
    else:
        nodes = nodes.withColumn("impact_score", F.lit(None).cast("double"))

    node_rows = nodes.select(
        F.lit("node").alias("kind"),
        F.col("id"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("target"),
        F.col("id").alias("label"),
        F.col("level"),
        (F.col("id") == root_table).alias("is_root"),
        F.lit(None).cast("string").alias("relationship_type"),
        F.lit(None).cast("double").alias("confidence"),
        F.col("impact_score"),
    )
    edge_rows = graph_edges.select(
        F.lit("edge").alias("kind"),
        F.lit(None).cast("string").alias("id"),
        F.col("source"),
        F.col("target"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("int").alias("level"),
        # false, not null: cross-engine null-boolean representations
        # diverge (None vs NaN) and edges are never the root anyway
        F.lit(False).alias("is_root"),
        F.col("relationship_type"),
        F.col("confidence"),
        F.lit(None).cast("double").alias("impact_score"),
    )
    return node_rows.unionByName(edge_rows)


# ---------------------------------------------------------------- exporters
# The graph DataFrame is a bounded root-neighborhood (max_depth hops),
# so rendering collects it to the driver — an export artifact is small
# by construction even when the catalog is 10^6 tables. Recasts of
# /root/reference/baselinr/visualization/exporters/{mermaid_exporter.py,
# graphviz_exporter.py,json_exporter.py}; output is DETERMINISTIC
# (nodes ordered by (level, id), edges by (source, target)) where the
# reference renders in dict-insertion order.

def _split(graph: DataFrame) -> tuple[list, list, str | None]:
    rows = graph.collect()
    nodes = sorted(
        (r for r in rows if r["kind"] == "node"),
        key=lambda r: (r["level"], r["id"]),
    )
    edges = sorted(
        (r for r in rows if r["kind"] == "edge"),
        key=lambda r: (r["source"], r["target"]),
    )
    root = next((r["id"] for r in nodes if r["is_root"]), None)
    return nodes, edges, root


def _safe(node_id: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", node_id)


def to_mermaid(graph: DataFrame, direction: str = "TD") -> str:
    """Mermaid diagram (mermaid_exporter.py:31-112): root label bolded,
    edge arrow style by confidence (solid ≥0.8, dotted ≥0.5, faint
    below), confidence appended to the edge label when < 1.0."""
    nodes, edges, _ = _split(graph)
    lines = [f"graph {direction}"]
    for n in nodes:
        label = f"**{n['label']}**" if n["is_root"] else n["label"]
        lines.append(f"    {_safe(n['id'])}[{label}]")
    for e in edges:
        label = e["relationship_type"]
        conf = e["confidence"] if e["confidence"] is not None else 1.0
        if conf < 1.0:
            label += f" ({conf:.2f})"
        arrow = "-->|" if conf >= 0.8 else ("-.->|" if conf >= 0.5 else "-.-|")
        lines.append(f"    {_safe(e['source'])} {arrow}{label}|{_safe(e['target'])}")
    return "\n".join(lines)


def to_dot(graph: DataFrame, rankdir: str = "LR") -> str:
    """Graphviz DOT (graphviz_exporter.py:40-145): one node statement
    per table (root gets penwidth=2), one edge statement with the
    relationship label; dashed style below 0.8 confidence."""
    nodes, edges, _ = _split(graph)
    lines = [f'digraph lineage {{', f'    rankdir={rankdir};',
             '    node [shape=box];']
    for n in nodes:
        attrs = [f'label="{n["label"]}"']
        if n["is_root"]:
            attrs.append("penwidth=2")
        if n["impact_score"] is not None:
            attrs.append(f'tooltip="impact={n["impact_score"]:.4f}"')
        lines.append(f'    {_safe(n["id"])} [{", ".join(attrs)}];')
    for e in edges:
        conf = e["confidence"] if e["confidence"] is not None else 1.0
        attrs = [f'label="{e["relationship_type"]}"']
        if conf < 0.8:
            attrs.append("style=dashed")
        lines.append(
            f'    {_safe(e["source"])} -> {_safe(e["target"])} '
            f'[{", ".join(attrs)}];'
        )
    lines.append("}")
    return "\n".join(lines)


def to_json(graph: DataFrame, direction: str = "both") -> str:
    """LineageGraph.to_dict JSON shape (graph_builder.py:73-90 /
    json_exporter.py): {nodes, edges, root_id, direction}, with the
    level carried in each node's metadata like the reference's depth."""
    nodes, edges, root = _split(graph)
    doc = {
        "nodes": [
            {
                "id": n["id"], "type": "table", "label": n["label"],
                "metadata": {"level": n["level"], "is_root": bool(n["is_root"])},
                "metrics": (
                    {"impact_score": n["impact_score"]}
                    if n["impact_score"] is not None else None
                ),
            }
            for n in nodes
        ],
        "edges": [
            {
                "source": e["source"], "target": e["target"],
                "relationship_type": e["relationship_type"],
                "confidence": e["confidence"],
            }
            for e in edges
        ],
        "root_id": root,
        "direction": direction,
    }
    return json.dumps(doc, indent=2, sort_keys=True)
