"""Lineage-aware impact scoring — blast radius + weighted impact score
for every table in a lineage DAG, as iterative DataFrame propagation.

Recasts /root/reference/baselinr/smart_selection/lineage/
{graph.py,impact_scorer.py} (~1.1k LoC of driver-side DFS per node):
the reference builds an in-memory node map and walks DFS from EVERY
node to count transitive descendants (graph.py:202-222), BFS from roots
for depth (graph.py:247-277), then scores each node
(impact_scorer.py:202-392). Here the same metrics come from
level-synchronous set propagation — O(graph depth) distributed joins
for the whole catalog, the same shape as `dedup.connected_components` —
so a million-table catalog scores in ~depth jobs instead of N·E
driver-side walks.

Scoring parity (impact_scorer.py):
- downstream_score = log(1+total_downstream)/log(1+max_downstream) (:262-275)
- depth_score = (max_depth - depth)/max_depth, 0.5 when max_depth=0 (:277-290)
- criticality = (1.0·exposures + 0.5·marts among descendants)/|descendants|,
  capped at 1; no descendants → 1.0 iff the node itself is an exposure (:292-319)
- fanout_score = fanout/max_fanout; fanout = # leaf nodes reachable
  (graph.py:213-222 via _get_leaf_descendants — equals the count of
  leaves in the descendant set)
- total = 0.4·downstream + 0.3·criticality + 0.2·depth + 0.1·fanout,
  then boosts: root 1.25 (floor), critical-path ×1.20, high-fanout
  (>0.5·max) ×1.15, leaf cap 0.60, orphan cap 0.50; min(1, ·) (:202-221,:330-355)
- blast radius: immediate/total downstream, critical assets = exposures
  + marts (each counted 1 here, unlike the 0.5-mart criticality
  weighting — the reference does the same, :357-392), user impact bands
  NONE/LOW/MEDIUM(≤2)/HIGH(≤5)/CRITICAL.

Documented deviations:
- `critical_path_member`: the reference enumerates up to 100 root→leaf
  paths per root driver-side and marks the global top-3 by summed
  total_downstream (graph.py:333-358) — path enumeration is exponential
  and cannot scale. `greedy_critical_path` marks the path found by
  steepest-descent on total_downstream from the best root (ties →
  lexicographically smallest), which selects the same path whenever the
  top path is locally dominant; off by default in the gate query and
  unit-tested against hand-computed graphs.
- node types are caller-provided (the reference infers them from dbt
  metadata / name conventions in graph.py:279-331; the parquet world
  has no dbt manifest, so the adapter input IS the type source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXPOSURE_TYPES = ("exposure", "dashboard", "report", "notebook", "ml_model")

WEIGHTS = {"downstream": 0.4, "criticality": 0.3, "depth": 0.2,
           "fanout": 0.1}
BOOSTS = {"root": 1.25, "critical_path": 1.20, "high_fanout": 1.15,
          "leaf": 0.60, "orphan": 0.50}


def _edge_pairs(edges: DataFrame) -> DataFrame:
    return (edges.select(F.col("upstream_table").alias("src"),
                         F.col("downstream_table").alias("dst"))
            .where(F.col("src") != F.col("dst")).distinct())


def descendant_sets(edges: DataFrame, max_iters: int = 30) -> DataFrame:
    """(node, ds: array<string>) — every transitive descendant of every
    node, by iterating ds_{k+1}(n) = children(n) ∪ ⋃_{c} ds_k(c) until
    the total set size stops growing (≤ graph depth iterations). Each
    round is one join + one groupBy; localCheckpoint truncates the
    growing plan. Set payload per node is its descendant list — the
    inherent output size of transitive closure, not a blowup."""
    e = _edge_pairs(edges).persist()
    empty = F.array().cast("array<string>")
    desc = (e.groupBy("src").agg(F.collect_set("dst").alias("ds"))
            .withColumnRenamed("src", "node").localCheckpoint())
    total = desc.select(F.sum(F.size("ds"))).collect()[0][0] or 0
    for _ in range(max_iters):
        child = desc.select(F.col("node").alias("dst"),
                            F.col("ds").alias("child_ds"))
        desc = (
            e.join(child, "dst", "left")
            .groupBy("src")
            .agg(F.array_distinct(F.flatten(F.collect_list(
                F.concat(F.array(F.col("dst")),
                         F.coalesce(F.col("child_ds"), empty))
            ))).alias("ds"))
            .withColumnRenamed("src", "node")
            .localCheckpoint()
        )
        new_total = desc.select(F.sum(F.size("ds"))).collect()[0][0] or 0
        if new_total == total:
            break
        total = new_total
    e.unpersist()
    return desc


def _depth_signature(depth: DataFrame) -> tuple:
    """(node count, total depth) in ONE aggregate — the convergence
    witness for node_depths. Count can only grow and per-node min depth
    only shrink, so an unchanged pair means a fixed point."""
    r = depth.agg(
        F.count(F.lit(1)).alias("c"), F.sum("depth").alias("s")
    ).collect()[0]
    return (r["c"], r["s"])


def node_depths(edges: DataFrame, max_iters: int = 30) -> DataFrame:
    """(node, depth) — BFS min-depth from roots (graph.py:247-277):
    roots at 0, each child at min(parent)+1; min-propagated until
    stable. Nodes unreachable from any root default to 0 like the
    reference. One driver round trip per iteration: the convergence
    check is a single (count, sum) aggregate over the NEW frame,
    compared against the previous round's remembered pair — the old
    frame is never re-aggregated."""
    e = _edge_pairs(edges).persist()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select("dst")).distinct())
    roots = nodes.join(e.select(F.col("dst").alias("node")).distinct(),
                       "node", "left_anti")
    depth = roots.withColumn("depth", F.lit(0)).localCheckpoint()
    sig = _depth_signature(depth)
    for _ in range(max_iters):
        step = (
            e.join(depth.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    (F.col("depth") + 1).alias("depth"))
        )
        new = (depth.unionByName(step).groupBy("node")
               .agg(F.min("depth").alias("depth")).localCheckpoint())
        new_sig = _depth_signature(new)
        depth = new
        if new_sig == sig:
            break
        sig = new_sig
    e.unpersist()
    # unreached (cycle-trapped) nodes → 0, reference graph.py:275-277
    return (nodes.join(depth, "node", "left")
            .select("node", F.coalesce("depth", F.lit(0)).alias("depth")))


def lineage_impact(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    critical_path: list[str] | None = None,
    max_iters: int = 30,
) -> DataFrame:
    """Score every node of the lineage DAG. ``edges`` has
    (upstream_table, downstream_table); optional ``nodes`` has
    (table, node_type) and may list isolated tables (scored as
    orphans). ``critical_path`` marks those tables as critical-path
    members (see `greedy_critical_path`)."""
    e = _edge_pairs(edges)
    endpoints = (e.select(F.col("src").alias("table"))
                 .union(e.select("dst")).distinct())
    if nodes is not None:
        allnodes = (nodes.select("table", "node_type")
                    .unionByName(endpoints.withColumn(
                        "node_type", F.lit(None).cast("string")))
                    .groupBy("table")
                    .agg(F.max("node_type").alias("node_type")))
    else:
        allnodes = endpoints.withColumn("node_type",
                                        F.lit(None).cast("string"))
    allnodes = allnodes.withColumn(
        "node_type", F.coalesce("node_type", F.lit("unknown")))

    upc = e.groupBy(F.col("dst").alias("table")).agg(
        F.count(F.lit(1)).alias("upstream_count"))
    dnc = e.groupBy(F.col("src").alias("table")).agg(
        F.count(F.lit(1)).alias("downstream_count"))
    desc = descendant_sets(e.select(
        F.col("src").alias("upstream_table"),
        F.col("dst").alias("downstream_table")), max_iters)
    depths = node_depths(e.select(
        F.col("src").alias("upstream_table"),
        F.col("dst").alias("downstream_table")), max_iters)

    g = (
        allnodes
        .join(upc, "table", "left")
        .join(dnc, "table", "left")
        .join(desc.withColumnRenamed("node", "table"), "table", "left")
        .join(depths.withColumnRenamed("node", "table"), "table", "left")
        .fillna({"upstream_count": 0, "downstream_count": 0, "depth": 0})
        .withColumn("ds", F.coalesce("ds", F.array().cast("array<string>")))
        .withColumn("total_downstream", F.size("ds"))
        .withColumn("is_root", F.col("upstream_count") == 0)
        .withColumn("is_leaf", F.col("downstream_count") == 0)
        .withColumn("is_orphaned", F.col("is_root") & F.col("is_leaf"))
    )

    # per-descendant type lookups: explode the sets once, join the tiny
    # type table, re-aggregate — leaf/exposure/mart counts per node
    leaves = g.where("is_leaf").select(F.col("table").alias("d"))
    types = allnodes.select(F.col("table").alias("d"), "node_type")
    ex = g.select("table", F.explode_outer("ds").alias("d"))
    ex = (
        ex.join(leaves.withColumn("__leaf", F.lit(1)), "d", "left")
        .join(types.withColumnRenamed("node_type", "d_type"), "d", "left")
        .groupBy("table")
        .agg(
            F.sum(F.coalesce("__leaf", F.lit(0))).alias("fanout_factor"),
            F.sum(F.when(F.col("d_type").isin(*EXPOSURE_TYPES), 1)
                  .otherwise(0)).alias("n_exposures"),
            F.sum(F.when(F.col("d_type") == "mart", 1).otherwise(0))
            .alias("n_marts"),
        )
    )
    g = g.join(ex, "table", "left").fillna(
        {"fanout_factor": 0, "n_exposures": 0, "n_marts": 0})

    gmax = g.agg(
        F.greatest(F.max("total_downstream"), F.lit(1)).alias("max_down"),
        F.greatest(F.max("fanout_factor"), F.lit(1)).alias("max_fanout"),
        F.max("depth").alias("max_depth"),
    )
    g = g.crossJoin(F.broadcast(gmax))

    td = F.col("total_downstream").cast("double")
    down_score = F.when(
        F.col("total_downstream") == 0, 0.0
    ).otherwise(F.least(
        F.lit(1.0),
        F.log(F.lit(1.0) + td) / F.log(1.0 + F.col("max_down").cast("double")),
    ))
    depth_score = F.when(F.col("max_depth") == 0, 0.5).otherwise(
        (F.col("max_depth") - F.col("depth")).cast("double")
        / F.col("max_depth").cast("double"))
    crit_weighted = F.col("n_exposures") + 0.5 * F.col("n_marts")
    crit_score = F.when(
        F.col("total_downstream") == 0,
        F.when(F.col("node_type").isin(*EXPOSURE_TYPES), 1.0).otherwise(0.0),
    ).otherwise(F.least(F.lit(1.0), crit_weighted / td))
    fan_score = F.when(F.col("fanout_factor") == 0, 0.0).otherwise(
        F.least(F.lit(1.0),
                F.col("fanout_factor").cast("double")
                / F.col("max_fanout").cast("double")))

    is_crit = (F.col("table").isin(*critical_path) if critical_path
               else F.lit(False))
    boost = F.lit(1.0)
    boost = F.when(F.col("is_root") & ~F.col("is_orphaned"),
                   F.greatest(boost, F.lit(BOOSTS["root"]))).otherwise(boost)
    boost = F.when(is_crit, boost * BOOSTS["critical_path"]).otherwise(boost)
    boost = F.when(
        F.col("fanout_factor") > F.col("max_fanout") * 0.5,
        boost * BOOSTS["high_fanout"]).otherwise(boost)
    boost = F.when(F.col("is_leaf") & ~F.col("is_root"),
                   F.least(boost, F.lit(BOOSTS["leaf"]))).otherwise(boost)
    boost = F.when(F.col("is_orphaned"),
                   F.least(boost, F.lit(BOOSTS["orphan"]))).otherwise(boost)

    total = (WEIGHTS["downstream"] * down_score
             + WEIGHTS["criticality"] * crit_score
             + WEIGHTS["depth"] * depth_score
             + WEIGHTS["fanout"] * fan_score)

    n_crit_assets = F.col("n_exposures") + F.col("n_marts")
    impact_band = (
        F.when((n_crit_assets == 0) & (F.col("total_downstream") == 0),
               "NONE")
        .when(n_crit_assets == 0, "LOW")
        .when(n_crit_assets <= 2, "MEDIUM")
        .when(n_crit_assets <= 5, "HIGH")
        .otherwise("CRITICAL")
    )
    position = (
        F.when(F.col("is_orphaned"), "orphaned")
        .when(F.col("is_root"), "root")
        .when(F.col("is_leaf"), "leaf")
        .otherwise("intermediate")
    )

    return g.select(
        "table", "node_type",
        position.alias("position"),
        "depth", "upstream_count", "downstream_count",
        "total_downstream",
        F.col("fanout_factor").cast("int").alias("fanout_factor"),
        F.col("n_exposures").cast("int").alias("exposures_affected"),
        n_crit_assets.cast("int").alias("critical_assets_affected"),
        impact_band.alias("estimated_user_impact"),
        F.round(down_score, 6).alias("downstream_score"),
        F.round(depth_score, 6).alias("depth_score"),
        F.round(crit_score, 6).alias("criticality_score"),
        F.round(fan_score, 6).alias("fanout_score"),
        F.round(boost, 6).alias("boost_factor"),
        F.round(F.least(F.lit(1.0), total * boost), 6).alias("total_score"),
        is_crit.alias("is_critical_path"),
    )


def greedy_critical_path_from_edges(
    edges: DataFrame, max_steps: int = 100
) -> list[str]:
    """The scalable critical-path recast (see module docstring): start
    at the root with the largest total_downstream (tie → lexical min),
    repeatedly step to the child with the largest total_downstream,
    stop at a leaf. ≤ graph-depth tiny lookups, each O(1) rows."""
    metrics = lineage_impact(edges).select(
        "table", "total_downstream", "is_critical_path", "position"
    ).persist()
    e = _edge_pairs(edges).persist()
    start = (metrics.where(F.col("position") == "root")
             .orderBy(F.desc("total_downstream"), F.asc("table"))
             .limit(1).collect())
    if not start:
        e.unpersist(); metrics.unpersist()
        return []
    path = [start[0]["table"]]
    for _ in range(max_steps):
        nxt = (
            e.where(F.col("src") == path[-1])
            .join(metrics.withColumnRenamed("table", "dst"), "dst")
            .orderBy(F.desc("total_downstream"), F.asc("dst"))
            .limit(1).collect()
        )
        if not nxt:
            break
        path.append(nxt[0]["dst"])
    e.unpersist()
    metrics.unpersist()
    return path
