"""Link-graph authority scoring (PageRank) for crawl prioritization.

A web-scale training-data pipeline weights documents by the authority
of their host domain (crawl-frontier prioritization, quality-classifier
feature, sampling weight). The reference repo has no graph surface —
its closest analogue is lineage BFS (`/root/reference/baselinr/query/
client.py` lineage traversal, recast in query/lineage) — so this module
is additive coverage, paired with the derived URL corpus
(functions/urltools.py).

Scale design (10^8 domains / 10^10 edges):

* All iteration state is the **(node, rank)** table — O(|nodes|), never
  O(|edges|). Each round is: ranks ⋈ edges (shuffle on src), groupBy
  dst with map-side partial aggregation (billion-in-degree hub domains
  collapse per map partition before the shuffle — the same
  hot-key-safe shape as `linededup.line_dedup`), then a LEFT join back
  to the node set so zero-in-degree nodes keep their teleport mass.
* The two per-round scalars (node count, dangling mass) ride as
  broadcast 1-row aggregates — in-plan, no driver round-trips inside
  the loop (house crossJoin rule: broadcast of a 1-row aggregate only).
* ``localCheckpoint`` per round bounds plan growth, as in
  `dedup.connected_components`.
* Convergence is fixed-iteration (power iteration contracts by the
  damping factor per round; 5-20 rounds is the standard web-graph
  budget) — deterministic, and exactly replayable by the unrolled-CTE
  DuckDB oracle.

Determinism: the only engine-order-sensitive value is the float sum of
contributions; rank magnitudes are O(1/N) with ~1e-16 addition error,
so the gate's round-to-6-decimals comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Distinct directed edges with self-loops removed — the PageRank
    input contract (parallel edges carry no extra weight)."""
    return (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank with uniform teleport and dangling-mass
    redistribution. Returns (node, rank); ranks sum to 1 every round.

    rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + dangling/N)
    """
    e = normalize_edges(edges, src_col, dst_col).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # outdeg rides on the node table (NULL = dangling) so each round is
    # one join against a single prepared relation.
    nd = nodes.join(outdeg, "node", "left").localCheckpoint()
    n_nodes = F.broadcast(nd.agg(F.count(F.lit(1)).alias("__n")))

    ranks = nd.crossJoin(n_nodes).select(
        "node", "outdeg", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(n_iter):
        dangling = F.broadcast(
            ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg").isNull(), F.col("rank"))),
                    F.lit(0.0),
                ).alias("__dangling")
            )
        )
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nd.join(contribs, "node", "left")
            .crossJoin(n_nodes)
            .crossJoin(dangling)
            .select(
                "node",
                "outdeg",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dangling") / F.col("__n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")


def oracle_pagerank_cte(
    edges_cte: str, n_iter: int = 5, damping: float = 0.85
) -> str:
    """CTE chain replaying `pagerank` exactly: ``edges_cte`` must be a
    SQL body producing (src, dst) BEFORE normalization; stages e / nodes
    / nd / nn / r0..r{n_iter} follow. Callers append a final SELECT over
    r{n_iter} (node, rank)."""
    d = damping
    parts = [
        f"rawe AS ({edges_cte})",
        "e AS (SELECT DISTINCT src, dst FROM rawe WHERE src != dst)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        """nd AS (
  SELECT n.node, od.outdeg
  FROM nodes n LEFT JOIN (SELECT src AS node, count(*) AS outdeg
                          FROM e GROUP BY 1) od USING (node)
)""",
        "nn AS (SELECT count(*)::double AS n FROM nd)",
        "r0 AS (SELECT node, outdeg, 1.0 / nn.n AS rank FROM nd, nn)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""dg{i} AS (
  SELECT coalesce(sum(CASE WHEN outdeg IS NULL THEN rank END), 0.0) AS dangling
  FROM r{i-1}
),
cb{i} AS (
  SELECT e.dst AS node, sum(r.rank / r.outdeg) AS contrib
  FROM r{i-1} r JOIN e ON r.node = e.src
  GROUP BY 1
),
r{i} AS (
  SELECT nd.node, nd.outdeg,
         (1.0 - {d}) / nn.n
         + {d} * (coalesce(cb{i}.contrib, 0.0) + dg{i}.dangling / nn.n) AS rank
  FROM nd LEFT JOIN cb{i} USING (node), nn, dg{i}
)"""
        )
    return "WITH " + ",\n".join(parts)


def hits(
    edges: DataFrame,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) by power iteration over the
    normalized edge set, L1-normalized each half-step so both score
    vectors sum to 1 (the L1 variant keeps every step a sum-aggregate —
    same fixed point direction as the textbook L2 form, and exactly
    replayable in SQL). Per round: auth'(v) = Σ_{u→v} hub(u), normalize;
    hub'(u) = Σ_{u→v} auth'(v), normalize. Nodes outside the edge set's
    reach keep score 0. Returns (node, hub, authority).

    Additive vs the reference (no reference graph-analysis surface
    beyond lineage traversal, visualization/graph_builder.py); the
    webtext use is seed-quality curation: high-authority domains anchor
    crawl frontier scoring alongside `pagerank` / `authority_weights`.

    Scale: state is O(nodes) with outdeg-style join shape identical to
    `pagerank` (one equi-join + one groupBy per half-step); the
    normalizer is a 1-row broadcast crossJoin (house rule,
    see module docstring).
    """
    e = normalize_edges(edges, src_col, dst_col).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    state = nodes.crossJoin(n_nodes).select(
        "node",
        (F.lit(1.0) / F.col("__n")).alias("hub"),
        (F.lit(1.0) / F.col("__n")).alias("authority"),
    )
    for _ in range(n_iter):
        auth_raw = (
            state.join(e, state["node"] == e["src"])
            .select(F.col("dst").alias("node"), F.col("hub").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("a_raw"))
        )
        a_tot = F.broadcast(auth_raw.agg(F.sum("a_raw").alias("__at")))
        auth = (
            nodes.join(auth_raw, "node", "left")
            .crossJoin(a_tot)
            .select(
                "node",
                F.when(
                    F.col("__at") > 0,
                    F.coalesce(F.col("a_raw"), F.lit(0.0)) / F.col("__at"),
                )
                .otherwise(0.0)
                .alias("authority"),
            )
        )
        hub_raw = (
            auth.join(e, auth["node"] == e["dst"])
            .select(F.col("src").alias("node"), F.col("authority").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("h_raw"))
        )
        h_tot = F.broadcast(hub_raw.agg(F.sum("h_raw").alias("__ht")))
        hub = (
            nodes.join(hub_raw, "node", "left")
            .crossJoin(h_tot)
            .select(
                "node",
                F.when(
                    F.col("__ht") > 0,
                    F.coalesce(F.col("h_raw"), F.lit(0.0)) / F.col("__ht"),
                )
                .otherwise(0.0)
                .alias("hub"),
            )
        )
        state = (
            nodes.join(hub, "node")
            .join(auth, "node")
            .select("node", "hub", "authority")
            .localCheckpoint()
        )
    return state


def oracle_hits_cte(edges_cte: str, n_iter: int = 5) -> str:
    """CTE chain replaying `hits` exactly; callers append a final SELECT
    over s{n_iter} (node, hub, authority).

    Every CTE is AS MATERIALIZED: each level references its
    predecessor through several paths (s{i} → hr{i} ×2 → a{i} ×3 →
    ar{i} ×2 → s{i-1}), so inlined CTEs re-evaluate the whole prefix
    ~6× per level — exponential in n_iter. Materialization makes the
    replay linear (measured: >10 min inlined vs <1 s materialized at
    n_iter=4 on the 37-node sf0.01 domain graph)."""
    parts = [
        f"rawe AS MATERIALIZED ({edges_cte})",
        "e AS MATERIALIZED "
        "(SELECT DISTINCT src, dst FROM rawe WHERE src != dst)",
        "nodes AS MATERIALIZED "
        "(SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT count(*)::double AS n FROM nodes)",
        "s0 AS MATERIALIZED "
        "(SELECT node, 1.0 / nn.n AS hub, 1.0 / nn.n AS authority "
        "FROM nodes, nn)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(s.hub) AS a_raw
  FROM s{i-1} s JOIN e ON s.node = e.src
  GROUP BY 1
),
at{i} AS MATERIALIZED (SELECT sum(a_raw) AS t FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN at{i}.t > 0
              THEN coalesce(ar{i}.a_raw, 0.0) / at{i}.t
              ELSE 0.0 END AS authority
  FROM nodes n LEFT JOIN ar{i} USING (node), at{i}
),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.authority) AS h_raw
  FROM a{i} a JOIN e ON a.node = e.dst
  GROUP BY 1
),
ht{i} AS MATERIALIZED (SELECT sum(h_raw) AS t FROM hr{i}),
s{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN ht{i}.t > 0
              THEN coalesce(hr{i}.h_raw, 0.0) / ht{i}.t
              ELSE 0.0 END AS hub,
         a{i}.authority
  FROM nodes n
  LEFT JOIN hr{i} USING (node)
  JOIN a{i} USING (node), ht{i}
)"""
        )
    return "WITH " + ",\n".join(parts)
