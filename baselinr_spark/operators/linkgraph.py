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
