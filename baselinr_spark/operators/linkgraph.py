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


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simplification of the link graph — the standard
    community-structure signal for crawl curation (link farms show
    near-clique clustering; legitimate hub domains have low local
    clustering at high degree).

    Returns one row per node with degree >= 1:
    (node, degree, triangles, clustering) where
    clustering = 2*T_v / (deg_v * (deg_v - 1)) and 0.0 when deg < 2.

    Scale design (10^8 nodes / 10^10 edges): the classic
    degree-orientation join (Suri & Vassilvitskii 2011, "Counting
    triangles and the curse of the last reducer") — each undirected
    edge is oriented from its (degree, node)-smaller endpoint to the
    larger, capping every node's oriented out-degree at O(sqrt(m)); the
    wedge self-join then generates only oriented wedges, and one
    equi-join against the oriented edge set closes them. No node ever
    fans out by its full (possibly 10^7) degree. Each triangle is
    counted exactly once, then exploded back to its 3 corners for the
    per-node table.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    # orient from (degree, node)-smaller endpoint to larger
    ranked = und.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("w1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "u").filter(F.col("w1") < F.col("w2"))
    # the closing edge: w1 < w2 means (w1, w2) is exactly und's
    # (least, greatest) key — no orientation fan-out needed
    closer = und.select(F.col("a").alias("w1"), F.col("b").alias("w2"))
    tris = wedges.join(closer, ["w1", "w2"])  # (u, w1, w2) each exactly once
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("w1").alias("node")))
        .unionAll(tris.select(F.col("w2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = deg.join(corners, "node", "left").select(
        "node",
        F.col("degree").cast("bigint").alias("degree"),
        F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint").alias("triangles"),
    )
    return out.select(
        "node",
        "degree",
        "triangles",
        F.when(
            F.col("degree") >= 2,
            F.lit(2.0)
            * F.col("triangles").cast("double")
            / (F.col("degree").cast("double") * (F.col("degree") - 1).cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def oracle_triangle_stats_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`triangle_stats` over an edges CTE yielding
    (src, dst)."""
    return f"""
WITH raw_edges AS ({edges_cte}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw_edges WHERE src <> dst
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY 1
),
oriented AS (
  SELECT CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN u.a ELSE u.b END AS u,
         CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN u.b ELSE u.a END AS v
  FROM und u
  JOIN deg da ON da.node = u.a
  JOIN deg db ON db.node = u.b
),
wedges AS (
  SELECT e1.u, e1.v AS w1, e2.v AS w2
  FROM oriented e1 JOIN oriented e2 USING (u)
  WHERE e1.v < e2.v
),
closer AS (
  SELECT a AS w1, b AS w2 FROM und
),
tris AS (
  SELECT w.u, w.w1, w.w2 FROM wedges w JOIN closer c USING (w1, w2)
),
corners AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT u AS node FROM tris
    UNION ALL SELECT w1 AS node FROM tris
    UNION ALL SELECT w2 AS node FROM tris
  ) GROUP BY 1
)
SELECT d.node, d.degree::bigint AS degree,
       coalesce(c.triangles, 0)::bigint AS triangles,
       CASE WHEN d.degree >= 2
            THEN 2.0 * coalesce(c.triangles, 0)::double
                 / (d.degree::double * (d.degree - 1)::double)
            ELSE 0.0 END AS clustering
FROM deg d LEFT JOIN corners c ON c.node = d.node"""


def label_propagation(
    edges: DataFrame,
    n_iter: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, the
    deterministic synchronous variant): communities over the
    UNDIRECTED link graph — the spam-ring / mirror-farm detector that
    complements connected_components (which merges everything
    touching) and pagerank (which ranks but does not group). Each node
    starts labeled with itself; every round it adopts the most common
    label among its neighbors, ties broken by the smallest label —
    fully deterministic, no RNG, so the oracle replays it exactly.

    Returns (node, label) after ``n_iter`` rounds.

    Scale design: per round ONE join of the edge table against the
    O(|nodes|) label table keyed on the neighbor endpoint (reusing the
    edge key's partitioning round to round) + one (node, label)
    groupBy; state is never larger than the node set and nothing is
    collected. n_iter is a small constant — LPA converges in a handful
    of sweeps on power-law graphs.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    labels = und.select(F.col("src").alias("node")).distinct() \
                .withColumn("label", F.col("node"))
    for _ in range(n_iter):
        neigh = und.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).groupBy(F.col("src").alias("node"), "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        new = neigh.groupBy("node").agg(
            F.min(F.struct((-F.col("c")).alias("negc"),
                           F.col("label"))).alias("__b")
        ).select("node", F.col("__b.label").alias("label"))
        labels = labels.select("node").join(new, "node", "left") \
                       .select("node", F.coalesce("label", "node")
                               .alias("label"))
    return labels


def oracle_label_propagation_cte(
    edges_cte: str, n_iter: int = 2
) -> str:
    """DuckDB twin of :func:`label_propagation` — exact unrolled
    sweeps; callers append a final SELECT over l{n_iter}."""
    parts = [
        f"""e AS ({edges_cte}),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
  ) WHERE src <> dst
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""c{t} AS (
  SELECT u.src AS node, l.label, count(*) AS c
  FROM und u JOIN l{t-1} l ON l.node = u.dst
  GROUP BY 1, 2
),
l{t} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label) AS rn
    FROM c{t}
  ) WHERE rn = 1
)"""
        )
    return "WITH " + ",\n".join(parts)


def trustrank(
    edges: DataFrame,
    seeds: list[str],
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004;
    public): PageRank with the teleport vector CONCENTRATED on a
    hand-vetted trusted seed set instead of uniform — trust flows out
    of the seeds along links, so link-farm spam (which uniform
    PageRank rewards for sheer in-link volume) gets near-zero mass
    unless a trusted page links toward it. The anti-spam complement
    to ``pagerank`` for crawl prioritization and sampling weights;
    the biased teleport is also exactly "personalized PageRank", so
    the same operator serves topic-conditioned authority.

    rank'(v) = (1-d)·p(v) + d·(Σ_{u→v} rank(u)/outdeg(u)
               + dangling·p(v)),  p = uniform over ``seeds``.

    Dangling mass returns to the SEEDS (not all nodes) — the standard
    TrustRank choice that keeps total trust = 1 without leaking mass
    to untrusted pages. Seeds absent from the graph still receive
    their teleport share (they are added as isolated nodes), so the
    oracle and a seed-list typo behave identically and visibly.

    Returns (node, trust). Same scale shape as ``pagerank``:
    state O(nodes), one contribs shuffle per round, scalars as 1-row
    broadcasts, localCheckpoint per round.
    """
    if not seeds:
        # createDataFrame([]) cannot infer a schema, and a 0-seed
        # teleport vector would divide by zero — fail loudly instead
        raise ValueError("trustrank requires at least one seed node")
    e = normalize_edges(edges, src_col, dst_col).localCheckpoint()
    seed_df = e.sparkSession.createDataFrame(
        [(s,) for s in sorted(set(seeds))], ["node"]
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(seed_df.select("node"))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    nd = (
        nodes.join(outdeg, "node", "left")
        .withColumn("is_seed", F.col("node").isin(list(seeds)))
        .localCheckpoint()
    )
    ns = F.broadcast(
        nd.agg(F.sum(F.col("is_seed").cast("int")).cast("double").alias("__s"))
    )
    p_v = F.when(F.col("is_seed"), F.lit(1.0) / F.col("__s")).otherwise(0.0)
    ranks = nd.crossJoin(ns).select(
        "node", "outdeg", "is_seed", p_v.alias("trust")
    )
    for _ in range(n_iter):
        dangling = F.broadcast(
            ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg").isNull(), F.col("trust"))),
                    F.lit(0.0),
                ).alias("__dangling")
            )
        )
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("trust") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nd.join(contribs, "node", "left")
            .crossJoin(ns)
            .crossJoin(dangling)
            .select(
                "node",
                "outdeg",
                "is_seed",
                (
                    F.lit(1.0 - damping) * p_v
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dangling") * p_v
                    )
                ).alias("trust"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "trust")


def oracle_trustrank_cte(
    edges_cte: str,
    seeds: list[str],
    n_iter: int = 5,
    damping: float = 0.85,
) -> str:
    """CTE chain replaying :func:`trustrank` exactly; callers append a
    final SELECT over t{n_iter} (node, trust)."""
    d = damping
    seed_vals = ", ".join(f"('{s}')" for s in sorted(set(seeds)))
    parts = [
        f"rawe AS ({edges_cte})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM rawe WHERE src != dst)",
        f"seeds AS (SELECT node FROM (VALUES {seed_vals}) v(node))",
        """nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e
            UNION SELECT node FROM seeds)""",
        """tnd AS MATERIALIZED (
  SELECT n.node, od.outdeg, (n.node IN (SELECT node FROM seeds)) AS is_seed
  FROM nodes n LEFT JOIN (SELECT src AS node, count(*) AS outdeg
                          FROM e GROUP BY 1) od USING (node)
)""",
        "sn AS (SELECT sum(is_seed::int)::double AS s FROM tnd)",
        """t0 AS MATERIALIZED (
  SELECT node, outdeg, is_seed,
         CASE WHEN is_seed THEN 1.0 / sn.s ELSE 0.0 END AS trust
  FROM tnd, sn
)""",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""tdg{i} AS (
  SELECT coalesce(sum(CASE WHEN outdeg IS NULL THEN trust END), 0.0)
           AS dangling
  FROM t{i-1}
),
tcb{i} AS (
  SELECT e.dst AS node, sum(t.trust / t.outdeg) AS contrib
  FROM t{i-1} t JOIN e ON t.node = e.src
  GROUP BY 1
),
t{i} AS MATERIALIZED (
  SELECT tnd.node, tnd.outdeg, tnd.is_seed,
         (1.0 - {d}) * (CASE WHEN tnd.is_seed THEN 1.0 / sn.s
                             ELSE 0.0 END)
         + {d} * (coalesce(tcb{i}.contrib, 0.0)
                  + tdg{i}.dangling * (CASE WHEN tnd.is_seed
                                            THEN 1.0 / sn.s
                                            ELSE 0.0 END)) AS trust
  FROM tnd LEFT JOIN tcb{i} USING (node), sn, tdg{i}
)"""
        )
    return "WITH " + ",\n".join(parts)
