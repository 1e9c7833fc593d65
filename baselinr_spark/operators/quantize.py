"""Embedding compression for 100 TB-scale vector stores.

Two standard compression passes a web-scale embedding pipeline runs
before similarity search / SemDeDup, complementing the product
quantizer in ``similarity.py``:

- :func:`sq_stats` / :func:`sq_encode` — per-dimension scalar int8
  quantization (the FAISS ``SQ8`` scheme, public): per-dim [min, max]
  range over the corpus, 255 uniform levels, plus the reconstruction
  error profile per dimension that tells you which dims actually need
  more bits. 4x smaller than float32 with ~no recall loss.
- :func:`jl_distortion` — Johnson-Lindenstrauss random projection with
  the Achlioptas (2003) +-1 sign matrix, evaluated by the pairwise
  distance distortion it induces. The sign matrix derives from md5 of
  the (input-dim, output-dim) index pair INSIDE the engine, so the
  DuckDB oracle replays the projection exactly — same idiom as the
  dedup/IVF md5 constructions.

Scale design (10^9 vectors x d dims): sq_stats posexplodes to (dim,
value) pairs but map-side combines to d rows per partition before the
shuffle — the aggregate state is O(d), not O(rows·d). sq_encode is
row-local against a broadcast d-row stats table. jl projection fans
out d·k terms per vector map-locally, then ONE groupBy (id, j)
reduces to k values per vector; the distortion join pairs consecutive
ids (equi-join on id+1, no cross product). Quantization codes use
floor(v + 0.5) rather than engine round() so both engines tie-break
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import dot_expr


def sq_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension int8 scalar-quantization profile: (dim, dmin,
    dmax, scale, mse, max_abs_err) where scale = (dmax-dmin)/255 and
    the error columns measure reconstruction x_hat = dmin+code*scale
    with code = floor((x-dmin)/scale + 0.5) clamped to [0, 255].
    Degenerate dims (dmax == dmin) quantize to code 0 with zero error.
    """
    e = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "xf")
    ).select("dim", F.col("xf").cast("double").alias("x"))
    stats = e.groupBy("dim").agg(
        F.min("x").alias("dmin"), F.max("x").alias("dmax")
    )
    scale = (F.col("dmax") - F.col("dmin")) / F.lit(255.0)
    withs = e.join(F.broadcast(stats), "dim").select(
        "dim",
        "x",
        F.col("dmin"),
        F.col("dmax"),
        scale.alias("scale"),
    )
    code = F.when(
        F.col("scale") > 0,
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.col("dmin")) / F.col("scale") + F.lit(0.5)),
                F.lit(0),
            ),
            F.lit(255),
        ),
    ).otherwise(F.lit(0))
    err = (F.col("dmin") + code.cast("double") * F.col("scale")) - F.col("x")
    return (
        withs.select("dim", "dmin", "dmax", "scale", err.alias("err"))
        .groupBy("dim")
        .agg(
            F.first("dmin").alias("dmin"),
            F.first("dmax").alias("dmax"),
            F.first("scale").alias("scale"),
            F.avg(F.col("err") * F.col("err")).alias("mse"),
            F.max(F.abs(F.col("err"))).alias("max_abs_err"),
        )
    )


def oracle_sq_stats_sql(
    table: str = "embeddings", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of :func:`sq_stats`."""
    return f"""
WITH e AS (
  SELECT i - 1 AS dim, ({vec_col})[i]::double AS x
  FROM {table}, UNNEST(range(1, len({vec_col}) + 1)) AS t(i)
),
stats AS (
  SELECT dim, min(x) AS dmin, max(x) AS dmax,
         (max(x) - min(x)) / 255.0 AS scale
  FROM e GROUP BY 1
),
werr AS (
  SELECT e.dim, s.dmin, s.dmax, s.scale,
         (s.dmin + (CASE WHEN s.scale > 0
                    THEN least(greatest(floor((e.x - s.dmin) / s.scale + 0.5), 0), 255)
                    ELSE 0 END)::double * s.scale) - e.x AS err
  FROM e JOIN stats s USING (dim)
)
SELECT dim, any_value(dmin) AS dmin, any_value(dmax) AS dmax,
       any_value(scale) AS scale,
       avg(err * err) AS mse, max(abs(err)) AS max_abs_err
FROM werr GROUP BY dim"""


def _jl_sign(i, j):
    """Deterministic +-1 from md5 of the (i, j) index pair — engine-side
    (same '0x'-hex idiom as the dedup oracles)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(i.cast("string"), F.lit("#"), j.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def jl_project(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    *,
    k: int = 16,
) -> DataFrame:
    """Project vectors to k dims with the Achlioptas +-1 sign matrix:
    y_j = (1/sqrt(k)) * sum_i sign(i, j) * x_i. Returns the long-format
    (id, j, y) table — the shape downstream distance computations
    consume without an order-sensitive array rebuild."""
    e = df.select(
        F.col(id_col).alias("id"), F.posexplode(F.col(vec_col)).alias("i", "xf")
    ).select("id", "i", F.col("xf").cast("double").alias("x"))
    fan = e.select(
        "id",
        "i",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
    )
    term = fan.select(
        "id", "j", (_jl_sign(F.col("i"), F.col("j")) * F.col("x")).alias("t")
    )
    return term.groupBy("id", "j").agg(
        (F.sum("t") / F.lit(float(k) ** 0.5)).alias("y")
    )


def jl_distortion(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    *,
    k: int = 16,
) -> DataFrame:
    """Pairwise distance distortion of the JL projection over the
    deterministic consecutive-id pair set (id, id+1): one row per pair
    (id_a, id_b, d_orig, d_proj, ratio) with ratio = d_proj/d_orig
    (0.0 for coincident originals). The JL lemma predicts ratio within
    1 +- eps for k = O(log n / eps^2); this operator measures it."""
    proj = jl_project(df, id_col, vec_col, k=k)
    pa = proj.select(F.col("id").alias("id_a"), "j", F.col("y").alias("ya"))
    pb = proj.select((F.col("id") - 1).alias("id_a"), "j", F.col("y").alias("yb"))
    dproj = (
        pa.join(pb, ["id_a", "j"])
        .groupBy("id_a")
        .agg(F.sqrt(F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))).alias("d_proj"))
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select((F.col(id_col) - 1).alias("id_a"), F.col(vec_col).alias("vb"))
    diff = F.zip_with(
        F.col("va"), F.col("vb"), lambda x, y: x.cast("double") - y.cast("double")
    )
    dorig = va.join(vb, "id_a").select(
        "id_a",
        F.sqrt(dot_expr(diff, diff)).alias("d_orig"),
    )
    return (
        dorig.join(dproj, "id_a")
        .select(
            "id_a",
            (F.col("id_a") + 1).alias("id_b"),
            "d_orig",
            "d_proj",
            F.when(F.col("d_orig") > 0, F.col("d_proj") / F.col("d_orig"))
            .otherwise(F.lit(0.0))
            .alias("ratio"),
        )
    )


def oracle_jl_distortion_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 16,
) -> str:
    """DuckDB twin of :func:`jl_distortion`."""
    return f"""
WITH e AS (
  SELECT {id_col} AS id, i - 1 AS i, ({vec_col})[i]::double AS x
  FROM {table}, UNNEST(range(1, len({vec_col}) + 1)) AS t(i)
),
fan AS (
  SELECT id, i, x, j FROM e, UNNEST(range(0, {k})) AS u(j)
),
proj AS (
  SELECT id, j,
         sum((CASE WHEN ('0x' || substring(md5(i::varchar || '#' || j::varchar), 1, 8))::bigint % 2 = 0
              THEN 1.0 ELSE -1.0 END) * x) / sqrt({k}::double) AS y
  FROM fan GROUP BY 1, 2
),
dproj AS (
  SELECT pa.id AS id_a, sqrt(sum((pa.y - pb.y) * (pa.y - pb.y))) AS d_proj
  FROM proj pa JOIN proj pb ON pb.id = pa.id + 1 AND pb.j = pa.j
  GROUP BY 1
),
dorig AS (
  SELECT a.{id_col} AS id_a,
         sqrt(sum((a.{vec_col}[i]::double - b.{vec_col}[i]::double)
                  * (a.{vec_col}[i]::double - b.{vec_col}[i]::double))) AS d_orig
  FROM {table} a JOIN {table} b ON b.{id_col} = a.{id_col} + 1,
       UNNEST(range(1, len(a.{vec_col}) + 1)) AS t(i)
  GROUP BY 1
)
SELECT o.id_a, o.id_a + 1 AS id_b, o.d_orig, p.d_proj,
       CASE WHEN o.d_orig > 0 THEN p.d_proj / o.d_orig ELSE 0.0 END AS ratio
FROM dorig o JOIN dproj p USING (id_a)"""
