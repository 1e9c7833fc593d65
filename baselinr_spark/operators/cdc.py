"""Content-defined chunking (CDC) and chunk-level cross-document dedup.

Fixed-size chunking breaks under insertion: one added byte shifts every
later boundary, so identical trailing content hashes differently. CDC
(Muthitacharoen et al., LBFS, SOSP 2001; public) cuts where a rolling
content hash satisfies ``hash % divisor == 0`` — boundaries are a pure
function of local content, so two documents sharing a long region
produce identical interior chunks regardless of byte offset. This is
the storage-dedup complement to winnowing (operators/winnowing.py):
winnowing DETECTS local overlap, CDC yields the shared byte regions as
addressable units (mirror/syndication payload extraction, delta
storage of re-crawls — pairs with operators/revisit.py). The reference
repo has no sub-document dedup surface, so this extends the dedup
family (SURVEY.md §2 extensions).

Hash idiom: the package-wide md5-prefix int64 over k-char grams
(winnowing.py:_gram_hashes, dedup.py:238) stands in for LBFS's Rabin
fingerprint — any uniform content-derived hash gives the same
expected-chunk-size geometry (divisor D → mean interior chunk ≈ D+k
chars).

Scale design (10^12 docs):

* Chunk layout is computed entirely per-document with higher-order
  functions inside WholeStageCodegen — zero shuffle, zero Python. The
  gram-hash array is staged as a materialized projection column first
  (the winnowing O(n²)-inlining lesson, winnowing.py:_staged_windows).
* Cross-document chunk matching is ONE groupBy on the chunk hash with
  map-side partial aggregation — boilerplate chunks shared by millions
  of pages collapse per map task; nothing is ever self-joined.
* Per-doc dup shares come from joining the O(distinct chunks) group
  table back on the chunk-hash key (AQE handles residual skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.dedup import normalize_text

DEFAULT_K = 8
DEFAULT_DIVISOR = 16


def _hashes_over(tcol, k: int):
    """int64 gram hashes over an ALREADY-normalized text column."""
    n_h = F.length(tcol) - (k - 1)
    gram = lambda i: F.conv(
        F.substring(F.md5(tcol.substr(i, F.lit(k))), 1, 15), 16, 10
    ).cast("long")
    return F.when(
        n_h >= 1, F.transform(F.sequence(F.lit(1), n_h), gram)
    ).otherwise(F.array().cast("array<bigint>"))


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = DEFAULT_K,
    divisor: int = DEFAULT_DIVISOR,
) -> DataFrame:
    """Chunk layout per document: a gram at position p whose hash is
    ≡ 0 (mod divisor) CLOSES a chunk at p + k - 1; the next chunk
    starts at p + k. The last chunk runs to end-of-text. Documents
    shorter than k chars are one whole chunk; empty text yields none.

    Returns (id_col, chunk_idx, start, chunk_len, chunk_hash) with
    1-based start offsets into the normalized text and chunk_hash =
    md5 of the chunk substring.
    """
    staged = df.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__t")
    ).select("id", "__t", _hashes_over(F.col("__t"), k).alias("__h"))
    h, t = F.col("__h"), F.col("__t")
    bpos = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size(h), F.lit(1))).alias("_"),
        lambda i: (i <= F.size(h)) & (F.element_at(h, i) % divisor == 0),
    )
    staged = staged.select("id", "__t", bpos.alias("__b"))
    starts = F.concat(
        F.array(F.lit(1)), F.transform(F.col("__b"), lambda p: p + k)
    )
    ends = F.concat(
        F.transform(F.col("__b"), lambda p: p + k - 1),
        F.array(F.length(t)),
    )
    spans = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
        lambda z: z["s"] <= z["e"],
    )
    ex = staged.select("id", "__t", F.posexplode(spans).alias("chunk_idx", "z"))
    chunk = F.expr("substring(__t, z.s, z.e - z.s + 1)")
    return ex.select(
        F.col("id").alias(id_col),
        F.col("chunk_idx").cast("int"),
        F.col("z.s").cast("int").alias("start"),
        (F.col("z.e") - F.col("z.s") + 1).cast("int").alias("chunk_len"),
        F.md5(chunk).alias("chunk_hash"),
    )


def cdc_dup_chunks(chunks: DataFrame, *, min_docs: int = 2) -> DataFrame:
    """Corpus-shared chunks: every chunk hash appearing in ≥ min_docs
    distinct documents, with occurrence counts and the byte payload
    size it represents. Returns (chunk_hash, n_docs, n_occurrences,
    chunk_len)."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct(chunks.columns[0]).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("chunk_len").alias("chunk_len"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def cdc_doc_summary(chunks: DataFrame, id_col: str) -> DataFrame:
    """Per-document CDC profile + corpus-dup exposure: how much of
    each document's normalized text lives in chunks that also occur in
    OTHER documents. Returns (id_col, n_chunks, total_len,
    dup_chunks, dup_len_share)."""
    shared = (
        chunks.groupBy("chunk_hash")
        .agg(F.countDistinct(id_col).alias("__nd"))
    )
    j = chunks.join(shared, "chunk_hash")
    is_dup = (F.col("__nd") >= 2).cast("int")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_len").cast("bigint").alias("total_len"),
            F.sum(is_dup).cast("bigint").alias("dup_chunks"),
            F.round(
                F.sum(is_dup * F.col("chunk_len"))
                / F.sum("chunk_len"), 6
            ).alias("dup_len_share"),
        )
    )


_ORACLE_CHUNK_CTE = r"""
WITH s AS (
  SELECT {id_col} AS id,
         trim(regexp_replace(lower({text_col}), '\s+', ' ', 'g')) AS t
  FROM {table}
),
h AS (
  SELECT id, t,
         CASE WHEN length(t) >= {k} THEN
           list_transform(range(1, length(t) - {k} + 2),
             i -> ('0x' || substring(md5(substring(t, i, {k})), 1, 15))::bigint)
         ELSE []::BIGINT[] END AS hs
  FROM s
),
b AS (
  SELECT id, t,
         list_filter(range(1, len(hs) + 1), i -> hs[i] % {divisor} = 0)
           AS bpos
  FROM h
),
se AS (
  SELECT id, t,
         list_concat([1], list_transform(bpos, p -> p + {k})) AS ss,
         list_concat(list_transform(bpos, p -> p + {k} - 1), [length(t)])
           AS es
  FROM b
),
sp AS (
  SELECT id, t,
         list_filter(list_transform(range(1, len(ss) + 1),
                                    j -> [ss[j], es[j]]),
                     z -> z[1] <= z[2]) AS spans
  FROM se
),
ex AS (
  SELECT id, t, j - 1 AS chunk_idx, spans[j][1] AS s0, spans[j][2] AS e0
  FROM sp, UNNEST(range(1, len(spans) + 1)) AS u(j)
),
chunks AS (
  SELECT id, chunk_idx::int AS chunk_idx, s0::int AS start,
         (e0 - s0 + 1)::int AS chunk_len,
         md5(substring(t, s0, e0 - s0 + 1)) AS chunk_hash
  FROM ex
)"""


def oracle_cdc_chunks_sql(
    table: str,
    id_col: str,
    text_col: str,
    *,
    k: int = DEFAULT_K,
    divisor: int = DEFAULT_DIVISOR,
) -> str:
    """DuckDB twin of :func:`cdc_chunks`."""
    cte = _ORACLE_CHUNK_CTE.format(
        table=table, id_col=id_col, text_col=text_col, k=k, divisor=divisor
    )
    return cte + f"""
SELECT id AS {id_col}, chunk_idx, start, chunk_len, chunk_hash FROM chunks"""


def oracle_cdc_doc_summary_sql(
    table: str,
    id_col: str,
    text_col: str,
    *,
    k: int = DEFAULT_K,
    divisor: int = DEFAULT_DIVISOR,
) -> str:
    """DuckDB twin of :func:`cdc_doc_summary` over :func:`cdc_chunks`."""
    cte = _ORACLE_CHUNK_CTE.format(
        table=table, id_col=id_col, text_col=text_col, k=k, divisor=divisor
    )
    return cte + f""",
shared AS (
  SELECT chunk_hash, count(DISTINCT id) AS nd FROM chunks GROUP BY 1
)
SELECT c.id AS {id_col}, count(*)::bigint AS n_chunks,
       sum(c.chunk_len)::bigint AS total_len,
       sum((s.nd >= 2)::int)::bigint AS dup_chunks,
       round(sum((s.nd >= 2)::int * c.chunk_len)::double
             / sum(c.chunk_len), 6) AS dup_len_share
FROM chunks c JOIN shared s USING (chunk_hash)
GROUP BY 1"""
