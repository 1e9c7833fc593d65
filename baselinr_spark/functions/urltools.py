"""URL canonicalization + URL-level dedup for web-crawl corpora.

Common-Crawl-style pipelines dedup first by URL: the same page is
fetched many times across crawls under trivially-different URLs
(scheme/host case, default ports, `www.`, trailing slashes, tracking
query params, fragments). Canonicalizing before the URL groupBy merges
those variants so the much more expensive content-level dedup
(MinHash/SimHash/SemDeDup) sees each page once.

Everything here is native Catalyst expressions — regexp_extract /
regexp_replace / split + array higher-order functions, no UDF — and
every regex is written to the RE2-compatible subset (no lookaround, no
backreferences) so the DuckDB gate oracle can replay the exact chain.

Scale shape: canonicalization is row-local (zero shuffle); the dedup is
one groupBy on the canonical key with a min/max struct — map-side
combined, no window over the corpus.

Additive vs the reference (it profiles warehouse tables, not crawls);
the canonical steps follow the de-facto crawl rules (RFC 3986 §6 case
+ port normalization, plus the tracking-param/`www.`/trailing-slash
conventions used by CC-index tooling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped from query strings (lowercased param names)
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)="

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (non-matching inputs
    pass through trimmed): lowercase scheme+host, strip `www.`, strip
    the scheme's default port, drop the fragment, drop tracking query
    params (param ORDER is otherwise preserved — reordering would merge
    semantically distinct URLs on sites where order matters), strip
    trailing slashes from the path."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(F.regexp_extract(u, _URL_RE, 3), "/+$", "")
    qs = F.regexp_extract(u, _URL_RE, 4)  # includes leading '?' or ''
    params = F.filter(
        F.split(F.regexp_replace(qs, r"^\?", ""), "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when(scheme == "", u).otherwise(canon)


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url_expr(F.col(url_col)))


# host/path/url heuristics used by crawl-side URL filtering (the
# UT1-blocklist + RefinedWeb-style "filter by URL before fetching the
# body" pass). Lexicon kept tiny and neutral; real deployments swap in
# their blocklist.
SPAM_KEYWORD_RE = r"(casino|poker|viagra|torrent|warez)"
BAD_EXT_RE = (
    r"\.(exe|msi|apk|dmg|iso|zip|rar|7z|jpg|jpeg|png|gif|webp|svg|"
    r"mp3|mp4|avi|mkv|css|js|woff2?)$"
)


def url_quality_features(
    df: DataFrame,
    url_col: str = "url",
    max_path_depth: int = 8,
    max_params: int = 6,
    max_len: int = 2048,
    max_host_digit_ratio: float = 0.4,
) -> DataFrame:
    """URL-level quality features + keep/drop — the pre-fetch filter a
    crawler runs on the frontier (and a pipeline re-runs on WARC URLs)
    BEFORE paying for body processing: binary/media extensions, spam
    keywords, digit-stuffed hosts, path/query-string explosions, and
    absurd lengths each get a typed flag; ``url_keep`` is their
    conjunction. All row-local Catalyst regexp/split/filter exprs —
    zero shuffle, and every regex is RE2-safe so the DuckDB oracle
    replays the chain exactly.

    Returns the input plus (url_len, path_depth, n_params,
    host_digit_ratio, bad_ext, spam_kw, url_keep)."""
    u = F.trim(F.col(url_col))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    qs = F.regexp_replace(F.regexp_extract(u, _URL_RE, 4), r"^\?", "")
    host_len = F.length(host)
    digit_ratio = F.when(
        host_len > 0,
        (host_len - F.length(F.regexp_replace(host, r"[0-9]", "")))
        / host_len.cast("double"),
    ).otherwise(F.lit(0.0))
    path_depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    n_params = F.size(F.filter(F.split(qs, "&"), lambda p: p != ""))
    bad_ext = F.lower(path).rlike(BAD_EXT_RE)
    spam_kw = F.lower(u).rlike(SPAM_KEYWORD_RE)
    out = (
        df.withColumn("url_len", F.length(u))
        .withColumn("path_depth", path_depth)
        .withColumn("n_params", n_params)
        .withColumn("host_digit_ratio", digit_ratio)
        .withColumn("bad_ext", bad_ext)
        .withColumn("spam_kw", spam_kw)
    )
    return out.withColumn(
        "url_keep",
        (~F.col("bad_ext"))
        & (~F.col("spam_kw"))
        & (F.col("url_len") <= max_len)
        & (F.col("path_depth") <= max_path_depth)
        & (F.col("n_params") <= max_params)
        & (F.col("host_digit_ratio") <= max_host_digit_ratio),
    )


def oracle_url_quality_sql(
    urls_sql: str,
    url_col: str = "url",
    max_path_depth: int = 8,
    max_params: int = 6,
    max_len: int = 2048,
    max_host_digit_ratio: float = 0.4,
) -> str:
    """DuckDB replay of `url_quality_features` (same _URL_RE groups,
    same split/filter semantics; Spark's split drops nothing — empties
    are filtered explicitly in both engines)."""
    ure = _URL_RE
    return f"""
WITH u0 AS (SELECT *, trim({url_col}) AS __u FROM ({urls_sql})),
p AS (
  SELECT *,
         lower(regexp_extract(__u, '{ure}', 2)) AS __host,
         regexp_extract(__u, '{ure}', 3) AS __path,
         regexp_replace(regexp_extract(__u, '{ure}', 4), '^\\?', '') AS __qs
  FROM u0
),
f AS (
  SELECT *,
         length(__u)::int AS url_len,
         len(list_filter(string_split(__path, '/'), s -> s != ''))::int
           AS path_depth,
         len(list_filter(string_split(__qs, '&'), s -> s != ''))::int
           AS n_params,
         CASE WHEN length(__host) > 0 THEN
           (length(__host) - length(regexp_replace(__host, '[0-9]', '', 'g')))
           / length(__host)::double
         ELSE 0.0 END AS host_digit_ratio,
         regexp_matches(lower(__path), '{BAD_EXT_RE}') AS bad_ext,
         regexp_matches(lower(__u), '{SPAM_KEYWORD_RE}') AS spam_kw
  FROM p
)
SELECT * EXCLUDE (__u, __host, __path, __qs),
       (NOT bad_ext AND NOT spam_kw AND url_len <= {max_len}
        AND path_depth <= {max_path_depth} AND n_params <= {max_params}
        AND host_digit_ratio <= {max_host_digit_ratio}) AS url_keep
FROM f
"""


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """One row per canonical URL: the LATEST fetch wins (crawl
    convention — the newest capture supersedes earlier ones), ties
    break to the lexicographically-smallest raw URL. Implemented as a
    max_by over a (ts, inverted-url) struct in ONE groupBy — map-side
    combined; no corpus-wide window, no join back.

    Returns (canonical_url, url, <ts_col>, n_dups) where url/<ts_col>
    are the winner's and n_dups counts the merged fetches.
    """
    canon = canonicalize_urls(df, url_col)
    # winner in ONE agg: min_by over the rank struct (-epoch_micros, url)
    # — struct comparison is field-by-field, so the minimum is (max ts,
    # then lexicographically-smallest url). No window, no join back.
    agg = canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min_by(
            F.struct(F.col(url_col).alias("u"), F.col(ts_col).alias("t")),
            F.struct(
                (-F.unix_micros(F.col(ts_col))).alias("nt"),
                F.col(url_col).alias("u"),
            ),
        ).alias("__win"),
    )
    return agg.select(
        "canonical_url",
        F.col("__win.u").alias(url_col),
        F.col("__win.t").alias(ts_col),
        "n_dups",
    )


def resolve_redirects(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    max_hops: int = 3,
):
    """Bounded-hop redirect-chain resolution: follow a crawl's
    redirect map (src url → dst url) to each source's final
    destination, the canonicalization step AFTER per-url
    normalization (canonical_url) — a frontier that doesn't resolve
    redirects re-fetches every hop of every chain forever. Multiple
    recorded redirects for one src collapse deterministically to the
    min dst (re-crawl disagreement tie-break).

    Returns (url, final_url, n_hops, terminal): terminal=False after
    ``max_hops`` means the chain didn't ground — a longer chain or a
    redirect LOOP, both of which a crawler should drop rather than
    chase (RFC-style redirect caps do exactly this).

    Scale design: ``max_hops`` joins of the frontier against the
    deduped edge map, all keyed on the url — the map's partitioning is
    reused hop to hop; state is one row per source url; no recursion,
    no collect. max_hops is a small constant (browsers cap ~20;
    crawlers 3-5).
    """
    from pyspark.sql import functions as F

    emap = (
        edges.groupBy(F.col(src_col).alias("__s"))
        .agg(F.min(F.col(dst_col)).alias("__d"))
    )
    cur = emap.select(
        F.col("__s").alias("url"),
        F.col("__d").alias("final_url"),
        F.lit(1).alias("n_hops"),
    )
    for _ in range(max_hops - 1):
        nxt = emap.withColumnRenamed("__s", "final_url")
        cur = cur.join(nxt, "final_url", "left").select(
            "url",
            F.coalesce("__d", "final_url").alias("final_url"),
            (F.col("n_hops")
             + F.col("__d").isNotNull().cast("int")).alias("n_hops"),
        )
    last = emap.withColumnRenamed("__s", "final_url")
    return cur.join(last, "final_url", "left").select(
        "url", "final_url",
        F.col("n_hops").cast("int").alias("n_hops"),
        F.col("__d").isNull().alias("terminal"),
    )


def oracle_resolve_redirects_sql(
    edges_sql: str, max_hops: int = 3
) -> str:
    """DuckDB twin of :func:`resolve_redirects` — unrolled hops."""
    parts = [
        f"""e AS ({edges_sql}),
emap AS (SELECT src AS s, min(dst) AS d FROM e GROUP BY 1),
r1 AS (SELECT s AS url, d AS final_url, 1 AS n_hops FROM emap)"""
    ]
    for t in range(2, max_hops + 1):
        parts.append(
            f"""r{t} AS (
  SELECT r.url, coalesce(m.d, r.final_url) AS final_url,
         r.n_hops + (m.d IS NOT NULL)::int AS n_hops
  FROM r{t-1} r LEFT JOIN emap m ON m.s = r.final_url
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT r.url, r.final_url, r.n_hops::int AS n_hops,
       (m.d IS NULL) AS terminal
FROM r{max_hops} r LEFT JOIN emap m ON m.s = r.final_url"""
    )


def robots_filter(
    urls,
    rules,
    *,
    domain_col: str = "domain",
    path_col: str = "path",
    prefix_col: str = "path_prefix",
    allow_col: str = "allow",
):
    """robots.txt rule evaluation with the documented longest-match
    semantics (REP, RFC 9309: the most specific — longest — matching
    path prefix wins; on a length tie the allow rule wins; no matching
    rule means allowed). The frontier-side politeness gate that runs
    BEFORE any fetch is scheduled.

    ``urls``: one row per candidate (domain, path, …); ``rules``: one
    row per directive (domain, path_prefix, allow). Returns the urls
    columns plus (allowed, matched_prefix) — matched_prefix NULL when
    no rule applied.

    Scale design: candidates come from ONE equi-join on the domain key
    (prefix match is a row-local startswith, never a cross join);
    per-url winner via ONE max(struct(len, allow, prefix)) groupBy —
    no window over the url corpus; rules-per-domain is bounded by
    robots.txt size, so join fan-out is a small constant.
    """
    from pyspark.sql import functions as F

    cand = urls.select(domain_col, path_col).join(
        rules.select(
            F.col(domain_col),
            F.col(prefix_col).alias("__pfx"),
            F.col(allow_col).cast("boolean").alias("__allow"),
        ),
        domain_col,
    ).filter(F.col(path_col).startswith(F.col("__pfx")))
    best = cand.groupBy(domain_col, path_col).agg(
        F.max(
            F.struct(
                F.length("__pfx").alias("l"),
                F.col("__allow").cast("int").alias("a"),
                F.col("__pfx").alias("p"),
            )
        ).alias("__b")
    )
    return urls.join(best, [domain_col, path_col], "left").select(
        *urls.columns,
        F.coalesce(F.col("__b.a") == 1, F.lit(True)).alias("allowed"),
        F.col("__b.p").alias("matched_prefix"),
    )


def oracle_robots_filter_sql(
    urls_sql: str,
    rules_sql: str,
    domain_col: str = "domain",
    path_col: str = "path",
) -> str:
    """DuckDB twin of :func:`robots_filter`."""
    return f"""
WITH urls_in AS ({urls_sql}),
rules_in AS ({rules_sql}),
cand AS (
  SELECT u.{domain_col}, u.{path_col}, r.path_prefix, r.allow,
         row_number() OVER (
           PARTITION BY u.{domain_col}, u.{path_col}
           ORDER BY length(r.path_prefix) DESC, r.allow::int DESC,
                    r.path_prefix DESC) AS rn
  FROM urls_in u
  JOIN rules_in r ON r.{domain_col} = u.{domain_col}
   AND starts_with(u.{path_col}, r.path_prefix)
),
best AS (SELECT {domain_col}, {path_col}, path_prefix, allow
         FROM cand WHERE rn = 1)
SELECT u.*, coalesce(b.allow, true) AS allowed,
       b.path_prefix AS matched_prefix
FROM urls_in u LEFT JOIN best b USING ({domain_col}, {path_col})"""
