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
