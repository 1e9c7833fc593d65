"""HTML → text extraction as native Catalyst expressions.

The input-table contract carries both `html:binary` (the raw fetch) and
`text:string` (the extracted text the quality filter consumes), with a
per-row invariant: extraction must be byte-stable per url. This module
is the extraction step itself, for when a corpus arrives with only the
raw HTML: a deterministic, engine-replayable strip chain —

  1. decode UTF-8,
  2. drop <script>/<style> element bodies (separate patterns per tag:
     RE2, which the DuckDB oracle uses, has no backreferences),
  3. drop HTML comments,
  4. drop all remaining tags,
  5. decode the basic entities (&lt; &gt; &quot; &#39; &nbsp; first,
     &amp; LAST — the standard unescape order, so "&amp;lt;" yields
     the literal "&lt;" and never double-decodes).

No whitespace collapsing: the chain is a pure inverse of tag/entity
wrapping, so wrapping text in markup and extracting returns the text
byte-identical (tested; this is the invariant the north rule names).
Real-world boilerplate REMOVAL (nav bars, footers) is a separate
corpus-level concern — that's `operators/linededup.py:line_dedup`,
which drops corpus-repeated lines exactly the way C4/RefinedWeb do.

Everything is regexp_replace/decode in WholeStageCodegen — row-local,
zero shuffle, no UDF. At 100 TB this runs inside the same scan-stage
pass as the rest of the per-doc features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) chain over the decoded string; RE2-compatible
# (no lookaround/backrefs) so DuckDB replays it verbatim.
STRIP_CHAIN: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"(?s)<[^>]*>", ""),
)

ENTITY_CHAIN: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", "\u00a0"),  # spec decode (html.unescape): NBSP, not ' '
    ("&amp;", "&"),  # MUST be last (see module docstring)
)


def extract_text_expr(html: Column) -> Column:
    """Extracted text from an `html:binary` column (NULL html → NULL)."""
    s = F.decode(html, "UTF-8")
    for pat, rep in STRIP_CHAIN:
        s = F.regexp_replace(s, pat, rep)
    for ent, ch in ENTITY_CHAIN:
        # literal replace — F.replace, not regexp (entities contain '&#')
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def extract_pages_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted_text",
) -> DataFrame:
    return df.withColumn(out_col, extract_text_expr(F.col(html_col)))


def escape_html_expr(text: Column) -> Column:
    """Inverse helper (used by tests/oracles to build synthetic HTML):
    escape &, <, >, ", ' — & FIRST so escape∘unescape = identity.
    (&nbsp; is decode-only: spaces are never escaped.)"""
    s = F.replace(text, F.lit("&"), F.lit("&amp;"))
    for ch, ent in (("<", "&lt;"), (">", "&gt;"),
                    ('"', "&quot;"), ("'", "&#39;")):
        s = F.replace(s, F.lit(ch), F.lit(ent))
    return s
