"""Per-document text features as native Catalyst expressions.

Zero Python in this module's hot path: every feature is a JVM-side
`pyspark.sql.functions` expression (split / filter / aggregate /
array_distinct / regexp_replace), so the whole feature stage stays inside
WholeStageCodegen and scales linearly with executors.

Feature semantics (shared with oracle/pandas_ref.py, which implements the
same definitions independently in pure pandas — the unit tests assert
equality):

    words               = non-empty substrings of text split on /\\s+/
    n_words             = len(words)
    mean_word_length    = sum(len(w)) / n_words            (0.0 if no words)
    symbol_ratio        = count(chars not in [A-Za-z0-9 \\s]) / len(text)
    stopword_fraction   = count(lower(w) in STOPWORDS) / n_words
    lines               = non-empty trimmed substrings of text split on \\n
    dup_line_fraction   = 1 - n_distinct_lines / n_lines   (0.0 if no lines)

These recast baselinr's validator predicates (SURVEY.md §2.10; e.g.
/root/reference/baselinr/validation/validators/range_validator.py:375's
`col IS NOT NULL AND (col < min OR col > max)` shape) as Gopher/C4
document heuristics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import FilterConfig
from . import synthlang as sl

#: columns added by with_features
FEATURE_COLS = (
    "n_words",
    "n_chars",
    "mean_word_length",
    "symbol_ratio",
    "stopword_fraction",
    "n_lines",
    "dup_line_fraction",
)


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: F.length(w) > 0)


def _lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: F.length(ln) > 0,
    )


def with_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the FEATURE_COLS to df. One projection, no shuffle."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    stop_arr = F.array(*[F.lit(w) for w in sorted(sl.all_stopwords())])

    words = _words(text)
    lines = _lines(text)

    n_words = F.size(words)
    n_chars = F.length(text)
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))

    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars", n_chars)
        .withColumn(
            "mean_word_length",
            F.when(n_words > 0, total_word_chars / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "symbol_ratio",
            F.when(n_chars > 0, n_symbols / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_fraction",
            F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn("n_lines", n_lines)
        .withColumn(
            "dup_line_fraction",
            F.when(n_lines > 0, 1.0 - n_distinct_lines / n_lines).otherwise(F.lit(0.0)),
        )
    )


def rule_columns(cfg: FilterConfig) -> dict[str, Column]:
    """Boolean fail-predicates over feature columns. Rule name → Column.

    langid/perplexity rules are appended by plans/pipeline.py once the
    model-score columns exist; this dict covers the pure-heuristic rules.
    """
    return {
        "too_short": F.col("n_words") < cfg.min_words,
        "too_long": F.col("n_words") > cfg.max_words,
        "mean_word_length": (F.col("n_words") > 0)
        & (
            (F.col("mean_word_length") < cfg.min_mean_word_length)
            | (F.col("mean_word_length") > cfg.max_mean_word_length)
        ),
        "symbol_ratio": F.col("symbol_ratio") > cfg.max_symbol_ratio,
        "stopword_fraction": (F.col("n_words") > 0)
        & (F.col("stopword_fraction") < cfg.min_stopword_fraction),
        "dup_lines": F.col("dup_line_fraction") > cfg.max_dup_line_fraction,
    }


def model_rule_columns(cfg: FilterConfig) -> dict[str, Column]:
    """Fail-predicates over model-score columns (lang_pred, lang_conf,
    perplexity) added by the langid/perplexity UDF stages."""
    return {
        "langid": (~F.col("lang_pred").isin(*cfg.allowed_langs))
        | (F.col("lang_conf") < cfg.min_lang_confidence),
        "perplexity": F.col("perplexity") > cfg.max_perplexity,
    }


def with_verdict(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add per-rule boolean columns `rule_<name>`, `drop_reasons`
    (array<string> in RULE_NAMES order) and `keep`."""
    from ..config import RULE_NAMES

    out = df
    for name, col in rules.items():
        out = out.withColumn(f"rule_{name}", F.coalesce(col, F.lit(False)))
    present = [n for n in RULE_NAMES if n in rules]
    reason_arr = F.array_compact(
        F.array(
            *[
                F.when(F.col(f"rule_{n}"), F.lit(n)).otherwise(F.lit(None))
                for n in present
            ]
        )
    )
    out = out.withColumn("drop_reasons", reason_arr)
    out = out.withColumn("keep", F.size(F.col("drop_reasons")) == 0)
    return out
