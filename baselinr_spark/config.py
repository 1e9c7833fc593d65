"""Filter thresholds and pipeline configuration.

The rule set recasts baselinr's row-level validators
(/root/reference/baselinr/validation/validators/*.py, §2.10 of SURVEY.md)
as Gopher/C4-style document-quality heuristics: each rule is a boolean
fail-predicate over per-document features; keep = no rule fired;
per-partition failure_rate = avg(rule fired) * 100, matching the
reference's failed_rows/total_rows*100 semantics
(/root/reference/baselinr/validation/validators/null_validator.py:81).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FilterConfig:
    # Gopher-ish document heuristics
    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_length: float = 3.0
    max_mean_word_length: float = 10.0
    max_symbol_ratio: float = 0.10        # non-alnum-non-space chars / chars
    min_stopword_fraction: float = 0.06   # stopword hits / words
    max_dup_line_fraction: float = 0.30   # 1 - distinct_lines/lines
    # model-based rules
    min_lang_confidence: float = 0.65
    allowed_langs: tuple[str, ...] = ("aa", "bb", "cc")
    max_perplexity: float = 3000.0
    # drift (PSI) semantics per
    # /root/reference/baselinr/drift/statistical_tests.py:396-404,468-477,605-609
    psi_buckets: int = 10
    psi_threshold: float = 0.2
    psi_floor: float = 0.0001
    # profiling histogram semantics per
    # /root/reference/baselinr/profiling/metrics.py:324-362 + config/schema.py:537
    histogram_bins: int = 10


#: rule name -> stable ordering for drop_reasons arrays
RULE_NAMES: tuple[str, ...] = (
    "too_short",
    "too_long",
    "mean_word_length",
    "symbol_ratio",
    "stopword_fraction",
    "dup_lines",
    "langid",
    "perplexity",
)

DEFAULT_CONFIG = FilterConfig()


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end job configuration (paths are directories of the local
    'warehouse': partitioned parquet emulating Iceberg tables; see
    sources/catalog.py for the Iceberg fallback rationale)."""

    input_path: str = ""
    output_root: str = ""
    filter: FilterConfig = field(default_factory=FilterConfig)
    partition_col: str = "dt"  # derived as date(warc_ts) — days() transform
