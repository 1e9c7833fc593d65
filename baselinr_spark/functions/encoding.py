"""Encoding-quality signals for web-extracted text.

Real Common-Crawl extraction produces mojibake (UTF-8 bytes decoded as
cp1252/Latin-1: ``â€™`` for a right quote,
``Ã©`` for ``é``), U+FFFD replacement characters from
lossy decodes, and stray C0 control bytes. Production pipelines (ftfy,
CCNet's preprocessing, Dolma's taggers) score these per document and
drop or fix the worst pages. The reference repo has no text-encoding
surface (its validators are schema/format rules,
`/root/reference/baselinr/validation/rules.py`), so this module is
additive web-text-tier coverage.

All signals are native Spark expressions (``regexp_count`` /
``length`` arithmetic) — whole-stage-codegen, zero Python, so the
scan at 10^12 documents stays one codegen stage with no shuffle. The
regex patterns use only hex/code-point escapes and character classes,
written identically for the Java (Spark) and RE2 (DuckDB oracle)
engines; the oracle SQL interpolates these same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# UTF-8-decoded-as-cp1252/Latin-1 artifact shape: an opener A-tilde
# (U+00C3, from lead byte C3: two-byte letters), A-circumflex (U+00C2:
# NBSP/guillemet family) or a-circumflex (U+00E2: the three-byte
# punctuation family) followed by a continuation char — a raw Latin-1
# 80-BF decode or a cp1252 remap of bytes 80-9F (euro, dagger, single/
# double curly quotes, bullets, dashes, trademark, OE/oe, S/Z-caron,
# Y-diaeresis...). Each artifact counts once: the opener+continuation
# match consumes the pair, and continuation chars are never openers.
# \x{...} code-point escapes are valid in BOTH Java regex and RE2.
_MOJI_CONT = (
    "\\x{0080}-\\x{00BF}"
    "\\x{20AC}\\x{201A}\\x{0192}\\x{201E}\\x{2026}\\x{2020}\\x{2021}"
    "\\x{02C6}\\x{2030}\\x{0160}\\x{2039}\\x{0152}\\x{017D}"
    "\\x{2018}\\x{2019}\\x{201C}\\x{201D}\\x{2022}\\x{2013}\\x{2014}"
    "\\x{02DC}\\x{2122}\\x{0161}\\x{203A}\\x{0153}\\x{017E}\\x{0178}"
)
MOJIBAKE_RE = "[\\x{00C3}\\x{00C2}\\x{00E2}][" + _MOJI_CONT + "]"
# C0 controls except tab (09), LF (0A), CR (0D)
CONTROL_RE = "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}]"
REPLACEMENT_CHAR = "\\x{FFFD}"


def mojibake_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(MOJIBAKE_RE))


def control_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(CONTROL_RE))


def replacement_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(REPLACEMENT_CHAR))


def with_encoding_features(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_bad_fraction: float = 0.01,
    max_mojibake: int = 2,
) -> DataFrame:
    """Append encoding-quality columns:

    - ``replacement_count`` — U+FFFD occurrences
    - ``control_count`` — C0 controls (tab/newline/CR exempt)
    - ``mojibake_count`` — UTF-8-as-cp1252 artifact sequences
    - ``bad_char_fraction`` — (replacement + control) / chars
    - ``encoding_ok`` — keep flag: bad_char_fraction <=
      ``max_bad_fraction`` AND mojibake_count <= ``max_mojibake``

    The keep rule mirrors ftfy-style triage: a handful of artifacts is
    fixable noise; a saturated page is an extraction failure.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.greatest(F.length(t), F.lit(1))
    repl = replacement_char_count(t)
    ctrl = control_char_count(t)
    moji = mojibake_count(t)
    bad_frac = (repl + ctrl) / n
    return df.select(
        "*",
        repl.alias("replacement_count"),
        ctrl.alias("control_count"),
        moji.alias("mojibake_count"),
        bad_frac.alias("bad_char_fraction"),
        (
            (bad_frac <= F.lit(max_bad_fraction))
            & (moji <= F.lit(max_mojibake))
        ).alias("encoding_ok"),
    )
