"""PII / toxicity scrub pass.

Patterns seed from the reference's built-in format validators
(/root/reference/baselinr/validation/validators/format_validator.py:125-129
— email/url/phone regexes) extended per the north rule with IPv4 and a
toxicity lexicon. Two implementations:

1. `scrub_expr` — native `regexp_replace` chain (JVM, codegen). The
   patterns are ASCII-only and avoid constructs where Java regex, RE2
   (DuckDB) and Python `re` could diverge, so all three engines produce
   byte-identical output.
2. `scrub_pandas_udf` — Arrow-batched pandas UDF applying the *same
   compiled Python patterns* as the pure-python oracle
   (oracle/pandas_ref.py). This is the byte-identity-guaranteed path
   (SURVEY.md §7 risk register); the pipeline uses the native expr chain
   by default and the tests assert both agree.

Replacement order is fixed: email → phone → ipv4 → toxicity.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.pages import TOX_LEXICON

#: (name, pattern, replacement) — applied in order
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # email: reference format_validator.py:125 shape, unanchored
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # phone: fixed international format planted by the generator
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}-[0-9]{4}", "<PHONE>"),
    # ipv4
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # toxicity lexicon, case-insensitive whole words
    ("tox", r"(?i)\b(?:" + "|".join(TOX_LEXICON) + r")\b", "<TOX>"),
)

_COMPILED = [(re.compile(p), r) for _, p, r in SCRUB_PATTERNS]


def scrub_python(text: str | None) -> str | None:
    """Pure-python scrub — the oracle implementation."""
    if text is None:
        return None
    for pat, repl in _COMPILED:
        text = pat.sub(repl, text)
    return text


def scrub_expr(col: Column) -> Column:
    """Native regexp_replace chain (JVM-side)."""
    out = col
    for _, pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


@F.pandas_udf(T.StringType())
def scrub_pandas_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched scrub with the exact oracle patterns."""
    return texts.map(scrub_python)
