"""Column-name pattern matching for profiling column selection.

Recasts /root/reference/baselinr/profiling/column_matcher.py:18-170:
wildcard (fnmatch, the default) and regex patterns, first-match-wins
config resolution, per-pattern enable/disable, and the
include_defaults fallback (no configs → profile everything). This is
driver-side schema metadata work — it selects which columns enter the
single-pass `profile()` aggregation, so pattern cost is O(columns),
never O(rows).
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass


@dataclass(frozen=True)
class ColumnPattern:
    """One column-selection rule (reference ColumnConfig subset:
    name/pattern_type/profiling.enabled)."""
    name: str
    pattern_type: str = "wildcard"  # wildcard | regex | literal
    enabled: bool = True


def _matches(column_name: str, pat: ColumnPattern) -> bool:
    if pat.pattern_type == "regex":
        try:
            return bool(re.match(pat.name, column_name))
        except re.error:
            # reference column_matcher.py:66-72: invalid regex → literal
            return column_name == pat.name
    if pat.pattern_type == "literal":
        return column_name == pat.name
    return fnmatch.fnmatch(column_name, pat.name)


def find_matching_pattern(
    column_name: str, patterns: list[ColumnPattern]
) -> ColumnPattern | None:
    """First matching pattern wins (column_matcher.py:137-138)."""
    for pat in patterns:
        if _matches(column_name, pat):
            return pat
    return None


def select_columns(
    all_columns: list[str],
    patterns: list[ColumnPattern] | None = None,
    include_defaults: bool = True,
) -> list[str]:
    """Columns to profile, in table order (the reference returns a set;
    deterministic order matters for reproducible plans).

    - no patterns → all columns (backward compat, column_matcher.py:125)
    - matched → profiled iff the first matching pattern is enabled
    - unmatched → profiled iff include_defaults (column_matcher.py:147)
    """
    if not patterns:
        return list(all_columns) if include_defaults else []
    out = []
    for c in all_columns:
        pat = find_matching_pattern(c, patterns)
        if pat is not None:
            if pat.enabled:
                out.append(c)
        elif include_defaults:
            out.append(c)
    return out
