"""Table-name pattern matching for profiling-scope selection.

Recasts /root/reference/baselinr/profiling/table_matcher.py:12-300:
wildcard patterns (``*``/``?``/character classes, compiled to anchored
regexes), regex patterns, include/exclude filtering, and priority
resolution. Like the column matcher this is driver-side catalog
metadata work — it decides WHICH tables a profiling run plans over, so
its cost is O(tables), and the pruning happens before any Spark job is
built (a table that doesn't match never even gets a scan planned).
"""

from __future__ import annotations

import re


def wildcard_to_regex(pattern: str) -> str:
    """Wildcard → anchored regex (reference table_matcher.py:54-121):
    ``*`` → ``.*``, ``?`` → ``.``, character classes preserved,
    backslash escapes the next char, other regex metachars escaped."""
    parts: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        elif ch == "[":
            start = len(parts)
            parts.append("[")
            i += 1
            closed = False
            while i < n:
                nxt = pattern[i]
                parts.append(nxt)
                if nxt == "]":
                    closed = True
                    i += 1
                    break
                if nxt == "\\" and i + 1 < n:
                    i += 1
                    parts.append(pattern[i])
                i += 1
            if not closed:
                # unclosed bracket → literal '[' (reference :96-99)
                parts[start:] = ["\\["] + parts[start + 1:]
            continue
        elif ch == "\\":
            if i + 1 < n:
                i += 1
                parts.append(pattern[i])
            else:
                parts.append("\\\\")
        elif ch in r".+^$(){}|":
            parts.append("\\" + ch)
        else:
            parts.append(ch)
        i += 1
    return "^" + "".join(parts) + "$"


def match_table(
    table_name: str, pattern: str, pattern_type: str | None = None
) -> bool:
    """True if ``table_name`` matches ``pattern``
    (table_matcher.py:141-184). Regex patterns use ``re.match``
    (prefix-anchored, like the reference); wildcards are fully
    anchored."""
    if pattern_type == "regex":
        return bool(re.match(pattern, table_name))
    return bool(re.match(wildcard_to_regex(pattern), table_name))


def matches_exclude_patterns(
    table_name: str,
    exclude_patterns: list[str] | None,
    pattern_type: str | None = None,
) -> bool:
    """True if any exclude pattern matches (table_matcher.py:204-225)."""
    return any(
        match_table(table_name, p, pattern_type)
        for p in (exclude_patterns or [])
    )


def filter_tables(
    tables: list[str],
    pattern: str | None = None,
    pattern_type: str | None = None,
    exclude_patterns: list[str] | None = None,
) -> list[str]:
    """Include-then-exclude table filtering (table_matcher.py:226-268);
    preserves catalog order."""
    out = list(tables)
    if pattern:
        out = [t for t in out if match_table(t, pattern, pattern_type)]
    if exclude_patterns:
        out = [
            t for t in out
            if not matches_exclude_patterns(t, exclude_patterns, pattern_type)
        ]
    return out


def resolve_priority(
    table_matches: list[tuple[str, int]], keep_highest: bool = True
) -> list[str]:
    """Collapse duplicate (table, priority) matches keeping the
    highest (or lowest) priority per table, ordered by priority
    (table_matcher.py:269-300)."""
    pri: dict[str, int] = {}
    for name, p in table_matches:
        if name not in pri:
            pri[name] = p
        else:
            pri[name] = max(pri[name], p) if keep_highest else min(pri[name], p)
    ordered = sorted(pri.items(), key=lambda kv: kv[1], reverse=keep_highest)
    return [name for name, _ in ordered]


def filter_tables_by_tags(
    tables: list[str],
    table_tags: dict[str, list[str]],
    required_tags: list[str] | None = None,
    any_tags: list[str] | None = None,
) -> list[str]:
    """Tag-based table scoping (reference
    profiling/tag_metadata.py:43-84): keep tables carrying ALL
    ``required_tags`` (AND) and at least one of ``any_tags`` (OR); with
    neither, everything passes. ``table_tags`` maps table → tags — in
    production populated from Iceberg/catalog table properties (the
    parquet-warehouse analog of Snowflake object tags / BigQuery
    labels); here a plain dict keeps it engine-agnostic."""
    if not required_tags and not any_tags:
        return list(tables)
    out = []
    for t in tables:
        tags = table_tags.get(t, [])
        if required_tags and not all(tag in tags for tag in required_tags):
            continue
        if any_tags and not any(tag in tags for tag in any_tags):
            continue
        out.append(t)
    return out
