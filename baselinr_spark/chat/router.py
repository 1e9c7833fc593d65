"""Deterministic intent router — the non-LLM half of the reference
chat agent (/root/reference/baselinr/chat/agent.py: the agent loop is
"pick a tool from the registry for the user's question, call it,
render the result"; the picking is an LLM there and a rule table
here — provider calls are out of sandbox scope, exactly like
operators/explainer.py).

`route(question)` maps a question to (tool_name, kwargs) via ordered
regex intents; `answer(registry, question)` executes the routed tool
and renders a compact text summary of the rows. Both are pure
functions of their inputs — testable, replayable, no network.
"""

from __future__ import annotations

import re

from .tools import ToolRegistry

__all__ = ["route", "answer"]

_DT = r"(\d{4}-\d{2}-\d{2})"

# ordered: first match wins (specific before generic)
_INTENTS: list[tuple[str, str, callable]] = [
    (r"compare\s+" + _DT + r"\s+(?:and|vs|with|to)\s+" + _DT,
     "compare_runs",
     lambda m: {"partition_a": m.group(1), "partition_b": m.group(2)}),
    (r"(?:profile|metrics)\b.*?" + _DT,
     "get_table_profile",
     lambda m: {"partition": m.group(1)}),
    (r"(?:feeds|upstream)\b.*?(\S+dt=\S+|\S+/\S+)",
     "get_lineage",
     lambda m: {"table": m.group(1), "direction": "upstream"}),
    (r"downstream\b.*?(\S+dt=\S+|\S+/\S+)",
     "get_lineage",
     lambda m: {"table": m.group(1), "direction": "downstream"}),
    (r"(high|medium|low)\s+severity\s+drift",
     "query_drift_events",
     lambda m: {"severity": m.group(1)}),
    (r"drift\b.*?" + _DT,
     "query_drift_events",
     lambda m: {"partition": m.group(1)}),
    (r"drift",
     "query_drift_events",
     lambda m: {}),
    (r"anomal",
     "query_anomalies",
     lambda m: {}),
    (r"(?:trend|history)\b.*?\b([a-z_]+_rate|count|kept_count)\b",
     "get_column_history",
     lambda m: {"metric_name": m.group(1)}),
    (r"(?:find|search)\b.*?partitions?\b.*?([0-9-]{4,})",
     "search_tables",
     lambda m: {"pattern": m.group(1)}),
    (r"failed\s+runs?",
     "query_recent_runs",
     lambda m: {"status": "failed"}),
    (r"(?:runs?|processed|profiled)\b",
     "query_recent_runs",
     lambda m: {}),
]


def route(question: str) -> tuple[str, dict] | None:
    """(tool_name, kwargs) for the first matching intent, else None."""
    q = question.strip().lower()
    for pattern, tool, extract in _INTENTS:
        m = re.search(pattern, q)
        if m:
            return tool, extract(m)
    return None


def _render(tool_name: str, rows: list[dict]) -> str:
    if not rows:
        return f"{tool_name}: no results."
    cols = list(rows[0].keys())
    lines = [f"{tool_name}: {len(rows)} row(s)"]
    for r in rows[:10]:
        lines.append("  " + ", ".join(f"{c}={r[c]}" for c in cols))
    if len(rows) > 10:
        lines.append(f"  … {len(rows) - 10} more")
    return "\n".join(lines)


def answer(registry: ToolRegistry, question: str) -> str:
    """Route, execute, render. Unroutable questions get the tool list
    (the reference agent falls back to the registry description too,
    chat/agent.py system-prompt assembly)."""
    routed = route(question)
    if routed is None:
        return ("I couldn't map that to a tool. Available tools:\n"
                + registry.get_tool_descriptions())
    name, kwargs = routed
    tool = registry.get_tool(name)
    if tool is None:
        return f"Tool {name!r} is not registered."
    try:
        rows = tool.function(**kwargs)
    except Exception as e:  # tool errors surface as text, agent.py:198
        return f"{name} failed: {e}"
    return _render(name, rows)
