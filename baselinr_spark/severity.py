"""The one severity ordering, shared by every consumer.

high > medium > low > none (reference query/client.py:516 and event
severity bands throughout). Hooks filtering, drift-summary rollups, and
the status CLI all import from here so the ordering cannot skew.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEVERITY_RANK: dict[str, int] = {"none": 0, "low": 1, "medium": 2, "high": 3}


def severity_rank(name: str) -> int:
    """Rank of a severity name; unknown names raise (a typo silently
    becoming some default threshold is worse than an error)."""
    try:
        return SEVERITY_RANK[name.lower()]
    except (KeyError, AttributeError):
        raise ValueError(
            f"unknown severity {name!r}; expected one of "
            f"{sorted(SEVERITY_RANK)}"
        ) from None


def severity_rank_expr(col: Column) -> Column:
    """Catalyst expression mapping a severity column to its rank
    (unknown/null → 0)."""
    expr = F.lit(0)
    for name, pri in SEVERITY_RANK.items():
        expr = F.when(F.lower(col) == name, F.lit(pri)).otherwise(expr)
    return expr
