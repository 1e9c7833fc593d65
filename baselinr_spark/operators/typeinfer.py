"""Semantic type inference from values (SURVEY.md §1.2, §2.4).

Recasts the reference's sampled-value classifier
(/root/reference/baselinr/profiling/metrics.py:696-833): stringify
values, test regex/parse heuristics, classify by dominant pattern.
Differences from the reference, chosen for engine-portability:

- computed over ALL non-null values in ONE aggregation pass instead of a
  driver-side loop over a 1000-row sample (the reference's per-column
  sample query fan-out is a warehouse-round-trip artifact, SURVEY.md §4);
- a value class wins when ≥ `threshold` (0.9) of non-null values match;
- `json` detection is omitted (needs a parser, not a regex; schema here
  is fixed so it never fires in the reference either).

Patterns are ASCII-only and valid in both Java regex (Spark `rlike`) and
RE2 (DuckDB `regexp_matches`), so the oracle can mirror them literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (type_name, pattern, lowercase_first) — priority order = reference's
#: check order (metrics.py:755-833)
SEMANTIC_PATTERNS: tuple[tuple[str, str, bool], ...] = (
    ("boolean", r"^(true|false|t|f|yes|no|0|1)$", True),
    ("integer", r"^[+-]?[0-9]+$", False),
    ("numeric", r"^[+-]?([0-9]*\.)?[0-9]+$", False),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T][0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?)?$", False),
    ("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$", False),
    ("url", r"^https?://[^\s/$.?#][^\s]*$", False),
    ("uuid", r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$", False),
)


def infer_semantic_types(
    df: DataFrame, columns: list[str], threshold: float = 0.9
) -> DataFrame:
    """One row per column: (column_name, inferred_type). Single full-scan
    aggregation for every column × pattern at once."""
    aggs = []
    for c in columns:
        s = F.col(c).cast("string")
        for tname, pat, lower in SEMANTIC_PATTERNS:
            probe = (F.lower(s) if lower else s).rlike(pat).cast("double")
            aggs.append(
                F.avg(F.when(s.isNotNull(), probe)).alias(f"{c}\t{tname}")
            )
    row = df.agg(*aggs)

    structs = []
    for c in columns:
        inferred = F.lit("string")
        for tname, _, _ in reversed(SEMANTIC_PATTERNS):
            frac = F.col(f"`{c}\t{tname}`")
            inferred = F.when(
                frac.isNotNull() & (frac >= threshold), F.lit(tname)
            ).otherwise(inferred)
        structs.append(
            F.struct(F.lit(c).alias("column_name"), inferred.alias("inferred_type"))
        )
    return row.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")


def oracle_sql_for(table: str, columns: list[str], threshold: float = 0.9) -> str:
    """DuckDB SQL computing the identical classification (oracle mirror)."""
    parts = []
    for c in columns:
        fracs = []
        case = "'string'"
        for tname, pat, lower in reversed(SEMANTIC_PATTERNS):
            subject = f"lower({c}::varchar)" if lower else f"{c}::varchar"
            fracs.append(
                f"avg(CASE WHEN {c} IS NOT NULL THEN "
                f"(CASE WHEN regexp_matches({subject}, '{pat}') THEN 1.0 ELSE 0.0 END) "
                f"END) AS f_{tname}"
            )
            case = (
                f"CASE WHEN f_{tname} IS NOT NULL AND f_{tname} >= {threshold} "
                f"THEN '{tname}' ELSE {case} END"
            )
        parts.append(
            f"SELECT '{c}' AS column_name, {case} AS inferred_type "
            f"FROM (SELECT {', '.join(fracs)} FROM {table})"
        )
    return " UNION ALL ".join(parts)
