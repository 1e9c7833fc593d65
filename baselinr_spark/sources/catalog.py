"""Local 'warehouse' abstraction: Iceberg when available, partitioned
parquet otherwise.

The north rule targets Iceberg tables partitioned by days(warc_ts). This
sandbox image ships no iceberg-spark runtime jar (checked: no ivy cache,
no iceberg jar under $SPARK_HOME/jars), so — per the SURVEY.md §7 risk
register — we emulate the two Iceberg features the pipeline actually
relies on:

1. *partition transform* days(warc_ts) → explicit `dt` date column +
   parquet `partitionBy("dt")` (Catalyst still prunes on dt predicates);
2. *metadata tables* (`db.pages.partitions`, snapshot manifest) → a
   `processed_partitions` parquet manifest (sources/manifest.py) and
   filesystem listing for partition discovery.

Writes use dynamic partition overwrite, which is the idempotence
primitive Iceberg's `REPLACE PARTITIONS` would give us: re-running a
partition replaces exactly that partition's files.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not available in this image
    import importlib

    _ICEBERG = importlib.util.find_spec("pyiceberg") is not None
except Exception:  # pragma: no cover
    _ICEBERG = False


def list_partitions(path: str, partition_col: str = "dt") -> list[str]:
    """Filesystem partition discovery (stand-in for the Iceberg
    `.partitions` metadata table; cf. reference planner's list_tables
    expansion /root/reference/baselinr/planner.py:379-713)."""
    if not os.path.isdir(path):
        return []
    pat = re.compile(re.escape(partition_col) + r"=(.+)$")
    out = []
    for name in os.listdir(path):
        m = pat.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            out.append(m.group(1))
    return sorted(out)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_col: str = "dt") -> None:
    """Dynamic partition overwrite — only partitions present in `df` are
    replaced; everything else is untouched (Iceberg REPLACE PARTITIONS
    semantics)."""
    (
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


#: common partition-column name patterns, in reference order
#: (/root/reference/baselinr/profiling/query_builder.py:252-262)
PARTITION_NAME_PATTERNS = (
    "date", "event_date", "partition_date", "created_at", "updated_at",
    "timestamp", "dt", "ds",
)


def infer_partition_key(df: DataFrame) -> str | None:
    """Infer the partition column from the schema (reference
    query_builder.py:237-280): a column whose lower-cased name is one of
    the common patterns wins; otherwise a DATE/TIMESTAMP-typed column
    whose name contains 'date'. Returns None when nothing matches —
    driver-side schema metadata only, no scan."""
    for field in df.schema.fields:
        if field.name.lower() in PARTITION_NAME_PATTERNS:
            return field.name
    for field in df.schema.fields:
        type_str = field.dataType.simpleString().lower()
        if any(t in type_str for t in ("date", "timestamp")):
            if "date" in field.name.lower():
                return field.name
    return None
