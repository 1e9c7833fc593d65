#!/usr/bin/env python
"""Strict dtype / lexical-representation audit of oracle pairs.

The driver's correctness gate hashes stringified values, so a DuckDB
column that comes back float64 (HUGEINT/DECIMAL promotion) against a
Spark bigint hashes differently ("5.0" vs "5") even when the local
comparator's numeric compare passes — exactly the round-4 BPE failure.
This tool reruns query/oracle pairs and flags any column whose pandas
dtype KIND (int/float/object/bool/datetime) differs between the Spark
and DuckDB results, plus object columns whose Python element types
differ (Decimal vs int vs str).

Usage: python tools/check_dtypes.py [sf_dir] [query ...]
       (no query args = all registry entries)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def elem_type(series: pd.Series) -> str:
    for v in series:
        if v is not None and v == v:
            return type(v).__name__
    return "empty"


def audit(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    for c in sorted(set(sdf.columns) & set(ddf.columns)):
        sk, dk = sdf[c].dtype.kind, ddf[c].dtype.kind
        if sk != dk:
            problems.append(f"col {c}: spark dtype kind '{sk}' "
                            f"({sdf[c].dtype}) vs duck '{dk}' ({ddf[c].dtype})")
        elif sk == "O":
            se, de = elem_type(sdf[c]), elem_type(ddf[c])
            if se != de and "empty" not in (se, de):
                problems.append(f"col {c}: spark elem {se} vs duck elem {de}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from baselinr_spark.session import build_session

    spark = build_session(app_name="check_dtypes", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    flagged = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERR   {name}: {str(e)[:200]}")
            flagged.append(name)
            continue
        problems = audit(name, sdf, ddf)
        if problems:
            print(f"FLAG  {name}:")
            for p in problems:
                print(f"      {p}")
            flagged.append(name)
        else:
            print(f"OK    {name}")

    print(f"\n{len(flagged)} flagged" if flagged else "\nall dtype-clean")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
