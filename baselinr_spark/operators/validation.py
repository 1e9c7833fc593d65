"""Row-level validation rules as DataFrame aggregations.

Recasts the reference's six validators (SURVEY.md §2.10; each is 2-4
COUNT round-trips in /root/reference/baselinr/validation/validators/) into
single-pass conditional aggregates sharing one scan per table. Result
shape mirrors ValidationResult
(/root/reference/baselinr/integrations/validation/base.py:12-88):
(rule_name, column_name, rule_type, total_rows, failed_rows,
failure_rate) with failure_rate = failed/total*100
(null_validator.py:81 semantics; 0.0 when total=0).

Fail predicates (validators cited per rule):
- not_null:     col IS NULL                       (null_validator.py:29-107)
- format:       col IS NOT NULL AND NOT rlike     (format_validator.py:144-286)
- range:        col IS NOT NULL AND (col<min OR col>max)
                                                  (range_validator.py:316-428)
- enum:         col IS NOT NULL AND col NOT IN values
                                                  (enum_validator.py:29-123)
- unique:       failed = nonnull_count − distinct_count (count-level)
                                                  (uniqueness_validator.py:152-251)
- referential:  col IS NOT NULL AND col NOT IN ref (left_anti join)
                                                  (referential_validator.py:280-388)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    rule_type: str  # not_null | format | range | enum | unique | referential
    column: str
    pattern: str | None = None
    min_value: float | None = None
    max_value: float | None = None
    values: tuple = ()
    ref_table: str | None = None   # path or view name, resolved by caller
    ref_column: str | None = None


def _fail_predicate(rule: Rule) -> Column:
    c = F.col(rule.column)
    if rule.rule_type == "not_null":
        return c.isNull()
    if rule.rule_type == "format":
        return c.isNotNull() & ~c.rlike(rule.pattern)
    if rule.rule_type == "range":
        cond = F.lit(False)
        if rule.min_value is not None:
            cond = cond | (c < rule.min_value)
        if rule.max_value is not None:
            cond = cond | (c > rule.max_value)
        return c.isNotNull() & cond
    if rule.rule_type == "enum":
        return c.isNotNull() & ~c.isin(*rule.values)
    raise ValueError(f"not a row-level rule: {rule.rule_type}")


RESULT_COLS = ("rule_name", "column_name", "rule_type", "total_rows",
               "failed_rows", "failure_rate")


def validate(
    df: DataFrame,
    rules: list[Rule],
    ref_dfs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run all rules over `df` in ONE aggregation pass (plus one
    broadcast-anti-join pre-pass per referential rule). Returns the long
    RESULT_COLS shape, one row per rule, ordered as given."""
    ref_dfs = ref_dfs or {}
    exprs = [F.count(F.lit(1)).alias("__total")]
    working = df

    for i, rule in enumerate(rules):
        a = f"__fail_{i}"
        if rule.rule_type == "unique":
            # failed = nonnull − distinct (uniqueness_validator.py:211-222)
            exprs.append(
                (F.count(F.col(rule.column)) - F.count_distinct(F.col(rule.column)))
                .cast("long").alias(a)
            )
        elif rule.rule_type == "referential":
            ref = ref_dfs[rule.ref_table]
            ref_keys = ref.select(
                F.col(rule.ref_column).alias("__refkey")
            ).where(F.col(rule.ref_column).isNotNull()).distinct()
            # broadcast semi-join marker; the anti side is counted in agg
            working = working.join(
                F.broadcast(ref_keys),
                working[rule.column] == F.col("__refkey"),
                "left",
            ).withColumn(
                f"__viol_{i}",
                F.col(rule.column).isNotNull() & F.col("__refkey").isNull(),
            ).drop("__refkey")
            exprs.append(
                F.sum(F.col(f"__viol_{i}").cast("long")).alias(a)
            )
        else:
            exprs.append(
                F.sum(_fail_predicate(rule).cast("long")).alias(a)
            )

    agg = working.agg(*exprs)
    structs = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule_name"),
                F.lit(r.column).alias("column_name"),
                F.lit(r.rule_type).alias("rule_type"),
                F.col("__total").cast("long").alias("total_rows"),
                F.col(f"__fail_{i}").cast("long").alias("failed_rows"),
                F.when(
                    F.col("__total") > 0,
                    F.col(f"__fail_{i}") * 100.0 / F.col("__total"),
                ).otherwise(0.0).alias("failure_rate"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return agg.select(F.explode(structs).alias("kv")).select("kv.*")


def sample_failures(
    df: DataFrame,
    rules: list[Rule],
    ref_dfs: dict[str, DataFrame] | None = None,
    limit: int = 10,
) -> DataFrame:
    """Up to `limit` failing sample values per rule — the
    ValidationResult.sample_failures contract
    (/root/reference/baselinr/integrations/validation/base.py:53-61;
    each validator caps at max_sample_failures=10, e.g.
    format_validator.py:126-150). The reference takes an arbitrary
    LIMIT; here samples are the *smallest* failing values (string
    order) so results are deterministic across engines and reruns.

    Each rule is one filter + TakeOrderedAndProject pass — partial
    top-k per partition, no full sort, no collect; rules with zero
    failures contribute zero rows. For `unique`, samples are the
    duplicated values; for `referential`, the unmatched keys
    (broadcast anti-join).

    Returns (rule_name, column_name, rule_type, sample_value:string)."""
    from functools import reduce

    ref_dfs = ref_dfs or {}
    outs = []
    for rule in rules:
        c = F.col(rule.column)
        if rule.rule_type == "unique":
            failing = (
                df.filter(c.isNotNull())
                .groupBy(rule.column)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .select(c.cast("string").alias("sample_value"))
            )
        elif rule.rule_type == "referential":
            ref = ref_dfs[rule.ref_table]
            ref_keys = ref.select(
                F.col(rule.ref_column).alias("__refkey")
            ).where(F.col(rule.ref_column).isNotNull()).distinct()
            failing = (
                df.filter(c.isNotNull())
                .join(F.broadcast(ref_keys), c == F.col("__refkey"), "left_anti")
                .select(c.cast("string").alias("sample_value"))
            )
        else:
            failing = df.filter(_fail_predicate(rule)).select(
                c.cast("string").alias("sample_value")
            )
        outs.append(
            failing.orderBy(F.asc_nulls_first("sample_value"))
            .limit(limit)
            .select(
                F.lit(rule.name).alias("rule_name"),
                F.lit(rule.column).alias("column_name"),
                F.lit(rule.rule_type).alias("rule_type"),
                "sample_value",
            )
        )
    if not outs:  # no rules -> empty result with the contract schema
        return df.sparkSession.createDataFrame(
            [], "rule_name string, column_name string, rule_type string, "
            "sample_value string",
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def duplicate_samples(df: DataFrame, column: str, limit: int = 10) -> DataFrame:
    """Top duplicate values: GROUP BY col HAVING count>1 LIMIT k
    (uniqueness_validator.py:211-222)."""
    return (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .orderBy(F.desc("dup_count"), F.asc(column))
        .limit(limit)
    )
