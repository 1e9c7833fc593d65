"""Explanation assembly — the deterministic half of the reference's
LLM explainer, as pure string-expression columns.

Recasts /root/reference/baselinr/llm/{explainer.py,prompts.py,
templates.py}: the reference formats one anomaly dict at a time on the
driver (construct_anomaly_prompt, prompts.py:103-170; the template
fallback generate_anomaly_explanation, templates.py:78-146). Here both
renderings are Catalyst string expressions over an anomaly DataFrame —
a corpus of 10^9 alerts renders in one WholeStageCodegen pass, no
Python in the loop. Provider calls (explainer.py:100-146) are out of
scope by design: this module produces the prompt/context that WOULD be
sent plus the deterministic template explanation the reference falls
back to when no provider is configured.

Documented deviation: the reference interpolates expected/actual into
the PROMPT with raw Python str() (prompts.py:142-143); here they are
rendered to 2 decimals like every other numeric in the prompt, so the
output is reproducible across engines and float-repr conventions. The
template explanation already used 2-decimal formatting in the
reference (templates.py:103-110) and matches exactly.

Number formatting: %.2f after an explicit HALF_UP round(·, 2) — both
Spark and DuckDB round half-up for doubles, and printf of a double
within half-ulp of a 2-decimal value is engine-independent, so oracle
string comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fmt2(c: Column) -> Column:
    return F.format_string("%.2f", F.round(c.cast("double"), 2))


#: method → parenthetical context appended to the template explanation
#: (templates.py:118-129)
METHOD_CONTEXT = {
    "control_limits": " (outside control limits)",
    "iqr": " (outside interquartile range)",
    "mad": " (outside median absolute deviation range)",
    "ewma": " (outside exponentially weighted moving average range)",
    "trend_seasonality": " (unexpected trend or seasonal pattern)",
    "regime_shift": " (regime shift detected)",
}


def anomaly_prompt(
    table: Column,
    column: Column,
    metric: Column,
    anomaly_type: Column,
    detection_method: Column,
    severity: Column,
    expected_value: Column,
    actual_value: Column,
    deviation_score: Column | None = None,
    lower_control_limit: Column | None = None,
    upper_control_limit: Column | None = None,
    historical_values_count: Column | None = None,
    ewma_value: Column | None = None,
) -> Column:
    """construct_anomaly_prompt (prompts.py:103-170) as one expression:
    header block, expected/actual, optional deviation line, then the
    method-specific metadata line (control limits / history count /
    EWMA), closing with the instruction sentence."""
    parts: list[Column] = [
        F.lit("An anomaly was detected:\n\nTable: "), table,
        F.lit("\nColumn: "), column,
        F.lit("\nMetric: "), metric,
        F.lit("\nAnomaly Type: "), anomaly_type,
        F.lit("\nDetection Method: "), detection_method,
        F.lit("\nSeverity: "), F.upper(severity),
        F.lit("\n\nExpected value: "), _fmt2(expected_value),
        F.lit("\nActual value: "), _fmt2(actual_value),
    ]
    if deviation_score is not None:
        parts.append(
            F.when(
                deviation_score.isNotNull(),
                F.concat(
                    F.lit("\nDeviation: "), _fmt2(deviation_score),
                    F.lit(" standard deviations from expected"),
                ),
            ).otherwise(F.lit(""))
        )
    if lower_control_limit is not None and upper_control_limit is not None:
        parts.append(
            F.when(
                (detection_method == "control_limits")
                & lower_control_limit.isNotNull()
                & upper_control_limit.isNotNull(),
                F.concat(
                    F.lit("\nControl limits: ["), _fmt2(lower_control_limit),
                    F.lit(", "), _fmt2(upper_control_limit), F.lit("]"),
                ),
            ).otherwise(F.lit(""))
        )
    if historical_values_count is not None:
        parts.append(
            F.when(
                detection_method.isin("iqr", "mad")
                & historical_values_count.isNotNull(),
                F.concat(
                    F.lit("\nBased on "),
                    historical_values_count.cast("long").cast("string"),
                    F.lit(" historical values"),
                ),
            ).otherwise(F.lit(""))
        )
    if ewma_value is not None:
        parts.append(
            F.when(
                (detection_method == "ewma") & ewma_value.isNotNull(),
                F.concat(F.lit("\nEWMA value: "), _fmt2(ewma_value)),
            ).otherwise(F.lit(""))
        )
    parts.append(
        F.lit("\n\nExplain this anomaly in 2-4 clear sentences for a data engineer.")
    )
    return F.concat(*parts)


def anomaly_template_explanation(
    table: Column,
    column: Column,
    metric: Column,
    anomaly_type: Column,
    detection_method: Column,
    severity: Column,
    expected_value: Column,
    actual_value: Column,
) -> Column:
    """generate_anomaly_explanation (templates.py:78-146): value
    sentence, deviation clause when expected is present, the
    method-specific parenthetical, then the severity+type closing."""
    base = F.concat(
        F.lit("Anomaly detected in "), table, F.lit("."), column,
        F.lit(": "), metric, F.lit(" value of "), _fmt2(actual_value),
    )
    dev = F.when(
        expected_value.isNotNull(),
        F.concat(
            F.lit(" deviates from expected value of "), _fmt2(expected_value),
            F.lit(" by "), _fmt2(F.abs(actual_value - expected_value)),
        ),
    ).otherwise(F.lit(""))
    ctx = F.lit("")
    for method, text in METHOD_CONTEXT.items():
        ctx = F.when(detection_method == method, F.lit(text)).otherwise(ctx)
    closing = (
        F.when(
            severity == "high",
            F.concat(
                F.lit(". This is a "), anomaly_type,
                F.lit(" anomaly of high severity that requires immediate attention."),
            ),
        )
        .when(
            severity == "medium",
            F.concat(
                F.lit(". This "), anomaly_type,
                F.lit(" anomaly is of medium severity and should be investigated."),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(". This "), anomaly_type,
                F.lit(" anomaly is of low severity but should be monitored."),
            )
        )
    )
    return F.concat(base, dev, ctx, closing)


def assemble_anomaly_context(anomalies: DataFrame) -> DataFrame:
    """One-pass context assembly over an anomaly table with the
    reference AnomalyResult column shape (table_name, column_name,
    metric_name, anomaly_type, detection_method, severity,
    expected_value, actual_value, deviation_score, and optional
    lower/upper_control_limit, historical_values_count, ewma_value):
    appends `prompt` and `explanation` columns (explainer.py
    generate_explanation with no provider = prompt construction +
    template fallback)."""
    cols = anomalies.columns
    opt = lambda name: F.col(name) if name in cols else None  # noqa: E731
    return anomalies.withColumn(
        "prompt",
        anomaly_prompt(
            F.col("table_name"), F.col("column_name"), F.col("metric_name"),
            F.col("anomaly_type"), F.col("detection_method"),
            F.col("severity"), F.col("expected_value"), F.col("actual_value"),
            deviation_score=opt("deviation_score"),
            lower_control_limit=opt("lower_control_limit"),
            upper_control_limit=opt("upper_control_limit"),
            historical_values_count=opt("historical_values_count"),
            ewma_value=opt("ewma_value"),
        ),
    ).withColumn(
        "explanation",
        anomaly_template_explanation(
            F.col("table_name"), F.col("column_name"), F.col("metric_name"),
            F.col("anomaly_type"), F.col("detection_method"),
            F.col("severity"), F.col("expected_value"), F.col("actual_value"),
        ),
    )
