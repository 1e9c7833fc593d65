"""Explainer assembly tests — hand-computed parity with the reference
templates (llm/templates.py) and prompt shapes (llm/prompts.py)."""

from baselinr_spark.operators.explainer import assemble_anomaly_context

_SCHEMA = (
    "table_name string, column_name string, metric_name string, "
    "anomaly_type string, detection_method string, severity string, "
    "expected_value double, actual_value double, deviation_score double, "
    "lower_control_limit double, upper_control_limit double, "
    "historical_values_count int, ewma_value double"
)
_FIELDS = [f.split()[0] for f in _SCHEMA.split(", ")]


def _row(**over):
    base = dict(
        table_name="orders", column_name="amount",
        metric_name="mean", anomaly_type="control_limit_breach",
        detection_method="control_limits", severity="high",
        expected_value=100.0, actual_value=125.5, deviation_score=3.4,
        lower_control_limit=85.0, upper_control_limit=115.0,
        historical_values_count=30, ewma_value=None,
    )
    base.update(over)
    return tuple(base[f] for f in _FIELDS)


def test_prompt_control_limits_full(spark):
    out = assemble_anomaly_context(spark.createDataFrame([_row()], _SCHEMA)).collect()[0]
    assert out["prompt"] == (
        "An anomaly was detected:\n\n"
        "Table: orders\nColumn: amount\nMetric: mean\n"
        "Anomaly Type: control_limit_breach\n"
        "Detection Method: control_limits\nSeverity: HIGH\n\n"
        "Expected value: 100.00\nActual value: 125.50\n"
        "Deviation: 3.40 standard deviations from expected\n"
        "Control limits: [85.00, 115.00]\n\n"
        "Explain this anomaly in 2-4 clear sentences for a data engineer."
    )
    # templates.py:78-146 exact rendering, high-severity closing
    assert out["explanation"] == (
        "Anomaly detected in orders.amount: mean value of 125.50"
        " deviates from expected value of 100.00 by 25.50"
        " (outside control limits)"
        ". This is a control_limit_breach anomaly of high severity"
        " that requires immediate attention."
    )


def test_prompt_iqr_history_and_medium_severity(spark):
    row = _row(detection_method="iqr", anomaly_type="distribution_shift",
               severity="medium", deviation_score=None)
    out = assemble_anomaly_context(spark.createDataFrame([row], _SCHEMA)).collect()[0]
    # iqr: no deviation line, no control-limit line, history count line
    assert "\nDeviation:" not in out["prompt"]
    assert "Control limits" not in out["prompt"]
    assert "\nBased on 30 historical values\n" in out["prompt"]
    assert out["explanation"].endswith(
        " (outside interquartile range). This distribution_shift anomaly"
        " is of medium severity and should be investigated."
    )


def test_prompt_ewma_and_low_severity(spark):
    row = _row(detection_method="ewma", severity="low", ewma_value=103.25,
               lower_control_limit=None, upper_control_limit=None,
               historical_values_count=None)
    out = assemble_anomaly_context(spark.createDataFrame([row], _SCHEMA)).collect()[0]
    assert "\nEWMA value: 103.25\n" in out["prompt"]
    assert out["explanation"].endswith(
        " (outside exponentially weighted moving average range)."
        " This control_limit_breach anomaly is of low severity"
        " but should be monitored."
    )


def test_explanation_without_expected_value(spark):
    row = _row(expected_value=None, detection_method="regime_shift")
    out = assemble_anomaly_context(spark.createDataFrame([row], _SCHEMA)).collect()[0]
    # no deviation clause when expected is null (templates.py:111-116)
    assert out["explanation"].startswith(
        "Anomaly detected in orders.amount: mean value of 125.50"
        " (regime shift detected)."
    )
