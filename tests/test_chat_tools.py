"""Chat tool registry + deterministic router over a real pipeline
output root (reference chat/tools.py contract; provider loop out of
scope, see chat/router.py docstring)."""

import pytest

from baselinr_spark.chat import ToolRegistry, answer, route, setup_tools
from baselinr_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def chat_env(spark, warehouse, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("chat_out"))
    summary = run_pipeline(spark, warehouse, out_root, run_id="chat-run")
    reg = ToolRegistry()
    setup_tools(reg, spark, out_root)
    return reg, sorted(summary["partitions_processed"])


def test_registry_shapes(chat_env):
    reg, _ = chat_env
    names = {t.name for t in reg.list_tools()}
    assert names == {
        "query_recent_runs", "query_drift_events", "query_anomalies",
        "get_table_profile", "get_column_history", "compare_runs",
        "search_tables", "get_lineage",
    }
    oa = reg.to_openai_format()
    assert all(t["type"] == "function" for t in oa)
    an = reg.to_anthropic_format()
    assert all("input_schema" in t for t in an)
    assert "query_drift_events" in reg.get_tool_descriptions()
    assert reg.get_tools_by_category("drift")
    assert reg.get_tool("nope") is None


def test_tools_execute(chat_env):
    reg, parts = chat_env
    runs = reg.get_tool("query_recent_runs").function(limit=100)
    assert {r["partition"] for r in runs} == set(parts)
    assert all(r["status"] == "done" for r in runs)

    prof = reg.get_tool("get_table_profile").function(partition=parts[0])
    assert {"count", "kept_count", "keep_rate"} <= {
        r["metric_name"] for r in prof
    }

    hist = reg.get_tool("get_column_history").function(
        metric_name="keep_rate")
    assert {h["partition"] for h in hist} == set(parts)

    cmpd = reg.get_tool("compare_runs").function(
        partition_a=parts[0], partition_b=parts[1])
    by_metric = {r["metric_name"]: r for r in cmpd}
    assert set(by_metric) == {"count", "kept_count", "keep_rate"}
    a = [h for h in hist if h["partition"] == parts[0]][0]["metric_value"]
    b = [h for h in hist if h["partition"] == parts[1]][0]["metric_value"]
    assert by_metric["keep_rate"]["value_a"] == a
    assert by_metric["keep_rate"]["value_b"] == b

    hits = reg.get_tool("search_tables").function(pattern=parts[0])
    assert [h["partition"] for h in hits] == [parts[0]]

    drift = reg.get_tool("query_drift_events").function(limit=100)
    assert all(e["event_type"] == "distribution_drift" for e in drift)


def test_lineage_tool(chat_env, warehouse):
    import os

    reg, parts = chat_env
    # the input dir of partition p is upstream of its docs output dir;
    # find the output path from lineage by asking downstream of input
    down = reg.get_tool("get_lineage").function(
        table=os.path.join(warehouse, f"dt={parts[0]}"),
        direction="downstream",
    )
    assert len(down) == 1
    assert down[0]["table"].endswith(f"dt={parts[0]}")
    up = reg.get_tool("get_lineage").function(
        table=down[0]["table"], direction="upstream"
    )
    assert [u["table"] for u in up] == [os.path.join(warehouse, f"dt={parts[0]}")]


def test_router(chat_env):
    reg, parts = chat_env
    assert route("show me high severity drift") == (
        "query_drift_events", {"severity": "high"})
    assert route(f"compare {parts[0]} and {parts[1]}") == (
        "compare_runs", {"partition_a": parts[0], "partition_b": parts[1]})
    assert route(f"profile {parts[0]}") == (
        "get_table_profile", {"partition": parts[0]})
    assert route("any anomalies lately?") == ("query_anomalies", {})
    assert route("show failed runs") == (
        "query_recent_runs", {"status": "failed"})
    assert route("what's the trend of keep_rate?") == (
        "get_column_history", {"metric_name": "keep_rate"})
    assert route("completely unrelated question about weather") is None

    txt = answer(reg, f"profile {parts[0]}")
    assert txt.startswith("get_table_profile:") and "keep_rate" in txt
    fallback = answer(reg, "what is the meaning of life")
    assert "Available tools" in fallback
