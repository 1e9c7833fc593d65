"""Orchestrator integrations: dbt manifest/selector parsing (pure
JSON, fully functional), Airflow operators and Dagster sensor/asset
glue (import-gated exactly like the reference — the orchestrator
packages are optional dependencies)."""
