"""Metadata query layer: read-side API over runs/metrics/events/lineage."""
