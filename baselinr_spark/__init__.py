"""baselinr_spark — a PySpark-native web-text quality-filter & data-quality
engine, built from scratch with the analytical capabilities of
baselinrhq/baselinr (profiling, validation, drift, anomaly detection,
incremental planning) recast Spark-first.

Reference semantics are cited per-module as /root/reference/<file>:<lines>.
The execution model is entirely Spark DataFrame/Catalyst: one declarative
plan per job, vectorized Arrow pandas UDFs for model scoring, no per-row
Python in any hot path.
"""

__version__ = "0.1.0"
