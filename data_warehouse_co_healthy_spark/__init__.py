"""PySpark-native analytics engine with the capabilities of
ManuelM07/data_warehouse_CO_healthy (reference at /root/reference),
rebuilt Spark-first.

Layout:
  session    — single tuned SparkSession factory (vs reference's 4 builders,
               dimension.py:13, medical_formula_process.py:11-14, ...)
  schemas    — explicit StructTypes (reference infers everywhere, SURVEY §1.3)
  catalog    — fixture loader + temp-view registration
  operators  — relational operator library (projections, joins, setops,
               aggregates, windows)
  functions  — scalar/date/text function library
  sources    — readers/writers (parquet/csv/json/jdbc wrappers)
  plans      — declared query corpus with DuckDB oracle SQL (the t2 gate)
  pipelines  — CO_healthy parity pipelines (dims + 4 fact pipelines)
  llm        — large-scale training-data ops: dedup, similarity, text analysis
  streaming  — Structured Streaming demo over the events table
"""

__version__ = "0.1.0"
