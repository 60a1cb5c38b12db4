"""powersql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of PowerSQL (reference: /root/reference,
Rust, MIT), rebuilt Spark-first.

The reference is a SQL transformation orchestrator (parse -> DAG ->
type-check -> schedule -> materialize -> ASSERT tests) that delegates all
query execution to PostgreSQL/BigQuery (reference src/execute.rs:101,222).
Here, Spark SQL + Catalyst replace the warehouse: models materialize as
views/tables in the SparkSession catalog, Catalyst optimizes and executes,
and the orchestration layer is thin pure Python (see
powersql_spark.orchestrator).

Layers
------
- ``session``      : tuned SparkSession builders (AQE, shuffle sizing).
- ``catalog``      : testdata parquet registration.
- ``registry``     : query-key registry backing ``__spark_entry__.py``.
- ``operators``    : the SQL-surface parity operators (SURVEY.md §2.B).
- ``pipeline``     : LLM-data-pipeline extensions (dedup, similarity,
                     text analysis, multimodal) — beyond the reference.
- ``streaming``    : windowed/sessionized event aggregation, batch and
                     Structured Streaming variants.
- ``orchestrator`` : PowerSQL-parity tool (config, DAG, check/run/test/docs).
"""

__version__ = "0.1.0"
