"""Windowed event aggregation — batch-first (oracle-checkable), with
Structured Streaming variants of the same logic.
"""

from powersql_spark.streaming import stateful, windows  # noqa: F401
