"""Shared helpers for parity operators.

Cross-engine float determinism: a SUM over doubles is order-dependent, so
Spark (partition-parallel) and DuckDB (its own order) can differ in the
last ulps — enough to break a value-hash. Casting to DECIMAL(18,6) before
aggregating makes the sum exact and bit-identical in both engines, and —
just as important at 100 TB — makes results independent of partitioning.
The result is cast back to DOUBLE so schemas stay simple.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: str | Column, alias: str) -> Column:
    """Exact, order-independent SUM over a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Exact-numerator AVG: decimal SUM divided by COUNT, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
