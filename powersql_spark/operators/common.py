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


def sql_jround(expr: str, n: int) -> str:
    """DuckDB replay of Spark's round(double, n).

    Spark's round is half-up on the double's SHORTEST DECIMAL
    REPRESENTATION (BigDecimal.valueOf -> Double.toString), so a value
    whose true decimal terminates exactly on a half boundary (common
    with 2dp money inputs and decimal coefficients) rounds UP when the
    double is the nearest representation of that decimal, but DOWN
    when accumulated float error nudged it below ("...49999999"
    shortest repr). DuckDB's numeric round() and fixed-scale decimal
    casts each get one of those cases wrong; its VARCHAR cast is also
    shortest-roundtrip, so string -> DECIMAL(38,18) -> round replays
    Spark digit-for-digit. Use for rounded DOUBLE expressions whose
    true value can terminate (ratios/folds of low-dp data); plain
    round() is fine for genuinely continuous values."""
    return (
        f"CAST(round(CAST(CAST(({expr}) AS VARCHAR)"
        f" AS DECIMAL(38,18)), {n}) AS DOUBLE)"
    )
