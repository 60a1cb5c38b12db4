"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``powersql_spark`` package; every operator
from SURVEY.md §2 registers a (spark callable, DuckDB oracle) pair in
``powersql_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary, the reference's
    rev_per_product pattern) on /root/testdata/sf0.001."""
    from powersql_spark.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from powersql_spark.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per key — every registered key has one as of
    round 4 (engine-specific semantics are verified via portable hash
    families, unrolled bounded loops, or in-query boolean gates)."""
    from powersql_spark.registry import oracle_queries

    return oracle_queries()
