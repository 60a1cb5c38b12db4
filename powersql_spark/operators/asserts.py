"""Data-quality ASSERT operators (SURVEY.md §2.B.8) — the reference's
signature feature.

The reference wraps each test condition as ``SELECT (cond) AS condition``
and reads one boolean cell (src/main.rs:439-440, src/execute.rs:124-130).
Each key below returns that one-row boolean DataFrame; the orchestrator's
``test`` command (powersql_spark.orchestrator.runner) reuses the same
wrapper over parsed ASSERT files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from powersql_spark.registry import query


@query(
    "assert_not_exists",
    oracle="""
    SELECT (NOT EXISTS (
        SELECT 1
        FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderkey IS NULL
    )) AS condition
    """,
)
def assert_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSERT NOT EXISTS(...) — referential integrity lineitem->orders,
    the shape of examples/postgres/tests/data_tests.sql:1-6 (grammar at
    src/main.rs:176-185). Catalyst turns the probe into an anti join; at
    scale this is a broadcast/shuffled anti join, not a scan-and-collect."""
    return spark.sql(
        """
        SELECT (NOT EXISTS (
            SELECT 1
            FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderkey IS NULL
        )) AS condition
        """
    )


@query(
    "assert_scalar_compare",
    oracle="""
    SELECT ((SELECT COUNT(*) FROM lineitem WHERE l_discount > 0.0)
            >= 0.5 * (SELECT COUNT(*) FROM lineitem)) AS condition
    """,
)
def assert_scalar_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSERT (scalar subq) >= expr — distributional check, the shape of
    data_tests.sql:22-29 ('at least 70% should ...')."""
    return spark.sql(
        """
        SELECT ((SELECT COUNT(*) FROM lineitem WHERE l_discount > 0.0)
                >= 0.5 * (SELECT COUNT(*) FROM lineitem)) AS condition
        """
    )


@query(
    "assert_typecheck",
    oracle="""
    SELECT (typeof(l_quantity < 10.0) = 'BOOLEAN') AS condition
    FROM lineitem LIMIT 1
    """,
)
def assert_typecheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test conditions must type-check to Boolean — reference
    src/main.rs:378-385. Spark-side: analyze the wrapped condition without
    running a job (lazy ``df.schema``) and report the verdict; this is the
    'check' command's mechanism (SURVEY.md §3.2)."""
    cond_df = spark.sql("SELECT (l_quantity < 10.0) AS condition FROM lineitem")
    ok = isinstance(cond_df.schema["condition"].dataType, T.BooleanType)
    return spark.createDataFrame(
        [(ok,)], T.StructType([T.StructField("condition", T.BooleanType())])
    )
