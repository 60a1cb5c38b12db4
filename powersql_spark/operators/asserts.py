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


@query(
    "assert_observe_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_price,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nonpositive,
           (COUNT(*) > 0
            AND SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) = 0
            AND SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0)
               AS condition
    FROM orders
    """,
)
def assert_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality metrics via Spark's ``Observation`` API —
    the Spark-first upgrade of the reference's ASSERT loop (src/main.rs:
    430-454 runs one query PER test): here row count, null count and
    range violations are collected as accumulator side effects of ONE
    pass over the table, with the pass itself writing to a noop sink the
    way a materialization would. At 100 TB this turns k quality checks
    from k scans into zero extra scans — the metrics ride the write job.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("quality")
    observed = spark.table("orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("int"))
        .cast("bigint")
        .alias("n_null_price"),
        F.sum((F.col("o_totalprice") <= 0).cast("int"))
        .cast("bigint")
        .alias("n_nonpositive"),
    )
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    ok = (
        m["n_rows"] > 0
        and m["n_null_price"] == 0
        and m["n_nonpositive"] == 0
    )
    return spark.createDataFrame(
        [(m["n_rows"], m["n_null_price"], m["n_nonpositive"], ok)],
        "n_rows bigint, n_null_price bigint, n_nonpositive bigint, condition boolean",
    )
