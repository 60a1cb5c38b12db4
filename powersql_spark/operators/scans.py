"""Scans, sources and sinks (SURVEY.md §2.B.1).

The reference resolves FROM targets as models, external sources, derived
tables, and nested joins (reference src/main.rs:59-71, src/types.rs:106-146);
models materialize via CREATE [MATERIALIZED] VIEW / CREATE TABLE AS
(src/main.rs:152-160). Here each form executes natively on Spark.

Scale notes: every scan below is a parquet scan through the DataFrame
reader, so Catalyst pushes filters and prunes columns down to the file
reader (visible as PushedFilters/ReadSchema in .explain). At 100 TB the
same code path gets partition pruning and row-group skipping for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.operators.common import dsum
from powersql_spark.registry import query


@query(
    "scan_model",
    oracle="""
    WITH big_items AS (
        SELECT l_orderkey, l_partkey, l_extendedprice
        FROM lineitem WHERE l_quantity > 45.0
    )
    SELECT l_partkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM big_items GROUP BY l_partkey
    """,
)
def scan_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM a model (view) by name — reference TableFactor::Table
    (src/main.rs:59). The view is registered in the session catalog and
    scanned by a downstream query, exactly how the orchestrator chains
    models."""
    spark.table("lineitem").where(F.col("l_quantity") > 45.0).select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    ).createOrReplaceTempView("big_items")
    return (
        spark.table("big_items")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "total_price"))
    )


@query(
    "scan_external",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def scan_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM an external source table (not defined by any model) — the
    reference drops unknown refs from the DAG and types them open
    (src/main.rs:221, src/types.rs:121-123). Here: a direct parquet scan;
    the segment filter is pushed to the parquet reader."""
    return (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "scan_derived",
    oracle="""
    SELECT t.o_custkey, t.n_orders
    FROM (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ) AS t
    WHERE t.n_orders >= 3
    """,
)
def scan_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM (subquery) AS alias — reference TableFactor::Derived with the
    alias required (src/main.rs:67-71, src/types.rs:138-146)."""
    return spark.sql(
        """
        SELECT t.o_custkey, t.n_orders
        FROM (
            SELECT o_custkey, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        ) AS t
        WHERE t.n_orders >= 3
        """
    )


@query(
    "scan_nested_join",
    oracle="""
    SELECT c_custkey, n_name, r_name
    FROM (nation JOIN region ON n_regionkey = r_regionkey)
         JOIN customer ON c_nationkey = n_nationkey
    WHERE r_name = 'AMERICA'
    """,
)
def scan_nested_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM (a JOIN b ...) — reference TableFactor::NestedJoin
    (src/main.rs:60-66, src/types.rs:125-137). The dim-dim join side is
    tiny, so Catalyst broadcasts it into the customer scan."""
    return spark.sql(
        """
        SELECT c_custkey, n_name, r_name
        FROM (nation JOIN region ON n_regionkey = r_regionkey)
             JOIN customer ON c_nationkey = n_nationkey
        WHERE r_name = 'AMERICA'
        """
    )


@query(
    "sink_view",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def sink_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE [MATERIALIZED] VIEW name AS query — reference
    Statement::CreateView (src/main.rs:153). Spark idiom: CREATE OR
    REPLACE TEMP VIEW (idempotent like the reference's DROP+CREATE,
    src/execute.rs:77-111)."""
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW order_status_summary AS
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus
        """
    )
    return spark.table("order_status_summary")


@query(
    "sink_table",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS net_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sink_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE name AS query — reference Statement::CreateTable with
    query (src/main.rs:154-158). Spark idiom: eager parquet write +
    re-read, mode("overwrite") for idempotence. At scale this is the
    materialization path: columnar parquet, partition-pruned on re-read."""
    import tempfile

    target = tempfile.mkdtemp(prefix="powersql_sink_") + "/net_rev"
    (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "net_revenue",
            )
        )
        .write.mode("overwrite")
        .parquet(target)
    )
    return spark.read.parquet(target)


@query(
    "scan_values",
    oracle="""
    SELECT r.r_name, t.tier
    FROM region r
    JOIN (VALUES (0, 'core'), (1, 'growth'), (2, 'frontier'),
                 (3, 'frontier'), (4, 'growth'))
         AS t(r_regionkey, tier)
      ON r.r_regionkey = t.r_regionkey
    ORDER BY r.r_name
    """,
)
def scan_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table — literal rows as a relation (sqlparser's
    Values body passes through the reference untyped; both its
    backends execute it). The idiomatic carrier for tiny hand-written
    mapping tables: Catalyst folds it to a LocalRelation, so joining
    against it is a broadcast of literals — no file, no scan."""
    return spark.sql(
        """
        SELECT r.r_name, t.tier
        FROM region r
        JOIN (VALUES (0, 'core'), (1, 'growth'), (2, 'frontier'),
                     (3, 'frontier'), (4, 'growth'))
             AS t(r_regionkey, tier)
          ON r.r_regionkey = t.r_regionkey
        ORDER BY r.r_name
        """
    )
