"""Aggregation operators (SURVEY.md §2.B.4).

Reference surface: GROUP BY + SUM/COUNT from the flagship example
(examples/postgres/models/revenue.sql:4-9), generic aggregate traversal
(src/main.rs:117-121), ListAgg (src/main.rs:132-134). Catalyst plans every
groupBy below as partial (map-side) + final HashAggregate, so the shuffle
carries pre-aggregated rows — the property that makes these run at 100 TB.
Float sums use the decimal trick (operators/common.py) for cross-engine
and cross-partitioning determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.operators.common import davg_grid, dsum_grid
from powersql_spark.registry import query


@query(
    "agg_group_by",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with multiple aggregates — the TPC-H Q1 shape; the
    reference's flagship model is the same pattern
    (examples/postgres/models/revenue.sql:4-9)."""
    li = spark.table("lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum_grid("l_quantity", "sum_qty"),
        dsum_grid("l_extendedprice", "sum_base_price"),
        dsum_grid(disc_price, "sum_disc_price"),
        davg_grid("l_quantity", "avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_sum",
    oracle="""
    SELECT l_partkey AS product_id,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev,
           COUNT(*) AS quantity
    FROM lineitem GROUP BY l_partkey
    """,
)
def agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(col) per key — the reference's own rev_per_product model
    (examples/postgres/models/revenue.sql:4-9) adapted to testdata."""
    return (
        spark.table("lineitem")
        .groupBy(F.col("l_partkey").alias("product_id"))
        .agg(dsum_grid("l_extendedprice", "rev"), F.count("*").alias("quantity"))
    )


@query(
    "agg_count_star",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) — revenue.sql:6, data_tests.sql:23,27."""
    return (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_count",
    oracle="""
    SELECT o_orderpriority,
           COUNT(o_custkey) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(o_totalprice) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(col) / MIN / MAX / AVG — generic aggregate surface
    (src/main.rs:117-121). MIN/MAX over doubles are exact picks, no
    decimal guard needed; AVG uses the exact-numerator form."""
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("o_custkey").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            davg_grid("o_totalprice", "avg_price"),
        )
    )


# Split from agg_count so each §2.B.4 key has its own entry.
@query(
    "agg_min",
    oracle="""
    SELECT l_returnflag, MIN(l_extendedprice) AS min_price,
           MIN(l_shipdate) AS first_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN over numeric and timestamp columns."""
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.min("l_shipdate").alias("first_ship"),
        )
    )


@query(
    "agg_max",
    oracle="""
    SELECT l_returnflag, MAX(l_extendedprice) AS max_price,
           MAX(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX over numeric and timestamp columns."""
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.max("l_extendedprice").alias("max_price"),
            F.max("l_shipdate").alias("last_ship"),
        )
    )


@query(
    "agg_avg",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(c_acctbal) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG — exact-numerator decimal form for cross-engine determinism."""
    return (
        spark.table("customer")
        .groupBy("c_mktsegment")
        .agg(davg_grid("c_acctbal", "avg_bal"))
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG(expr, sep) WITHIN GROUP (ORDER BY ...) — the one aggregate
    with a dedicated AST arm in the reference (Expr::ListAgg,
    src/main.rs:132-134). Spark idiom: sort_array(collect_list(...)) +
    array_join, which keeps the ordered-concat deterministic."""
    n = spark.table("nation")
    r = F.broadcast(spark.table("region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ...) — parseable surface [P]. Catalyst expands
    multi-distinct into an Expand + two-phase aggregate."""
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150.0
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation filter [P]."""
    return (
        spark.table("lineitem")
        .groupBy("l_partkey")
        .agg(dsum_grid("l_quantity", "total_qty"))
        .where(F.col("total_qty") > 150.0)
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY ALL
    """,
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — group by every non-aggregate select item (the
    modern shorthand both Spark 3.4+ and DuckDB support). Resolves at
    analysis time to an ordinary grouped aggregate: same partial+final
    plan as writing the keys out."""
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   AS qty
        FROM lineitem
        GROUP BY ALL
        """
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT l_returnflag,
           arg_min(l_orderkey,
                   lpad(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                  * 100 AS BIGINT) AS VARCHAR), 12, '0')
                   || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                   || lpad(CAST(l_linenumber AS VARCHAR), 4, '0'))
               AS cheapest_orderkey,
           arg_max(l_orderkey,
                   lpad(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                  * 100 AS BIGINT) AS VARCHAR), 12, '0')
                   || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                   || lpad(CAST(l_linenumber AS VARCHAR), 4, '0'))
               AS priciest_orderkey,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY / MAX_BY — the key of the extreme row, not the extreme
    value itself ('which order was cheapest'), without a groupBy +
    join-back. The ordering key is zero-padded (price-cents, orderkey,
    linenumber) so ties on price resolve identically on both engines
    (DuckDB arg_min/arg_max take one comparable argument; Spark
    min_by's struct ordering is mirrored as the padded string).

    Single-pass partial aggregation: per-group state is one candidate
    row key, constant regardless of group size."""
    li = spark.table("lineitem")
    key = F.concat(
        # cents via DECIMAL(18,2): double->BIGINT truncates on Spark but
        # ROUNDS on DuckDB; double->DECIMAL rounds identically on both.
        F.lpad(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("string"),
            12,
            "0",
        ),
        F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("l_linenumber").cast("string"), 4, "0"),
    )
    return li.groupBy("l_returnflag").agg(
        F.min_by("l_orderkey", key).alias("cheapest_orderkey"),
        F.max_by("l_orderkey", key).alias("priciest_orderkey"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


@query(
    "agg_pivot_multi",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
               AS f_qty,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT)
               AS f_n,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
               AS o_qty,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT)
               AS o_n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with MULTIPLE aggregates per pivot value — each
    (value, aggregate) pair becomes a column (F_qty, F_n, O_qty, O_n).
    agg_pivot covers the single-aggregate form; this is the wide-table
    report shape. The oracle spells out the conditional-aggregation
    desugaring, which is also exactly Catalyst's plan: ONE pass, one
    partial+final pair, no per-value scans."""
    li = spark.table("lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("F_qty").alias("f_qty"),
        F.col("F_n").alias("f_n"),
        F.col("O_qty").alias("o_qty"),
        F.col("O_n").alias("o_n"),
    )
