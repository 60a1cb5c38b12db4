"""Scalar function families (SURVEY.md §2.B.7).

The reference treats every function call opaquely (name ignored, args
traversed at src/main.rs:117-121, result typed Any at src/types.rs:94);
EXTRACT is the only dedicated arm (src/main.rs:116). The concrete function
library is the backend's — here, Spark's built-in pyspark.sql.functions,
which keeps all of these inside whole-stage codegen.

Oracle caveats handled per-family: DuckDB spells some functions
differently (date_diff vs datediff, ceil returns DOUBLE not BIGINT,
list vs array syntax, json_extract_string vs get_json_object) — each
oracle uses the DuckDB spelling that yields identical *values*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.registry import query


@query(
    "fn_extract_date",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
               AS days_since_epoch
    FROM orders WHERE o_totalprice > 300000.0
    """,
)
def fn_extract_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT / date-time functions — the reference's one dedicated
    function arm (Expr::Extract, src/main.rs:116)."""
    o = spark.table("orders").where(F.col("o_totalprice") > 300000.0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch"),
    )


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           trim(c_name) AS name_trim,
           substring(c_name, 1, 8) AS name_prefix,
           concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           length(c_name) AS name_len,
           (c_name LIKE 'Customer%') AS is_customer,
           replace(c_name, '#', '') AS name_nohash
    FROM customer WHERE c_custkey <= 500
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family — upper/lower/trim/substring/concat_ws/
    length/LIKE/replace (backend-delegated in the reference)."""
    c = spark.table("customer").where(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim("c_name").alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(
            "-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")
        ).alias("seg_key"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").like("Customer%").alias("is_customer"),
        F.regexp_replace("c_name", "#", "").alias("name_nohash"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_round,
           abs(l_discount - l_tax) AS disc_tax_gap,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           sqrt(l_extendedprice) AS price_sqrt,
           power(l_quantity, 2.0) AS qty_sq,
           CAST(l_partkey % 7 AS BIGINT) AS pk_mod
    FROM lineitem WHERE l_quantity > 49.0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family — round/abs/ceil/floor/sqrt/power/modulo.
    ceil/floor cast to BIGINT on both sides (Spark returns BIGINT, DuckDB
    DOUBLE)."""
    li = spark.table("lineitem").where(F.col("l_quantity") > 49.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.pow("l_quantity", 2.0).alias("qty_sq"),
        (F.col("l_partkey") % 7).cast("bigint").alias("pk_mod"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           NULLIF(o_orderpriority, '1-URGENT') AS non_urgent,
           (CASE WHEN o_totalprice > 200000.0 THEN o_totalprice ELSE 0.0 END)
               AS big_or_zero
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / CASE conditional family."""
    o = spark.table("orders").where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_or_open"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias(
            "non_urgent"
        ),
        F.when(F.col("o_totalprice") > 200000.0, F.col("o_totalprice"))
        .otherwise(0.0)
        .alias("big_or_zero"),
    )


@query(
    "fn_array",
    # The array itself is emitted as a decimal-formatted joined string:
    # the driver's pandas canonicalizer can't hash list cells (the
    # agg_collect_set round-1 crash), and double->string formatting
    # differs across engines, so each element goes through DECIMAL(18,6)
    # first (same trick as dsum in operators/common.py).
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS DECIMAL(18,6)) AS VARCHAR) || ',' ||
           CAST(CAST(l_discount AS DECIMAL(18,6)) AS VARCHAR) || ',' ||
           CAST(CAST(l_tax AS DECIMAL(18,6)) AS VARCHAR) AS triple_str,
           len([l_quantity, l_discount, l_tax]) AS triple_len,
           list_extract([l_quantity, l_discount, l_tax], 1) AS first_elem,
           list_contains([l_quantity, l_discount, l_tax], 0.0) AS has_zero
    FROM lineitem WHERE l_quantity > 49.5
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + size/element_at/array_contains — extension
    beyond the reference surface (arrays collapse to Any there,
    src/types.rs:31-32)."""
    li = spark.table("lineitem").where(F.col("l_quantity") > 49.5)
    triple = F.array("l_quantity", "l_discount", "l_tax")

    def dec_str(col: str):
        return F.col(col).cast("decimal(18,6)").cast("string")

    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(
            ",", dec_str("l_quantity"), dec_str("l_discount"), dec_str("l_tax")
        ).alias("triple_str"),
        F.size(triple).alias("triple_len"),
        F.element_at(triple, 1).alias("first_elem"),
        F.array_contains(triple, 0.0).alias("has_zero"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           map(['type'], [event_type])['type'][1] AS type_from_map,
           map(['v'], [value])['v'][1] AS value_from_map
    FROM events WHERE event_id < 200
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key lookup — extension beyond the reference
    surface (maps collapse to Any there)."""
    e = spark.table("events").where(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.create_map(F.lit("type"), F.col("event_type"))["type"].alias(
            "type_from_map"
        ),
        F.create_map(F.lit("v"), F.col("value"))["v"].alias("value_from_map"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events WHERE event_id < 500
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column — extension; Spark
    get_json_object over the events.props JSON payload."""
    e = spark.table("events").where(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )
