"""Flagship query for the driver's smoke check (``entry(spark)``).

The reference's flagship model chain is revenue -> rev_per_product
(examples/postgres/models/revenue.sql:1-9): revenue per product with a
count. Adapted to the testdata star schema and widened to the TPC-H Q1
pricing-summary shape, materialized through the same view-chaining
mechanism the orchestrator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.catalog import load_tables
from powersql_spark.operators.common import davg, dsum


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary per (returnflag, linestatus) — TPC-H Q1 shape."""
    load_tables(spark, sf_dir, ("lineitem",))
    li = spark.table("lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charged = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charged, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
