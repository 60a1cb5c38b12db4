"""Join-key skew profiling (driver north-star extension; the reference
has no analog — its surface ends at SQL orchestration,
src/execute.rs:101).

The pre-flight diagnostic for every shuffle decision in this repo: a
shuffled join/agg is only as fast as its hottest key, so before picking
broadcast vs shuffle vs salted (join_skew_salted) you measure the key
distribution. One pass per candidate key — a count-per-key aggregate
(partial map-side, so the exchange moves one row per distinct key) —
then a tiny rollup to the numbers that drive the decision: how many
rows the hottest key owns, how that compares to the typical (median)
key, and the salt factor that would level it.

Exact integer counts and interpolated percentiles over them are
deterministic on both engines, so the whole profile is hash-verified
against the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.registry import query

_KEYS = ("l_partkey", "l_suppkey", "l_orderkey")


def _profile_one(spark: SparkSession, key: str) -> DataFrame:
    counts = (
        spark.table("lineitem")
        .groupBy(key)
        .agg(F.count("*").alias("c"))
    )
    med = F.expr("percentile(c, 0.5)")
    return counts.agg(
        F.lit(key).alias("join_key"),
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        med.alias("p50_key_rows"),
        F.expr("percentile(c, 0.99)").alias("p99_key_rows"),
        F.ceil(F.max("c") / med).cast("bigint").alias("salt_factor"),
        # Empty table -> drop the degenerate all-null profile row, so
        # the output matches the oracle's GROUP BY (zero rows) shape.
    ).where(F.col("n_keys") > 0)


@query(
    "profile_key_skew",
    oracle=f"""
    WITH per_key AS (
        SELECT 'l_partkey' AS join_key, l_partkey AS k, COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'l_suppkey', l_suppkey, COUNT(*)
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'l_orderkey', l_orderkey, COUNT(*)
        FROM lineitem GROUP BY 1, 2
    )
    SELECT join_key,
           COUNT(*) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           MAX(c) AS max_key_rows,
           CAST(quantile_cont(c, 0.5) AS DOUBLE) AS p50_key_rows,
           CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99_key_rows,
           CAST(CEIL(MAX(c) / quantile_cont(c, 0.5)) AS BIGINT)
               AS salt_factor
    FROM per_key
    GROUP BY join_key
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of the three lineitem join keys: rows owned by the
    hottest key vs the median key, and the salt factor
    (``ceil(max/p50)``) that ``join_skew_salted`` would need to level
    the hot partition. This is the measurement step the scale notes
    throughout this repo assume — run it before choosing a join
    strategy, not after a straggler shows up.

    Scale shape: one partial-aggregated count per candidate key (the
    exchange carries one row per distinct key), then a rollup of
    key-count rows that is at most distinct-key-sized. Keys profile
    independently and union at the end — three bounded passes, no
    state on the driver."""
    profiles = [_profile_one(spark, k) for k in _KEYS]
    return reduce(DataFrame.unionAll, profiles)
