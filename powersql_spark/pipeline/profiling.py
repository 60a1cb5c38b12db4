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


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@query(
    "profile_table_summary",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM documents
        """
        for c in _PROFILE_COLS
    ),
)
def profile_table_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile of the documents table — row count,
    null count, exact distinct cardinality, lexicographic min/max per
    column: the ANALYZE/deequ-style summary every ingestion gate and
    skew investigation starts from (pairs with ``profile_key_skew``,
    which drills into per-key ownership).

    Scale shape: ONE pass over the table computes every column's
    stats in a single aggregate — Spark plans the 5 DISTINCT
    aggregates via Expand (5x row multiplication before the partial
    aggregate), the exact-cardinality trade; swap COUNT(DISTINCT) for
    approx_count_distinct to make the same plan strictly single-pass
    at 100 TB. The per-column reshape happens on the ONE aggregated
    row (stack — metadata-sized)."""
    d = spark.table("documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_str, max_str)"
        ),
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"
    )
