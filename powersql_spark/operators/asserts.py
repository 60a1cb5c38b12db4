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

from powersql_spark.catalog import values_df
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
    return values_df(spark, [(ok,)], "condition boolean")


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
    return values_df(
        spark,
        [(m["n_rows"], m["n_null_price"], m["n_nonpositive"], ok)],
        "n_rows bigint, n_null_price bigint, n_nonpositive bigint, condition boolean",
    )


@query(
    "assert_quality_report",
    oracle="""
    WITH ref AS (
        SELECT COUNT(*) AS viol FROM lineitem
        LEFT JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderkey IS NULL
    ),
    flags AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(*) FILTER (NOT (l_quantity > 0))
                   AS qty_positive,
               COUNT(*) FILTER (NOT (l_extendedprice >= 0))
                   AS price_non_negative,
               COUNT(*) FILTER (NOT (l_discount BETWEEN 0 AND 1))
                   AS discount_in_unit_range,
               COUNT(*) FILTER (NOT (l_tax BETWEEN 0 AND 1))
                   AS tax_in_unit_range,
               COUNT(*) FILTER (NOT (l_shipdate >= DATE '1995-01-01'
                                     AND l_shipdate < DATE '2002-01-01'))
                   AS shipdate_in_epoch,
               COUNT(*) FILTER (l_returnflag NOT IN ('A', 'N', 'R'))
                   AS returnflag_in_domain
        FROM lineitem
    ),
    pivoted AS (
        SELECT 'qty_positive' AS rule, qty_positive AS n_violations,
               n_rows FROM flags
        UNION ALL SELECT 'price_non_negative', price_non_negative,
               n_rows FROM flags
        UNION ALL SELECT 'discount_in_unit_range',
               discount_in_unit_range, n_rows FROM flags
        UNION ALL SELECT 'tax_in_unit_range', tax_in_unit_range,
               n_rows FROM flags
        UNION ALL SELECT 'shipdate_in_epoch', shipdate_in_epoch,
               n_rows FROM flags
        UNION ALL SELECT 'returnflag_in_domain', returnflag_in_domain,
               n_rows FROM flags
        UNION ALL SELECT 'orderkey_in_orders', ref.viol, flags.n_rows
               FROM ref, flags
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           round(CAST(n_violations AS DOUBLE) / n_rows, 6)
               AS violation_pct,
           n_violations = 0 AS passed
    FROM pivoted
    """,
)
def assert_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality RULE REPORT: every column rule the
    reference's ASSERT corpus would write as a separate test
    (positivity, non-negativity, unit-range, date domain, value
    domain) evaluated in a SINGLE aggregate over the fact table,
    plus one referential rule (lineitem -> orders) — emitted as
    (rule, n_violations, violation_pct, passed) rows. The
    report-not-gate complement of the boolean ASSERT family: a test
    runner stops at the first red; operators monitoring 100 TB want
    the whole violation profile from one scan.

    Spark shape: the six column rules are conditional-count
    aggregates in ONE scan (partial-aggregated, one single-row
    result); the referential rule is the standard broadcast/shuffled
    anti-join count. The pivot to rows happens on the single result
    row via stack() — zero extra scans (same trick as
    profile_table_summary)."""
    li = spark.table("lineitem")
    from pyspark.sql import functions as F

    viol = {
        "qty_positive": ~(F.col("l_quantity") > 0),
        "price_non_negative": ~(F.col("l_extendedprice") >= 0),
        "discount_in_unit_range": ~F.col("l_discount").between(0, 1),
        "tax_in_unit_range": ~F.col("l_tax").between(0, 1),
        "shipdate_in_epoch": ~(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("2002-01-01").cast("date"))
        ),
        "returnflag_in_domain": ~F.col("l_returnflag").isin(
            "A", "N", "R"
        ),
    }
    flags = li.agg(
        F.count("*").alias("n_rows"),
        *[
            F.count(F.when(cond, 1)).alias(rule)
            for rule, cond in viol.items()
        ],
    )
    ref = (
        li.join(
            spark.table("orders"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("orderkey_in_orders"))
    )
    wide = flags.join(ref)  # 1 row x 1 row
    rules = list(viol) + ["orderkey_in_orders"]
    stacked = wide.select(
        "n_rows",
        F.expr(
            "stack({}, {}) as (rule, n_violations)".format(
                len(rules),
                ", ".join(f"'{r}', {r}" for r in rules),
            )
        ),
    )
    return stacked.select(
        "rule",
        "n_violations",
        F.round(
            F.try_divide(
                F.col("n_violations").cast("double"), F.col("n_rows")
            ),
            6,
        ).alias("violation_pct"),
        (F.col("n_violations") == 0).alias("passed"),
    )
