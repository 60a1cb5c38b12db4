"""Subqueries and CTEs (SURVEY.md §2.B.5).

Reference surface: Expr::Subquery (src/main.rs:138) incl. comparing two
scalar subqueries (examples/postgres/tests/data_tests.sql:22-29), CTEs
(src/main.rs:53-55,95; src/types.rs:155-158), nested query bodies
(src/main.rs:77). Catalyst decorrelates EXISTS/IN into semi/anti joins and
plans uncorrelated scalar subqueries as broadcast one-row subplans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from powersql_spark.registry import query


@query(
    "subq_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(o_totalprice)
        FROM orders
    )
    """,
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in an expression — reference Expr::Subquery
    (src/main.rs:138); distributional shape of data_tests.sql:22-29. The
    average uses the exact-numerator form so the threshold is identical
    across engines."""
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(o_totalprice)
            FROM orders
        )
        """
    )


@query(
    "subq_exists",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity >= 49.5
    )
    """,
)
def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Expr::Exists (src/main.rs:115), decorrelated
    by Catalyst into a left-semi join on l_orderkey."""
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity >= 49.5
        )
        """
    )


@query(
    "subq_in",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_nationkey NOT IN (
        SELECT n_nationkey FROM nation WHERE n_name IN ('FRANCE', 'GERMANY')
    )
    """,
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN (subquery) — Expr::InSubquery (src/main.rs:122-125).
    The subquery is null-free so NOT IN has clean anti-join semantics."""
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_nationkey NOT IN (
            SELECT n_nationkey FROM nation WHERE n_name IN ('FRANCE', 'GERMANY')
        )
        """
    )


@query(
    "subq_cte",
    oracle="""
    WITH nation_custs AS (
        SELECT c_nationkey, COUNT(*) AS n_cust
        FROM customer GROUP BY c_nationkey
    ),
    big_nations AS (
        SELECT c_nationkey FROM nation_custs WHERE n_cust >= 5
    )
    SELECT n_name, n_cust
    FROM nation
    JOIN nation_custs ON n_nationkey = nation_custs.c_nationkey
    WHERE n_nationkey IN (SELECT c_nationkey FROM big_nations)
    """,
)
def subq_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH ... AS chains, multiple CTEs, CTE-on-CTE — reference Cte
    handling (src/main.rs:53-55,95; src/types.rs:155-158; unit tests
    src/types.rs:279-313)."""
    return spark.sql(
        """
        WITH nation_custs AS (
            SELECT c_nationkey, COUNT(*) AS n_cust
            FROM customer GROUP BY c_nationkey
        ),
        big_nations AS (
            SELECT c_nationkey FROM nation_custs WHERE n_cust >= 5
        )
        SELECT n_name, n_cust
        FROM nation
        JOIN nation_custs ON n_nationkey = nation_custs.c_nationkey
        WHERE n_nationkey IN (SELECT c_nationkey FROM big_nations)
        """
    )


@query(
    "subq_nested_query",
    oracle="""
    SELECT kind, COUNT(*) AS n
    FROM (
        SELECT 'cust' AS kind, c_nationkey AS nk FROM customer
        UNION ALL
        SELECT 'supp' AS kind, s_nationkey AS nk FROM supplier
    ) u
    GROUP BY kind
    """,
)
def subq_nested_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parenthesized query body (SetExpr::Query, src/main.rs:77,
    src/types.rs:218) — a nested set-op query as a FROM source."""
    return spark.sql(
        """
        SELECT kind, COUNT(*) AS n
        FROM (
            SELECT 'cust' AS kind, c_nationkey AS nk FROM customer
            UNION ALL
            SELECT 'supp' AS kind, s_nationkey AS nk FROM supplier
        ) u
        GROUP BY kind
        """
    )


@query(
    "subq_correlated",
    oracle="""
    SELECT l_partkey, l_orderkey, l_extendedprice
    FROM lineitem a
    WHERE l_extendedprice = (
        SELECT MIN(l_extendedprice) FROM lineitem b
        WHERE b.l_partkey = a.l_partkey
    )
    ORDER BY l_partkey, l_orderkey
    """,
)
def subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (cheapest line per part — the TPC-H Q2
    pattern). Catalyst decorrelates it into aggregate + join, i.e. the
    rewrite you'd hand-write at scale: one groupBy shuffle on the
    correlation key plus one join, NOT a per-row subquery execution."""
    return spark.sql(
        """
        SELECT l_partkey, l_orderkey, l_extendedprice
        FROM lineitem a
        WHERE l_extendedprice = (
            SELECT MIN(l_extendedprice) FROM lineitem b
            WHERE b.l_partkey = a.l_partkey
        )
        ORDER BY l_partkey, l_orderkey
        """
    )


@query(
    "subq_not_in_null_aware",
    oracle="""
    SELECT
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN
             (SELECT NULLIF(o_custkey, 7) FROM orders))
            AS n_not_in_with_null,
        (SELECT COUNT(*) FROM customer c
         WHERE NOT EXISTS
             (SELECT 1 FROM orders
              WHERE NULLIF(o_custkey, 7) = c.c_custkey))
            AS n_not_exists,
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN
             (SELECT NULLIF(o_custkey, 7) FROM orders
              WHERE NULLIF(o_custkey, 7) IS NOT NULL))
            AS n_not_in_nullfree
    """,
)
def subq_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, measured: with one NULL planted in the
    inner set (NULLIF(o_custkey, 7)), `NOT IN` returns ZERO rows
    (three-valued logic: x <> NULL is unknown for every x), while
    NOT EXISTS and the null-filtered NOT IN return the real
    non-buyer count. Every engine must implement all three arms —
    Spark plans the first as a null-aware anti join — and every data
    team has lost an afternoon to the difference; this key pins all
    three side by side.

    Scale note: the null-aware arm cannot hash-partition (a NULL in
    the build side poisons every probe row), so Spark REQUIRES the
    broadcast form — fine when the inner set is an aggregate/key
    column that fits a broadcast, and the reason production pipelines
    write NOT EXISTS instead for fact-sized inner sets."""
    return spark.sql(
        """
        SELECT
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN
                 (SELECT NULLIF(o_custkey, 7) FROM orders))
                AS n_not_in_with_null,
            (SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS
                 (SELECT 1 FROM orders
                  WHERE NULLIF(o_custkey, 7) = c.c_custkey))
                AS n_not_exists,
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN
                 (SELECT NULLIF(o_custkey, 7) FROM orders
                  WHERE NULLIF(o_custkey, 7) IS NOT NULL))
                AS n_not_in_nullfree
        """
    )
