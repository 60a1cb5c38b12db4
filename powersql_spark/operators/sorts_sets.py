"""Sorts, limits, set operations and window functions (SURVEY.md §2.B.6).

These parse in the reference (Query.order_by/limit/offset,
SetExpr::SetOperation, Function.over in sqlparser 0.6.1) and execute on
its backends; its own code never inspects them (wildcard arms
src/main.rs:90; set-op typing rejected at src/types.rs:219 — an asymmetry
we deliberately do NOT reproduce). All are native Spark operators here.

Determinism: every LIMIT rides on a tie-free total ORDER BY, and every
window ordering includes a unique key — otherwise two engines (or two
cluster sizes) could legitimately return different rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.registry import query


@query(
    "sort_order_by",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 9000.0
    ORDER BY c_acctbal DESC, c_custkey ASC
    """,
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ASC/DESC — [P] surface. Catalyst plans a range-partitioned
    sort (sampled bounds), the scalable global sort."""
    return (
        spark.table("customer")
        .where(F.col("c_acctbal") > 9000.0)
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 100
    """,
)
def limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n — [P] surface; ordered by the unique key so the selected
    rows are well-defined."""
    return (
        spark.table("orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@query(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT = top-k — Catalyst plans TakeOrderedAndProject
    (per-partition heap + merge, no global sort): the pattern that stays
    cheap at 100 TB."""
    return (
        spark.table("orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500.0
    UNION
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500.0
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — [P] surface; the reference's check command
    rejects set-ops (src/types.rs:219) while run executes them — we
    support them everywhere."""
    c = (
        spark.table("customer")
        .where(F.col("c_acctbal") > 9500.0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        spark.table("supplier")
        .where(F.col("s_acctbal") > 9500.0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.union(s).distinct()


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500.0
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500.0
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no shuffle at all (pure concatenation of
    partitions)."""
    c = (
        spark.table("customer")
        .where(F.col("c_acctbal") > 9500.0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        spark.table("supplier")
        .where(F.col("s_acctbal") > 9500.0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.union(s)


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — customers with both finished and open orders."""
    f = (
        spark.table("orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    o = (
        spark.table("orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return f.intersect(o)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — customers dormant since 2000 (set difference);
    ``subtract`` is Spark's EXCEPT DISTINCT. The right side is
    date-restricted because every testdata customer has some order —
    the unrestricted difference would be vacuously empty."""
    c = spark.table("customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        spark.table("orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


@query(
    "window_fns",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           LAG(c_acctbal) OVER w AS prev_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    QUALIFY rn <= 5
    """,
)
def window_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVER (PARTITION BY ... ORDER BY ... [frame]) — Function.over in the
    0.6.1 AST [P]. row_number/rank/lag + framed running sum, top-5 per
    nation. One shuffle on the partition key serves all four windows
    (same window spec), and the running sum is order-defined so it is
    deterministic; decimal-cast keeps it hash-identical cross-engine."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = spark.table("customer")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.lag("c_acctbal").over(w).alias("prev_bal"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .over(run)
            .cast("double")
            .alias("running_bal"),
        )
        .where(F.col("rn") <= 5)
    )


@query(
    "set_except_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_quantity > 30
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicity-preserving), vs
    EXCEPT's set semantics. Catalyst rewrites it to a count-compare
    aggregate + generate, one shuffle."""
    li = spark.table("lineitem")
    a = li.where(F.col("l_quantity") > 30).select("l_partkey")
    b = li.where(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)
    ).select("l_partkey")
    return a.exceptAll(b)


@query(
    "sort_nulls",
    oracle="""
    SELECT event_id, nullif(value, 0.0) AS v
    FROM events WHERE event_id < 400
    ORDER BY v DESC NULLS LAST, event_id
    """,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST ordering. Engines disagree on the
    default (Spark: nulls first on ASC; others: nulls last), so
    portable sorts always say it explicitly — here DESC NULLS LAST
    with a unique tiebreaker."""
    e = spark.table("events").where(F.col("event_id") < 400)
    return e.select(
        "event_id", F.nullif("value", F.lit(0.0)).alias("v")
    ).orderBy(F.col("v").desc_nulls_last(), F.col("event_id"))


@query(
    "set_union_by_name",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE lang = 'en'
        UNION ALL
        SELECT doc_id, lang, 'unknown' AS source, CAST(NULL AS BIGINT)
            AS n_chars
        FROM documents WHERE lang = 'de'
    )
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: unionByName(allowMissingColumns=True)
    aligns relations by COLUMN NAME (not position) and null-fills
    columns one side lacks — how heterogeneous corpus shards with
    drifted schemas stack into one table without manual projection
    lists. The oracle spells out the aligned/filled projection the
    operator derives automatically; the 'unknown' default shows the
    coalesce-after-union idiom for absent metadata."""
    d = spark.table("documents")
    full = d.where(F.col("lang") == "en").select(
        "doc_id", "lang", "source", "n_chars"
    )
    # A drifted shard: no source column, no n_chars.
    drifted = d.where(F.col("lang") == "de").select("doc_id", "lang")
    stacked = full.unionByName(drifted, allowMissingColumns=True)
    return stacked.select(
        "doc_id",
        "lang",
        F.coalesce("source", F.lit("unknown")).alias("source"),
        "n_chars",
    )


@query(
    "window_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(CUME_DIST() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey), 6) AS cd,
           NTILE(4) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    WHERE o_orderdate >= DATE '1998-01-01'
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST + NTILE over the same ordering — the remaining
    ranking-family members next to RANK/PERCENT_RANK/ROW_NUMBER
    (window_rank, window_percent_rank, window_ntile): cumulative
    share of rows at-or-below each price within its priority class.
    Total (tie-free) ordering via the key so both engines rank
    identically; one (priority) exchange serves both functions."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        spark.table("orders")
        .where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )
