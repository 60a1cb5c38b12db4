"""Join operators (SURVEY.md §2.B.3).

The reference traverses joins without inspecting kind (src/main.rs:60-66,
src/types.rs:168-174) and delegates the physical strategy to the backend.
Here Catalyst picks broadcast-hash / shuffled-hash / sort-merge from stats
and AQE; we add explicit ``F.broadcast`` hints on dimension tables —
region/nation/supplier stay tiny relative to the fact tables at any scale
factor, so the hint removes a shuffle of the 100 TB side entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.operators.common import dsum
from powersql_spark.registry import query


@query(
    "join_inner",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_acctbal > 0.0
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INNER JOIN ... ON equi-key — reference join traversal
    (src/main.rs:60-66; unit test 'join x on 1=1' src/main.rs:474-487).
    Both dims broadcast: zero shuffles of the customer side."""
    c = spark.table("customer").where(F.col("c_acctbal") > 0.0)
    n = F.broadcast(spark.table("nation"))
    r = F.broadcast(spark.table("region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "inner")
        .join(r, n.n_regionkey == r.r_regionkey, "inner")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "join_left",
    oracle="""
    SELECT n_name, COUNT(c_custkey) AS n_customers
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT [OUTER] JOIN — e.g. examples/postgres/tests/data_tests.sql:4.
    COUNT(col) counts non-null matches, preserving unmatched nations."""
    n = spark.table("nation")
    c = spark.table("customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@query(
    "join_right",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT [OUTER] JOIN — parseable surface [P] (SURVEY.md §2.B.3)."""
    s = spark.table("supplier")
    n = spark.table("nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        FROM customer WHERE c_acctbal > 9000.0 GROUP BY c_nationkey
    ),
    supp AS (
        SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        FROM supplier WHERE s_acctbal > 9000.0 GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey, n_cust, n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN — parseable surface [P]. Unmatched sides produce
    NULL counts, exercising null-generating join semantics."""
    cust = (
        spark.table("customer")
        .where(F.col("c_acctbal") > 9000.0)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        spark.table("supplier")
        .where(F.col("s_acctbal") > 9000.0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk, "full").select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN — parseable surface [P]. Dim x dim only (5 x 25 rows);
    a cross join with a fact table would be a scale bug, not a feature."""
    return (
        spark.table("region")
        .crossJoin(spark.table("nation"))
        .select("r_name", "n_name")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the reference reaches semi-joins via EXISTS/IN
    (src/main.rs:115,122); Spark exposes the join type directly."""
    c = spark.table("customer")
    o = spark.table("orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — NOT EXISTS in the reference's test corpus
    (examples/postgres/tests/data_tests.sql:1-21). Against urgent
    orders only: every testdata customer has SOME order, so the
    unrestricted anti-join would be vacuously empty."""
    c = spark.table("customer")
    o = spark.table("orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
"""


@query("join_lateral", oracle=_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's top-2 orders by
    price — the per-row top-n join shape. Identical SQL runs on both
    engines. Catalyst decorrelates the LATERAL into a join +
    per-partition ranking rather than re-executing the subquery per
    customer row; the tie-free ORDER BY (price, then orderkey) keeps
    the picked rows deterministic across engines and partitionings."""
    return spark.sql(_LATERAL_SQL)


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH names AS (  -- fuzzy-match at NAME granularity, not row
        SELECT DISTINCT p_brand AS brand, p_name AS name
        FROM part
    ),
    pairs AS (  -- brand blocking + length prefilter (lossless for
                -- lev <= 2: an edit distance d changes length by <= d)
        SELECT a.brand, a.name AS name_a, b.name AS name_b,
               levenshtein(a.name, b.name) AS dist
        FROM names a JOIN names b
          ON b.brand = a.brand AND a.name < b.name
         AND abs(len(a.name) - len(b.name)) <= 2
    )
    SELECT brand,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM names n
            WHERE n.brand = pairs.brand) AS n_names,
           CAST(COUNT(*) AS BIGINT) AS n_pairs_checked,
           CAST(COUNT(CASE WHEN dist <= 2 THEN 1 END) AS BIGINT)
               AS n_fuzzy_matches,
           CAST(MIN(dist) AS BIGINT) AS min_dist
    FROM pairs
    GROUP BY brand
    ORDER BY brand
    """,
)
def join_fuzzy_levenshtein(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Blocked fuzzy self-join of part names by edit distance: within
    each brand block, count DISTINCT-name pairs within Levenshtein
    distance 2 (near-duplicate product names — the entity-resolution
    primitive for catalog hygiene). Two scale disciplines are
    explicit: (1) names dedupe to vocabulary granularity BEFORE
    pairing, so the quadratic stage is bounded by distinct names per
    block, never rows; (2) a length prefilter |len(a)-len(b)| <= 2
    (provably lossless for distance <= 2 — one edit changes length
    by at most one) cuts candidates before the expensive distance
    evaluates. The per-brand summary reports exact integers only.

    At 100 TB the same shape holds: blocking key (brand) bounds each
    block, the name-level dedup collapses the fact table first, and
    for tighter thresholds the prefilter generalizes to q-gram
    count filtering — this key is the Spark-native seed of that
    ladder (dedup_ngram_jaccard's AllPairs filter is the
    set-similarity sibling).

    Both engines implement the classic unweighted
    Wagner-Fischer edit distance, so `dist` is engine-exact."""
    names = (
        spark.table("part")
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_name").alias("name"),
        )
        .distinct()
    )
    from powersql_spark.catalog import track_persist

    names = track_persist(names)
    a = names.alias("a")
    b = names.alias("b")
    pairs = a.join(
        b,
        (F.col("b.brand") == F.col("a.brand"))
        & (F.col("a.name") < F.col("b.name"))
        & (
            F.abs(
                F.length(F.col("a.name")) - F.length(F.col("b.name"))
            )
            <= 2
        ),
    ).select(
        F.col("a.brand").alias("brand"),
        F.levenshtein(F.col("a.name"), F.col("b.name")).alias(
            "dist"
        ),
    )
    per_brand = names.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n_names")
    )
    return (
        pairs.groupBy("brand")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs_checked"),
            F.count(F.when(F.col("dist") <= 2, 1))
            .cast("bigint")
            .alias("n_fuzzy_matches"),
            F.min("dist").cast("bigint").alias("min_dist"),
        )
        .join(F.broadcast(per_brand), "brand")
        .select(
            "brand",
            "n_names",
            "n_pairs_checked",
            "n_fuzzy_matches",
            "min_dist",
        )
        .orderBy("brand")
    )
