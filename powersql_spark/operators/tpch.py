"""Composite TPC-H-shaped queries over the testdata schema.

The single-operator keys prove each §2.B construct in isolation; these
prove they compose — multi-way joins + aggregation + ordering in one
plan, the shapes a reference user actually ships (the reference's own
flagship model is TPC-H Q1's little sibling,
examples/postgres/models/revenue.sql:4-9). Also the core of bench.py's
headline set, so their plans are tuned: dimension sides broadcast,
filters sit on the scan, aggregation is partial before every shuffle.

The testdata schema (TESTDATA.md) trims some TPC-H columns (no
partsupp, no o_shippriority, no l_commitdate), so the queries are
adapted: same join graph and aggregation shape, existing columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.operators.common import davg_grid, dsum_grid, sql_davg, sql_dsum
from powersql_spark.registry import query


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — full 8-aggregate version. Scan-heavy:
    the filter and all partial aggregation happen inside the scan's
    codegen stage; the shuffle moves only (4 groups x partial states)."""
    li = spark.table("lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_grid("l_quantity", "sum_qty"),
            dsum_grid("l_extendedprice", "sum_base_price"),
            dsum_grid(disc, "sum_disc_price"),
            dsum_grid(charge, "sum_charge"),
            davg_grid("l_quantity", "avg_qty"),
            davg_grid("l_extendedprice", "avg_price"),
            davg_grid("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority. Plan shape: customer (filtered to one
    segment) broadcasts into orders, the survivors hash-join lineitem on
    the key both sides are big on; ORDER BY+LIMIT becomes
    TakeOrderedAndProject (top-k, never a full sort)."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = spark.table("customer").where(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").where(F.col("o_orderdate") < cutoff)
    li = spark.table("lineitem").where(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_grid(rev, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume — the 6-way join. Every dimension
    (supplier/nation/region/filtered customer) broadcasts; the only
    big-big shuffle is lineitem |x| orders on orderkey. The
    c_nationkey = s_nationkey 'local' constraint rides on the join."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    c = spark.table("customer")
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = spark.table("lineitem")
    s = spark.table("supplier")
    n = spark.table("nation")
    r = spark.table("region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_grid(rev, "revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change — pure scan+filter+agg. All
    four predicates push to the parquet reader (row-group stats prune);
    no shuffle at all beyond the single-row final agg."""
    li = spark.table("lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum_grid(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: who returned the most revenue.
    Broadcast customer+nation; top-20 via TakeOrderedAndProject."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    c = spark.table("customer")
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = spark.table("lineitem").where(F.col("l_returnflag") == "R")
    n = spark.table("nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_grid(rev, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum("volume", "revenue")}
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
        WHERE s.s_suppkey = l.l_suppkey
          AND o.o_orderkey = l.l_orderkey
          AND c.c_custkey = o.o_custkey
          AND s.s_nationkey = n1.n_nationkey
          AND c.c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between a nation pair. The disjunctive
    nation-pair predicate rides on the join; nations/supplier/customer
    broadcast, so the only big shuffle is lineitem |x| orders."""
    li = spark.table("lineitem")
    o = spark.table("orders")
    s = spark.table("supplier")
    c = spark.table("customer")
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            vol.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum_grid("volume", "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q18",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum("l_quantity", "total_qty")}
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 210
          )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: IN over a HAVING aggregate ->
    left-semi join against the pre-aggregated key set (the aggregate
    output is small, so it broadcasts into the fact scan)."""
    li = spark.table("lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .where(F.col("q") > 210)
        .select("l_orderkey")
    )
    o = spark.table("orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = spark.table("customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum_grid("l_quantity", "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 21)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 15 AND 35)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
            AND l_quantity BETWEEN 25 AND 50))
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted-revenue shape: equi-join plus a disjunction
    of conjunctive band predicates spanning BOTH sides. Catalyst keeps
    the equi-key as the join condition and evaluates the OR-of-ANDs as a
    post-join filter, while the single-side conjuncts it can factor out
    (p_brand IN (...), p_size/l_quantity hull ranges) push to the scans."""
    li = spark.table("lineitem")
    p = spark.table("part")
    cond = (
        (
            (p.p_brand == "Brand#1")
            & p.p_size.between(1, 15)
            & li.l_quantity.between(1, 21)
        )
        | (
            (p.p_brand == "Brand#2")
            & p.p_size.between(10, 30)
            & li.l_quantity.between(15, 35)
        )
        | (
            (p.p_brand == "Brand#3")
            & p.p_size.between(20, 50)
            & li.l_quantity.between(25, 50)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dsum_grid(rev, "revenue"))
    )
