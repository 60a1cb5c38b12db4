"""The remaining TPC-H query shapes (Q2, Q4, Q8, Q9, Q11-Q17, Q20-Q22),
adapted to the testdata schema.

The driver's tables trim TPC-H (TESTDATA.md): no partsupp, no
l_commitdate / l_receiptdate / l_shipmode, no c_phone, no p_container.
Each query below keeps the original's join graph, subquery shape, and
aggregation pattern, substituting available columns:

- partsupp                -> the DISTINCT (l_partkey, l_suppkey) bridge
- ps_supplycost           -> s_acctbal (min-cost supplier -> min-balance)
- "late" (receipt>commit) -> l_shipdate > o_orderdate + N days
- l_shipmode classes      -> l_returnflag classes
- c_phone country code    -> c_nationkey % 10
- p_name LIKE '%green%'   -> '%gear%' / '%bolt%' (the generator's nouns)

Parity evidence for the shapes: the reference passes all of these
constructs through untyped (wildcard arms src/main.rs:140,
src/types.rs:94) and delegates execution (src/execute.rs:101), so the
backend surface — correlated scalar subqueries, EXISTS/NOT EXISTS,
IN <agg subquery>, HAVING over scalar subqueries — is exactly what
these queries exercise, natively on Spark.

Scale notes are per-query in the docstrings; the recurring moves:
dimensions broadcast, EXISTS/NOT EXISTS pairs decorrelate into one
grouped pass over the fact table, and every double aggregate uses the
decimal-sum trick (common.py) so results are partition-count-invariant
— the same plan is deterministic at sf0.01 and at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import DEC, dsum_grid, sql_dsum
from powersql_spark.registry import query

_BRIDGE = "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"


@query(
    "tpch_q2",
    oracle=f"""
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supplier, nation, region, {_BRIDGE} b
    WHERE p_partkey = b.l_partkey
      AND s_suppkey = b.l_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND p_size = 15
      AND p_type = 'STANDARD'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM {_BRIDGE} b2, supplier s2, nation n2, region r2
        WHERE b2.l_partkey = p_partkey
          AND s2.s_suppkey = b2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (supplycost -> s_acctbal, partsupp
    -> the observed part-supplier bridge). The correlated MIN subquery
    decorrelates into a window MIN over the part key — one pass, no
    re-scan of the bridge, and the bridge itself is a map-side DISTINCT
    before any join. Dimensions broadcast."""
    bridge = spark.table("lineitem").select("l_partkey", "l_suppkey").distinct()
    s = spark.table("supplier")
    n = spark.table("nation")
    r = spark.table("region").where(F.col("r_name") == "EUROPE")
    p = spark.table("part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    eligible = (
        bridge.join(F.broadcast(s), bridge.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), bridge.l_partkey == p.p_partkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking ("late" = shipped >60 days
    after order date, standing in for receipt>commit). The correlated
    EXISTS with an inequality on both relations becomes a left-semi
    join with a compound condition — Catalyst keeps the equi-part
    (orderkey) as the join key and the date inequality as the join
    residual, so it still hash-joins, never nested-loops."""
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = spark.table("lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END
                         AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey
        AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND s_nationkey = n1.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_7's share of PROMO-part
    revenue sold into the ASIA market, by year. The share is a ratio of
    two decimal-exact sums computed in ONE aggregation (conditional sum
    in the same pass), so the big join output is aggregated once."""
    p = spark.table("part").where(F.col("p_type") == "PROMO")
    s = spark.table("supplier")
    li = spark.table("lineitem")
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = spark.table("customer")
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rk")
    )
    r = spark.table("region").where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rk") == r.r_regionkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"),
                nat_vol.alias("nat_volume"))
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(F.col("nat_volume").cast(DEC)).cast("double")
                / F.sum(F.col("volume").cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum("amount", "sum_profit")}
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey
        AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey
        AND p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (no ps_supplycost in the schema, so
    profit = discounted revenue) for parts named like '%gear%', by
    supplier nation and order year. part/supplier/nation broadcast; the
    LIKE filter prunes the part build side before broadcasting."""
    p = spark.table("part").where(F.col("p_name").like("%gear%"))
    s = spark.table("supplier")
    li = spark.table("lineitem")
    o = spark.table("orders")
    n = spark.table("nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum_grid("amount", "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11",
    oracle=f"""
    SELECT l_partkey AS ps_partkey, {sql_dsum("l_extendedprice * l_quantity", "part_value")}
    FROM lineitem, supplier, nation, region
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE) > (
      SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE) * 0.001
      FROM lineitem, supplier, nation, region
      WHERE l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
    )
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (partsupp value -> shipped value
    l_extendedprice*l_quantity via EUROPE suppliers). HAVING against a
    scalar subquery over the same relation: computed by aggregating the
    per-part sums a second time (a few thousand rows) rather than
    re-scanning the fact table, then broadcast into the filter. The
    threshold is a product of two exactly-reproducible doubles, so the
    > comparison is deterministic across engines and partitionings."""
    s = spark.table("supplier")
    n = spark.table("nation")
    r = spark.table("region").where(F.col("r_name") == "EUROPE")
    li = spark.table("lineitem")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(dsum_grid(value, "part_value"))
    )
    total = per_part.agg(
        F.sum(F.col("part_value").cast(DEC)).cast("double").alias("t")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("t") * 0.001)
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-priority split (shipmode -> returnflag
    classes; 'late' = shipped >30 days after order). Conditional
    integer sums — one joined pass, both counters in the same
    aggregate, shuffle carries 3 groups of partial states."""
    o = spark.table("orders")
    li = spark.table("lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (the filter rides ON
    the outer join, keeping order-less customers with count 0).
    Aggregate-before-join: orders collapse to per-customer counts
    (partial aggregation map-side) BEFORE meeting customers, so the
    join shuffles one row per customer instead of one per order — at
    100 TB that's orders-of-magnitude less shuffle than joining raw
    orders into customers and grouping afterwards. Missing customers
    surface as COALESCE(n, 0)."""
    c = spark.table("customer")
    counts = (
        spark.table("orders")
        .where(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        c.join(counts, c.c_custkey == counts.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT 100.00 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: PROMO-part share of one month's
    revenue. Part broadcasts into the date-pruned lineitem scan; both
    sums come out of a single aggregate."""
    li = spark.table("lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = spark.table("part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast(DEC)).cast("double")
                / F.sum(rev.cast(DEC)).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier of a quarter. The revenue CTE is computed
    once and reused for both the MAX scalar and the final join (Spark:
    a window MAX over the unpartitioned 100-row aggregate — cheap
    because it runs on the aggregated relation, not the fact table).
    Equality on the double is safe: both sides are the same
    decimal-exact sum."""
    li = spark.table("lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_grid(rev, "total_revenue")
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).where(F.col("total_revenue") == F.col("max_rev"))
    s = spark.table("supplier")
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT b.l_suppkey) AS supplier_cnt
    FROM {_BRIDGE} b, part
    WHERE p_partkey = b.l_partkey
      AND p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND b.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (partsupp -> observed
    bridge; 'complaint' suppliers -> negative balance). NOT IN over a
    never-NULL key column is a left-anti join; the excluded set is tiny
    so it broadcasts."""
    bridge = spark.table("lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = spark.table("supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = spark.table("part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    return (
        bridge.join(
            F.broadcast(bad), bridge.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p), bridge.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(l_quantity))
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue. The per-part correlated
    AVG decorrelates into one groupBy over lineitem joined back on the
    part key — the classic rewrite; the per-part averages (2k rows)
    broadcast. The average uses the exact decimal sum so the `<`
    threshold is bit-identical across engines."""
    li = spark.table("lineitem")
    p = spark.table("part").where(F.col("p_brand") == "Brand#3")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(thresh), li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "tpch_q20",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_name LIKE '%bolt%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 30
      )
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (availqty -> shipped
    quantity): ASIA suppliers who moved >30 units of '%bolt%' parts in
    1996. IN <grouped subquery> -> left-semi join against the
    aggregated key set, which broadcasts."""
    p = spark.table("part").where(F.col("p_name").like("%bolt%"))
    li = spark.table("lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .where(F.col("qty") > 30)
        .select("l_suppkey")
    )
    s = spark.table("supplier")
    n = spark.table("nation")
    r = spark.table("region").where(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(movers), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_so AS (
      SELECT l_orderkey, l_suppkey, MAX(late) AS late
      FROM lo GROUP BY l_orderkey, l_suppkey
    ),
    per_o AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
      FROM per_so GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_so
    JOIN per_o USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late = 1 AND n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: the supplier was
    late (shipped >90 days after order) on a finished multi-supplier
    order where NO other supplier was late. The original's
    EXISTS(other supplier) + NOT EXISTS(other late supplier) pair
    decorrelates into one grouped pass: per (order, supplier) late
    flags, then per-order supplier/late counts as WINDOW aggregates
    over that same pass — the fact table is scanned and joined exactly
    once (a groupBy+self-join formulation would scan it twice). At
    100 TB this is the difference between a pipeline and a quadratic
    self-join."""
    li = spark.table("lineitem")
    o = spark.table("orders").where(F.col("o_orderstatus") == "F")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    per_so = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    s = spark.table("supplier")
    return (
        per_so.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), per_so.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "tpch_q22",
    oracle=f"""
    SELECT cntrycode, COUNT(*) AS numcust, {sql_dsum("c_acctbal", "totacctbal")}
    FROM (
      SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey % 10 IN (1, 3, 5, 7)
    ) custsale
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(c_acctbal)
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 3, 5, 7)
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (phone country code ->
    c_nationkey % 10): rich customers with no RECENT orders (every
    customer in the testdata has some order, so 'never ordered' would
    be empty — 'dormant since 2000' keeps the shape non-trivial). The
    scalar AVG broadcasts; NOT EXISTS(recent orders) is a left-anti
    join on custkey against the distinct recent-buyer set."""
    c = spark.table("customer").where((F.col("c_nationkey") % 10).isin(1, 3, 5, 7))
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    buyers = (
        spark.table("orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(buyers, c.c_custkey == buyers.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), dsum_grid("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )
