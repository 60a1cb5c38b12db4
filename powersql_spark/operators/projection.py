"""Projection, filters, predicates and scalar expressions (SURVEY.md §2.B.2).

Reference surface: SelectItem::{UnnamedExpr, ExprWithAlias, Wildcard}
(src/main.rs:84-88, src/types.rs:182-216), WHERE + the predicate/expression
AST arms at src/main.rs:99-142. All expressions here stay in Spark
built-ins, i.e. inside whole-stage codegen — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.registry import query


@query(
    "project_cols",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal * 0.5 AS half_bal
    FROM customer
    """,
)
def project_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT a, b, expr AS alias — reference SelectItem::UnnamedExpr /
    ExprWithAlias (src/main.rs:84-88). Column pruning reaches the parquet
    reader: ReadSchema lists only the three source columns."""
    c = spark.table("customer")
    return c.select(
        "c_custkey", "c_name", (F.col("c_acctbal") * 0.5).alias("half_bal")
    )


@query("project_star", oracle="SELECT * FROM nation")
def project_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * — the reference types this as an Open table
    (src/types.rs:201-216); Spark resolves the wildcard to a concrete
    closed schema at analysis time (SURVEY.md §7 decision 3)."""
    return spark.table("nation").select("*")


@query(
    "filter_where",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 10.0
    """,
)
def filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE predicate — e.g. examples/postgres/tests/data_tests.sql:5.
    Both conjuncts are pushed to the parquet scan (PushedFilters)."""
    li = spark.table("lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 10.0)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


@query(
    "pred_compare",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_totalprice >= 100000.0 AND o_orderstatus <> 'F'
          AND o_custkey > 0
    """,
)
def pred_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary comparisons =, <, <=, >, >=, <> — reference Expr::BinaryOp
    (src/main.rs:105-108); e.g. data_tests.sql:10."""
    o = spark.table("orders")
    return o.where(
        (F.col("o_totalprice") >= 100000.0)
        & (F.col("o_orderstatus") != "F")
        & (F.col("o_custkey") > 0)
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


@query(
    "pred_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity BETWEEN 10.0 AND 20.0
    """,
)
def pred_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN low AND high — reference Expr::Between (src/main.rs:101-104)."""
    li = spark.table("lineitem")
    return li.where(F.col("l_quantity").between(10.0, 20.0)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "pred_is_null",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS closed_status
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NULL
    """,
)
def pred_is_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL — reference Expr::{IsNull,IsNotNull}
    (src/main.rs:126-131); e.g. data_tests.sql:20. The testdata has no
    natural NULLs, so NULLIF synthesizes them."""
    o = spark.table("orders")
    closed = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey", closed.alias("closed_status")
    ).where(closed.isNull())


@query(
    "pred_in_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
    )
    """,
)
def pred_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expr IN (subquery) — reference Expr::InSubquery (src/main.rs:122-125).
    Catalyst plans this as a left-semi join."""
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
        )
        """
    )


@query(
    "pred_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_suppkey = s_suppkey AND l_quantity > 49.0
    )
    """,
)
def pred_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS (correlated subquery) — reference Expr::Exists
    (src/main.rs:115), typed Boolean (src/types.rs:76-79); the backbone of
    every ASSERT in data_tests.sql. Decorrelated to a semi join."""
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_suppkey = s_suppkey AND l_quantity > 49.0
        )
        """
    )


@query(
    "expr_unary",
    oracle="""
    SELECT o_orderkey,
           -o_totalprice AS neg_price,
           NOT (o_orderstatus = 'O') AS not_open
    FROM orders WHERE o_totalprice > 250000.0
    """,
)
def expr_unary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unary +/-/NOT — reference Expr::UnaryOp typed at
    src/types.rs:80-92 (+/- on numbers, NOT on booleans)."""
    o = spark.table("orders").where(F.col("o_totalprice") > 250000.0)
    return o.select(
        "o_orderkey",
        (-F.col("o_totalprice")).alias("neg_price"),
        (~(F.col("o_orderstatus") == "O")).alias("not_open"),
    )


@query(
    "expr_nested",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charged
    FROM lineitem WHERE l_quantity >= 49.0
    """,
)
def expr_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parenthesized expressions — reference Expr::Nested
    (src/main.rs:135-137). Per-row IEEE arithmetic is deterministic, so no
    decimal guard is needed."""
    li = spark.table("lineitem").where(F.col("l_quantity") >= 49.0)
    charged = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) * (1 + F.col("l_tax"))
    return li.select("l_orderkey", "l_linenumber", charged.alias("charged"))


@query(
    "expr_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS VARCHAR) AS line_str,
           CAST(l_orderkey AS DOUBLE) AS key_dbl,
           CAST(l_shipdate AS DATE) AS ship_day
    FROM lineitem WHERE l_quantity > 48.0
    """,
)
def expr_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST(expr AS type) — reference Expr::Cast (src/main.rs:109-111,
    src/types.rs:68-75); e.g. revenue.sql:2. Casts chosen to be
    value-identical across engines (int->string, int->double,
    timestamp->date); double->int is avoided since DuckDB rounds where
    Spark truncates."""
    li = spark.table("lineitem").where(F.col("l_quantity") > 48.0)
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_orderkey").cast("double").alias("key_dbl"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


@query(
    "expr_collate",
    oracle="SELECT r_regionkey, upper(r_name) AS name_ci FROM region",
)
def expr_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expr COLLATE collation — reference Expr::Collate (src/main.rs:112-114)
    passes collations through without checking them. Spark 4 has real
    collations; for oracle-comparability we express the common use-case
    (case-insensitive handling) as an explicit normalization, and the
    orchestrator's parser accepts and ignores COLLATE clauses like the
    reference does."""
    return spark.table("region").select(
        "r_regionkey", F.upper("r_name").alias("name_ci")
    )


@query(
    "expr_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000.0 THEN 'big'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def expr_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ... THEN ... ELSE ... END — parseable surface [P]
    (SURVEY.md §2.B.2); F.when chain in DataFrame form."""
    o = spark.table("orders")
    bucket = (
        F.when(F.col("o_totalprice") > 250000.0, "big")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("small")
    )
    return o.select("o_orderkey", bucket.alias("bucket"))


@query(
    "expr_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net,
           l_quantity + 1 AS qty_plus,
           l_extendedprice / 100.0 AS price_pct,
           l_tax - l_discount AS tax_minus_disc
    FROM lineitem WHERE l_partkey % 50 = 0
    """,
)
def expr_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """+ - * / arithmetic incl. mixed literal math — reference BinaryOp
    (src/main.rs:105-108); e.g. data_tests.sql:26."""
    li = spark.table("lineitem").where(F.col("l_partkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        (F.col("l_quantity") + 1).alias("qty_plus"),
        (F.col("l_extendedprice") / 100.0).alias("price_pct"),
        (F.col("l_tax") - F.col("l_discount")).alias("tax_minus_disc"),
    )


@query(
    "expr_bool_logic",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 150000.0)
       OR (o_orderpriority = '1-URGENT' AND NOT o_orderstatus = 'F')
    """,
)
def expr_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR chains — BinaryOp surface [P] (SURVEY.md §2.B.2)."""
    o = spark.table("orders")
    return o.where(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
        | (
            (F.col("o_orderpriority") == "1-URGENT")
            & ~(F.col("o_orderstatus") == "F")
        )
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "pred_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%gear%'
      AND p_type NOT LIKE 'SMALL%'
      AND p_brand LIKE 'Brand#_3'
    """,
)
def pred_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE with % and _ wildcards. A leading-anchored
    pattern (prefix LIKE) can push to parquet as a range filter;
    %-leading patterns are full scans by nature."""
    p = spark.table("part")
    return p.where(
        F.col("p_name").like("%gear%")
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_brand").like("Brand#_3")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "expr_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(substring(text, 1, 4) AS INTEGER) AS maybe_int,
           TRY_CAST(lang AS DOUBLE) AS never_double,
           CAST(n_chars AS VARCHAR) AS chars_str
    FROM documents WHERE doc_id < 250
    """,
)
def expr_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST — NULL on conversion failure instead of a runtime
    error. Under ANSI mode (Spark 4 default) plain CAST throws on bad
    input mid-job; TRY_CAST is how a 100 TB pipeline survives dirty
    rows without disabling ANSI safety everywhere else."""
    d = spark.table("documents").where(F.col("doc_id") < 250)
    return d.select(
        "doc_id",
        F.expr("TRY_CAST(substring(text, 1, 4) AS INT)").alias("maybe_int"),
        F.expr("TRY_CAST(lang AS DOUBLE)").alias("never_double"),
        F.col("n_chars").cast("string").alias("chars_str"),
    )


@query(
    "pred_rlike",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE regexp_matches(o_orderpriority, '^[12]-(URGENT|HIGH)$')
    """,
)
def pred_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate in WHERE (RLIKE) — the pattern-match filter the
    LIKE surface (pred_like) can't express (anchors, alternation,
    classes). ASCII-only patterns keep Java regex (Spark) and RE2
    (DuckDB) agreeing. The filter sits in the scan stage
    (DataFilters), so matching happens during the columnar read — no
    separate pass."""
    o = spark.table("orders")
    return o.where(
        F.col("o_orderpriority").rlike(r"^[12]-(URGENT|HIGH)$")
    ).select("o_orderkey", "o_orderpriority")


@query(
    "pred_in_multicol",
    oracle="""
    WITH hot AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem GROUP BY 1, 2
        HAVING COUNT(*) >= 3
    )
    SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
    FROM lineitem li
    WHERE EXISTS (SELECT 1 FROM hot
                  WHERE hot.ps_partkey = li.l_partkey
                    AND hot.ps_suppkey = li.l_suppkey)
    ORDER BY l_orderkey, l_partkey, l_suppkey, l_quantity
    """,
)
def pred_in_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column IN subquery — (a, b) IN (SELECT x, y ...): row-value
    membership against a derived set (here: part-supplier pairs
    appearing on 3+ lineitems). Catalyst plans it as a left-semi join
    on the composite key, exactly like single-column IN — no row-value
    gymnastics needed at any scale."""
    return spark.sql(
        """
        SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
        FROM lineitem
        WHERE (l_partkey, l_suppkey) IN (
            SELECT ps_partkey, ps_suppkey
            FROM (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                         COUNT(*) AS n
                  FROM lineitem GROUP BY 1, 2
                  HAVING COUNT(*) >= 3) hot
        )
        ORDER BY l_orderkey, l_partkey, l_suppkey, l_quantity
        """
    )


@query(
    "pred_like_escape",
    oracle="""
    SELECT p_partkey, p_type
    FROM part
    WHERE p_type LIKE '%BRUSHED!%%' ESCAPE '!'
       OR p_type LIKE 'ECONOMY%'
    ORDER BY p_partkey
    """,
)
def pred_like_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with an ESCAPE clause — matching a literal '%' (or '_')
    inside the pattern, the corner of the LIKE surface plain pred_like
    can't express. No part type actually contains '%', so the escaped
    branch matches nothing and the result is exactly the ECONOMY
    prefix scan — proving the escape parses and evaluates rather than
    silently treating '!' as a literal."""
    return spark.sql(
        """
        SELECT p_partkey, p_type
        FROM part
        WHERE p_type LIKE '%BRUSHED!%%' ESCAPE '!'
           OR p_type LIKE 'ECONOMY%'
        ORDER BY p_partkey
        """
    )
