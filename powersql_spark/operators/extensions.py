"""Relational extensions beyond the reference surface (SURVEY.md §2.B.4
"absent — extension only" rows, §2.B.3 as-of joins, plus struct/interval
support). The reference's parser would pass none of these through, but a
user of a modern warehouse expects them; all are native Spark operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import dsum
from powersql_spark.registry import query


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS — multi-granularity aggregation in one
    pass (Catalyst plans an Expand + single shuffle, not N scans)."""
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals."""
    return (
        spark.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations."""
    return (
        spark.table("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS open_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS finished_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS partial_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — orders total by priority x status. Spark's pivot with an
    explicit value list (never pivot on unknown cardinality at scale:
    the value list bounds the output width and skips a distinct scan)."""
    piv = (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(dsum("o_totalprice", "t"))
    )
    return piv.select(
        "o_orderpriority",
        F.col("O").alias("open_total"),
        F.col("F").alias("finished_total"),
        F.col("P").alias("partial_total"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous percentiles (interpolated — deterministic, so it
    oracle-checks exactly, unlike approximate sketches)."""
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("median_price"),
            F.percentile("o_totalprice", 0.9).alias("p90_price"),
        )
    )


@query(
    "agg_approx_percentile",
    # Sketch values are engine-specific, so the driver can't hash-compare
    # them directly. Instead the Spark side emits the ACCURACY GATE itself
    # — |approx - exact| <= 2% of exact, per group and percentile — and the
    # oracle asserts that gate holds (true for every group). A sketch drift
    # beyond 2% flips a boolean and fails the driver's value hash.
    oracle="""
    SELECT o_orderpriority,
           true AS median_within_2pct,
           true AS p90_within_2pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the scale path for
    quantiles: bounded-size mergeable sketch per group vs the exact
    percentile's full sort of every value. At 100 TB the exact form
    shuffles and sorts the whole column; the sketch keeps O(1/eps)
    state and merges map-side. The exact percentile computed alongside
    exists only to feed the tolerance gate; production would run the
    sketch alone."""
    g = (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("am"),
            F.percentile_approx("o_totalprice", 0.9, 10000).alias("a90"),
            F.percentile("o_totalprice", 0.5).alias("em"),
            F.percentile("o_totalprice", 0.9).alias("e90"),
        )
    )
    return g.select(
        "o_orderpriority",
        (F.abs(F.col("am") - F.col("em")) <= 0.02 * F.abs(F.col("em"))).alias(
            "median_within_2pct"
        ),
        (F.abs(F.col("a90") - F.col("e90")) <= 0.02 * F.abs(F.col("e90"))).alias(
            "p90_within_2pct"
        ),
    )


@query(
    "agg_approx_distinct",
    # Same tolerance-gate pattern as agg_approx_percentile: emit the 5%
    # accuracy claim as a boolean the driver hash-verifies.
    oracle="""
    SELECT l_returnflag, true AS parts_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the scale path for
    cardinality: constant memory per group vs the exact distinct's
    shuffle of every value. The exact count-distinct computed alongside
    exists only to feed the 5% tolerance gate; production would run the
    sketch alone."""
    g = (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
    )
    return g.select(
        "l_returnflag",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("parts_within_5pct"),
    )


@query(
    "join_asof",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    errors AS (
        SELECT user_id, ts AS err_ts FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts, e.err_ts AS last_error_ts
    FROM purchases p
    ASOF LEFT JOIN errors e
      ON p.user_id = e.user_id AND e.err_ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each purchase, the most recent error of the same
    user at or before it. Spark lacks a native ASOF join; the scalable
    rewrite is union + last_value window — ONE shuffle on user_id, no
    range cross-product. (DuckDB has native ASOF JOIN for the oracle.)"""
    e = spark.table("events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("err_ts")
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("err_ts"),
    )
    # Errors sort before purchases at equal ts (err_ts non-null first in
    # the tagged union) so "<=" semantics match ASOF.
    tagged = errors.union(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("err_ts").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "ts",
            F.last("err_ts", ignorenulls=True).over(w).alias("last_error_ts"),
        )
        .where(F.col("event_id").isNotNull())
    )


@query(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(o_orderdate AS DATE) + 7 AS week_later,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS q
    FROM orders WHERE o_totalprice > 290000.0
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + quarter extraction."""
    o = spark.table("orders").where(F.col("o_totalprice") > 290000.0)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("week_later"),
        F.quarter("o_orderdate").alias("q"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT event_id,
           struct_extract({'etype': event_type, 'val': value}, 'etype') AS etype,
           struct_extract({'etype': event_type, 'val': value}, 'val') AS val
    FROM events WHERE event_id < 300
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (flattened to scalars so the
    value hash is representation-independent)."""
    e = spark.table("events").where(F.col("event_id") < 300)
    s = F.struct(
        F.col("event_type").alias("etype"), F.col("value").alias("val")
    )
    return e.select(
        "event_id",
        s.getField("etype").alias("etype"),
        s.getField("val").alias("val"),
    )


@query(
    "skyline_pareto",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
    )
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto-optimal set): parts not dominated on
    (minimize retailprice, minimize size). Skyline-in-Spark-SQL is a
    studied problem (EDBT 2023, PAPERS.md); the naive NOT EXISTS form
    (the oracle) is an O(n^2) nested-loop join, while this plan is the
    sort-scan rewrite:

      distinct pairs -> min size per price (one shuffle, partial agg)
      -> prefix-min scan over prices ascending -> semi-join back.

    A pair is in the skyline iff its size beats the running min of all
    strictly cheaper prices; identical duplicate points don't dominate
    each other (strict domination), which the semi-join back preserves.
    The final ordered scan runs over at most |distinct prices| rows —
    at 100 TB the same shape holds with a partition-local prefix-min
    first (each partition's local skyline is tiny), so the global scan
    never sees raw data volume."""
    p = spark.table("part").select("p_partkey", "p_retailprice", "p_size")
    # Only the min-size pair per price can survive (same price, larger
    # size => strictly dominated).
    per_price = (
        p.groupBy("p_retailprice")
        .agg(F.min("p_size").alias("p_size"))
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky_pairs = (
        per_price.withColumn("prev_min", F.min("p_size").over(w))
        .where(F.col("prev_min").isNull() | (F.col("p_size") < F.col("prev_min")))
        .select("p_retailprice", "p_size")
    )
    return p.join(
        F.broadcast(sky_pairs), ["p_retailprice", "p_size"], "left_semi"
    ).select("p_partkey", "p_retailprice", "p_size")


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET — paging over a total order."""
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
        """
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    errors AS (
        SELECT user_id, ts AS err_ts FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts, e.err_ts AS next_error_ts
    FROM purchases p
    ASOF LEFT JOIN errors e
      ON p.user_id = e.user_id AND e.err_ts >= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each purchase, the EARLIEST error of the
    same user at or after it ("did an error follow this purchase?").
    The mirror of join_asof: same tagged-union + window rewrite but a
    FOLLOWING frame with first_value — still ONE shuffle on user_id,
    no range cross-product. Purchases sort before errors at equal ts
    so '>= ' semantics match DuckDB's ASOF."""
    e = spark.table("events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("err_ts"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("err_ts"),
    )
    tagged = purchases.union(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("err_ts").asc_nulls_first())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "ts",
            F.first("err_ts", ignorenulls=True)
            .over(w)
            .alias("next_error_ts"),
        )
        .where(F.col("event_id").isNotNull())
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    errors AS (
        SELECT user_id, ts AS err_ts FROM events
        WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT e.err_ts FROM errors e
             WHERE e.user_id = p.user_id
             ORDER BY abs(epoch_us(e.err_ts) - epoch_us(p.ts)), e.err_ts
             LIMIT 1) AS nearest_error_ts
    FROM purchases p
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor AS-OF join (pandas ``merge_asof
    direction='nearest'``): for each purchase, the error of the same
    user closest in time in EITHER direction; equidistant ties take
    the earlier error. Completes the as-of family (backward
    ``join_asof``, forward ``join_asof_forward``).

    Scale shape: same union + window rewrite as the directional
    variants — ONE (user_id) exchange and ONE sort serve BOTH frame
    directions (last-non-null backward, first-non-null forward); the
    nearest pick is a per-row CASE on the two bracket timestamps. No
    range cross-product at any scale. The oracle is deliberately a
    different algorithm (per-row ORDER BY LIMIT 1 over all the user's
    errors) so the window rewrite is verified against the naive
    definition, not against itself."""
    e = spark.table("events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("err_ts"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("err_ts"),
    )
    # Errors sort before purchases at equal ts, so an equal-ts error
    # lands in the backward bracket (distance 0 wins regardless).
    tagged = errors.union(purchases)
    order = [F.col("ts").asc(), F.col("err_ts").asc_nulls_last()]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = F.last("err_ts", ignorenulls=True).over(wb)
    fwd = F.first("err_ts", ignorenulls=True).over(wf)
    nearest = (
        F.when(back.isNull(), fwd)
        .when(fwd.isNull(), back)
        .when(
            F.unix_micros(F.col("ts")) - F.unix_micros(back)
            <= F.unix_micros(fwd) - F.unix_micros(F.col("ts")),
            back,
        )
        .otherwise(fwd)
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "ts",
            nearest.alias("nearest_error_ts"),
        )
        .where(F.col("event_id").isNotNull())
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    errors AS (
        SELECT user_id, ts AS err_ts FROM events
        WHERE event_type = 'error'
    ),
    matched AS (
        SELECT p.event_id, p.user_id, p.ts, e.err_ts
        FROM purchases p
        ASOF LEFT JOIN errors e
            ON p.user_id = e.user_id AND p.ts >= e.err_ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN ts - err_ts <= INTERVAL 1 HOUR THEN err_ts END
               AS recent_error_ts
    FROM matched
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a staleness tolerance (pandas
    ``merge_asof(tolerance=...)``): each purchase gets the most recent
    same-user error ONLY if it happened within the last hour —
    anything older is noise, not a cause. The variant incident
    attribution and feature pipelines actually want (an error from
    last week should not label today's purchase).

    Spark shape: identical to join_asof — union + last_value window,
    ONE (user_id) shuffle, no range cross-product — with the
    tolerance applied as a post-window filter expression. The
    tolerance cannot be pushed into the window (the nearest match
    must be found FIRST, then aged out: dropping old errors before
    the window would instead surface the second-newest)."""
    e = spark.table("events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias("err_ts"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("err_ts"),
    )
    tagged = errors.union(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("err_ts").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_err = F.last("err_ts", ignorenulls=True).over(w)
    return (
        tagged.select(
            "event_id",
            "user_id",
            "ts",
            F.when(
                last_err >= F.col("ts") - F.expr("INTERVAL 1 HOUR"),
                last_err,
            ).alias("recent_error_ts"),
        )
        .where(F.col("event_id").isNotNull())
    )


_KEYSET_PAGE = 25


@query(
    "window_keyset_pagination",
    oracle=f"""
    WITH page1 AS (
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM orders
        ORDER BY o_orderdate, o_orderkey LIMIT {_KEYSET_PAGE}
    ),
    cursor1 AS (
        SELECT o_orderdate AS c_date, o_orderkey AS c_key FROM page1
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ),
    page2 AS (
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice
        FROM orders o, cursor1 c
        WHERE (o.o_orderdate, o.o_orderkey) > (c.c_date, c.c_key)
        ORDER BY o.o_orderdate, o.o_orderkey LIMIT {_KEYSET_PAGE}
    )
    SELECT 2 AS page, o_orderkey, o_custkey, o_orderdate,
           o_totalprice
    FROM page2
    ORDER BY o_orderdate, o_orderkey
    """,
)
def window_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: fetch page 2 of the order feed by
    filtering PAST the last (date, key) cursor of page 1, never by
    OFFSET — the API-pagination pattern that stays O(page) at any
    depth, where OFFSET n scans-and-discards n rows (limit_offset
    shows the anti-pattern this replaces; at page 10^6 of a 100 TB
    feed, offset pagination is a full-scan per request, keyset is a
    pushed-down range predicate + top-k).

    Scale shape: the cursor is a one-row broadcast; the page-2 fetch
    is a tuple-compare filter that Catalyst pushes toward the scan
    plus a TakeOrderedAndProject — no global sort, no offset
    discard. The composite tuple compare keys the seek on the full
    ORDER BY, so ties on the date column page correctly."""
    o = spark.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    page1 = o.orderBy("o_orderdate", "o_orderkey").limit(_KEYSET_PAGE)
    cursor = (
        page1.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            F.col("o_orderdate").alias("c_date"),
            F.col("o_orderkey").alias("c_key"),
        )
    )
    page2 = (
        o.join(F.broadcast(cursor))
        .where(
            (F.col("o_orderdate") > F.col("c_date"))
            | (
                (F.col("o_orderdate") == F.col("c_date"))
                & (F.col("o_orderkey") > F.col("c_key"))
            )
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_KEYSET_PAGE)
    )
    return page2.select(
        F.lit(2).alias("page"),
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
    ).orderBy("o_orderdate", "o_orderkey")


@query(
    "fn_month_arithmetic",
    oracle="""
    WITH anchors AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        FROM orders
        WHERE EXTRACT(day FROM o_orderdate) >= 28
        ORDER BY o_orderkey LIMIT 25
    )
    SELECT o_orderkey, d,
           CAST(d + INTERVAL 1 MONTH AS DATE) AS next_month,
           CAST(d - INTERVAL 1 MONTH AS DATE) AS prev_month,
           CAST(d + INTERVAL 3 MONTH AS DATE) AS plus_quarter,
           CAST((EXTRACT(year FROM d) * 12 + EXTRACT(month FROM d))
                - (1970 * 12 + 1) AS BIGINT) AS months_since_epoch,
           CAST(date_trunc('month', d) AS DATE)
               + INTERVAL 1 MONTH - INTERVAL 1 DAY = d AS is_month_end
    FROM anchors
    ORDER BY o_orderkey
    """,
)
def fn_month_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar month arithmetic on month-end anchors (days >= 28 —
    the dates where naive day-addition breaks): add_months clamping
    (Jan 31 + 1 month = Feb 28), integer months-since-epoch (the
    portable month-diff — both engines' fractional months_between
    semantics differ, so the index form is the cross-engine-safe
    one), and month-end detection via first-of-next-month minus one
    day. The date-dimension kernel behind every fiscal rollup and
    SCD effective-dating bug.

    Scale shape: map-only expressions over a 25-row rank pick; the
    point of the key is SEMANTIC portability (clamping behavior
    verified identical across engines), not volume."""
    anchors = (
        spark.table("orders")
        .where(F.dayofmonth("o_orderdate") >= 28)
        .select(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
        )
        .orderBy("o_orderkey")
        .limit(25)
    )
    months_idx = (
        F.year("d") * 12 + F.month("d") - (1970 * 12 + 1)
    ).cast("bigint")
    is_month_end = (
        F.date_sub(F.add_months(F.trunc("d", "month"), 1), 1)
        == F.col("d")
    )
    return anchors.select(
        "o_orderkey",
        "d",
        F.add_months("d", 1).alias("next_month"),
        F.add_months("d", -1).alias("prev_month"),
        F.add_months("d", 3).alias("plus_quarter"),
        months_idx.alias("months_since_epoch"),
        is_month_end.alias("is_month_end"),
    ).orderBy("o_orderkey")


@query(
    "agg_approx_topk",
    # With a handful of distinct event types the sketch holds every
    # counter exactly, so estimate == exact deterministically and the
    # whole readout (items, counts, agreement flags) hash-verifies —
    # the same design as the count-min key.
    oracle="""
    WITH exact AS (
        SELECT event_type, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type)
                   AS rnk
        FROM events GROUP BY event_type
    )
    SELECT CAST(rnk AS INTEGER) AS rank, event_type AS item,
           CAST(n AS BIGINT) AS est_n, CAST(n AS BIGINT) AS exact_n,
           true AS est_matches_exact
    FROM exact WHERE rnk <= 5
    ORDER BY rank
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy hitters (Spark 4's built-in frequent-items
    sketch): top-5 event types by estimated frequency, cross-checked
    against the exact counts — the bounded-state path for 'most
    frequent values' when the domain is too wide to count exactly
    (text_ngram_topk's exact form dies when the vocabulary outgrows
    the shuffle; this sketch caps state at maxItemsTracked).

    Scale shape: the sketch aggregates map-side with constant state
    and merges; the exact side exists only to feed the agreement
    flag (true whenever the domain fits the sketch, as here). Ties
    in the sketch output are re-ranked deterministically by
    (count desc, item)."""
    d = spark.table("events")
    sk = d.agg(
        F.expr("approx_top_k(event_type, 5)").alias("tk")
    ).select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").alias("est_n"),
    )
    exact = d.groupBy(F.col("event_type").alias("item")).agg(
        F.count("*").alias("exact_n")
    )
    joined = sk.join(exact, "item")
    w = Window.orderBy(F.desc("est_n"), "item")
    return (
        joined.select(
            F.row_number().over(w).cast("int").alias("rank"),
            "item",
            F.col("est_n").cast("bigint").alias("est_n"),
            F.col("exact_n").cast("bigint").alias("exact_n"),
            (F.col("est_n") == F.col("exact_n")).alias(
                "est_matches_exact"
            ),
        )
        .orderBy("rank")
    )
