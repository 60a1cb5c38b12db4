"""Windowed event aggregation over ``events`` (extension; the reference
has no streaming at all — SURVEY.md §2.B.10).

Batch-first: tumbling / sliding / session windows are implemented with
the exact functions Structured Streaming uses (``F.window``,
``F.session_window``), run in batch mode so the DuckDB oracle can verify
values. ``run_streaming_tumbling`` then runs the *same* aggregation as a
real ``readStream`` with a watermark (micro-batch, availableNow) — the
tests assert batch and streaming agree, which is the guarantee that
matters when promoting a batch pipeline to a live stream.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import dsum
from powersql_spark.registry import query


@query(
    "window_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — F.window in batch mode;
    identical code runs under readStream with a watermark."""
    e = spark.table("events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "window_sliding",
    oracle="""
    WITH slid AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - k * INTERVAL '30 minutes' AS window_start,
               value
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
        WHERE ts < time_bucket(INTERVAL '30 minutes', ts)
                   - k * INTERVAL '30 minutes' + INTERVAL '1 hour'
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM slid GROUP BY window_start
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide — each event lands
    in two windows. The oracle reconstructs the window set with an
    unnested offset join."""
    e = spark.table("events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@query(
    "window_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL '10 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 10-minute gap per user — F.session_window
    in batch mode (same operator Structured Streaming uses for stateful
    sessionization). Oracle: classic gaps-and-islands rewrite."""
    e = spark.table("events")
    return (
        e.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "total_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM (
        SELECT DISTINCT ON (event_id) event_id, user_id, event_type
        FROM events ORDER BY event_id, ts
    ) d
    GROUP BY user_id, event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-id dedup then aggregate — batch ``dropDuplicates`` here; the
    streaming twin is ``dropDuplicatesWithinWatermark`` (tested in
    tests/test_streaming.py). event_id is unique in the testdata, so
    DISTINCT ON and dropDuplicates agree deterministically."""
    e = spark.table("events")
    return (
        e.dropDuplicates(["event_id"])
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS trailing_1h_value,
           COUNT(*) OVER w AS n_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frame: per-user trailing-1-hour sum
    and count at every event — the time-series 'value in the last hour'
    shape. Spark's rangeBetween needs a numeric ordering key, so the
    frame orders by unix_micros(ts) with a microsecond offset, exactly
    matching the oracle's INTERVAL arithmetic (events timestamps are
    microsecond-exact; verified no sub-microsecond residue). One
    shuffle on user_id; the frame is computed in a single sorted pass
    per partition with a sliding accumulator, never a per-row rescan."""
    from pyspark.sql import Window

    e = spark.table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_value"),
        F.count("*").over(w).alias("n_trailing"),
    )


@query(
    "rollup_hypertable",
    oracle="""
    SELECT CASE WHEN GROUPING(bucket_hour) = 0 THEN 'hour' ELSE 'day' END
               AS grain,
           COALESCE(bucket_hour, bucket_day) AS bucket_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             event_type, value
      FROM events
    ) buckets
    GROUP BY GROUPING SETS ((bucket_hour, event_type),
                            (bucket_day, event_type))
    """,
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly AND daily
    per-type aggregates of the event stream in ONE pass via GROUPING
    SETS (the multi-granularity rollup a time-series store maintains
    incrementally). Partial aggregation still applies per grouping set,
    so the scan is read once and the shuffle carries two small partial
    states per (bucket, type) — at 100 TB this halves the read vs a
    UNION ALL of two aggregations."""
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(bucket_hour) = 0 THEN 'hour' ELSE 'day' END
                   AS grain,
               COALESCE(bucket_hour, bucket_day) AS bucket_start,
               event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM (
          SELECT date_trunc('HOUR', ts) AS bucket_hour,
                 date_trunc('DAY', ts) AS bucket_day,
                 event_type, value
          FROM events
        )
        GROUP BY GROUPING SETS ((bucket_hour, event_type),
                                (bucket_day, event_type))
        """
    )


def run_streaming_tumbling(
    spark: SparkSession, sf_dir: str, table_name: str = "stream_tumbling_out"
) -> DataFrame:
    """True Structured Streaming variant of :func:`window_tumbling`:
    readStream over the events parquet, 2-hour watermark, availableNow
    trigger into an in-memory sink. Returns the sink contents.

    Watermark semantics: with a finite availableNow input and a watermark
    larger than any disorder in the data, the result equals the batch
    aggregation — asserted in tests/test_streaming.py."""
    from powersql_spark.catalog import read_parquet_stream

    stream = (
        read_parquet_stream(spark, f"{sf_dir}/events.parquet")
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    checkpoint = tempfile.mkdtemp(prefix="powersql_ckpt_")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


@query(
    "stream_interval_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           COUNT(c.ts) AS n_recent_clicks,
           COALESCE(CAST(SUM(CAST(c.value AS DECIMAL(18,6))) AS DOUBLE), 0.0)
               AS recent_click_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '10 minutes' AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: every purchase with the count/value of same-user
    clicks in the preceding 10 minutes — the attribution-window shape.
    This is the BATCH twin of the stream-stream watermarked interval
    join (the real readStream run, with both sides' state bounded by
    watermark + interval, is asserted equal to batch in
    tests/test_streaming.py::test_stream_stream_interval_join).
    One shuffle on user_id; the range predicate rides the equi-join."""
    e = spark.table("events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("ts"))
    )
    return (
        p.join(c, cond, "left")
        .groupBy("event_id", "user_id")
        .agg(
            F.count("c_ts").alias("n_recent_clicks"),
            F.coalesce(
                F.sum(F.col("c_value").cast("decimal(18,6)")).cast("double"),
                F.lit(0.0),
            ).alias("recent_click_value"),
        )
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to a static
    dimension (customer segment), aggregated per (segment, event_type)
    — the canonical "enrich the firehose with a lookup table" shape.
    BATCH twin of the readStream run asserted equal in
    tests/test_streaming.py::test_stream_static_join_equals_batch.

    Scale shape: the dimension broadcasts (no stream-side shuffle for
    the join — each micro-batch probes the broadcast hash table
    map-side); the only shuffle is the final aggregation on the tiny
    (segment, type) key space. Decimal-summed for bit-stable parity."""
    e = spark.table("events")
    c = spark.table("customer").select("c_custkey", "c_mktsegment")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "window_topk_per_window",
    oracle="""
    WITH per_user AS (
        SELECT date_trunc('hour', ts) AS window_start, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_value
        FROM events GROUP BY date_trunc('hour', ts), user_id
    ),
    ranked AS (
        SELECT window_start, user_id, total_value,
               ROW_NUMBER() OVER (PARTITION BY window_start
                                  ORDER BY total_value DESC, user_id)
                   AS rnk
        FROM per_user
    )
    SELECT window_start, CAST(rnk AS INTEGER) AS rnk, user_id, total_value
    FROM ranked WHERE rnk <= 3
    """,
)
def window_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by spend per tumbling hour — the windowed-leaderboard
    shape. Batch twin of the foreachBatch streaming pattern: Structured
    Streaming cannot rank in append mode, so production runs the
    window aggregate under readStream and applies this rank inside
    foreachBatch per micro-batch (complete-mode twin asserted in
    tests/test_streaming.py). Ties broken by user_id — deterministic
    cut on both engines.

    Scale shape: partial sum before the (window, user) shuffle, then the
    rank window re-shuffles only the aggregated (window, user) rows —
    two exchanges over data that shrinks at each step; the raw event
    stream is never re-shuffled."""
    from pyspark.sql import Window as W

    per_user = (
        spark.table("events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"), "user_id", "total_value"
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("window_start").orderBy(
            F.desc("total_value"), "user_id"
        )
    )
    return (
        per_user.select(
            "window_start", rnk.alias("rnk"), "user_id", "total_value"
        )
        .where(F.col("rnk") <= 3)
        .select("window_start", "rnk", "user_id", "total_value")
    )


@query(
    "ts_gap_fill_locf",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events
    ),
    spine AS (
        SELECT t.event_type, gs.h
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                        AS h FROM bounds) gs
    )
    SELECT s.event_type, s.h AS hour_ts, hourly.total,
           last_value(hourly.total IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.h
               ROWS UNBOUNDED PRECEDING) AS total_filled,
           hourly.total IS NULL AS is_gap
    FROM spine s
    LEFT JOIN hourly
      ON hourly.event_type = s.event_type AND hourly.h = s.h
    """,
)
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward
    (the TimescaleDB ``time_bucket_gapfill``/``locf`` shape): a dense
    hourly spine per event type, hours with no events marked and filled
    from the last observed hour — what dashboards and forecast featurizers
    need from an irregular event stream.

    Scale shape: the spine is (hours × types) — metadata-sized at ANY
    data volume, generated executor-side from one min/max aggregate
    (sequence + explode, no driver loop). The raw stream is touched
    once by the hourly rollup; the gap-fill join and LOCF window run on
    rollup-sized data."""
    e = spark.table("events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(dsum("value", "total"))
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    # hours is one exploded min/max row — hint it broadcast so the spine
    # is a BroadcastNestedLoopJoin under ANY session (AQE already picks
    # this on the tuned session; the hint makes it plan-deterministic,
    # matching the siblings at stats_more.py:370,498).
    spine = e.select("event_type").distinct().crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        # The hourly rollup is (types x hours) — metadata-sized at any
        # corpus volume, so hint it broadcast (ADVICE r12): the spine
        # probes a broadcast hash table instead of both metadata-sized
        # sides riding a shuffle exchange. (The spine is the PRESERVED
        # side of the left join, so the rollup is the broadcastable one.)
        spine.join(F.broadcast(hourly), ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            "total",
            F.last("total", ignorenulls=True).over(w).alias("total_filled"),
            F.col("total").isNull().alias("is_gap"),
        )
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH s0 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events
    ),
    s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM s0
    ),
    s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts
                       END) OVER (PARTITION BY user_id) AS t2
        FROM s1
    ),
    pu AS (
        SELECT user_id, MAX(t0) AS t0, MAX(t1) AS t1, MAX(t2) AS t2
        FROM s2 GROUP BY user_id
    )
    SELECT COUNT(t0) AS n_viewed,
           COUNT(t1) AS n_clicked_after_view,
           COUNT(t2) AS n_purchased_after_click
    FROM pu
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): per user,
    the first view, the first click AFTER that view, the first purchase
    AFTER that click — then how many users survive each stage. The
    event-analytics primitive behind every product dashboard.

    Scale shape: three chained unordered window MINs over the SAME
    user_id partitioning — Catalyst plans ONE exchange and reuses it
    for all three window stages and the final per-user rollup; the
    range conditions are per-row predicates, not joins. One shuffle of
    the event stream, total."""
    e = spark.table("events")
    w = Window.partitionBy("user_id")
    s0 = e.withColumn(
        "t0",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s1 = s0.withColumn(
        "t1",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t0")),
                F.col("ts"),
            )
        ).over(w),
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    pu = s2.groupBy("user_id").agg(
        F.max("t0").alias("t0"),
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
    )
    return pu.agg(
        F.count("t0").alias("n_viewed"),
        F.count("t1").alias("n_clicked_after_view"),
        F.count("t2").alias("n_purchased_after_click"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS hour_ts,
           arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 10, '0'))
               AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 10, '0'))
               AS close,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling — irregular events downsampled to hourly
    open/high/low/close candles per type (the TimescaleDB
    ``candlestick_agg`` / pandas ``resample().ohlc()`` shape).

    open/close are MIN_BY/MAX_BY over a zero-padded (epoch-micros,
    event_id) string key — one aggregation pass, no sort, and the
    composite key makes simultaneous events tie-break identically on
    both engines. Scale shape: pure partial aggregation; only
    (type, hour) candle state shuffles, never raw ticks — the same
    single-exchange plan at any volume."""
    e = spark.table("events")
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    return e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "window_session_dynamic",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value,
               ts + CASE WHEN event_type = 'purchase'
                         THEN INTERVAL '30 minutes'
                         ELSE INTERVAL '10 minutes' END AS endt
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, value, endt,
               CASE WHEN ts <= MAX(endt) OVER (
                        PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS new_session
        FROM g
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows: the inactivity gap depends on the
    event (purchases hold a session open 30 minutes, everything else
    10) — F.session_window with a per-row gap expression, the shape
    engagement analytics actually needs. The oracle is the general
    islands construction: a session continues while an event starts at
    or before the RUNNING MAX of previous members' (ts + gap) ends —
    the constant-gap lag() rewrite (window_session) is insufficient
    once gaps vary.

    Scale shape: identical to fixed-gap sessions — one exchange on
    user_id; in streaming mode the same expression runs stateful with
    watermark-driven state eviction."""
    e = spark.table("events")
    gap = F.when(
        F.col("event_type") == "purchase", "30 minutes"
    ).otherwise("10 minutes")
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "total_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )


@query(
    "stream_late_audit",
    oracle="""
    WITH b AS (
        SELECT event_id, ts, event_type,
               CAST(FLOOR(event_id / 1000) AS BIGINT) AS bkt
        FROM events
    ),
    inb AS (
        SELECT *,
               MAX(ts) OVER (PARTITION BY bkt ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_in
        FROM b
    ),
    bm AS (SELECT bkt, MAX(ts) AS bmax FROM b GROUP BY bkt),
    pm AS (
        SELECT bkt,
               MAX(bmax) OVER (ORDER BY bkt
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS prev_b
        FROM bm
    ),
    j AS (
        SELECT inb.event_type, inb.ts,
               GREATEST(COALESCE(prev_in, TIMESTAMP '1970-01-01'),
                        COALESCE(prev_b, TIMESTAMP '1970-01-01'))
                   AS wm_base
        FROM inb JOIN pm USING (bkt)
    )
    SELECT event_type,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN ts < wm_base - INTERVAL 10 MINUTE
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(round(CAST(CAST((SUM(CASE WHEN ts < wm_base
                        - INTERVAL 10 MINUTE THEN 1 ELSE 0 END)
                        * 100.0 / COUNT(*)) AS VARCHAR)
                        AS DECIMAL(38,18)), 4) AS DOUBLE) AS late_pct
    FROM j
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data audit: per event_type, how many rows a
    10-minute watermark would DROP — each row is late iff its event
    time is older than (max event time among all earlier-arriving
    rows) - 10min, with arrival order = event_id. This is the
    TIGHTEST reading of Structured Streaming's ``withWatermark("ts",
    "10 minutes")`` rule (the engine advances the watermark only at
    micro-batch boundaries, so a real run drops a subset of these
    rows — the audit is the safe upper bound). The sizing study every
    streaming job needs BEFORE picking its watermark delay (too short
    silently drops data; too long bloats state).

    Scale shape: the global "max ts seen so far" is a two-phase
    distributed prefix max (same pattern as curation_token_budget's
    prefix sum): an exclusive running max WITHIN each 1000-row arrival
    bucket (shuffle keyed on bucket), plus an exclusive running max
    ACROSS the bucket-level maxima (a window over the metadata-sized
    bucket table, broadcast back). No global single-partition pass
    over the corpus anywhere; the late flag is then map-side and the
    summary one aggregation."""
    b = spark.table("events").select(
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("event_id") / F.lit(1000))
        .cast("bigint")
        .alias("bkt"),
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    inb = b.select(
        "event_type", "ts", "bkt", F.max("ts").over(w_in).alias("prev_in")
    )
    bm = b.groupBy("bkt").agg(F.max("ts").alias("bmax"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    pm = bm.select("bkt", F.max("bmax").over(w_b).alias("prev_b"))
    epoch = F.lit("1970-01-01").cast("timestamp")
    j = inb.join(F.broadcast(pm), "bkt").select(
        "event_type",
        "ts",
        F.greatest(
            F.coalesce(F.col("prev_in"), epoch),
            F.coalesce(F.col("prev_b"), epoch),
        ).alias("wm_base"),
    )
    late = F.when(
        F.col("ts") < F.col("wm_base") - F.expr("INTERVAL 10 MINUTES"), 1
    ).otherwise(0)
    agg = j.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(late).cast("bigint").alias("n_late"),
    )
    return agg.select(
        "event_type",
        "n_total",
        "n_late",
        F.round(F.col("n_late") * 100.0 / F.col("n_total"), 4).alias(
            "late_pct"
        ),
    ).orderBy("event_type")
