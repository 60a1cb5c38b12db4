"""Round-5 analytics widening: rank statistics, customer segmentation,
distribution drift, decayed popularity, and CDC changelog application.

Extensions beyond the reference (SURVEY.md §2.B.11 — PowerSQL's surface
is whatever its backend executes, reference src/execute.rs:101; these
keys are the Spark-native analytics a warehouse user would run there).

Every key follows the repo discipline: decimal-exact aggregation state
where sums must be order-independent, integer/rational arithmetic held
unrounded until one final rounding, deterministic tie-breaks on every
window/top-k, and a DuckDB oracle twin sharing the same formula
templates so the driver hash check is bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import sql_jround
from powersql_spark.registry import query

# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) per event segment.
#
# The nonparametric sibling of stats_welch_ttest: valid when values are
# heavy-tailed / non-normal (metric distributions usually are). Shared
# formula templates keep Spark and DuckDB bit-identical: everything up
# to the final z is integer or half-integer arithmetic.
# ---------------------------------------------------------------------------

_MWU_MU = "(CAST(n_a AS DOUBLE) * n_b / 2)"
_MWU_SIG2 = (
    "(CAST(n_a AS DOUBLE) * n_b / 12) * "
    "((n_a + n_b + 1) - CAST(tie_t AS DOUBLE)"
    " / ((n_a + n_b) * (n_a + n_b - 1.0)))"
)
_MWU_Z = f"((u_a - {_MWU_MU}) / sqrt({_MWU_SIG2}))"


@query(
    "stats_mann_whitney",
    oracle=f"""
    WITH assigned AS (
        SELECT event_type, value,
               substr(md5(CAST(user_id AS VARCHAR) || ':mwu'), 1, 1)
                   < '8' AS is_a
        FROM events
        WHERE value IS NOT NULL
    ),
    vals AS (  -- collapse to distinct values: ranks from counts
        SELECT event_type, value,
               COUNT(*) AS cnt,
               COUNT(CASE WHEN is_a THEN 1 END) AS cnt_a
        FROM assigned GROUP BY event_type, value
    ),
    ranked AS (
        SELECT event_type, value, cnt, cnt_a,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
                              ROWS UNBOUNDED PRECEDING) - cnt AS cum_prev
        FROM vals
    ),
    s AS (
        SELECT event_type,
               CAST(SUM(cnt_a) AS BIGINT) AS n_a,
               CAST(SUM(cnt - cnt_a) AS BIGINT) AS n_b,
               CAST(SUM(CAST(cnt_a * (cum_prev + (cnt + 1) / 2.0)
                             AS DECIMAL(28,6))) AS DOUBLE)
                   AS rank_sum_a,
               SUM(cnt * cnt * cnt - cnt) AS tie_t
        FROM ranked GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           rank_sum_a - CAST(n_a AS DOUBLE) * (n_a + 1) / 2 AS u_a,
           {sql_jround(_MWU_Z.replace("u_a", "(rank_sum_a - CAST(n_a AS DOUBLE) * (n_a + 1) / 2)"), 4)} AS z_stat,
           abs({sql_jround(_MWU_Z.replace("u_a", "(rank_sum_a - CAST(n_a AS DOUBLE) * (n_a + 1) / 2)"), 4)}) > 1.96
               AS significant_5pct
    FROM s
    ORDER BY event_type
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test per event_type over the salted 50/50 user
    split: the distribution-free A/B readout that stays valid when
    values are skewed or heavy-tailed (where Welch's t assumes enough
    normality for the CLT to kick in). Average ranks come from counts
    over DISTINCT values — tie handling via midranks plus the standard
    tie-corrected variance.

    Scale shape: the corpus is touched once and immediately collapsed
    to (event_type, value) distinct granularity — the rank window and
    everything after runs on the collapsed table (bounded by value
    cardinality, not row count). Rank sums are half-integer exact and
    decimal-summed, so the statistic is bit-identical across engines
    AND partition counts; one shuffle for the group-by, one bounded
    window on its own partitioning."""
    e = spark.table("events").where(F.col("value").isNotNull())
    is_a = (
        F.substring(
            F.md5(
                F.concat(F.col("user_id").cast("string"), F.lit(":mwu")).cast(
                    "binary"
                )
            ),
            1,
            1,
        )
        < "8"
    )
    vals = (
        e.select("event_type", "value", is_a.alias("is_a"))
        .groupBy("event_type", "value")
        .agg(
            F.count("*").alias("cnt"),
            F.count(F.when(F.col("is_a"), 1)).alias("cnt_a"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = vals.withColumn(
        "cum_prev", F.sum("cnt").over(w) - F.col("cnt")
    )
    s = ranked.groupBy("event_type").agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).alias("n_b"),
        F.sum(
            (
                F.col("cnt_a")
                * (F.col("cum_prev") + (F.col("cnt") + 1) / 2.0)
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("rank_sum_a"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie_t"),
    )
    u_a = (
        F.col("rank_sum_a")
        - F.col("n_a").cast("double") * (F.col("n_a") + 1) / 2
    )
    mu = F.col("n_a").cast("double") * F.col("n_b") / 2
    sig2 = (F.col("n_a").cast("double") * F.col("n_b") / 12) * (
        (F.col("n_a") + F.col("n_b") + 1)
        - F.col("tie_t").cast("double")
        / (
            (F.col("n_a") + F.col("n_b"))
            * (F.col("n_a") + F.col("n_b") - 1.0)
        )
    )
    z = F.round((u_a - mu) / F.sqrt(sig2), 4)
    return s.select(
        "event_type",
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# RFM customer segmentation.
# ---------------------------------------------------------------------------

_RFM_SEGMENT = """
    CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
             THEN 'champion'
         WHEN f_score >= 4 THEN 'loyal'
         WHEN m_score = 5 THEN 'big_spender'
         WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
         WHEN r_score <= 2 THEN 'hibernating'
         ELSE 'regular'
    END
"""


@query(
    "analytics_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day',
                         CAST(MAX(o_orderdate) AS DATE),
                         (SELECT CAST(MAX(o_orderdate) AS DATE)
                          FROM orders)) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT *,
               NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey)
                   AS r_score,
               NTILE(5) OVER (ORDER BY frequency ASC, o_custkey)
                   AS f_score,
               NTILE(5) OVER (ORDER BY monetary ASC, o_custkey)
                   AS m_score
        FROM per_cust
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           {_RFM_SEGMENT} AS segment
    FROM scored
    ORDER BY o_custkey
    """,
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation: the
    classic lifecycle scoring every CRM/growth team runs. Quintile
    scores via NTILE(5) with customer-key tie-breaks (deterministic
    across engines), then a shared CASE maps score triples to named
    segments.

    Scale shape: ONE scan of orders collapsed to the customer aggregate
    (recency as integer days, monetary decimal-summed); the three NTILE
    windows run over that customer-sized table — a global sort of the
    AGGREGATE, never the fact table (same discipline as
    agg_gini_revenue). The max-date anchor is a one-row scalar
    broadcast."""
    o = spark.table("orders")
    anchor = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("anchor")
    )
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("anchor"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    scored = per_cust.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.desc("recency_days"), "o_custkey"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("frequency"), "o_custkey"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("monetary"), "o_custkey"))
        .alias("m_score"),
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.expr(_RFM_SEGMENT).alias("segment"),
    ).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# Population Stability Index drift per event_type.
# ---------------------------------------------------------------------------

# 10 equal-width bins over [0, 500) with top clamp — fixed literal edges
# so both engines bin identically at every SF (values observed 0..561).
_PSI_BIN = "LEAST(CAST(FLOOR(value / 50.0) AS INT), 9)"
# Laplace 0.5 smoothing over the 10 bins keeps log terms finite on
# empty bins and keeps every probability a rational number.
_PSI_P = "((cnt{s} + 0.5) / (n{s} + 5.0))"


@query(
    "profile_psi_drift",
    oracle=f"""
    WITH binned AS (
        SELECT event_type, {_PSI_BIN} AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
                   AS early
        FROM events WHERE value IS NOT NULL
    ),
    per_bin AS (
        SELECT event_type, bin,
               SUM(early) AS cnt_e, SUM(1 - early) AS cnt_l
        FROM binned GROUP BY event_type, bin
    ),
    tot AS (
        SELECT event_type,
               SUM(cnt_e) AS n_e, SUM(cnt_l) AS n_l,
               COUNT(*) AS n_bins
        FROM per_bin GROUP BY event_type
    ),
    terms AS (
        SELECT p.event_type, t.n_e, t.n_l,
               round(({_PSI_P.format(s="_l")} - {_PSI_P.format(s="_e")})
                     * ln({_PSI_P.format(s="_l")}
                          / {_PSI_P.format(s="_e")}), 8) AS term
        FROM per_bin p JOIN tot t ON p.event_type = t.event_type
    )
    SELECT event_type,
           CAST(n_e AS BIGINT) AS n_early,
           CAST(n_l AS BIGINT) AS n_late,
           CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE) AS psi,
           CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE) > 0.1
               AS drifted
    FROM terms
    GROUP BY event_type, n_e, n_l
    ORDER BY event_type
    """,
)
def profile_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the first and
    second half of the month: the standard model-monitoring drift
    metric (PSI < 0.1 stable, > 0.25 action). Fixed equal-width bins
    with Laplace smoothing so empty bins stay finite and both engines
    share exact rational probabilities; the only irrational step (the
    log term) is rounded per-bin then decimal-summed — bit-identical
    across engines and partitionings.

    Scale shape: one corpus scan collapsed to (event_type, bin) counts
    — constant-size state per segment (10 bins); everything after runs
    on the tiny per-bin table. The two time windows come from ONE scan
    via conditional aggregation, not two scans."""
    e = spark.table("events").where(F.col("value").isNotNull())
    binned = e.select(
        "event_type",
        F.expr(_PSI_BIN).alias("bin"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("early"),
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.sum("early").alias("cnt_e"),
        F.sum(1 - F.col("early")).alias("cnt_l"),
    )
    # Segment totals via a window over the (tiny) per-bin table — the
    # corpus is aggregated ONCE; no second scan, no join.
    wt = Window.partitionBy("event_type")
    per_bin = per_bin.select(
        "*",
        F.sum("cnt_e").over(wt).alias("n_e"),
        F.sum("cnt_l").over(wt).alias("n_l"),
    )
    p_e = (F.col("cnt_e") + 0.5) / (F.col("n_e") + 5.0)
    p_l = (F.col("cnt_l") + 0.5) / (F.col("n_l") + 5.0)
    terms = per_bin.select(
        "event_type",
        "n_e",
        "n_l",
        F.round((p_l - p_e) * F.log(p_l / p_e), 8).alias("term"),
    )
    psi = F.sum(F.col("term").cast("decimal(28,8)")).cast("double")
    return (
        terms.groupBy("event_type", "n_e", "n_l")
        .agg(psi.alias("psi"))
        .select(
            "event_type",
            F.col("n_e").cast("bigint").alias("n_early"),
            F.col("n_l").cast("bigint").alias("n_late"),
            "psi",
            (F.col("psi") > 0.1).alias("drifted"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Exponential time-decay popularity.
# ---------------------------------------------------------------------------


@query(
    "window_decay_popularity",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS a FROM events),
    terms AS (
        SELECT event_type,
               round(exp(-(ln(2) / 7.0) *
                         (epoch_us(a) - epoch_us(ts)) / 86400000000.0),
                     8) AS w
        FROM events, anchor
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(w AS DECIMAL(28,8))) AS DOUBLE) AS decayed_score,
           ROW_NUMBER() OVER (
               ORDER BY SUM(CAST(w AS DECIMAL(28,8))) DESC, event_type)
               AS decay_rank
    FROM terms
    GROUP BY event_type
    ORDER BY decay_rank
    """,
)
def window_decay_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed popularity per event_type (7-day
    half-life, anchored at the corpus max timestamp): the freshness-
    weighted ranking signal feeds/leaderboards use instead of raw
    counts — an event today counts 1.0, a week ago 0.5, two weeks 0.25.

    Scale shape: the per-event decay weight is map-only arithmetic off
    a one-row broadcast anchor; weights are rounded per-event then
    decimal-summed so the score is independent of partition order (a
    raw double sum of exp() terms would drift in the last ulps across
    cluster sizes). One aggregation shuffle carrying (event_type,
    decimal) partials; the rank window runs on the category-sized
    result."""
    e = spark.table("events")
    anchor = e.agg(F.max("ts").alias("a"))
    lam = F.lit(0.6931471805599453 / 7.0)  # ln(2)/7 — 7-day half-life
    age_days = (
        F.unix_micros(F.col("a")) - F.unix_micros(F.col("ts"))
    ) / 86400000000.0
    terms = e.crossJoin(F.broadcast(anchor)).select(
        "event_type", F.round(F.exp(-lam * age_days), 8).alias("w")
    )
    score = F.sum(F.col("w").cast("decimal(28,8)")).cast("double")
    agg = terms.groupBy("event_type").agg(
        F.count("*").alias("n_events"), score.alias("decayed_score")
    )
    return agg.select(
        "event_type",
        "n_events",
        "decayed_score",
        F.row_number()
        .over(Window.orderBy(F.desc("decayed_score"), "event_type"))
        .alias("decay_rank"),
    ).orderBy("decay_rank")


# ---------------------------------------------------------------------------
# CDC changelog application (Debezium-style upsert/delete replay).
# ---------------------------------------------------------------------------


@query(
    "cdc_apply_changelog",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                   AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        FROM events
    )
    SELECT user_id, value AS current_value, ts AS updated_at,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM ordered
    WHERE rn = 1 AND op = 'upsert'
    ORDER BY user_id
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changelog to produce the current snapshot: events
    are treated as an ordered change stream per key (user_id), where
    'error' rows are tombstone deletes and everything else upserts the
    value — the Debezium/Kafka-compact replay that turns a log into a
    table. Keys whose LAST change is a delete vanish from the
    snapshot; survivors carry their latest value, update time, and
    total change count.

    Scale shape: one shuffle on the key, one window computing both the
    last-change pick and the change count on the same partitioning
    (no second exchange), then a filter — the standard
    latest-row-per-key plan, linear in the log and independent of
    history length per key beyond the sort."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ordered = spark.table("events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("user_id"))
        .alias("n_changes"),
    )
    return (
        ordered.where((F.col("rn") == 1) & (F.col("op") == "upsert"))
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            F.col("ts").alias("updated_at"),
            F.col("n_changes").cast("bigint").alias("n_changes"),
        )
        .orderBy("user_id")
    )
