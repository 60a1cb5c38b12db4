"""Round-13 time-series widening: changepoint detection (bounded
binary segmentation), the OHLC volatility-estimator ladder
(Parkinson / Rogers-Satchell / Yang-Zhang), Kaufman's efficiency
ratio, decimal-exact VWAP, sample entropy, and the Higuchi fractal
dimension.

Extensions beyond the reference (SURVEY.md §2.B.11), ranked after
every banked key per the README r13 tranche plan. Shares the
timeseries module's two collapsed constructions (the per-type daily
value series and the per-type daily OHLC candles) and its numeric
discipline: exact decimal prefix/suffix sums wherever the data
allows, 8dp-rounded libm terms decimal-summed, shared double
expression trees with the DuckDB oracle, rank-picked (never
interpolated) selections, guards on every division and log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import sql_jround
from powersql_spark.pipeline.timeseries import (
    _DOHLC_CTE,
    _TSD_CTE,
    _daily_ohlc,
    _typed_daily,
)
from powersql_spark.registry import query

# ---------------------------------------------------------------------------
# Changepoint detection by one bounded binary-segmentation step with a
# BIC-style penalty gate (the PELT cost test applied to the single
# best split — ADVICE r13 candidate beside ts_changepoint_cusum).
# ---------------------------------------------------------------------------


@query(
    "ts_changepoint_binseg",
    oracle=f"""
    WITH {_TSD_CTE},
    idx AS (
        SELECT event_type, y,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    pre AS (
        SELECT event_type, i, n,
               CAST(SUM(y) OVER w AS DECIMAL(38,6)) AS s,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) OVER w
                    AS DECIMAL(38,12)) AS q
        FROM idx
        WINDOW w AS (PARTITION BY event_type ORDER BY i
                     ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (
        SELECT event_type, MAX(n) AS n,
               CAST(MAX(s) AS DOUBLE) AS s_all,
               CAST(MAX(q) AS DOUBLE) AS q_all
        FROM pre GROUP BY event_type
    ),
    cand AS (
        SELECT p.event_type, p.i AS k, t.n,
               (t.q_all - CAST(p.q AS DOUBLE))
                   - (t.s_all - CAST(p.s AS DOUBLE))
                     * (t.s_all - CAST(p.s AS DOUBLE)) / (t.n - p.i)
                   + CAST(p.q AS DOUBLE)
                   - CAST(p.s AS DOUBLE) * CAST(p.s AS DOUBLE) / p.i
                   AS sse_split,
               t.q_all - t.s_all * t.s_all / t.n AS sse_all
        FROM pre p JOIN tot t ON t.event_type = p.event_type
        WHERE p.i >= 2 AND p.i <= t.n - 2
    ),
    best AS (
        SELECT event_type, k, n, sse_all,
               sse_all - sse_split AS gain,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY sse_all - sse_split DESC, k) AS rn
        FROM cand
    )
    SELECT event_type, n AS n_days, k AS split_after,
           {sql_jround("gain", 4)} AS gain,
           {sql_jround("gain / sse_all", 6)} AS sse_reduction,
           gain > 2.0 * ln(CAST(n AS DOUBLE)) * (sse_all / n)
               AS significant_bic
    FROM best WHERE rn = 1 AND sse_all > 0 AND n >= 5
    ORDER BY event_type
    """,
)
def ts_changepoint_binseg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-changepoint detection per event-type daily series by
    binary segmentation: the split k maximizing the SSE reduction
    (two-segment piecewise-constant fit vs one), gated by the
    BIC-style penalty 2 ln(n) sigma-hat^2 — exactly the cost test
    PELT applies per candidate, bounded to the first (dominant)
    split. The level-shift detector beside ts_changepoint_cusum's
    drift accumulator: CUSUM localizes slow mean creep, binseg the
    sharpest single break.

    Numerics: prefix sums S_k and Q_k are EXACT decimals (y is
    DECIMAL(18,6), y^2 a 12dp decimal), cast to double once; every
    candidate's SSE and the argmax are one shared double tree with
    deterministic ties (smallest k).

    Scale shape: one corpus collapse to the daily table; prefix sums
    ride the (event_type) window; candidates are the daily rows
    themselves — no quadratic segment scan."""
    daily = _typed_daily(spark)
    w = Window.partitionBy("event_type").orderBy("day")
    wc = Window.partitionBy("event_type")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    y19 = F.col("y").cast("decimal(19,6)")
    pre = daily.select(
        "event_type",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wc).alias("n"),
        F.sum("y").over(wcum).cast("decimal(38,6)").alias("s"),
        F.sum(y19 * y19).over(wcum).cast("decimal(38,12)").alias("q"),
    )
    tot = pre.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("s").cast("double").alias("s_all"),
        F.max("q").cast("double").alias("q_all"),
    )
    # pre's own per-row n duplicates tot's; drop it before the join so
    # the candidate filter reads the broadcast total unambiguously.
    p = (
        pre.drop("n")
        .join(F.broadcast(tot), "event_type")
        .where((F.col("i") >= 2) & (F.col("i") <= F.col("n") - 2))
    )
    sd, qd = F.col("s").cast("double"), F.col("q").cast("double")
    n, i = F.col("n"), F.col("i")
    s_all, q_all = F.col("s_all"), F.col("q_all")
    sse_split = (
        (q_all - qd)
        - (s_all - sd) * (s_all - sd) / (n - i)
        + qd
        - sd * sd / i
    )
    sse_all = q_all - s_all * s_all / n
    cand = p.select(
        "event_type",
        i.alias("k"),
        n.alias("n"),
        sse_split.alias("sse_split"),
        sse_all.alias("sse_all"),
    )
    gain = F.col("sse_all") - F.col("sse_split")
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(gain), F.asc("k")
    )
    best = cand.select(
        "event_type",
        "k",
        "n",
        "sse_all",
        gain.alias("gain"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        best.where(
            (F.col("rn") == 1) & (F.col("sse_all") > 0) & (F.col("n") >= 5)
        )
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("k").alias("split_after"),
            F.round("gain", 4).alias("gain"),
            F.round(F.col("gain") / F.col("sse_all"), 6).alias(
                "sse_reduction"
            ),
            (
                F.col("gain")
                > 2.0
                * F.log(F.col("n").cast("double"))
                * (F.col("sse_all") / F.col("n"))
            ).alias("significant_bic"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# The OHLC volatility-estimator ladder (daily candles).
# ---------------------------------------------------------------------------


@query(
    "ts_parkinson_volatility",
    oracle=f"""
    WITH {_DOHLC_CTE},
    terms AS (
        SELECT event_type, round(ln(h / l), 8) AS u
        FROM dohlc WHERE l > 0
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CAST(round(u * u, 10) AS DECIMAL(38,10)))
                    AS DOUBLE) / COUNT(*) AS msq
        FROM terms GROUP BY event_type
    )
    SELECT event_type, n_days,
           {sql_jround("msq / (4 * ln(2))", 8)} AS park_var,
           {sql_jround("sqrt(msq / (4 * ln(2)))", 6)} AS park_vol
    FROM s ORDER BY event_type
    """,
)
def ts_parkinson_volatility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parkinson range volatility per event-type daily OHLC:
    sigma^2 = mean(ln(H/L)^2) / (4 ln 2) — the simplest range-based
    estimator (~5x the efficiency of close-to-close, the first rung
    of the ladder that Garman-Klass and Yang-Zhang refine). Zero-low
    candles have no defined log range and are excluded on both
    engines (the GK degenerate-day guard).

    Numerics: per-day logs 8dp-rounded, squares 10dp-rounded and
    decimal-summed; the mean is non-negative by construction so the
    sqrt needs no guard.

    Scale shape: candles are pure partial aggregation; one
    metadata-sized aggregation after."""
    ohlc = _daily_ohlc(spark).where(F.col("l") > 0)
    u = F.round(F.log(F.col("h") / F.col("l")), 8)
    s = ohlc.select("event_type", u.alias("u")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("bigint").alias("n_days"),
        (
            F.sum(
                F.round(F.col("u") * F.col("u"), 10).cast(
                    "decimal(38,10)"
                )
            ).cast("double")
            / F.count("*")
        ).alias("msq"),
    )
    ln2x4 = 4 * F.log(F.lit(2.0))
    return s.select(
        "event_type",
        "n_days",
        F.round(F.col("msq") / ln2x4, 8).alias("park_var"),
        F.round(F.sqrt(F.col("msq") / ln2x4), 6).alias("park_vol"),
    ).orderBy("event_type")


@query(
    "ts_rogers_satchell",
    oracle=f"""
    WITH {_DOHLC_CTE},
    terms AS (
        SELECT event_type,
               round(round(ln(h / c), 8) * round(ln(h / o), 8)
                     + round(ln(l / c), 8) * round(ln(l / o), 8),
                     10) AS rs
        FROM dohlc WHERE l > 0 AND o > 0 AND c > 0
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CAST(rs AS DECIMAL(38,10))) AS DOUBLE)
                   / COUNT(*) AS rs_var
        FROM terms GROUP BY event_type
    )
    SELECT event_type, n_days,
           {sql_jround("rs_var", 8)} AS rs_var,
           CASE WHEN rs_var >= 0
                THEN {sql_jround("sqrt(rs_var)", 6)} END AS rs_vol
    FROM s ORDER BY event_type
    """,
)
def ts_rogers_satchell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rogers-Satchell volatility per event-type daily OHLC:
    sigma^2 = mean(ln(H/C) ln(H/O) + ln(L/C) ln(L/O)) — the
    range-based estimator that stays UNBIASED under a nonzero drift,
    where Parkinson and Garman-Klass both overstate volatility for
    trending series (exactly the regime the trend keys here detect).
    Degenerate candles (any zero price) are excluded on both engines.

    Numerics: each ln 8dp-rounded BEFORE the cross-products (two
    libm calls per term — the product of two rounded logs is then
    engine-identical), per-day terms 10dp-rounded and decimal-summed;
    a negative mean (possible on extreme candles) reports NULL
    volatility rather than a NaN sqrt.

    Scale shape: identical to the GK key — candles collapse
    map-side, one aggregation after."""
    ohlc = _daily_ohlc(spark).where(
        (F.col("l") > 0) & (F.col("o") > 0) & (F.col("c") > 0)
    )
    rs = F.round(
        F.round(F.log(F.col("h") / F.col("c")), 8)
        * F.round(F.log(F.col("h") / F.col("o")), 8)
        + F.round(F.log(F.col("l") / F.col("c")), 8)
        * F.round(F.log(F.col("l") / F.col("o")), 8),
        10,
    )
    s = ohlc.select("event_type", rs.alias("rs")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("bigint").alias("n_days"),
        (
            F.sum(F.col("rs").cast("decimal(38,10)")).cast("double")
            / F.count("*")
        ).alias("rs_var"),
    )
    return s.select(
        "event_type",
        "n_days",
        F.round("rs_var", 8).alias("rs_var"),
        F.when(
            F.col("rs_var") >= 0, F.round(F.sqrt("rs_var"), 6)
        ).alias("rs_vol"),
    ).orderBy("event_type")


@query(
    "ts_yang_zhang",
    oracle=f"""
    WITH {_DOHLC_CTE},
    lagd AS (
        SELECT event_type, o, h, l, c,
               LAG(c) OVER (PARTITION BY event_type ORDER BY day)
                   AS c_prev
        FROM dohlc
    ),
    terms AS (
        SELECT event_type,
               round(ln(o / c_prev), 8) AS ov,
               round(ln(c / o), 8) AS oc,
               round(round(ln(h / c), 8) * round(ln(h / o), 8)
                     + round(ln(l / c), 8) * round(ln(l / o), 8),
                     10) AS rs
        FROM lagd
        WHERE c_prev > 0 AND o > 0 AND c > 0 AND l > 0
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ov AS DECIMAL(38,8))) AS DOUBLE) AS s_ov,
               CAST(SUM(CAST(round(ov * ov, 10) AS DECIMAL(38,10)))
                    AS DOUBLE) AS q_ov,
               CAST(SUM(CAST(oc AS DECIMAL(38,8))) AS DOUBLE) AS s_oc,
               CAST(SUM(CAST(round(oc * oc, 10) AS DECIMAL(38,10)))
                    AS DOUBLE) AS q_oc,
               CAST(SUM(CAST(rs AS DECIMAL(38,10))) AS DOUBLE) AS s_rs
        FROM terms GROUP BY event_type
    ),
    v AS (
        SELECT event_type, n,
               (q_ov - s_ov * s_ov / n) / (n - 1) AS var_ov,
               (q_oc - s_oc * s_oc / n) / (n - 1) AS var_oc,
               s_rs / n AS var_rs,
               0.34 / (1.34 + (n + 1.0) / (n - 1.0)) AS kk
        FROM s WHERE n > 1
    )
    SELECT event_type, n AS n_days,
           {sql_jround("var_ov + kk * var_oc + (1 - kk) * var_rs",
                       8)} AS yz_var,
           CASE WHEN var_ov + kk * var_oc + (1 - kk) * var_rs >= 0
                THEN {sql_jround(
                    "sqrt(var_ov + kk * var_oc + (1 - kk) * var_rs)",
                    6)} END AS yz_vol
    FROM v ORDER BY event_type
    """,
)
def ts_yang_zhang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yang-Zhang volatility per event-type daily OHLC: the
    minimum-variance combination sigma^2 = var(overnight) +
    k var(open-to-close) + (1-k) mean(RS), k = 0.34/(1.34 +
    (n+1)/(n-1)) — the top of the range-estimator ladder, handling
    BOTH drift and overnight jumps that Parkinson/GK/RS each ignore
    in part. First day per type drops (no previous close); degenerate
    candles excluded.

    Numerics: log terms 8dp-rounded then decimal-summed (sums AND
    squared sums, so the two sample variances are shared-tree
    doubles); the RS component reuses the rounded-products
    discipline of ts_rogers_satchell.

    Scale shape: candles collapse map-side; ONE lag window on the
    (event_type) exchange; one aggregation after."""
    ohlc = _daily_ohlc(spark)
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = ohlc.select(
        "event_type",
        "o",
        "h",
        "l",
        "c",
        F.lag("c").over(w).alias("c_prev"),
    ).where(
        (F.col("c_prev") > 0)
        & (F.col("o") > 0)
        & (F.col("c") > 0)
        & (F.col("l") > 0)
    )
    ov = F.round(F.log(F.col("o") / F.col("c_prev")), 8)
    oc = F.round(F.log(F.col("c") / F.col("o")), 8)
    rs = F.round(
        F.round(F.log(F.col("h") / F.col("c")), 8)
        * F.round(F.log(F.col("h") / F.col("o")), 8)
        + F.round(F.log(F.col("l") / F.col("c")), 8)
        * F.round(F.log(F.col("l") / F.col("o")), 8),
        10,
    )
    terms = lagd.select(
        "event_type", ov.alias("ov"), oc.alias("oc"), rs.alias("rs")
    )
    s = terms.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("ov").cast("decimal(38,8)"))
        .cast("double")
        .alias("s_ov"),
        F.sum(F.round(F.col("ov") * F.col("ov"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("q_ov"),
        F.sum(F.col("oc").cast("decimal(38,8)"))
        .cast("double")
        .alias("s_oc"),
        F.sum(F.round(F.col("oc") * F.col("oc"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("q_oc"),
        F.sum(F.col("rs").cast("decimal(38,10)"))
        .cast("double")
        .alias("s_rs"),
    )
    n = F.col("n")
    var_ov = (F.col("q_ov") - F.col("s_ov") * F.col("s_ov") / n) / (n - 1)
    var_oc = (F.col("q_oc") - F.col("s_oc") * F.col("s_oc") / n) / (n - 1)
    var_rs = F.col("s_rs") / n
    kk = 0.34 / (1.34 + (n + 1.0) / (n - 1.0))
    yz = var_ov + kk * var_oc + (1 - kk) * var_rs
    return (
        s.where(n > 1)
        .select(
            "event_type",
            n.alias("n_days"),
            F.round(yz, 8).alias("yz_var"),
            F.when(yz >= 0, F.round(F.sqrt(yz), 6)).alias("yz_vol"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Kaufman efficiency ratio (trend quality over a 10-day window).
# ---------------------------------------------------------------------------


@query(
    "ts_kaufman_er",
    oracle=f"""
    WITH {_TSD_CTE},
    d AS (
        SELECT event_type, day, y,
               CAST(abs(y - LAG(y) OVER w) AS DECIMAL(19,6)) AS ad,
               LAG(y, 9) OVER w AS y9
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    er AS (
        SELECT event_type, day, y9,
               CAST(abs(y - y9) AS DOUBLE) AS signal,
               CAST(SUM(ad) OVER (PARTITION BY event_type
                    ORDER BY day ROWS BETWEEN 8 PRECEDING
                    AND CURRENT ROW) AS DOUBLE) AS noise,
               COUNT(ad) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS n_w
        FROM d
    )
    SELECT event_type, day, {sql_jround("signal", 4)} AS signal,
           {sql_jround("noise", 4)} AS noise,
           CASE WHEN noise > 0
                THEN {sql_jround("signal / noise", 6)} END AS er
    FROM er WHERE y9 IS NOT NULL AND n_w = 9
    ORDER BY event_type, day
    """,
)
def ts_kaufman_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaufman efficiency ratio per event-type daily series over a
    10-day window: ER = |net 9-day change| / (sum of the 9 daily
    |changes|) — 1 for a straight trend, -> 0 for pure chop. The
    trend-QUALITY gauge that adaptive smoothers (KAMA) drive their
    bandwidth with, and the natural companion readout to the
    direction keys (theilsen/mann_kendall: IS there a trend; this:
    how efficiently does the series travel it).

    Numerics: both numerator and denominator are EXACT decimal sums
    of exact decimal |differences| — the ratio is the only double; a
    zero-noise window (flat series) reports NULL.

    Scale shape: one corpus collapse; two windows riding the same
    (event_type) exchange; only full windows emit."""
    daily = _typed_daily(spark)
    w = Window.partitionBy("event_type").orderBy("day")
    wroll = w.rowsBetween(-8, Window.currentRow)
    d = daily.select(
        "event_type",
        "day",
        "y",
        F.abs(F.col("y") - F.lag("y").over(w))
        .cast("decimal(19,6)")
        .alias("ad"),
        F.lag("y", 9).over(w).alias("y9"),
    )
    er = d.select(
        "event_type",
        "day",
        "y9",
        F.abs(F.col("y") - F.col("y9")).cast("double").alias("signal"),
        F.sum("ad").over(wroll).cast("double").alias("noise"),
        F.count("ad").over(wroll).alias("n_w"),
    )
    return (
        er.where(F.col("y9").isNotNull() & (F.col("n_w") == 9))
        .select(
            "event_type",
            "day",
            F.round("signal", 4).alias("signal"),
            F.round("noise", 4).alias("noise"),
            F.when(
                F.col("noise") > 0,
                F.round(F.col("signal") / F.col("noise"), 6),
            ).alias("er"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Decimal-exact VWAP on the lineitem fact (per ship-day + cumulative).
# ---------------------------------------------------------------------------


@query(
    "ts_vwap_daily",
    oracle=f"""
    WITH d AS (
        SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
                    AS DECIMAL(28,6)) AS px,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                    AS DECIMAL(28,6)) AS qty,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT day, px, qty, n_items,
               CAST(SUM(px) OVER w AS DECIMAL(38,6)) AS cpx,
               CAST(SUM(qty) OVER w AS DECIMAL(38,6)) AS cqty
        FROM d
        WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT day, n_items,
           CASE WHEN qty > 0 THEN
               {sql_jround("CAST(px AS DOUBLE) / CAST(qty AS DOUBLE)",
                           4)} END AS day_vwap,
           CASE WHEN cqty > 0 THEN
               {sql_jround(
                   "CAST(cpx AS DOUBLE) / CAST(cqty AS DOUBLE)",
                   4)} END AS cum_vwap
    FROM c ORDER BY day
    """,
)
def ts_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per ship-day over the lineitem
    fact, with the running cumulative VWAP — the execution-quality
    benchmark shape (extendedprice is the priced total per line, so
    VWAP = sum(price)/sum(quantity)); the anchored cumulative line is
    what fills get compared against intraday, scaled here to days.

    Numerics: both numerators and denominators are exact decimal
    sums (order-independent); the two ratios are the only doubles,
    with zero-volume guards.

    Scale shape: the fact collapses to the day grain map-side
    (partial sums); the cumulative window runs over day-grain rows
    only — the single-partition window is over METADATA-sized data,
    the same trade as every daily-series key here."""
    d = (
        spark.table("lineitem")
        .groupBy(
            F.date_trunc("day", "l_shipdate").cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("px"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("qty"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.select(
        "day",
        "px",
        "qty",
        "n_items",
        F.sum("px").over(w).cast("decimal(38,6)").alias("cpx"),
        F.sum("qty").over(w).cast("decimal(38,6)").alias("cqty"),
    )
    return c.select(
        "day",
        "n_items",
        F.when(
            F.col("qty") > 0,
            F.round(
                F.col("px").cast("double") / F.col("qty").cast("double"),
                4,
            ),
        ).alias("day_vwap"),
        F.when(
            F.col("cqty") > 0,
            F.round(
                F.col("cpx").cast("double")
                / F.col("cqty").cast("double"),
                4,
            ),
        ).alias("cum_vwap"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Sample entropy (m=2, r = 0.2 sd) — series regularity.
# ---------------------------------------------------------------------------


@query(
    "ts_sample_entropy",
    oracle=f"""
    WITH {_TSD_CTE},
    idx AS (
        SELECT event_type, y,
               ROW_NUMBER() OVER w AS i,
               LEAD(y) OVER w AS y1,
               LEAD(y, 2) OVER w AS y2
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    sd AS (
        SELECT event_type,
               0.2 * sqrt((CAST(SUM(CAST(y AS DECIMAL(19,6))
                               * CAST(y AS DECIMAL(19,6)))
                               AS DOUBLE)
                           - CAST(SUM(y) AS DOUBLE)
                             * CAST(SUM(y) AS DOUBLE) / COUNT(*))
                          / (COUNT(*) - 1)) AS r
        FROM daily GROUP BY event_type HAVING COUNT(*) > 1
    ),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN GREATEST(
                        CAST(abs(a.y - b.y) AS DOUBLE),
                        CAST(abs(a.y1 - b.y1) AS DOUBLE)) <= s.r
                    THEN 1 ELSE 0 END AS bm,
               CASE WHEN GREATEST(
                        CAST(abs(a.y - b.y) AS DOUBLE),
                        CAST(abs(a.y1 - b.y1) AS DOUBLE),
                        CAST(abs(a.y2 - b.y2) AS DOUBLE)) <= s.r
                    THEN 1 ELSE 0 END AS am
        FROM idx a
        JOIN idx b ON b.event_type = a.event_type AND a.i < b.i
        JOIN sd s ON s.event_type = a.event_type
        WHERE a.y2 IS NOT NULL AND b.y2 IS NOT NULL
    ),
    s AS (
        SELECT event_type,
               CAST(SUM(bm) AS BIGINT) AS b_count,
               CAST(SUM(am) AS BIGINT) AS a_count
        FROM pairs GROUP BY event_type
    )
    SELECT event_type, b_count, a_count,
           CASE WHEN a_count > 0 AND b_count > 0 THEN
               {sql_jround("-ln(CAST(a_count AS DOUBLE) / b_count)",
                           4)} END AS sampen
    FROM s ORDER BY event_type
    """,
)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy (m=2, r = 0.2 sd) per event-type daily series:
    -ln(A/B) where B counts template pairs matching for 2 consecutive
    points (Chebyshev distance <= r) and A those still matching at 3
    — the regularity gauge (low = self-similar/predictable, high =
    irregular) that, unlike approximate entropy, excludes
    self-matches and is length-consistent. Complements
    ts_permutation_entropy (ordinal patterns) with an
    amplitude-aware reading.

    Numerics: template distances are EXACT decimal |differences|
    cast to double for the single comparison against r (one shared
    tolerance per type from exact sufficient sums); counts are
    integers; the final -ln is the only libm call.

    Scale shape: one corpus collapse; the pair join is (days x
    days)/2 per type over the metadata-sized daily table — bounded,
    never corpus-quadratic."""
    daily = _typed_daily(spark)
    from powersql_spark.catalog import track_persist

    w = Window.partitionBy("event_type").orderBy("day")
    idx = track_persist(
        daily.select(
            "event_type",
            "y",
            F.row_number().over(w).alias("i"),
            F.lead("y").over(w).alias("y1"),
            F.lead("y", 2).over(w).alias("y2"),
        )
    )
    y19 = F.col("y").cast("decimal(19,6)")
    sd = (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").cast("double").alias("s"),
            F.sum(y19 * y19).cast("double").alias("q"),
        )
        .where(F.col("n") > 1)
        .select(
            "event_type",
            (
                0.2
                * F.sqrt(
                    (
                        F.col("q")
                        - F.col("s") * F.col("s") / F.col("n")
                    )
                    / (F.col("n") - 1)
                )
            ).alias("r"),
        )
    )
    a, b = idx.alias("a"), idx.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("a.i") < F.col("b.i")),
        )
        .join(
            F.broadcast(sd.alias("s")),
            F.col("s.event_type") == F.col("a.event_type"),
        )
        .where(F.col("a.y2").isNotNull() & F.col("b.y2").isNotNull())
    )
    d0 = F.abs(F.col("a.y") - F.col("b.y")).cast("double")
    d1 = F.abs(F.col("a.y1") - F.col("b.y1")).cast("double")
    d2 = F.abs(F.col("a.y2") - F.col("b.y2")).cast("double")
    r = F.col("s.r")
    s = (
        pairs.select(
            F.col("a.event_type").alias("event_type"),
            F.when(F.greatest(d0, d1) <= r, 1).otherwise(0).alias("bm"),
            F.when(F.greatest(d0, d1, d2) <= r, 1)
            .otherwise(0)
            .alias("am"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("bm").cast("bigint").alias("b_count"),
            F.sum("am").cast("bigint").alias("a_count"),
        )
    )
    return s.select(
        "event_type",
        "b_count",
        "a_count",
        F.when(
            (F.col("a_count") > 0) & (F.col("b_count") > 0),
            F.round(
                -F.log(
                    F.col("a_count").cast("double") / F.col("b_count")
                ),
                4,
            ),
        ).alias("sampen"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Higuchi fractal dimension (k = 1..4).
# ---------------------------------------------------------------------------

_HFD_MAX_K = 4


@query(
    "ts_higuchi_fd",
    oracle=f"""
    WITH {_TSD_CTE},
    idx AS (
        SELECT event_type, y,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    strided AS (
        SELECT a.event_type, k.k, a.i % k.k AS m, a.n,
               CAST(abs(a.y - b.y) AS DECIMAL(19,6)) AS d
        FROM idx a
        JOIN unnest(range(1, {_HFD_MAX_K} + 1)) AS k(k) ON TRUE
        JOIN idx b ON b.event_type = a.event_type
                  AND b.i = a.i - k.k
    ),
    lm AS (
        SELECT event_type, k, m,
               (CAST(SUM(d) AS DOUBLE) * (MAX(n) - 1))
                   / (COUNT(*) * k) / k AS l_m
        FROM strided GROUP BY event_type, k, m
    ),
    lk AS (
        SELECT event_type, k,
               CAST(SUM(CAST(round(l_m, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) / COUNT(*) AS l_k
        FROM lm GROUP BY event_type, k
    ),
    pts AS (
        SELECT event_type,
               round(ln(CAST(k AS DOUBLE)), 8) AS x,
               round(ln(l_k), 8) AS yl
        FROM lk WHERE l_k > 0
    ),
    fit AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(yl AS DECIMAL(38,8))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(round(x * x, 10) AS DECIMAL(38,10)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(round(x * yl, 10) AS DECIMAL(38,10)))
                    AS DOUBLE) AS sxy
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n_k,
           {sql_jround(
               "-((n_k * sxy - sx * sy) / (n_k * sxx - sx * sx))",
               4)} AS fd_higuchi
    FROM fit WHERE n_k > 1 AND n_k * sxx - sx * sx > 0
    ORDER BY event_type
    """,
)
def ts_higuchi_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higuchi fractal dimension per event-type daily series
    (k = 1..4): stride-k curve lengths L(k), averaged over the k
    offsets, regressed as ln L(k) on ln k — FD = -slope, between 1
    (smooth) and 2 (space-filling noise). The roughness companion to
    ts_hurst_exponent (FD ~ 2 - H for self-affine series), estimated
    the Higuchi way, which converges on far shorter series than R/S.

    Numerics: stride differences are exact decimals; per-offset curve
    lengths are shared-tree doubles 8dp-rounded before the
    per-k mean; the 4-point log-log OLS runs on 8dp-rounded logs with
    decimal-summed normal equations.

    Scale shape: one corpus collapse; the stride join is (days x 4)
    against itself on exact index offsets — metadata-sized; the
    regression is per-type over four points."""
    daily = _typed_daily(spark)
    from powersql_spark.catalog import track_persist

    w = Window.partitionBy("event_type").orderBy("day")
    wc = Window.partitionBy("event_type")
    idx = track_persist(
        daily.select(
            "event_type",
            "y",
            F.row_number().over(w).alias("i"),
            F.count("*").over(wc).alias("n"),
        )
    )
    ks = spark.range(1, _HFD_MAX_K + 1).select(
        F.col("id").cast("int").alias("k")
    )
    a, b = idx.alias("a"), idx.alias("b")
    strided = (
        a.crossJoin(F.broadcast(ks))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.i") == F.col("a.i") - F.col("k")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            "k",
            (F.col("a.i") % F.col("k")).alias("m"),
            F.col("a.n").alias("n"),
            F.abs(F.col("a.y") - F.col("b.y"))
            .cast("decimal(19,6)")
            .alias("d"),
        )
    )
    lm = strided.groupBy("event_type", "k", "m").agg(
        (
            (F.sum("d").cast("double") * (F.max("n") - 1))
            / (F.count("*") * F.col("k"))
            / F.col("k")
        ).alias("l_m")
    )
    lk = lm.groupBy("event_type", "k").agg(
        (
            F.sum(F.round(F.col("l_m"), 8).cast("decimal(38,8)"))
            .cast("double")
            / F.count("*")
        ).alias("l_k")
    )
    pts = lk.where(F.col("l_k") > 0).select(
        "event_type",
        F.round(F.log(F.col("k").cast("double")), 8).alias("x"),
        F.round(F.log("l_k"), 8).alias("yl"),
    )
    fit = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_k"),
        F.sum(F.col("x").cast("decimal(38,8)"))
        .cast("double")
        .alias("sx"),
        F.sum(F.col("yl").cast("decimal(38,8)"))
        .cast("double")
        .alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("yl"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxy"),
    )
    n_k = F.col("n_k")
    slope = (n_k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n_k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        fit.where(
            (n_k > 1) & (n_k * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        )
        .select(
            "event_type",
            "n_k",
            F.round(-slope, 4).alias("fd_higuchi"),
        )
        .orderBy("event_type")
    )
