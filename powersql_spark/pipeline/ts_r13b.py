"""Round-13 second-wave time-series widening (7 keys): Keltner
channels, Chaikin money flow, the mass index, TRIX, the choppiness
index, the ultimate oscillator, and per-channel market beta.

Extensions beyond the reference (SURVEY.md §2.B.11), ranked after the
r13 first wave per the README tranche plan. All seven ride the house
daily-candle devices (``_daily_ohlc`` / ``_typed_daily`` — 5 types x
30 days at any SF, so every rolling window is metadata-sized): event
``value`` is exactly 2dp, so ranges / true ranges / buying pressure
round(x, 2) back to exact decimals and every rolling sum is
decimal-exact; EMAs use the running-list fold shared digit-for-digit
with DuckDB (the ts_macd device); ratios of per-day floats are
8dp-rounded then decimal-summed before any window accumulation.
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

# The adjust=False EMA recursion seeded at the first observation,
# folded over a running prefix list — both engines walk the identical
# prefix in the identical order (the ts_macd / ts_ewma device).
_FOLD = "list_reduce({vals}, (acc, x) -> acc * {om} + {a} * x)"


def _ema(col, alpha: float):
    a = F.lit(alpha)
    return F.aggregate(
        F.slice(col, 2, F.greatest(F.size(col) - 1, F.lit(0))),
        F.element_at(col, 1),
        lambda acc, x: acc * (F.lit(1.0) - a) + a * x,
    )


def _wrun():
    return (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


# Shared SQL fragment: per-day true range (2dp-exact) with high/low
# carried, over dohlc. Day 1 of each type has no previous close and is
# filtered (the ts_atr convention).
_TR_CTE = """
    trr AS (
        SELECT event_type, day, h, l,
               round(GREATEST(
                   h - l,
                   abs(h - LAG(c) OVER (PARTITION BY event_type
                                        ORDER BY day)),
                   abs(l - LAG(c) OVER (PARTITION BY event_type
                                        ORDER BY day))), 2) AS tr
        FROM dohlc
    ),
    trf AS (SELECT * FROM trr WHERE tr IS NOT NULL)
"""


def _tr_frame(spark: SparkSession) -> DataFrame:
    """Spark twin of ``_TR_CTE``: (event_type, day, h, l, tr) rows
    from the second day of each type on, tr an exact 2dp decimal
    recovered by round(., 2) (values are exactly 2dp at every SF)."""
    ohlc = _daily_ohlc(spark)
    w_lag = Window.partitionBy("event_type").orderBy("day")
    pc = F.lag("c").over(w_lag)
    tr = F.round(
        F.greatest(
            F.col("h") - F.col("l"),
            F.abs(F.col("h") - pc),
            F.abs(F.col("l") - pc),
        ),
        2,
    )
    return ohlc.select(
        "event_type", "day", "h", "l", tr.alias("tr")
    ).where(F.col("tr").isNotNull())


# ---------------------------------------------------------------------------
# Keltner channels: EMA(typical price, 20) +/- 2 * ATR(10).
# ---------------------------------------------------------------------------


@query(
    "ts_keltner_channels",
    oracle=f"""
    WITH {_DOHLC_CTE},
    {_TR_CTE},
    listed AS (
        SELECT event_type, day,
               list((h + l + c) / 3.0) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS vals
        FROM dohlc
    ),
    mid AS (
        SELECT event_type, day,
               {_FOLD.format(vals="vals", om=19.0 / 21.0, a=2.0 / 21.0)}
                   AS ema_tp
        FROM listed
    ),
    atr AS (
        SELECT event_type, day,
               COUNT(tr) OVER w AS n_w,
               CAST(SUM(CAST(tr AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   / 10 AS atr10
        FROM trf
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT m.event_type, m.day,
           round(m.ema_tp, 4) AS middle,
           round(m.ema_tp + 2 * a.atr10, 4) AS upper_ch,
           round(m.ema_tp - 2 * a.atr10, 4) AS lower_ch
    FROM mid m JOIN atr a
      ON a.event_type = m.event_type AND a.day = m.day
    WHERE a.n_w = 10
    ORDER BY m.event_type, m.day
    """,
)
def ts_keltner_channels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keltner channels per event-type daily candles: a 20-day EMA of
    the typical price (h+l+c)/3 banded at +/- 2 ATR(10). The
    EMA-centered, gap-aware sibling of ts_bollinger_bands (SMA +/-
    k sigma) and ts_donchian_channels (pure extremes): Bollinger
    widens on any variance including pure drift, while Keltner's ATR
    unit makes band touches comparable across regimes — the pair
    diverging is itself a squeeze/breakout signal.

    Numerics: the EMA is the shared running-list fold (bit-identical
    prefixes on both engines); true ranges are 2dp-exact and the
    ATR(10) sum rides DECIMAL(18,2), so the bands are one shared
    double tree rounded once.

    Scale shape: one corpus collapse to daily candles; the fold and
    the ATR window ride one (event_type) exchange over the
    metadata-sized daily table (L = 30 at any corpus scale)."""
    ohlc = _daily_ohlc(spark)
    tp = (F.col("h") + F.col("l") + F.col("c")) / 3.0
    vals = F.collect_list(tp).over(_wrun())
    mid = ohlc.select(
        "event_type", "day", _ema(vals, 2.0 / 21.0).alias("ema_tp")
    )
    w10 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-9, Window.currentRow)
    )
    atr = _tr_frame(spark).select(
        "event_type",
        "day",
        F.count("tr").over(w10).alias("n_w"),
        (
            F.sum(F.col("tr").cast("decimal(18,2)"))
            .over(w10)
            .cast("double")
            / 10
        ).alias("atr10"),
    )
    return (
        mid.join(atr, ["event_type", "day"])
        .where(F.col("n_w") == 10)
        .select(
            "event_type",
            "day",
            F.round("ema_tp", 4).alias("middle"),
            F.round(F.col("ema_tp") + 2 * F.col("atr10"), 4).alias(
                "upper_ch"
            ),
            F.round(F.col("ema_tp") - 2 * F.col("atr10"), 4).alias(
                "lower_ch"
            ),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Chaikin money flow (20-day).
# ---------------------------------------------------------------------------


@query(
    "ts_chaikin_money_flow",
    oracle=f"""
    WITH {_DOHLC_CTE},
    mf AS (
        SELECT event_type, day, vol,
               CAST(round(CASE WHEN h > l THEN
                        ((c - l) - (h - c)) / (h - l) * vol
                    ELSE 0.0 END, 8) AS DECIMAL(28,8)) AS mfv
        FROM dohlc
    ),
    roll AS (
        SELECT event_type, day,
               COUNT(*) OVER w AS n_w,
               CAST(SUM(mfv) OVER w AS DOUBLE) AS mfv_sum,
               CAST(SUM(vol) OVER w AS BIGINT) AS vol_sum
        FROM mf
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           {sql_jround("mfv_sum / vol_sum", 6)} AS cmf
    FROM roll WHERE n_w = 20 AND vol_sum > 0
    ORDER BY event_type, day
    """,
)
def ts_chaikin_money_flow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chaikin money flow per event-type daily candles: the 20-day
    ratio sum(money-flow volume) / sum(volume), where the money-flow
    multiplier ((c-l)-(h-c))/(h-l) locates the close within the day's
    range. The volume-WEIGHTED accumulation/distribution readout
    beside ts_obv (which only signs whole days): CMF > 0 means volume
    concentrates on days closing near their highs. Flat days (h = l)
    contribute zero multiplier by convention.

    Numerics: the per-day multiplier-times-volume is one shared
    double tree of 2dp-exact candle fields, 8dp-rounded into
    DECIMAL(28,8) BEFORE the rolling sum (the stochastic-%D
    discipline — no float accumulation crosses a window); the volume
    sum is integer-exact; sql_jround replays the one final rounding.

    Scale shape: one corpus collapse to daily candles; one
    (event_type) exchange carries the rolling windows."""
    ohlc = _daily_ohlc(spark)
    mfm = F.when(
        F.col("h") > F.col("l"),
        ((F.col("c") - F.col("l")) - (F.col("h") - F.col("c")))
        / (F.col("h") - F.col("l"))
        * F.col("vol"),
    ).otherwise(F.lit(0.0))
    mf = ohlc.select(
        "event_type",
        "day",
        "vol",
        F.round(mfm, 8).cast("decimal(28,8)").alias("mfv"),
    )
    w20 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-19, Window.currentRow)
    )
    roll = mf.select(
        "event_type",
        "day",
        F.count("*").over(w20).alias("n_w"),
        F.sum("mfv").over(w20).cast("double").alias("mfv_sum"),
        F.sum("vol").over(w20).cast("bigint").alias("vol_sum"),
    )
    return (
        roll.where((F.col("n_w") == 20) & (F.col("vol_sum") > 0))
        .select(
            "event_type",
            "day",
            F.round(F.col("mfv_sum") / F.col("vol_sum"), 6).alias(
                "cmf"
            ),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Mass index (Dorsey): 25-day sum of EMA9(range) / EMA9(EMA9(range)).
# ---------------------------------------------------------------------------


@query(
    "ts_mass_index",
    oracle=f"""
    WITH {_DOHLC_CTE},
    rng AS (
        SELECT event_type, day, round(h - l, 2) AS r FROM dohlc
    ),
    l1 AS (
        SELECT event_type, day,
               list(CAST(r AS DOUBLE)) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS vals
        FROM rng
    ),
    e1t AS (
        SELECT event_type, day,
               {_FOLD.format(vals="vals", om=8.0 / 10.0, a=2.0 / 10.0)}
                   AS e1
        FROM l1
    ),
    l2 AS (
        SELECT event_type, day, e1,
               list(e1) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS evals
        FROM e1t
    ),
    rat AS (
        SELECT event_type, day,
               CASE WHEN {_FOLD.format(
                   vals="evals", om=8.0 / 10.0, a=2.0 / 10.0)} > 0
               THEN CAST(round(e1 / {_FOLD.format(
                   vals="evals", om=8.0 / 10.0, a=2.0 / 10.0)}, 8)
                   AS DECIMAL(28,8)) END AS ratio
        FROM l2
    ),
    roll AS (
        SELECT event_type, day,
               COUNT(ratio) OVER w AS n_w,
               CAST(SUM(ratio) OVER w AS DOUBLE) AS mass
        FROM rat
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, {sql_jround("mass", 4)} AS mass_index
    FROM roll WHERE n_w = 25
    ORDER BY event_type, day
    """,
)
def ts_mass_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dorsey's mass index per event-type daily candles: the 25-day
    sum of EMA9(high-low) / EMA9(EMA9(high-low)) — a range-expansion
    detector that flags trend REVERSALS when the 'bulge' rises
    through ~27 regardless of direction, complementing the
    directional indicators (ts_aroon, ts_macd). The double-EMA ratio
    strips the range's level so only its widening dynamics remain.

    Numerics: daily ranges are 2dp-exact; both EMA layers are the
    shared running-list fold; the per-day ratio is 8dp-rounded into
    DECIMAL(28,8) before the 25-day window sum (no float
    accumulation crosses a window); one final sql_jround.

    Scale shape: one corpus collapse to daily candles; two chained
    folds and one rolling sum over the metadata-sized daily grid,
    all on one (event_type) exchange."""
    ohlc = _daily_ohlc(spark)
    rng = ohlc.select(
        "event_type",
        "day",
        F.round(F.col("h") - F.col("l"), 2).alias("r"),
    )
    vals = F.collect_list(F.col("r").cast("double")).over(_wrun())
    e1t = rng.select(
        "event_type", "day", _ema(vals, 2.0 / 10.0).alias("e1")
    )
    evals = F.collect_list("e1").over(_wrun())
    e2 = _ema(F.col("evals"), 2.0 / 10.0)
    rat = e1t.select(
        "event_type", "day", evals.alias("evals"), "e1"
    ).select(
        "event_type",
        "day",
        F.when(e2 > 0, F.round(F.col("e1") / e2, 8))
        .cast("decimal(28,8)")
        .alias("ratio"),
    )
    w25 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-24, Window.currentRow)
    )
    roll = rat.select(
        "event_type",
        "day",
        F.count("ratio").over(w25).alias("n_w"),
        F.sum("ratio").over(w25).cast("double").alias("mass"),
    )
    return (
        roll.where(F.col("n_w") == 25)
        .select(
            "event_type",
            "day",
            F.round("mass", 4).alias("mass_index"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# TRIX: 1-day rate of change of a triple 15-day EMA.
# ---------------------------------------------------------------------------


@query(
    "ts_trix",
    oracle=f"""
    WITH {_TSD_CTE},
    l1 AS (
        SELECT event_type, day,
               list(CAST(y AS DOUBLE)) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS vals
        FROM daily
    ),
    e1t AS (
        SELECT event_type, day,
               {_FOLD.format(vals="vals", om=14.0 / 16.0, a=2.0 / 16.0)}
                   AS e1
        FROM l1
    ),
    e2t AS (
        SELECT event_type, day,
               {_FOLD.format(vals="l2", om=14.0 / 16.0, a=2.0 / 16.0)}
                   AS e2
        FROM (SELECT event_type, day,
                     list(e1) OVER (
                         PARTITION BY event_type ORDER BY day
                         ROWS UNBOUNDED PRECEDING) AS l2
              FROM e1t)
    ),
    e3t AS (
        SELECT event_type, day,
               {_FOLD.format(vals="l3", om=14.0 / 16.0, a=2.0 / 16.0)}
                   AS e3
        FROM (SELECT event_type, day,
                     list(e2) OVER (
                         PARTITION BY event_type ORDER BY day
                         ROWS UNBOUNDED PRECEDING) AS l3
              FROM e2t)
    ),
    lagd AS (
        SELECT event_type, day, e3,
               LAG(e3) OVER (PARTITION BY event_type ORDER BY day)
                   AS pe3
        FROM e3t
    )
    SELECT event_type, day,
           round(100.0 * (e3 - pe3) / pe3, 4) AS trix
    FROM lagd WHERE pe3 IS NOT NULL AND pe3 <> 0
    ORDER BY event_type, day
    """,
)
def ts_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIX per event-type daily revenue series: the one-day percent
    rate of change of a TRIPLE-smoothed 15-day EMA. Three EMA layers
    filter cycles shorter than the period as noise, so a zero-line
    cross is a filtered momentum reversal — the heavily-smoothed
    sibling of ts_macd's single-difference momentum.

    Numerics: each EMA layer is the shared running-list fold, so e3
    is bit-identical on both engines; the percent change is one
    shared double tree; zero previous-EMA days (an all-zero revenue
    prefix) are excluded by the guard rather than divided.

    Scale shape: three chained folds over the metadata-sized daily
    grid on one (event_type) exchange; the corpus is touched once to
    build the grid."""
    daily = _typed_daily(spark)
    vals = F.collect_list(F.col("y").cast("double")).over(_wrun())
    e1t = daily.select(
        "event_type", "day", _ema(vals, 2.0 / 16.0).alias("e1")
    )
    e2t = e1t.select(
        "event_type",
        "day",
        _ema(F.collect_list("e1").over(_wrun()), 2.0 / 16.0).alias(
            "e2"
        ),
    )
    e3t = e2t.select(
        "event_type",
        "day",
        _ema(F.collect_list("e2").over(_wrun()), 2.0 / 16.0).alias(
            "e3"
        ),
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    lagd = e3t.select(
        "event_type",
        "day",
        "e3",
        F.lag("e3").over(wlag).alias("pe3"),
    )
    return (
        lagd.where(F.col("pe3").isNotNull() & (F.col("pe3") != 0))
        .select(
            "event_type",
            "day",
            F.round(
                100.0
                * (F.col("e3") - F.col("pe3"))
                / F.col("pe3"),
                4,
            ).alias("trix"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Choppiness index (14-day).
# ---------------------------------------------------------------------------


@query(
    "ts_choppiness_index",
    oracle=f"""
    WITH {_DOHLC_CTE},
    {_TR_CTE},
    roll AS (
        SELECT event_type, day,
               COUNT(tr) OVER w AS n_w,
               CAST(SUM(CAST(tr AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS tr_sum,
               MAX(h) OVER w AS hh,
               MIN(l) OVER w AS ll
        FROM trf
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           round(100.0 * log10(tr_sum / (hh - ll)) / log10(14.0), 4)
               AS chop
    FROM roll WHERE n_w = 14 AND hh > ll AND tr_sum > 0
    ORDER BY event_type, day
    """,
)
def ts_choppiness_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Choppiness index per event-type daily candles: 100 log10(sum
    of 14 true ranges / the 14-day high-low range) / log10(14).
    Values near 100 mean the path wandered (sum of daily ranges far
    exceeds the net range — consolidation); near 0 means one-way
    trend. The regime classifier the directional indicators assume:
    gate ts_macd / ts_aroon signals on low choppiness to mute
    whipsaw. Windows with zero range or zero true-range sum are
    excluded by the guards.

    Numerics: true ranges are 2dp-exact and the 14-day sum rides
    DECIMAL(18,2); the window extremes are exact field values; log10
    over the ratio is one shared double tree rounded once (genuinely
    continuous — plain round).

    Scale shape: one corpus collapse to daily candles; one
    (event_type) exchange carries the lag and all three window
    aggregates in a single window frame."""
    w14 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-13, Window.currentRow)
    )
    roll = _tr_frame(spark).select(
        "event_type",
        "day",
        F.count("tr").over(w14).alias("n_w"),
        F.sum(F.col("tr").cast("decimal(18,2)"))
        .over(w14)
        .cast("double")
        .alias("tr_sum"),
        F.max("h").over(w14).alias("hh"),
        F.min("l").over(w14).alias("ll"),
    )
    chop = (
        100.0
        * F.log10(F.col("tr_sum") / (F.col("hh") - F.col("ll")))
        / F.log10(F.lit(14.0))
    )
    return (
        roll.where(
            (F.col("n_w") == 14)
            & (F.col("hh") > F.col("ll"))
            & (F.col("tr_sum") > 0)
        )
        .select(
            "event_type",
            "day",
            F.round(chop, 4).alias("chop"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Ultimate oscillator (Williams, 7/14/28).
# ---------------------------------------------------------------------------


@query(
    "ts_ultimate_oscillator",
    oracle=f"""
    WITH {_DOHLC_CTE},
    bt AS (
        SELECT event_type, day,
               round(c - LEAST(l, LAG(c) OVER (
                   PARTITION BY event_type ORDER BY day)), 2) AS bp,
               round(GREATEST(h, LAG(c) OVER (
                   PARTITION BY event_type ORDER BY day))
                   - LEAST(l, LAG(c) OVER (
                   PARTITION BY event_type ORDER BY day)), 2) AS tr
        FROM dohlc
    ),
    btf AS (SELECT * FROM bt WHERE tr IS NOT NULL),
    roll AS (
        SELECT event_type, day,
               COUNT(tr) OVER w28 AS n_w,
               CAST(SUM(CAST(bp AS DECIMAL(18,2))) OVER w7
                    AS DOUBLE) AS bp7,
               CAST(SUM(CAST(tr AS DECIMAL(18,2))) OVER w7
                    AS DOUBLE) AS tr7,
               CAST(SUM(CAST(bp AS DECIMAL(18,2))) OVER w14
                    AS DOUBLE) AS bp14,
               CAST(SUM(CAST(tr AS DECIMAL(18,2))) OVER w14
                    AS DOUBLE) AS tr14,
               CAST(SUM(CAST(bp AS DECIMAL(18,2))) OVER w28
                    AS DOUBLE) AS bp28,
               CAST(SUM(CAST(tr AS DECIMAL(18,2))) OVER w28
                    AS DOUBLE) AS tr28
        FROM btf
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               w14 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
               w28 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           {sql_jround(
               "100.0 * (4.0 * bp7 / tr7 + 2.0 * bp14 / tr14"
               " + bp28 / tr28) / 7.0", 4)} AS ultimate_osc
    FROM roll
    WHERE n_w = 28 AND tr7 > 0 AND tr14 > 0 AND tr28 > 0
    ORDER BY event_type, day
    """,
)
def ts_ultimate_oscillator(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Williams' ultimate oscillator per event-type daily candles:
    the 4:2:1-weighted blend of buying-pressure-to-true-range ratios
    over 7/14/28 days, where bp = close - min(low, prev close). A
    single-window oscillator (ts_rsi, ts_stochastic_oscillator)
    whipsaws at its own period; blending three horizons is Williams'
    divergence-quality fix. All three window sums share one frame
    spine, so the blend adds no extra exchange.

    Numerics: bp and tr are 2dp-exact (round(., 2) recovers the
    decimal); all six rolling sums ride DECIMAL(18,2); the blend is
    a shared double tree of exact decimal ratios — a terminating
    rational is possible, so sql_jround replays the rounding.

    Scale shape: one corpus collapse to daily candles; one
    (event_type) exchange carries the lag and all six window sums."""
    ohlc = _daily_ohlc(spark)
    wlag = Window.partitionBy("event_type").orderBy("day")
    pc = F.lag("c").over(wlag)
    bt = ohlc.select(
        "event_type",
        "day",
        F.round(F.col("c") - F.least(F.col("l"), pc), 2).alias("bp"),
        F.round(
            F.greatest(F.col("h"), pc) - F.least(F.col("l"), pc), 2
        ).alias("tr"),
    ).where(F.col("tr").isNotNull())

    def wn(n):
        return (
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(-(n - 1), Window.currentRow)
        )

    def dsum(col, w):
        return F.sum(F.col(col).cast("decimal(18,2)")).over(w).cast(
            "double"
        )

    roll = bt.select(
        "event_type",
        "day",
        F.count("tr").over(wn(28)).alias("n_w"),
        dsum("bp", wn(7)).alias("bp7"),
        dsum("tr", wn(7)).alias("tr7"),
        dsum("bp", wn(14)).alias("bp14"),
        dsum("tr", wn(14)).alias("tr14"),
        dsum("bp", wn(28)).alias("bp28"),
        dsum("tr", wn(28)).alias("tr28"),
    )
    uo = (
        100.0
        * (
            4.0 * F.col("bp7") / F.col("tr7")
            + 2.0 * F.col("bp14") / F.col("tr14")
            + F.col("bp28") / F.col("tr28")
        )
        / 7.0
    )
    return (
        roll.where(
            (F.col("n_w") == 28)
            & (F.col("tr7") > 0)
            & (F.col("tr14") > 0)
            & (F.col("tr28") > 0)
        )
        .select(
            "event_type",
            "day",
            F.round(uo, 4).alias("ultimate_osc"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Market beta: each channel's daily-return sensitivity to the
# all-channel aggregate.
# ---------------------------------------------------------------------------


@query(
    "ts_market_beta",
    oracle=f"""
    WITH {_TSD_CTE},
    mkt AS (
        SELECT day, CAST(SUM(y) AS DECIMAL(18,6)) AS m
        FROM daily GROUP BY day
    ),
    tret AS (
        SELECT event_type, day,
               CAST(round(CAST(y - LAG(y) OVER tw AS DOUBLE)
                   / CAST(LAG(y) OVER tw AS DOUBLE), 8)
                   AS DECIMAL(19,8)) AS ry
        FROM daily
        WHERE TRUE
        WINDOW tw AS (PARTITION BY event_type ORDER BY day)
        QUALIFY LAG(y) OVER tw > 0
    ),
    mret AS (
        SELECT day,
               CAST(round(CAST(m - LAG(m) OVER mw AS DOUBLE)
                   / CAST(LAG(m) OVER mw AS DOUBLE), 8)
                   AS DECIMAL(19,8)) AS rm
        FROM mkt
        WINDOW mw AS (ORDER BY day)
        QUALIFY LAG(m) OVER mw > 0
    ),
    j AS (
        SELECT t.event_type, m.rm AS x, t.ry AS y
        FROM tret t JOIN mret m ON m.day = t.day
    ),
    s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DECIMAL(19,8)) AS sx,
               CAST(SUM(y) AS DECIMAL(19,8)) AS sy,
               CAST(SUM(x * y) AS DECIMAL(38,16)) AS sxy,
               CAST(SUM(x * x) AS DECIMAL(38,16)) AS sxx,
               CAST(SUM(y * y) AS DECIMAL(38,16)) AS syy
        FROM j GROUP BY event_type
    ),
    f AS (
        SELECT event_type, n,
               CAST(CAST(n AS DECIMAL(6,0)) * sxy - sx * sy
                    AS DOUBLE) AS cnum,
               CAST(CAST(n AS DECIMAL(6,0)) * sxx - sx * sx
                    AS DOUBLE) AS cdenx,
               CAST(CAST(n AS DECIMAL(6,0)) * syy - sy * sy
                    AS DOUBLE) AS cdeny,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s
    )
    SELECT event_type, n AS n_days,
           {sql_jround("cnum / cdenx", 6)} AS beta,
           round((syd - cnum / cdenx * sxd) / n, 6) AS alpha_daily,
           CASE WHEN cdeny > 0 THEN
               round(cnum * cnum / (cdenx * cdeny), 6) END AS r2
    FROM f WHERE n >= 3 AND cdenx <> 0
    ORDER BY event_type
    """,
)
def ts_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM-style market beta per event type: the OLS slope of the
    channel's daily revenue return on the ALL-channel aggregate
    ('market') return, with intercept alpha and R^2. Beta > 1 marks
    channels that amplify platform-wide swings, beta ~ 0 marks
    counter-cyclical or idiosyncratic ones — the portfolio view the
    pairwise keys (ts_rolling_corr, ts_cross_correlation_lag) don't
    give: one systematic-exposure number per channel against the
    common factor.

    Numerics: daily levels are exact DECIMAL(18,6) sums; returns are
    shared-tree doubles 8dp-rounded into DECIMAL(19,8); the five
    sufficient sums and both covariance numerators n*Sxy - Sx*Sy are
    decimal-exact (products widen to DECIMAL(38,16)), so doubles
    appear only at the final ratios. Zero-level previous days (the
    sf0.1 value=0 lesson) are excluded by the QUALIFY guard on both
    engines.

    Scale shape: one corpus collapse to the daily grid, one
    metadata-sized day-grain aggregate for the market series, one
    equi-join of two bounded grids; the regression needs only the
    five sums — no per-type iteration."""
    daily = _typed_daily(spark)
    from powersql_spark.catalog import track_persist

    daily = track_persist(daily)
    mkt = daily.groupBy("day").agg(
        F.sum("y").cast("decimal(18,6)").alias("m")
    )
    tw = Window.partitionBy("event_type").orderBy("day")
    mw = Window.orderBy("day")
    py = F.lag("y").over(tw)
    tret = (
        daily.select(
            "event_type",
            "day",
            "y",
            py.alias("py"),
        )
        .where(F.col("py") > 0)
        .select(
            "event_type",
            "day",
            F.round(
                (F.col("y") - F.col("py")).cast("double")
                / F.col("py").cast("double"),
                8,
            )
            .cast("decimal(19,8)")
            .alias("ry"),
        )
    )
    pm = F.lag("m").over(mw)
    mret = (
        mkt.select("day", "m", pm.alias("pm"))
        .where(F.col("pm") > 0)
        .select(
            "day",
            F.round(
                (F.col("m") - F.col("pm")).cast("double")
                / F.col("pm").cast("double"),
                8,
            )
            .cast("decimal(19,8)")
            .alias("rm"),
        )
    )
    j = tret.join(F.broadcast(mret), "day").select(
        "event_type",
        F.col("rm").alias("x"),
        F.col("ry").alias("y"),
    )
    s = j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("decimal(19,8)").alias("sx"),
        F.sum("y").cast("decimal(19,8)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,16)").alias(
            "sxy"
        ),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,16)").alias(
            "sxx"
        ),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,16)").alias(
            "syy"
        ),
    )
    nd = F.col("n").cast("decimal(6,0)")
    f = s.select(
        "event_type",
        "n",
        (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("cnum"),
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("cdenx"),
        (nd * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cdeny"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    )
    beta = F.col("cnum") / F.col("cdenx")
    return (
        f.where((F.col("n") >= 3) & (F.col("cdenx") != 0))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.round(beta, 6).alias("beta"),
            F.round(
                (F.col("syd") - beta * F.col("sxd")) / F.col("n"), 6
            ).alias("alpha_daily"),
            F.when(
                F.col("cdeny") > 0,
                F.round(
                    F.col("cnum")
                    * F.col("cnum")
                    / (F.col("cdenx") * F.col("cdeny")),
                    6,
                ),
            ).alias("r2"),
        )
        .orderBy("event_type")
    )
