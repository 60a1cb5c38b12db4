"""Round-13 second-wave statistics widening (6 keys): Mood's median
test, Bowker symmetry, Cronbach's alpha, Kuiper uniformity, Welch's
heteroscedastic ANOVA, and Dixon's Q extremes screen.

Extensions beyond the reference (SURVEY.md §2.B.11), ranked after the
r13 first wave per the README tranche plan. House numeric discipline
throughout: integer-exact counts and 100x-scaled value sums (events
``value`` is exactly 2dp at every SF — probed), shared double trees
with the DuckDB oracle, per-term 8dp rounding + decimal summation
wherever a float sum would otherwise depend on accumulation order,
and VARCHAR-routed wide-integer -> double casts (the >2^53 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import sql_jround
from powersql_spark.registry import query

# Chi-square 5% critical values by df (1..10) — the same fixed-grid
# lookup device as stats_cochran_q / stats_quade_test.
_CHI2_5PCT = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307,
}

_CHI2_CASE_SQL = (
    "CASE df "
    + " ".join(f"WHEN {d} THEN {c}" for d, c in _CHI2_5PCT.items())
    + " END"
)


def _chi2_crit_col(df_col):
    expr = F.lit(None).cast("double")
    for d, c in _CHI2_5PCT.items():
        expr = F.when(df_col == d, F.lit(c)).otherwise(expr)
    return expr


# Zero-padded (epoch-micros, event_id) ordering key — the house device
# for deterministic within-user event order on both engines.
_EVKEY_SQL = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')"
    " || lpad(CAST(event_id AS VARCHAR), 10, '0')"
)


def _evkey():
    return F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )


# ---------------------------------------------------------------------------
# Mood's median test (k-sample): do the event types share a common
# median value?
# ---------------------------------------------------------------------------


@query(
    "stats_median_test",
    oracle=f"""
    WITH tvc AS (
        SELECT event_type, value AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, value
    ),
    hist AS (
        SELECT v, CAST(SUM(cnt) AS BIGINT) AS cnt FROM tvc GROUP BY v
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
    med AS (
        SELECT MIN(v) AS m FROM (
            SELECT v, SUM(cnt) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum
            FROM hist), tot
        WHERE cum >= CAST(floor((n - 1) / 2.0) AS BIGINT) + 1
    ),
    grp AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN v > med.m THEN cnt ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN v <= med.m THEN cnt ELSE 0 END)
                    AS BIGINT) AS b
        FROM tvc, med GROUP BY event_type
    ),
    marg AS (
        SELECT CAST(SUM(a) AS BIGINT) AS ta,
               CAST(SUM(b) AS BIGINT) AS tb,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM grp
    ),
    terms AS (
        SELECT CAST(round(CASE WHEN marg.ta > 0 AND marg.tb > 0 THEN
              (g.a - 1.0 * (g.a + g.b) * marg.ta / (marg.ta + marg.tb))
            * (g.a - 1.0 * (g.a + g.b) * marg.ta / (marg.ta + marg.tb))
            / (1.0 * (g.a + g.b) * marg.ta / (marg.ta + marg.tb))
            + (g.b - 1.0 * (g.a + g.b) * marg.tb / (marg.ta + marg.tb))
            * (g.b - 1.0 * (g.a + g.b) * marg.tb / (marg.ta + marg.tb))
            / (1.0 * (g.a + g.b) * marg.tb / (marg.ta + marg.tb))
            END, 8) AS DECIMAL(38,8)) AS t
        FROM grp g, marg
    ),
    s AS (
        SELECT CAST(SUM(t) AS DOUBLE) AS chi2 FROM terms
    )
    SELECT tot.n AS n_total, CAST(med.m AS DOUBLE) AS grand_median,
           marg.k AS k_groups, marg.k - 1 AS df,
           {sql_jround("s.chi2", 6)} AS chi2,
           CAST(CASE marg.k - 1
                {" ".join(f"WHEN {d} THEN {c}"
                          for d, c in _CHI2_5PCT.items())}
           END AS DOUBLE) AS crit_5pct,
           s.chi2 > CASE marg.k - 1
                {" ".join(f"WHEN {d} THEN {c}"
                          for d, c in _CHI2_5PCT.items())}
           END AS reject_equal_medians_5pct
    FROM tot, med, marg, s
    WHERE tot.n > 0 AND marg.k > 1
    """,
)
def stats_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's k-sample median test over event values by type: grand
    LOWER median (the exact rank-picked data value at 0-based rank
    (n-1)//2 — the curation weak-label device, replayable where
    interpolated quantiles drift), 2xk above/<=-median contingency,
    chi-square with df = k-1 against the fixed-grid 5% critical
    value. The distribution-free companion to stats_anova_oneway
    (means) and stats_kruskal_wallis-style rank tests: it asks only
    about MEDIAN location, so a single heavy tail can't flip it.
    Degenerate corpora (every value on one side of its own median —
    all values equal) yield NULL chi2 via the margin guard.

    Numerics: counts are integer-exact; the median is a rank-picked
    exact data value (F.floor on the Spark side — `/` is float
    division there); expected counts are shared-tree doubles of
    integers; per-group terms are 8dp-rounded then decimal-summed so
    the k-term sum cannot depend on accumulation order.

    Scale shape: ONE corpus collapse to a persisted (event_type,
    value) histogram; the global histogram, the rank-picked median
    and the 2xk table are all derived from that bounded cache, so
    the corpus is scanned exactly once and every later join is a
    broadcast of a one-row or k-row frame (persisting the shared
    frames also keeps the crossJoin chain from re-embedding the scan
    per branch — the huber-IRLS lineage lesson)."""
    from powersql_spark.catalog import track_persist

    tvc = track_persist(
        spark.table("events")
        .where(F.col("value").isNotNull())
        .groupBy("event_type", F.col("value").alias("v"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    hist = tvc.groupBy("v").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    med = (
        hist.select("v", F.sum("cnt").over(wcum).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .where(
            F.col("cum")
            >= F.floor((F.col("n") - 1) / 2).cast("bigint") + 1
        )
        .agg(F.min("v").alias("m"))
    )
    grp = track_persist(
        tvc.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("v") > F.col("m"), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("a"),
            F.sum(
                F.when(F.col("v") <= F.col("m"), F.col("cnt")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("b"),
        )
    )
    marg = grp.agg(
        F.sum("a").cast("bigint").alias("ta"),
        F.sum("b").cast("bigint").alias("tb"),
        F.count("*").cast("bigint").alias("k"),
    )
    ni = (F.col("a") + F.col("b")).cast("double")
    ea = ni * F.col("ta") / (F.col("ta") + F.col("tb"))
    eb = ni * F.col("tb") / (F.col("ta") + F.col("tb"))
    term = F.when(
        (F.col("ta") > 0) & (F.col("tb") > 0),
        (F.col("a") - ea) * (F.col("a") - ea) / ea
        + (F.col("b") - eb) * (F.col("b") - eb) / eb,
    )
    terms = grp.crossJoin(F.broadcast(marg)).select(
        F.round(term, 8).cast("decimal(38,8)").alias("t")
    )
    s = terms.agg(F.sum("t").cast("double").alias("chi2"))
    dfc = F.col("k") - 1
    out = (
        tot.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(marg))
        .crossJoin(F.broadcast(s))
    )
    return out.where((F.col("n") > 0) & (F.col("k") > 1)).select(
        F.col("n").alias("n_total"),
        F.col("m").cast("double").alias("grand_median"),
        F.col("k").alias("k_groups"),
        dfc.alias("df"),
        F.round("chi2", 6).alias("chi2"),
        _chi2_crit_col(dfc).alias("crit_5pct"),
        (F.col("chi2") > _chi2_crit_col(dfc)).alias(
            "reject_equal_medians_5pct"
        ),
    )


# ---------------------------------------------------------------------------
# Bowker's symmetry test over user event-type transitions.
# ---------------------------------------------------------------------------


@query(
    "stats_bowker_symmetry",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, {_EVKEY_SQL} AS k FROM events
    ),
    tr AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY k) AS p,
               event_type AS q
        FROM ev
    ),
    cnt AS (
        SELECT p, q, CAST(COUNT(*) AS BIGINT) AS c
        FROM tr WHERE p IS NOT NULL AND p <> q
        GROUP BY p, q
    ),
    pairs AS (
        SELECT LEAST(p, q) AS i, GREATEST(p, q) AS j,
               CAST(SUM(CASE WHEN p < q THEN c ELSE 0 END) AS BIGINT)
                   AS nf,
               CAST(SUM(CASE WHEN p > q THEN c ELSE 0 END) AS BIGINT)
                   AS nb
        FROM cnt GROUP BY 1, 2
    ),
    s AS (
        SELECT CAST(SUM(CAST(round(
                   1.0 * (nf - nb) * (nf - nb) / (nf + nb), 8)
               AS DECIMAL(38,8))) AS DOUBLE) AS chi2,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(nf + nb) AS BIGINT) AS n_offdiag
        FROM pairs WHERE nf + nb > 0
    )
    SELECT n_offdiag AS n_transitions, df,
           {sql_jround("chi2", 6)} AS chi2,
           CAST({_CHI2_CASE_SQL} AS DOUBLE) AS crit_5pct,
           chi2 > {_CHI2_CASE_SQL} AS asymmetric_5pct
    FROM s WHERE df >= 1
    """,
)
def stats_bowker_symmetry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bowker's test of symmetry on the user event-type transition
    matrix: chi2 = sum over unordered type pairs {{i,j}} of
    (n_ij - n_ji)^2 / (n_ij + n_ji), df = pairs with any traffic —
    the k-category generalization of McNemar (eval_mcnemar_paired is
    the 2x2 member). A symmetric matrix means types alternate with no
    drift; rejection means directional flow (e.g. view -> purchase
    dominating purchase -> view), the stationarity assumption behind
    analytics_markov_transitions made testable. Self-transitions
    carry no symmetry information and are excluded by construction.

    Numerics: transition counts are integer-exact over the
    zero-padded (epoch, event_id) order key; each pair term is an
    8dp-rounded rational, decimal-summed (<= 10 terms, order-free);
    df indexes the same fixed chi-square grid as the house
    contingency keys.

    Scale shape: one per-user LAG pass (the user-keyed exchange),
    one collapse to the <= k^2 transition-count table; everything
    after is metadata-sized."""
    ev = spark.table("events").select(
        "user_id", "event_type", _evkey().alias("k")
    )
    wuser = Window.partitionBy("user_id").orderBy("k")
    tr = ev.select(
        F.lag("event_type").over(wuser).alias("p"),
        F.col("event_type").alias("q"),
    )
    cnt = (
        tr.where(F.col("p").isNotNull() & (F.col("p") != F.col("q")))
        .groupBy("p", "q")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    pairs = cnt.groupBy(
        F.least("p", "q").alias("i"), F.greatest("p", "q").alias("j")
    ).agg(
        F.sum(F.when(F.col("p") < F.col("q"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("nf"),
        F.sum(F.when(F.col("p") > F.col("q"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("nb"),
    )
    d = (F.col("nf") - F.col("nb")).cast("double")
    term = d * d / (F.col("nf") + F.col("nb"))
    s = pairs.where(F.col("nf") + F.col("nb") > 0).agg(
        F.sum(F.round(term, 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("chi2"),
        F.count("*").cast("bigint").alias("df"),
        F.sum(F.col("nf") + F.col("nb"))
        .cast("bigint")
        .alias("n_offdiag"),
    )
    dfc = F.col("df")
    return s.where(dfc >= 1).select(
        F.col("n_offdiag").alias("n_transitions"),
        "df",
        F.round("chi2", 6).alias("chi2"),
        _chi2_crit_col(dfc).alias("crit_5pct"),
        (F.col("chi2") > _chi2_crit_col(dfc)).alias(
            "asymmetric_5pct"
        ),
    )


# ---------------------------------------------------------------------------
# Cronbach's alpha: internal consistency of per-user item scores.
# ---------------------------------------------------------------------------


@query(
    "stats_cronbach_alpha",
    oracle="""
    WITH base AS (
        SELECT user_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS s
        FROM events WHERE value IS NOT NULL
    ),
    users AS (SELECT DISTINCT user_id FROM base),
    items AS (SELECT DISTINCT event_type FROM base),
    raw AS (
        SELECT user_id, event_type, CAST(SUM(s) AS BIGINT) AS x
        FROM base GROUP BY 1, 2
    ),
    grid AS (
        SELECT u.user_id, i.event_type, COALESCE(r.x, 0) AS x
        FROM users u CROSS JOIN items i
        LEFT JOIN raw r ON r.user_id = u.user_id
                       AND r.event_type = i.event_type
    ),
    item AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        FROM grid GROUP BY event_type
    ),
    inum AS (
        SELECT CAST(SUM(n * sxx - sx * sx) AS HUGEINT) AS num_items,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(MAX(n) AS BIGINT) AS n_users
        FROM item
    ),
    totrow AS (
        SELECT user_id, CAST(SUM(x) AS HUGEINT) AS t
        FROM grid GROUP BY user_id
    ),
    tnum AS (
        SELECT CAST(CAST(COUNT(*) AS HUGEINT) * SUM(t * t)
                    - SUM(t) * SUM(t) AS HUGEINT) AS num_tot
        FROM totrow
    )
    SELECT k AS k_items, n_users,
           CAST(round(CAST(CAST(
               CAST(k AS DOUBLE) / (k - 1)
               * (1.0 - CAST(CAST(num_items AS VARCHAR) AS DOUBLE)
                        / CAST(CAST(num_tot AS VARCHAR) AS DOUBLE))
           AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
               AS cronbach_alpha,
           CAST(round(CAST(CAST(
               CAST(CAST(num_items AS VARCHAR) AS DOUBLE)
               / CAST(CAST(num_tot AS VARCHAR) AS DOUBLE)
           AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
               AS item_var_share
    FROM inum, tnum
    WHERE k > 1 AND num_tot <> 0
    """,
)
def stats_cronbach_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cronbach's alpha over the user x event-type score matrix
    (score = total event value per user per type, absent cells 0 —
    the full-grid discipline): alpha = k/(k-1) (1 - sum(var_item) /
    var(total)). The k-item generalization of stats_kr20_reliability
    (KR-20 is alpha for binary items): do the five engagement
    channels measure one underlying 'activity' trait, or five
    unrelated ones? Population variances cancel their 1/n^2
    normalizer, so the ratio is formed from exact integer
    numerators.

    Numerics: scores ride the 100x integer encoding (values are
    exactly 2dp — probed at every SF); every sum, square and
    numerator n*Sxx - Sx^2 is HUGEINT / DECIMAL(38,0) exact; the two
    numerators cross into doubles through VARCHAR (the >2^53 rule) so
    both engines bind the identical correctly-rounded double before
    the single division.

    Scale shape: one corpus collapse to (user, item) cells, a
    broadcast item-grid fill, two metadata-sized aggregations; no
    fact-sized join anywhere."""
    base = (
        spark.table("events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 100, 0)
            .cast("bigint")
            .alias("s"),
        )
    )
    from powersql_spark.catalog import track_persist

    raw = track_persist(
        base.groupBy("user_id", "event_type").agg(
            F.sum("s").cast("bigint").alias("x")
        )
    )
    users = raw.select("user_id").distinct()
    items = raw.select("event_type").distinct()
    # Persisted: both the item-moment and the total-score aggregates
    # read this grid — unpersisted, each branch re-embeds the
    # grid-fill join (and its corpus scan) in its own plan.
    grid = track_persist(
        users.crossJoin(F.broadcast(items))
        .join(raw, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce("x", F.lit(0)).alias("x"),
        )
    )
    xd = F.col("x").cast("decimal(19,0)")
    item = grid.groupBy("event_type").agg(
        F.count("*").cast("decimal(8,0)").alias("n"),
        F.sum("x").cast("decimal(19,0)").alias("sx"),
        F.sum(xd * xd).cast("decimal(30,0)").alias("sxx"),
    )
    inum = item.agg(
        F.sum(
            (F.col("n") * F.col("sxx")).cast("decimal(38,0)")
            - (F.col("sx") * F.col("sx")).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("num_items"),
        F.count("*").cast("bigint").alias("k"),
        F.max("n").cast("bigint").alias("n_users"),
    )
    totrow = grid.groupBy("user_id").agg(
        F.sum("x").cast("decimal(19,0)").alias("t")
    )
    td = F.col("t")
    tnum = totrow.agg(
        (
            F.count("*").cast("decimal(8,0)")
            * F.sum(td * td).cast("decimal(30,0)")
            - (
                F.sum("t").cast("decimal(19,0)")
                * F.sum("t").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("num_tot")
    )
    ni = F.col("num_items").cast("string").cast("double")
    nt = F.col("num_tot").cast("string").cast("double")
    alpha = F.col("k").cast("double") / (F.col("k") - 1) * (1.0 - ni / nt)
    return (
        inum.crossJoin(F.broadcast(tnum))
        .where((F.col("k") > 1) & (F.col("num_tot") != 0))
        .select(
            F.col("k").alias("k_items"),
            "n_users",
            F.round(alpha, 6).alias("cronbach_alpha"),
            F.round(ni / nt, 6).alias("item_var_share"),
        )
    )


# ---------------------------------------------------------------------------
# Kuiper's test against Uniform(0,1) — the rotation-invariant KS
# sibling (sensitive in BOTH tails at once).
# ---------------------------------------------------------------------------


@query(
    "stats_kuiper_uniform",
    oracle=r"""
    WITH scored AS (
        SELECT least(1.0, greatest(0.0,
                   CAST(len(list_filter(t, x -> x IN
                        ('the', 'a', 'and', 'of', 'to', 'in', 'is',
                         'it'))) AS DOUBLE) / len(t)
                   + CAST(len(t) AS DOUBLE) / 2000.0)) AS p
        FROM (SELECT string_split_regex(trim(text), '\s+') AS t
              FROM documents)
    ),
    vals AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM scored GROUP BY p
    ),
    cum AS (
        SELECT p, cnt,
               SUM(cnt) OVER (ORDER BY p
                              ROWS UNBOUNDED PRECEDING) AS c,
               SUM(cnt) OVER (ORDER BY p
                              ROWS UNBOUNDED PRECEDING) - cnt AS cp,
               SUM(cnt) OVER () AS n
        FROM vals
    ),
    d AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               MAX(CAST(c AS DOUBLE) / n - p) AS d_plus,
               MAX(p - CAST(cp AS DOUBLE) / n) AS d_minus
        FROM cum
    )
    SELECT n,
           round(d_plus + d_minus, 6) AS v_stat,
           round((d_plus + d_minus)
                 * (sqrt(CAST(n AS DOUBLE)) + 0.155
                    + 0.24 / sqrt(CAST(n AS DOUBLE))), 4)
               AS kuiper_stat,
           (d_plus + d_minus)
               * (sqrt(CAST(n AS DOUBLE)) + 0.155
                  + 0.24 / sqrt(CAST(n AS DOUBLE))) > 1.747
               AS reject_uniform_5pct
    FROM d WHERE n > 0
    """,
)
def stats_kuiper_uniform(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kuiper's one-sample test of the clipped quality score against
    Uniform(0,1): V = D+ + D-, with Stephens' finite-sample
    modification V (sqrt(n) + 0.155 + 0.24/sqrt(n)) against the 1.747
    asymptotic 5% point. The cyclic-invariant sibling of
    stats_ks_uniform (same score, same exact jump-point suprema): KS
    is blind near the distribution's ends where F_n - F pinches to 0,
    while V weighs both tails equally — a score bunched at BOTH
    extremes passes KS yet fails here.

    D+ / D- come from exact cumulative counts over the distinct-value
    grid; sqrt is IEEE correctly rounded on both engines, so the
    statistic is one shared double tree.

    Scale shape: identical to stats_ks_uniform — one scan collapses
    to distinct score values, one global rank window over that grid,
    a two-term aggregation."""
    t = F.split(F.trim(F.col("text")), r"\s+")
    sw = F.size(
        F.filter(
            "t",
            lambda x: x.isin(
                "the", "a", "and", "of", "to", "in", "is", "it"
            ),
        )
    )
    n_tok = F.size("t")
    p = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            sw.cast("double") / n_tok + n_tok.cast("double") / 2000.0,
        ),
    )
    scored = (
        spark.table("documents")
        .select(t.alias("t"))
        .select(p.alias("p"))
    )
    vals = scored.groupBy("p").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w_cum = Window.orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(F.lit(1))
    cum = vals.select(
        "p",
        F.sum("cnt").over(w_cum).alias("c"),
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("cp"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    d = cum.agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.col("c").cast("double") / F.col("n") - F.col("p")
        ).alias("d_plus"),
        F.max(
            F.col("p") - F.col("cp").cast("double") / F.col("n")
        ).alias("d_minus"),
    )
    v = F.col("d_plus") + F.col("d_minus")
    sq = F.sqrt(F.col("n").cast("double"))
    stat = v * (sq + 0.155 + 0.24 / sq)
    return d.where(F.col("n") > 0).select(
        "n",
        F.round(v, 6).alias("v_stat"),
        F.round(stat, 4).alias("kuiper_stat"),
        (stat > 1.747).alias("reject_uniform_5pct"),
    )


# ---------------------------------------------------------------------------
# Welch's heteroscedastic one-way ANOVA across event types.
# ---------------------------------------------------------------------------


@query(
    "stats_welch_anova",
    oracle=f"""
    WITH s AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS s1,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
        FROM s GROUP BY event_type HAVING COUNT(*) >= 2
    ),
    d AS (
        SELECT event_type, n,
               CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n / 100.0 AS m,
               CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
                   / n / (n - 1) / 10000.0 AS var
        FROM g
    ),
    w AS (
        SELECT event_type, n, m, CAST(n AS DOUBLE) / var AS wi
        FROM d WHERE var > 0
    ),
    a1 AS (
        SELECT CAST(SUM(CAST(round(wi, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sw,
               CAST(SUM(CAST(round(wi * m, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS swm,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM w
    ),
    b AS (
        SELECT a1.k, a1.sw,
               CAST(SUM(CAST(round(
                   wi * (m - a1.swm / a1.sw) * (m - a1.swm / a1.sw),
                   8) AS DECIMAL(38,8))) AS DOUBLE) AS anum,
               CAST(SUM(CAST(round(
                   (1.0 - wi / a1.sw) * (1.0 - wi / a1.sw) / (n - 1),
                   12) AS DECIMAL(38,12))) AS DOUBLE) AS lam
        FROM w, a1 GROUP BY a1.k, a1.sw, a1.swm
    )
    SELECT k AS k_groups, k - 1 AS df1,
           {sql_jround(
               "(anum / (k - 1))"
               " / (1.0 + 2.0 * (k - 2) / (k * k - 1.0) * lam)", 4)}
               AS welch_f,
           CASE WHEN lam > 0 THEN
               {sql_jround("(k * k - 1.0) / (3.0 * lam)", 2)} END
               AS df2,
           CAST(2.372 AS DOUBLE) AS crit_5pct_inf_df2,
           (anum / (k - 1))
               / (1.0 + 2.0 * (k - 2) / (k * k - 1.0) * lam) > 2.372
               AS reject_equal_means_5pct
    FROM b WHERE k > 1
    """,
)
def stats_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA on event values by type:
    F* = [sum w_i (m_i - m_w)^2 / (k-1)] / [1 + 2(k-2)/(k^2-1) L],
    w_i = n_i / s_i^2, L = sum (1 - w_i/sum w)^2 / (n_i - 1),
    df2 = (k^2-1)/(3L). stats_anova_oneway assumes equal variances —
    exactly what stats_bartlett_test / stats_brown_forsythe REJECT on
    heteroscedastic channels — so this is the F test still valid
    there. The 2.372 gate is the F(4, inf) 5% point: with per-type
    n in the thousands, df2 is effectively infinite (reported, so the
    approximation is auditable — the ts_dickey_fuller convention).

    Numerics: group moments ride the 100x integer encoding; each
    n*S2 - S1^2 numerator is HUGEINT/DECIMAL(38,0) exact and crosses
    into doubles through VARCHAR (the >2^53 rule); the k cross-group
    sums (sw, swm, anum, L) are per-group-rounded then decimal-summed
    so no float accumulation order can leak in.

    Scale shape: one corpus collapse to k group-moment rows;
    everything after is arithmetic on a metadata-sized frame."""
    s = (
        spark.table("events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0)
            .cast("bigint")
            .alias("x"),
        )
    )
    xd = F.col("x").cast("decimal(19,0)")
    g = (
        s.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("decimal(19,0)").alias("s1"),
            F.sum(xd * xd).cast("decimal(30,0)").alias("s2"),
        )
        .where(F.col("n") >= 2)
    )
    num = (
        F.col("n").cast("decimal(8,0)") * F.col("s2")
    ).cast("decimal(38,0)") - (
        F.col("s1") * F.col("s1")
    ).cast("decimal(38,0)")
    d = g.select(
        "event_type",
        "n",
        (
            F.col("s1").cast("string").cast("double")
            / F.col("n")
            / 100.0
        ).alias("m"),
        (
            num.cast("decimal(38,0)").cast("string").cast("double")
            / F.col("n")
            / (F.col("n") - 1)
            / 10000.0
        ).alias("var"),
    )
    # Persisted: both the weight-sum aggregate and the second-stage
    # deviation sums read this k-row frame — unpersisted, the
    # crossJoin branch re-embeds the corpus moment aggregation.
    from powersql_spark.catalog import track_persist

    w = track_persist(
        d.where(F.col("var") > 0).select(
            "event_type",
            "n",
            "m",
            (F.col("n").cast("double") / F.col("var")).alias("wi"),
        )
    )
    a1 = w.agg(
        F.sum(F.round("wi", 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("sw"),
        F.sum(F.round(F.col("wi") * F.col("m"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("swm"),
        F.count("*").cast("bigint").alias("k"),
    )
    mw = F.col("swm") / F.col("sw")
    b = (
        w.crossJoin(F.broadcast(a1))
        .groupBy("k", "sw", "swm")
        .agg(
            F.sum(
                F.round(
                    F.col("wi") * (F.col("m") - mw) * (F.col("m") - mw),
                    8,
                ).cast("decimal(38,8)")
            )
            .cast("double")
            .alias("anum"),
            F.sum(
                F.round(
                    (1.0 - F.col("wi") / F.col("sw"))
                    * (1.0 - F.col("wi") / F.col("sw"))
                    / (F.col("n") - 1),
                    12,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("lam"),
        )
    )
    kd = F.col("k").cast("double")
    fstat = (F.col("anum") / (F.col("k") - 1)) / (
        1.0 + 2.0 * (F.col("k") - 2) / (kd * kd - 1.0) * F.col("lam")
    )
    return b.where(F.col("k") > 1).select(
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).alias("df1"),
        F.round(fstat, 4).alias("welch_f"),
        F.when(
            F.col("lam") > 0,
            F.round((kd * kd - 1.0) / (3.0 * F.col("lam")), 2),
        ).alias("df2"),
        F.lit(2.372).alias("crit_5pct_inf_df2"),
        (fstat > 2.372).alias("reject_equal_means_5pct"),
    )


# ---------------------------------------------------------------------------
# Dixon's Q extremes screen on the per-type daily series.
# ---------------------------------------------------------------------------


@query(
    "stats_dixon_q",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    AS DECIMAL(18,6)) AS y
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    hist AS (
        SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM daily GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, y,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY y
                              ROWS UNBOUNDED PRECEDING) AS ca,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY y DESC
                              ROWS UNBOUNDED PRECEDING) AS cd,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist
    ),
    st AS (
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
               MIN(y) AS x1, MAX(y) AS xn,
               MIN(CASE WHEN ca >= 2 THEN y END) AS x2,
               MAX(CASE WHEN cd >= 2 THEN y END) AS xn1
        FROM cum GROUP BY event_type
    )
    SELECT event_type, n_days,
           CAST(x1 AS DOUBLE) AS series_min,
           CAST(xn AS DOUBLE) AS series_max,
           {sql_jround(
               "CAST(x2 - x1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE)",
               6)} AS q_low,
           {sql_jround(
               "CAST(xn - xn1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE)",
               6)} AS q_high,
           CASE WHEN CAST(x2 - x1 AS DOUBLE)
                     > CAST(xn - xn1 AS DOUBLE) THEN 'low'
                WHEN CAST(x2 - x1 AS DOUBLE)
                     < CAST(xn - xn1 AS DOUBLE) THEN 'high'
                ELSE 'tie' END AS suspect_side
    FROM st WHERE n_days >= 3 AND xn > x1
    ORDER BY event_type
    """,
)
def stats_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q gap-to-range extremes screen per event-type daily
    series: q_low = (x(2)-x(1))/(x(n)-x(1)) and q_high =
    (x(n)-x(n-1))/(x(n)-x(1)) from exact order statistics. The
    small-sample outlier screen beside the model-based detectors
    (stats_grubbs_outlier needs near-normality; ts_anomaly_zscore
    needs a window): Q asks only 'is the extreme GAP large relative
    to the RANGE'. No verdict column: the classic Dixon critical
    tables (Dean & Dixon 1951; Rorabacher 1991) stop near n = 30 and
    interpolating them would fabricate precision — the statistic and
    the suspect side are reported for the user's own table lookup.

    Numerics: order statistics are rank picks on a distinct-value
    histogram (duplicate extremes collapse correctly: a tied minimum
    gives x(2) = x(1), Q = 0); gaps and ranges are exact
    DECIMAL(18,6) differences, doubles only at the final ratio.

    Scale shape: one corpus collapse to the daily grid, one collapse
    to a per-type value histogram, two bounded rank windows over it —
    no sort of anything fact-sized."""
    daily = (
        spark.table("events")
        .where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("y")
        )
    )
    hist = daily.groupBy("event_type", "y").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    wa = (
        Window.partitionBy("event_type")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy(F.col("y").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "y",
        F.sum("cnt").over(wa).alias("ca"),
        F.sum("cnt").over(wd).alias("cd"),
        F.sum("cnt").over(wt).alias("n"),
    )
    st = cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.min("y").alias("x1"),
        F.max("y").alias("xn"),
        F.min(F.when(F.col("ca") >= 2, F.col("y"))).alias("x2"),
        F.max(F.when(F.col("cd") >= 2, F.col("y"))).alias("xn1"),
    )
    gap_lo = (F.col("x2") - F.col("x1")).cast("double")
    gap_hi = (F.col("xn") - F.col("xn1")).cast("double")
    rng = (F.col("xn") - F.col("x1")).cast("double")
    return (
        st.where((F.col("n_days") >= 3) & (F.col("xn") > F.col("x1")))
        .select(
            "event_type",
            "n_days",
            F.col("x1").cast("double").alias("series_min"),
            F.col("xn").cast("double").alias("series_max"),
            F.round(gap_lo / rng, 6).alias("q_low"),
            F.round(gap_hi / rng, 6).alias("q_high"),
            F.when(gap_lo > gap_hi, "low")
            .when(gap_lo < gap_hi, "high")
            .otherwise("tie")
            .alias("suspect_side"),
        )
        .orderBy("event_type")
    )
