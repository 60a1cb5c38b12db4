"""Round-11 statistics widening: the paired/rank/robust inference family.

Extensions beyond the reference (SURVEY.md §2.B.11 — PowerSQL's surface
is whatever its backend executes, reference src/execute.rs:101; these
keys are the Spark-native statistical toolbox a warehouse user runs on
that backend), ranked AFTER the five r11 tail keys in the driver
window so the rotation endgame (README "Driver-rotation endgame") is
unaffected.

House discipline throughout: decimal-exact sufficient statistics
(order-independent, therefore partition-count-independent — the
cluster-determinism property), integer/rational arithmetic held
unrounded until one final rounding, deterministic tie-breaks on every
window, and a DuckDB oracle twin sharing the same formula template.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import sql_jround
from powersql_spark.registry import query

# ---------------------------------------------------------------------------
# Shared paired panel: per-nation revenue in two adjacent years.
#
# The natural paired design in the star schema — the SAME 25 nations
# measured twice (1996 and 1997 customer-order revenue), so
# between-nation variance cancels and the paired tests see only the
# year effect. Sums are decimal-exact (2dp money), so the differences
# are exact decimals too: every paired statistic downstream starts
# from bit-identical state on both engines.
# ---------------------------------------------------------------------------

_PAIRS_CTE = """
    pairs AS (
        SELECT n.n_name AS nation,
               CAST(SUM(CASE WHEN year(o.o_orderdate) = 1996
                    THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END)
                    AS DECIMAL(18,2)) AS x,
               CAST(SUM(CASE WHEN year(o.o_orderdate) = 1997
                    THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END)
                    AS DECIMAL(18,2)) AS y
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE year(o.o_orderdate) IN (1996, 1997)
        GROUP BY n.n_name
        HAVING x IS NOT NULL AND y IS NOT NULL
    )
"""


def _nation_year_pairs(spark: SparkSession) -> DataFrame:
    """Spark twin of ``_PAIRS_CTE``: (nation, x=1996 rev, y=1997 rev)
    as exact DECIMAL(18,2) sums."""
    dec = lambda yr: (
        F.sum(
            F.when(
                F.year("o_orderdate") == yr,
                F.col("o_totalprice").cast("decimal(18,2)"),
            )
        ).cast("decimal(18,2)")
    )
    return (
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(spark.table("nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dec(1996).alias("x"), dec(1997).alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )


@query(
    "stats_ttest_paired",
    oracle=f"""
    WITH {_PAIRS_CTE},
    d AS (
        SELECT nation, CAST(x - y AS DECIMAL(18,2)) AS d
        FROM pairs
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d) AS DOUBLE) AS sd1,
               CAST(SUM(CAST(d AS DECIMAL(19,2))
                        * CAST(d AS DECIMAL(19,2))) AS DOUBLE) AS sd2
        FROM d
    )
    SELECT n,
           {sql_jround("sd1 / n", 2)} AS mean_diff,
           round(sqrt((sd2 - sd1 * sd1 / n) / (n - 1)), 4) AS sd_diff,
           round((sd1 / n) / (sqrt((sd2 - sd1 * sd1 / n) / (n - 1))
                              / sqrt(CAST(n AS DOUBLE))), 4) AS t_stat,
           CAST(n - 1 AS BIGINT) AS dof
    FROM s
    """,
)
def stats_ttest_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test on per-nation revenue, 1996 vs 1997: the same 25
    nations measured in both years, so the test sees only the year
    effect — t = mean(d) / (sd(d)/sqrt(n)) on the within-nation
    differences, df = n-1. The paired sibling of stats_welch_ttest
    (independent samples) closing the t-family.

    Scale shape: the corpus collapses once to a nation x year panel
    (25 rows); differences are exact DECIMAL(18,2) (2dp money sums),
    their squares exact DECIMAL(38,4), so mean/sd/t are bit-identical
    across engines and partition counts. Everything after the first
    aggregation is constant-sized."""
    d = _nation_year_pairs(spark).select(
        (F.col("x") - F.col("y")).cast("decimal(18,2)").alias("d")
    )
    s = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("d").cast("double").alias("sd1"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sd2"),
    )
    n, sd1, sd2 = F.col("n"), F.col("sd1"), F.col("sd2")
    var_d = (sd2 - sd1 * sd1 / n) / (n - 1)
    return s.select(
        "n",
        F.round(sd1 / n, 2).alias("mean_diff"),
        F.round(F.sqrt(var_d), 4).alias("sd_diff"),
        F.round(
            (sd1 / n) / (F.sqrt(var_d) / F.sqrt(n.cast("double"))), 4
        ).alias("t_stat"),
        (n - 1).cast("bigint").alias("dof"),
    )


@query(
    "stats_sign_test",
    oracle=f"""
    WITH {_PAIRS_CTE},
    signs AS (
        SELECT CAST(SUM(CASE WHEN x > y THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos,
               CAST(SUM(CASE WHEN x < y THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_neg
        FROM pairs
    ),
    nk AS (
        SELECT n_pos, n_neg, n_pos + n_neg AS n,
               LEAST(n_pos, n_neg) AS k
        FROM signs
    ),
    spine AS (  -- ln C(n,i) by cumulative recurrence, i = 0..n
        -- (constant 0..60 spine cross-filtered to i <= n: DuckDB's
        -- generate_series cannot take lateral column bounds)
        SELECT nk.n_pos, nk.n_neg, nk.n, nk.k, gs.i,
               SUM(CASE WHEN gs.i = 0 THEN 0.0
                   ELSE ln((nk.n - gs.i + 1.0) / gs.i) END)
                   OVER (ORDER BY gs.i ROWS UNBOUNDED PRECEDING)
                   AS ln_choose
        FROM nk, range(0, 61) AS gs(i)
        WHERE gs.i <= nk.n
    )
    SELECT ANY_VALUE(n_pos) AS n_pos, ANY_VALUE(n_neg) AS n_neg,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_nonzero,
           round(LEAST(1.0,
               2.0 * SUM(CASE WHEN i <= k
                   THEN exp(ln_choose - n * ln(2.0)) ELSE 0 END)), 6)
               AS p_two_sided
    FROM spine
    """,
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sided sign test on the nation-year revenue pairs: k =
    min(#positive, #negative) differences, p = min(1, 2 P(X <= k)) for
    X ~ Binomial(n, 1/2). The distribution-free companion of
    stats_ttest_paired — no normality assumption, only exchangeable
    signs. Binomial coefficients come from the cumulative
    ln-recurrence ln C(n,i) = sum ln((n-j+1)/j) (no factorials — the
    stats_fisher_exact discipline), evaluated identically by both
    engines over a 0..n spine.

    Scale shape: one corpus collapse to the 25-row paired panel, one
    constant row of sign counts, and a <= n+1-row spine window — the
    exact tail costs O(n) rows of metadata regardless of corpus
    size."""
    signs = _nation_year_pairs(spark).agg(
        F.sum(F.when(F.col("x") > F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("x") < F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg"),
    )
    nk = signs.select(
        "n_pos",
        "n_neg",
        (F.col("n_pos") + F.col("n_neg")).alias("n"),
        F.least("n_pos", "n_neg").alias("k"),
    )
    spine = nk.select(
        "n_pos",
        "n_neg",
        "n",
        "k",
        F.explode(F.sequence(F.lit(0), F.col("n"))).alias("i"),
    )
    w = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ln_choose = F.sum(
        F.when(F.col("i") == 0, F.lit(0.0)).otherwise(
            F.log((F.col("n") - F.col("i") + 1.0) / F.col("i"))
        )
    ).over(w)
    terms = spine.select(
        "n_pos", "n_neg", "n", "k", "i", ln_choose.alias("ln_choose")
    )
    return terms.agg(
        F.any_value("n_pos").alias("n_pos"),
        F.any_value("n_neg").alias("n_neg"),
        F.any_value("n").cast("bigint").alias("n_nonzero"),
        F.round(
            F.least(
                F.lit(1.0),
                2.0
                * F.sum(
                    F.when(
                        F.col("i") <= F.col("k"),
                        F.exp(
                            F.col("ln_choose")
                            - F.col("n") * F.log(F.lit(2.0))
                        ),
                    ).otherwise(F.lit(0.0))
                ),
            ),
            6,
        ).alias("p_two_sided"),
    )


@query(
    "stats_kendall_tau",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nk,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS x
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    ),
    bal AS (
        SELECT c_nationkey AS nk,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS y
        FROM customer GROUP BY c_nationkey
    ),
    metrics AS (
        SELECT n.n_name AS nation, rev.x, bal.y
        FROM rev JOIN bal USING (nk)
        JOIN nation n ON n.n_nationkey = rev.nk
    ),
    prs AS (
        SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
        FROM metrics a JOIN metrics b ON a.nation < b.nation
    ),
    cnt AS (
        SELECT
            CAST((SELECT COUNT(*) FROM metrics) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
            CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) < 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
            CAST(SUM(CASE WHEN xa = xb
                 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
            CAST(SUM(CASE WHEN ya = yb
                 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
        FROM prs
    )
    SELECT n, concordant, discordant,
           round((concordant - discordant) /
               sqrt((CAST(n AS DOUBLE) * (n - 1) / 2 - ties_x)
                  * (CAST(n AS DOUBLE) * (n - 1) / 2 - ties_y)), 4)
               AS tau_b
    FROM cnt
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between per-nation revenue and
    per-nation mean customer balance: concordant-minus-discordant pair
    fractions with tie corrections — the rank-association measure
    whose pairwise definition (unlike Spearman's midranks) gives it a
    direct probabilistic reading, P(concordant) - P(discordant). Tie
    corrections are the textbook tau-b n1/n2: ties_x counts every
    x-tied pair and ties_y every y-tied pair, double-ties included in
    both.

    Scale shape: the corpus collapses once to a 25-row entity panel;
    the pairwise stage is a self-join of THAT panel (n(n-1)/2 = 300
    pairs — entity-bounded, never row-bounded), so the quadratic term
    rides metadata, not data. Sums feeding x/y are decimal-exact, so
    the pair sign tests are deterministic across engines."""
    rev = (
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        )
    )
    bal = (
        spark.table("customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("y")
        )
    )
    m = rev.join(bal, "nk").join(
        F.broadcast(spark.table("nation")),
        F.col("nk") == F.col("n_nationkey"),
    ).select(F.col("n_name").alias("nation"), "x", "y")
    a = m.select(
        F.col("nation").alias("na"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = m.select(
        F.col("nation").alias("nb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    prs = a.join(F.broadcast(b), F.col("na") < F.col("nb"))
    # n rides the plan as a broadcast 1-row aggregate (no eager
    # .count() job at frame-construction time).
    n_row = m.agg(F.count("*").cast("bigint").alias("n"))
    sgn = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    cnt = prs.agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("concordant"),
        F.sum(F.when(sgn < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("discordant"),
        # Textbook tau-b tie corrections: ties_x counts ALL xa = xb
        # pairs and ties_y ALL ya = yb pairs, INCLUDING pairs tied on
        # both variables (ADVICE r11 — the earlier variant excluded
        # double-ties from both corrections).
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
        .cast("bigint")
        .alias("ties_x"),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0))
        .cast("bigint")
        .alias("ties_y"),
    ).crossJoin(F.broadcast(n_row))
    n0 = F.col("n").cast("double") * (F.col("n") - 1) / 2
    return cnt.select(
        "n",
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt((n0 - F.col("ties_x")) * (n0 - F.col("ties_y"))),
            4,
        ).alias("tau_b"),
    )


@query(
    "stats_mood_median",
    oracle=f"""
    WITH cells AS (  -- ONE corpus collapse: (segment, value) grid
        SELECT c.c_mktsegment AS seg,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    hist AS (SELECT v, SUM(cnt) AS cnt FROM cells GROUP BY v),
    med AS (  -- lower median: smallest v with 2*cum >= N
        SELECT MIN(v) AS m FROM (
            SELECT v, SUM(cnt) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER () AS n_total
            FROM hist
        ) WHERE 2 * cum >= n_total
    ),
    per_seg AS (
        SELECT seg,
               CAST(SUM(CASE WHEN v > (SELECT m FROM med)
                    THEN cnt ELSE 0 END) AS BIGINT) AS n_above,
               CAST(SUM(CASE WHEN v < (SELECT m FROM med)
                    THEN cnt ELSE 0 END) AS BIGINT) AS n_below
        FROM cells GROUP BY seg
    ),
    tot AS (
        SELECT SUM(n_above) AS ta, SUM(n_below) AS tb FROM per_seg
    )
    SELECT seg AS c_mktsegment, n_above, n_below,
           {sql_jround(
               "CAST(ta AS DOUBLE) * (n_above + n_below) / (ta + tb)",
               4)} AS expected_above,
           {sql_jround(
               "pow(n_above - CAST(ta AS DOUBLE) * (n_above + n_below)"
               " / (ta + tb), 2)"
               " / (CAST(ta AS DOUBLE) * (n_above + n_below)"
               " / (ta + tb))"
               " + pow(n_below - CAST(tb AS DOUBLE)"
               " * (n_above + n_below) / (ta + tb), 2)"
               " / (CAST(tb AS DOUBLE) * (n_above + n_below)"
               " / (ta + tb))", 4)} AS chi2_term
    FROM per_seg, tot
    ORDER BY c_mktsegment
    """,
)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the five market segments: does each
    segment's order-value distribution sit above or below the GRAND
    median more often than chance? Counts above/below the pooled
    (lower) median per segment, with per-segment chi-square terms
    against the margin-expected counts — the k-sample median test,
    robust to any value distribution (only the median matters).
    Values exactly ON the median are excluded (the standard
    treatment). ``chi2_total = SUM(chi2_term)`` with df = k-1.

    Scale shape: the grand median comes from a value-histogram
    cumulative window (bounded by the price grid's distinct values,
    not row count — at 100 TB you'd quantize to the cents grid
    first); per-segment counts are one aggregation; the 2 x k
    chi-square table is constant-sized. Median selection is on exact
    DECIMAL(18,2) values — no interpolation, no float ties."""
    from powersql_spark.catalog import track_persist

    # ONE corpus collapse to the (segment, value) grid — bounded by
    # the price grid x 5 segments, not row count — persisted because
    # the median derivation and the per-segment counts both read it
    # (two corpus scans otherwise).
    cells = track_persist(
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    hist = cells.groupBy("v").agg(F.sum("cnt").alias("cnt"))
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    med = (
        hist.select(
            "v",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(wall).alias("n_total"),
        )
        .where(2 * F.col("cum") >= F.col("n_total"))
        .agg(F.min("v").alias("m"))
    )
    per_seg = (
        cells.crossJoin(F.broadcast(med))
        .groupBy("seg")
        .agg(
            F.sum(
                F.when(F.col("v") > F.col("m"), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_above"),
            F.sum(
                F.when(F.col("v") < F.col("m"), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_below"),
        )
    )
    tot = per_seg.agg(
        F.sum("n_above").alias("ta"), F.sum("n_below").alias("tb")
    )
    j = per_seg.crossJoin(F.broadcast(tot))
    n_g = F.col("n_above") + F.col("n_below")
    ea = F.col("ta").cast("double") * n_g / (F.col("ta") + F.col("tb"))
    eb = F.col("tb").cast("double") * n_g / (F.col("ta") + F.col("tb"))
    return j.select(
        F.col("seg").alias("c_mktsegment"),
        "n_above",
        "n_below",
        F.round(ea, 4).alias("expected_above"),
        F.round(
            F.pow(F.col("n_above") - ea, 2) / ea
            + F.pow(F.col("n_below") - eb, 2) / eb,
            4,
        ).alias("chi2_term"),
    ).orderBy("c_mktsegment")


@query(
    "stats_hodges_lehmann",
    oracle="""
    WITH cells_a AS (
        SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS c,
               COUNT(*) AS cnt
        FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
    ),
    cells_n AS (
        SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS c,
               COUNT(*) AS cnt
        FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1
    ),
    diffs AS (  -- pairwise differences in integer cents-of-discount
        SELECT a.c - b.c AS d, SUM(a.cnt * b.cnt) AS w
        FROM cells_a a, cells_n b
        GROUP BY a.c - b.c
    ),
    cum AS (
        SELECT d, SUM(w) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                   AS cw,
               SUM(w) OVER () AS tw
        FROM diffs
    )
    SELECT CAST((SELECT SUM(cnt) FROM cells_a) AS BIGINT) AS n_a,
           CAST((SELECT SUM(cnt) FROM cells_n) AS BIGINT) AS n_n,
           CAST(MIN(d) AS DOUBLE) / 100.0 AS hl_shift
    FROM cum WHERE 2 * cw >= tw
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift estimator between returned ('A') and
    non-returned ('N') line items on the discount scale: the (lower
    weighted) median of all pairwise differences x_i - y_j — the
    robust effect-size companion to stats_mann_whitney (which only
    says WHETHER the distributions differ; HL says BY HOW MUCH, with
    breakdown point 29%).

    Scale shape: discounts live on an 11-value percent grid, so both
    samples collapse to value histograms and the "all pairs" stage is
    an 11 x 11 cell product with integer weights — the classic
    histogram-collapse that turns an O(n_a * n_b) estimator into a
    grid-bounded one. All arithmetic is integer (cents) until the
    final /100, so the median pick is exact on both engines."""
    li = spark.table("lineitem")
    cents = F.round(F.col("l_discount") * 100, 0).cast("bigint")

    def cells(flag: str) -> DataFrame:
        return (
            li.where(F.col("l_returnflag") == flag)
            .groupBy(cents.alias("c"))
            .agg(F.count("*").alias("cnt"))
        )

    ca, cn = cells("A"), cells("N")
    diffs = (
        ca.alias("a")
        .crossJoin(F.broadcast(cn.alias("b")))
        .groupBy((F.col("a.c") - F.col("b.c")).alias("d"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("w"))
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = diffs.select(
        "d",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    )
    n_a = ca.agg(F.sum("cnt").cast("bigint").alias("v"))
    n_n = cn.agg(F.sum("cnt").cast("bigint").alias("v"))
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .agg((F.min("d").cast("double") / 100.0).alias("hl_shift"))
        .crossJoin(F.broadcast(n_a.select(F.col("v").alias("n_a"))))
        .crossJoin(F.broadcast(n_n.select(F.col("v").alias("n_n"))))
        .select("n_a", "n_n", "hl_shift")
    )


@query(
    "stats_grubbs_outlier",
    oracle=f"""
    WITH mom AS (
        SELECT c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS mu,
               sqrt((CAST(SUM(CAST(c_acctbal AS DECIMAL(19,2))
                         * CAST(c_acctbal AS DECIMAL(19,2)))
                         AS DOUBLE)
                     - COUNT(*) * pow(
                         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                              AS DOUBLE) / COUNT(*), 2))
                    / (COUNT(*) - 1)) AS sd
        FROM customer GROUP BY c_mktsegment
    ),
    scored AS (
        SELECT c.c_mktsegment AS seg, m.n, c.c_custkey,
               CAST(c.c_acctbal AS DOUBLE) AS val,
               abs(c.c_acctbal - m.mu) / m.sd AS g,
               ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                   ORDER BY abs(c.c_acctbal - m.mu) / m.sd DESC,
                            c.c_custkey) AS rn
        FROM customer c JOIN mom m ON c.c_mktsegment = m.seg
    )
    SELECT seg AS c_mktsegment, n, c_custkey AS outlier_custkey,
           {sql_jround("val", 2)} AS outlier_value,
           round(g, 4) AS g_stat
    FROM scored WHERE rn = 1
    ORDER BY c_mktsegment
    """,
)
def stats_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' (extreme studentized deviate) statistic per market
    segment on customer balances: G = max |x - mean| / sd, with the
    arg-max customer identified — the single-outlier screen that says
    how many sample standard deviations the most extreme balance sits
    from its segment mean (compare G against the t-based critical
    value for the chosen alpha downstream).

    Scale shape: moments are decimal-exact sufficient sums per
    segment (one aggregation); scoring is a map-side broadcast join
    of the 5-row moment table back onto the scan; the arg-max is a
    per-segment rank window with a deterministic custkey tie-break.
    One corpus exchange total."""
    cust = spark.table("customer")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    mom = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum(bal).cast("double") / F.count("*")).alias("mu"),
        F.sqrt(
            (
                F.sum((bal * bal).cast("decimal(38,4)")).cast("double")
                - F.count("*")
                * F.pow(F.sum(bal).cast("double") / F.count("*"), 2)
            )
            / (F.count("*") - 1)
        ).alias("sd"),
    )
    g = F.abs(F.col("c_acctbal") - F.col("mu")) / F.col("sd")
    w = Window.partitionBy("c_mktsegment").orderBy(
        g.desc(), F.col("c_custkey")
    )
    scored = cust.join(
        F.broadcast(mom), cust["c_mktsegment"] == mom["seg"]
    ).select(
        "c_mktsegment",
        "n",
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("val"),
        g.alias("g"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        scored.where(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            "n",
            F.col("c_custkey").alias("outlier_custkey"),
            F.round(F.col("val"), 2).alias("outlier_value"),
            F.round(F.col("g"), 4).alias("g_stat"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "stats_theil_u",
    oracle="""
    WITH cells AS (
        SELECT o_orderstatus AS x, o_orderpriority AS y,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    n AS (SELECT SUM(cnt) AS n FROM cells),
    hx AS (  -- H(X) from the X margin
        SELECT -SUM((CAST(c AS DOUBLE) / n.n)
                    * ln(CAST(c AS DOUBLE) / n.n)) AS h
        FROM (SELECT x, SUM(cnt) AS c FROM cells GROUP BY x), n
        GROUP BY n.n
    ),
    hy AS (
        SELECT -SUM((CAST(c AS DOUBLE) / n.n)
                    * ln(CAST(c AS DOUBLE) / n.n)) AS h
        FROM (SELECT y, SUM(cnt) AS c FROM cells GROUP BY y), n
        GROUP BY n.n
    ),
    hxy AS (  -- joint entropy from the full table
        SELECT -SUM((CAST(cnt AS DOUBLE) / n.n)
                    * ln(CAST(cnt AS DOUBLE) / n.n)) AS h
        FROM cells, n GROUP BY n.n
    )
    SELECT CAST(n.n AS BIGINT) AS n_orders,
           round(hx.h, 6) AS h_status,
           round(hy.h, 6) AS h_priority,
           round((hx.h + hy.h - hxy.h) / hx.h, 6)
               AS u_status_given_priority,
           round((hx.h + hy.h - hxy.h) / hy.h, 6)
               AS u_priority_given_status
    FROM n, hx, hy, hxy
    """,
)
def stats_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient between order status and order
    priority: U(X|Y) = I(X;Y) / H(X) = (H(X) + H(Y) - H(X,Y)) / H(X)
    — the asymmetric, [0,1]-normalized "how much does knowing Y
    reduce uncertainty about X" association measure for categorical
    pairs, reported in both directions (it is NOT symmetric, unlike
    stats_cramers_v which this completes).

    Scale shape: one corpus collapse to the |X| x |Y| contingency
    cells (3 x 5 here — category-bounded, never row-bounded); margins
    and entropies are aggregations of that constant-sized table. Cell
    counts are exact integers; only the final entropy ratios touch
    floats."""
    cells = spark.table("orders").groupBy(
        F.col("o_orderstatus").alias("x"),
        F.col("o_orderpriority").alias("y"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    n = cells.agg(F.sum("cnt").alias("n"))

    def entropy(df: DataFrame, alias: str) -> DataFrame:
        p = F.col("c").cast("double") / F.col("n")
        return (
            df.crossJoin(F.broadcast(n))
            .agg((-F.sum(p * F.log(p))).alias(alias))
        )

    hx = entropy(
        cells.groupBy("x").agg(F.sum("cnt").alias("c")), "h_x"
    )
    hy = entropy(
        cells.groupBy("y").agg(F.sum("cnt").alias("c")), "h_y"
    )
    hxy = entropy(cells.select(F.col("cnt").alias("c")), "h_xy")
    mi = F.col("h_x") + F.col("h_y") - F.col("h_xy")
    return (
        n.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(hxy))
        .select(
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(F.col("h_x"), 6).alias("h_status"),
            F.round(F.col("h_y"), 6).alias("h_priority"),
            F.round(mi / F.col("h_x"), 6).alias(
                "u_status_given_priority"
            ),
            F.round(mi / F.col("h_y"), 6).alias(
                "u_priority_given_status"
            ),
        )
    )


# ---------------------------------------------------------------------------
# OLS diagnostics family on the daily purchase-revenue series.
#
# One shared construction: y_t = daily purchase revenue (decimal-exact
# 6dp sums), t = 1..n by day order. The OLS line comes from exact
# sufficient sums (integer t, decimal y, exact cross-products), so
# slope/intercept are bit-identical across engines; per-row residual
# terms are rounded to 8dp and decimal-summed (order-independent — the
# anderson_darling discipline) before any statistic is formed.
# ---------------------------------------------------------------------------

_DAILY_OLS_CTE = """
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    AS DECIMAL(18,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    tt AS (
        SELECT day, y,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
        FROM daily
    ),
    ols AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS DOUBLE) AS st,
               CAST(SUM(t * t) AS DOUBLE) AS stt,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(t * y AS DECIMAL(38,6))) AS DOUBLE)
                   AS sty
        FROM tt
    ),
    fit AS (
        SELECT n, st / n AS tbar, stt - st * st / n AS sxx,
               (sty - st * sy / n) / (stt - st * st / n) AS b,
               sy / n - (sty - st * sy / n) / (stt - st * st / n)
                   * st / n AS a
        FROM ols
    ),
    resid AS (
        SELECT tt.day, tt.t, CAST(tt.y AS DOUBLE) AS y, f.n, f.tbar,
               f.sxx, f.a, f.b,
               CAST(tt.y AS DOUBLE) - (f.a + f.b * tt.t) AS e
        FROM tt, fit f
    )
"""


def _daily_ols_resid(spark: SparkSession) -> DataFrame:
    """Spark twin of ``_DAILY_OLS_CTE``: one row per day with (day, t,
    y, n, tbar, sxx, a, b, e)."""
    daily = (
        spark.table("events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("y")
        )
    )
    tt = daily.select(
        "day",
        "y",
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("bigint")
        .alias("t"),
    )
    ols = tt.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("double").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("double").alias("stt"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("t") * F.col("y")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sty"),
    )
    n, st, stt, sy, sty = (
        F.col("n"),
        F.col("st"),
        F.col("stt"),
        F.col("sy"),
        F.col("sty"),
    )
    b = (sty - st * sy / n) / (stt - st * st / n)
    fit = ols.select(
        "n",
        (st / n).alias("tbar"),
        (stt - st * st / n).alias("sxx"),
        b.alias("b"),
        (sy / n - b * st / n).alias("a"),
    )
    return tt.crossJoin(F.broadcast(fit)).select(
        "day",
        "t",
        F.col("y").cast("double").alias("y"),
        "n",
        "tbar",
        "sxx",
        "a",
        "b",
        (
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("t"))
        ).alias("e"),
    )


@query(
    "stats_durbin_watson",
    oracle=f"""
    WITH {_DAILY_OLS_CTE},
    lagd AS (
        SELECT e, LAG(e) OVER (ORDER BY t) AS e_prev, n, b
        FROM resid
    )
    SELECT ANY_VALUE(n) AS n_days,
           round(ANY_VALUE(b), 6) AS slope,
           round(CAST(SUM(CASE WHEN e_prev IS NULL THEN 0
                   ELSE CAST(round(pow(e - e_prev, 2), 8)
                        AS DECIMAL(38,8)) END) AS DOUBLE)
               / CAST(SUM(CAST(round(e * e, 8) AS DECIMAL(38,8)))
                      AS DOUBLE), 4) AS dw_stat
    FROM lagd
    """,
)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order autocorrelation test on the residuals
    of the daily-revenue-vs-time OLS line: DW = sum (e_t - e_t-1)^2 /
    sum e_t^2, near 2 under independence, toward 0 under positive
    serial correlation — the gate that says whether the OLS trend's
    standard errors (and every i.i.d.-assuming test downstream) can
    be trusted on this series.

    Scale shape: one corpus collapse to the daily series; the OLS
    line comes from exact decimal/integer sufficient sums; residual
    terms are 8dp-rounded and decimal-summed so the quotient is
    order-independent. Constant work after the first aggregation."""
    resid = _daily_ols_resid(spark)
    lagd = resid.select(
        "e",
        F.lag("e").over(Window.orderBy("t")).alias("e_prev"),
        "n",
        "b",
    )
    num = F.sum(
        F.when(F.col("e_prev").isNull(), F.lit(0).cast("decimal(38,8)"))
        .otherwise(
            F.round(F.pow(F.col("e") - F.col("e_prev"), 2), 8).cast(
                "decimal(38,8)"
            )
        )
    ).cast("double")
    den = F.sum(
        F.round(F.col("e") * F.col("e"), 8).cast("decimal(38,8)")
    ).cast("double")
    return lagd.agg(
        F.any_value("n").alias("n_days"),
        F.round(F.any_value("b"), 6).alias("slope"),
        F.round(num / den, 4).alias("dw_stat"),
    )


@query(
    "stats_breusch_pagan",
    oracle=f"""
    WITH {_DAILY_OLS_CTE},
    aux AS (  -- regress e^2 on t: LM = n * R^2
        SELECT ANY_VALUE(resid.n) AS n,
               CAST(SUM(CAST(round(e * e, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS su,
               CAST(SUM(CAST(round(e * e * t, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sut,
               CAST(SUM(CAST(round(e * e * e * e, 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS suu,
               ANY_VALUE(ols.st) AS st, ANY_VALUE(ols.stt) AS stt
        FROM resid, ols
    )
    SELECT n AS n_days,
           round(pow(sut - st * su / n, 2)
                 / ((stt - st * st / n) * (suu - su * su / n)), 6)
               AS r2_aux,
           round(n * pow(sut - st * su / n, 2)
                 / ((stt - st * st / n) * (suu - su * su / n)), 4)
               AS lm_stat,
           n * pow(sut - st * su / n, 2)
               / ((stt - st * st / n) * (suu - su * su / n))
               > 3.841 AS heteroskedastic_5pct
    FROM aux
    """,
)
def stats_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroskedasticity test on the daily-revenue OLS:
    regress squared residuals on the regressor; LM = n R^2 of that
    auxiliary regression, chi-square(1) under homoskedasticity (5%
    critical 3.841). The companion diagnostic to stats_durbin_watson
    — DW checks residual INDEPENDENCE, this checks residual VARIANCE
    CONSTANCY, the other half of the OLS trust question.

    Scale shape: identical to durbin_watson — exact sufficient sums
    for the line, 8dp-decimal-summed residual powers for the
    auxiliary sums, one corpus exchange, constant-sized tail."""
    resid = _daily_ols_resid(spark)
    e2 = F.col("e") * F.col("e")
    dec8 = lambda c: F.sum(F.round(c, 8).cast("decimal(38,8)")).cast(
        "double"
    )
    aux = resid.agg(
        F.any_value("n").alias("n"),
        dec8(e2).alias("su"),
        dec8(e2 * F.col("t")).alias("sut"),
        dec8(e2 * e2).alias("suu"),
        F.sum("t").cast("double").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("double").alias("stt"),
    )
    n, su, sut, suu = (
        F.col("n"),
        F.col("su"),
        F.col("sut"),
        F.col("suu"),
    )
    st, stt = F.col("st"), F.col("stt")
    r2 = F.pow(sut - st * su / n, 2) / (
        (stt - st * st / n) * (suu - su * su / n)
    )
    return aux.select(
        n.alias("n_days"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(n * r2, 4).alias("lm_stat"),
        (n * r2 > 3.841).alias("heteroskedastic_5pct"),
    )


@query(
    "stats_cooks_distance",
    oracle=f"""
    WITH {_DAILY_OLS_CTE},
    s2 AS (
        SELECT CAST(SUM(CAST(round(e * e, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) / (ANY_VALUE(n) - 2) AS s2
        FROM resid
    ),
    scored AS (
        SELECT r.day, r.e,
               1.0 / r.n + pow(r.t - r.tbar, 2) / r.sxx AS h,
               (r.e * r.e / (2 * s2.s2))
                   * ((1.0 / r.n + pow(r.t - r.tbar, 2) / r.sxx)
                      / pow(1 - (1.0 / r.n
                             + pow(r.t - r.tbar, 2) / r.sxx), 2))
                   AS d
        FROM resid r, s2
    )
    SELECT day, round(e, 4) AS residual, round(h, 6) AS leverage,
           round(d, 6) AS cooks_d
    FROM scored
    ORDER BY d DESC, day
    LIMIT 5
    """,
)
def stats_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance for every day of the daily-revenue OLS — the
    influence diagnostic D_i = e_i^2 / (p s^2) * h_i / (1-h_i)^2 with
    leverage h_i = 1/n + (t_i - tbar)^2 / Sxx — reporting the top-5
    most influential days: the observations whose removal would move
    the fitted trend the most (the days to audit before trusting the
    slope).

    Scale shape: leverage is closed-form from the broadcast OLS
    scalars; s^2 is one more 8dp-decimal residual sum; scoring is
    map-side over the metadata-sized daily table, and the top-5 is a
    TakeOrderedAndProject with a day tie-break."""
    resid = _daily_ols_resid(spark)
    s2 = resid.agg(
        (
            F.sum(
                F.round(F.col("e") * F.col("e"), 8).cast(
                    "decimal(38,8)"
                )
            ).cast("double")
            / (F.any_value("n") - 2)
        ).alias("s2")
    )
    h = 1.0 / F.col("n") + F.pow(F.col("t") - F.col("tbar"), 2) / F.col(
        "sxx"
    )
    d = (F.col("e") * F.col("e") / (2 * F.col("s2"))) * (
        h / F.pow(1 - h, 2)
    )
    return (
        resid.crossJoin(F.broadcast(s2))
        .select(
            "day",
            F.round(F.col("e"), 4).alias("residual"),
            F.round(h, 6).alias("leverage"),
            F.round(d, 6).alias("cooks_d"),
            d.alias("_d"),
        )
        .orderBy(F.col("_d").desc(), "day")
        .limit(5)
        .drop("_d")
    )


@query(
    "stats_chow_test",
    oracle=f"""
    WITH {_DAILY_OLS_CTE},
    seg AS (  -- split at the midpoint day: refit each half
        SELECT CASE WHEN t * 2 <= n THEN 1 ELSE 2 END AS s,
               t, y
        FROM resid
    ),
    segfit AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS n_s,
               CAST(SUM(t) AS DOUBLE) AS st,
               CAST(SUM(t * t) AS DOUBLE) AS stt,
               CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(t * CAST(y AS DECIMAL(18,6))
                    AS DECIMAL(38,6))) AS DOUBLE) AS sty,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                    * CAST(y AS DECIMAL(19,6)))
                    AS DOUBLE) AS syy
        FROM seg GROUP BY s
    ),
    ssr AS (  -- SSR = Syy - Sxy^2/Sxx per segment (and pooled)
        SELECT s, n_s,
               (syy - sy * sy / n_s)
                   - pow(sty - st * sy / n_s, 2)
                     / (stt - st * st / n_s) AS ssr_s
        FROM segfit
    ),
    pooled AS (
        SELECT ANY_VALUE(n) AS n,
               CAST(SUM(CAST(round(e * e, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS ssr_p
        FROM resid
    )
    SELECT p.n AS n_days,
           CAST(MAX(CASE WHEN r.s = 1 THEN r.n_s END) AS BIGINT)
               AS n_seg1,
           CAST(MAX(CASE WHEN r.s = 2 THEN r.n_s END) AS BIGINT)
               AS n_seg2,
           round(ANY_VALUE(p.ssr_p), 4) AS ssr_pooled,
           round(SUM(r.ssr_s), 4) AS ssr_split,
           round(((ANY_VALUE(p.ssr_p) - SUM(r.ssr_s)) / 2)
                 / (SUM(r.ssr_s) / (p.n - 4)), 4) AS f_stat
    FROM ssr r, pooled p
    GROUP BY p.n
    """,
)
def stats_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break F-test on the daily revenue trend, split
    at the series midpoint: F = ((SSR_pooled - SSR_1 - SSR_2) / k) /
    ((SSR_1 + SSR_2) / (n - 2k)) with k = 2 line parameters — did the
    trend's level/slope CHANGE between the two halves, or is one line
    enough? The regression-flavored changepoint test completing
    ts_changepoint_cusum (mean shift) and stats_diff_in_diff
    (treatment effect).

    Scale shape: per-segment SSRs come from the same exact
    decimal/integer sufficient sums as the pooled fit (closed form —
    no per-row residual pass needed for the halves); the pooled SSR
    reuses the 8dp-decimal residual sum. Everything after the daily
    collapse is constant-sized."""
    resid = _daily_ols_resid(spark)
    seg = resid.select(
        F.when(F.col("t") * 2 <= F.col("n"), 1).otherwise(2).alias("s"),
        "t",
        F.col("y").cast("decimal(18,6)").alias("y"),
    )
    segfit = seg.groupBy("s").agg(
        F.count("*").cast("bigint").alias("n_s"),
        F.sum("t").cast("double").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("double").alias("stt"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("t") * F.col("y")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sty"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
    )
    n_s, st, stt = F.col("n_s"), F.col("st"), F.col("stt")
    sy, sty, syy = F.col("sy"), F.col("sty"), F.col("syy")
    ssr = segfit.select(
        "s",
        "n_s",
        (
            (syy - sy * sy / n_s)
            - F.pow(sty - st * sy / n_s, 2) / (stt - st * st / n_s)
        ).alias("ssr_s"),
    )
    pooled = resid.agg(
        F.any_value("n").alias("n"),
        F.sum(
            F.round(F.col("e") * F.col("e"), 8).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("ssr_p"),
    )
    j = ssr.crossJoin(F.broadcast(pooled))
    return j.groupBy("n").agg(
        F.max(F.when(F.col("s") == 1, F.col("n_s")))
        .cast("bigint")
        .alias("n_seg1"),
        F.max(F.when(F.col("s") == 2, F.col("n_s")))
        .cast("bigint")
        .alias("n_seg2"),
        F.round(F.any_value("ssr_p"), 4).alias("ssr_pooled"),
        F.round(F.sum("ssr_s"), 4).alias("ssr_split"),
        F.round(
            ((F.any_value("ssr_p") - F.sum("ssr_s")) / 2)
            / (F.sum("ssr_s") / (F.col("n") - 4)),
            4,
        ).alias("f_stat"),
    ).select(
        F.col("n").alias("n_days"),
        "n_seg1",
        "n_seg2",
        "ssr_pooled",
        "ssr_split",
        "f_stat",
    )


@query(
    "stats_partial_corr",
    oracle="""
    WITH cust AS (
        SELECT c.c_custkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS x,
               CAST(COUNT(*) AS BIGINT) AS y,
               CAST(ANY_VALUE(c.c_acctbal) AS DECIMAL(18,2)) AS z
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(z) AS DOUBLE) AS sz,
               CAST(SUM(CAST(x AS DECIMAL(19,2))
                        * CAST(x AS DECIMAL(19,2))) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(CAST(z AS DECIMAL(19,2))
                        * CAST(z AS DECIMAL(19,2))) AS DOUBLE) AS szz,
               CAST(SUM(y * x) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(19,2))
                        * CAST(z AS DECIMAL(19,2))) AS DOUBLE) AS sxz,
               CAST(SUM(y * z) AS DOUBLE) AS syz
        FROM cust
    ),
    r AS (
        SELECT n,
               (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n)
                   * (syy - sy * sy / n)) AS r_xy,
               (sxz - sx * sz / n) / sqrt((sxx - sx * sx / n)
                   * (szz - sz * sz / n)) AS r_xz,
               (syz - sy * sz / n) / sqrt((syy - sy * sy / n)
                   * (szz - sz * sz / n)) AS r_yz
        FROM s
    )
    SELECT n AS n_customers,
           round(r_xy, 6) AS r_spend_orders,
           round(r_xz, 6) AS r_spend_balance,
           round(r_yz, 6) AS r_orders_balance,
           round((r_xy - r_xz * r_yz)
                 / sqrt((1 - r_xz * r_xz) * (1 - r_yz * r_yz)), 6)
               AS partial_r_spend_orders
    FROM r
    """,
)
def stats_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation between customer spend and
    order count, controlling for account balance: r_xy.z = (r_xy -
    r_xz r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)) — does the spend/orders
    association survive once the wealth proxy is partialed out, or
    was balance a confounder driving both? The three pairwise
    Pearsons are reported alongside so the adjustment is auditable.

    Scale shape: one corpus collapse to the per-customer panel; all
    nine sufficient sums are exact (decimal money, integer counts,
    decimal cross-products bounded to precision 38), so every r — and
    the partial — is bit-identical across engines and partition
    counts. Single exchange, constant-sized tail."""
    cust = (
        spark.table("customer")
        .join(
            spark.table("orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x"),
            F.count("*").cast("bigint").alias("y"),
            F.any_value(F.col("c_acctbal"))
            .cast("decimal(18,2)")
            .alias("z"),
        )
    )
    x19 = F.col("x").cast("decimal(19,2)")
    z19 = F.col("z").cast("decimal(19,2)")
    s = cust.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(x19 * x19).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(z19 * z19).cast("double").alias("szz"),
        F.sum(F.col("y") * F.col("x")).cast("double").alias("sxy"),
        F.sum(x19 * z19).cast("double").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("double").alias("syz"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    czz = F.col("szz") - F.col("sz") * F.col("sz") / n
    r_xy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / F.sqrt(
        cxx * cyy
    )
    r_xz = (F.col("sxz") - F.col("sx") * F.col("sz") / n) / F.sqrt(
        cxx * czz
    )
    r_yz = (F.col("syz") - F.col("sy") * F.col("sz") / n) / F.sqrt(
        cyy * czz
    )
    r = s.select(
        n.alias("n"),
        r_xy.alias("r_xy"),
        r_xz.alias("r_xz"),
        r_yz.alias("r_yz"),
    )
    return r.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("r_xy"), 6).alias("r_spend_orders"),
        F.round(F.col("r_xz"), 6).alias("r_spend_balance"),
        F.round(F.col("r_yz"), 6).alias("r_orders_balance"),
        F.round(
            (F.col("r_xy") - F.col("r_xz") * F.col("r_yz"))
            / F.sqrt(
                (1 - F.col("r_xz") * F.col("r_xz"))
                * (1 - F.col("r_yz") * F.col("r_yz"))
            ),
            6,
        ).alias("partial_r_spend_orders"),
    )


@query(
    "stats_g_test",
    oracle=f"""
    WITH cells AS (
        SELECT c.c_mktsegment AS x, o.o_orderpriority AS y,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    n AS (SELECT SUM(obs) AS n FROM cells),
    rm AS (SELECT x, SUM(obs) AS rx FROM cells GROUP BY x),
    cm AS (SELECT y, SUM(obs) AS cy FROM cells GROUP BY y),
    terms AS (  -- absent cells contribute 0 to G (O ln(O/E) -> 0),
                -- unlike chi2 where the E term survives; dof still
                -- counts the full category grid
        SELECT c.obs, CAST(rm.rx AS DOUBLE) * cm.cy / n.n AS e
        FROM cells c
        JOIN rm ON rm.x = c.x
        JOIN cm ON cm.y = c.y
        CROSS JOIN n
    )
    SELECT CAST(n.n AS BIGINT) AS n_orders,
           CAST(((SELECT COUNT(*) FROM rm) - 1)
                * ((SELECT COUNT(*) FROM cm) - 1) AS BIGINT) AS dof,
           {sql_jround(
               "2.0 * CAST(SUM(CAST(round(obs * ln(obs / e), 8)"
               " AS DECIMAL(38,8))) AS DOUBLE)", 4)} AS g_stat
    FROM terms, n
    GROUP BY n.n
    """,
)
def stats_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-square) of independence between
    market segment and order priority: G = 2 sum O ln(O/E) over the
    contingency cells — the information-theoretic twin of
    stats_chi2_independence (G = 2n * MI in nats), additive across
    partitions of the table, which Pearson's chi2 is not. Absent
    cells contribute 0 to G (O ln O/E -> 0 as O -> 0) — unlike the
    chi2 family where absent cells contribute E (the r9 full-grid
    fix) — while dof still spans the full (r-1)(c-1) grid.

    Scale shape: one corpus collapse to the 5 x 5 category cells;
    margins and expecteds are aggregations/joins of that constant
    table; the G terms are 8dp-rounded and decimal-summed
    (order-independent)."""
    cells = (
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("x"),
            F.col("o_orderpriority").alias("y"),
        )
        .agg(F.count("*").cast("bigint").alias("obs"))
    )
    n = cells.agg(F.sum("obs").alias("n"))
    rm = cells.groupBy("x").agg(F.sum("obs").alias("rx"))
    cm = cells.groupBy("y").agg(F.sum("obs").alias("cy"))
    terms = (
        cells.join(F.broadcast(rm), "x")
        .join(F.broadcast(cm), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "obs",
            (
                F.col("rx").cast("double") * F.col("cy") / F.col("n")
            ).alias("e"),
            "n",
        )
    )
    dims = cells.agg(
        (
            (F.count_distinct("x") - 1) * (F.count_distinct("y") - 1)
        )
        .cast("bigint")
        .alias("dof")
    )
    return (
        terms.groupBy("n")
        .agg(
            F.round(
                2.0
                * F.sum(
                    F.round(
                        F.col("obs") * F.log(F.col("obs") / F.col("e")),
                        8,
                    ).cast("decimal(38,8)")
                ).cast("double"),
                4,
            ).alias("g_stat")
        )
        .crossJoin(F.broadcast(dims))
        .select(
            F.col("n").cast("bigint").alias("n_orders"),
            "dof",
            "g_stat",
        )
    )


@query(
    "stats_concordance_cindex",
    oracle="""
    WITH panel AS (  -- fixed 200-customer audit panel (key-ordered)
        SELECT c.c_custkey AS ck,
               CAST(c.c_acctbal AS DECIMAL(18,2)) AS pred,
               CAST(COALESCE(SUM(CAST(o.o_totalprice
                    AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS outc
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey <= 200
        GROUP BY c.c_custkey, c.c_acctbal
    ),
    prs AS (
        SELECT a.pred AS pa, a.outc AS oa, b.pred AS pb, b.outc AS ob
        FROM panel a JOIN panel b ON a.ck < b.ck
        WHERE a.outc <> b.outc  -- comparable pairs only
    ),
    cnt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS comparable,
               CAST(SUM(CASE WHEN (pa - pb) * (oa - ob) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               CAST(SUM(CASE WHEN pa = pb THEN 1 ELSE 0 END)
                    AS BIGINT) AS pred_ties
        FROM prs
    )
    SELECT CAST((SELECT COUNT(*) FROM panel) AS BIGINT) AS n_panel,
           comparable, concordant, pred_ties,
           round((concordant + 0.5 * pred_ties)
                 / CAST(comparable AS DOUBLE), 6) AS c_index
    FROM cnt
    """,
)
def stats_concordance_cindex(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Harrell's concordance index of account balance as a predictor
    of customer spend, on a fixed 200-customer audit panel: over all
    pairs with different outcomes, the fraction where the
    higher-predictor customer also has the higher outcome (predictor
    ties credit 1/2) — the rank-based discrimination measure that
    generalizes AUC to continuous outcomes.

    Scale shape: the quadratic pair stage runs on a KEY-BOUNDED panel
    (first 200 custkeys — constant 19,900 pairs at ANY corpus scale),
    the standard audit-panel bounding for pairwise statistics; the
    panel itself is one left-join aggregation. All pair tests are on
    exact decimals; counts are integers, so the index is exact until
    the final ratio."""
    panel = (
        spark.table("customer")
        .where(F.col("c_custkey") <= 200)
        .join(
            spark.table("orders"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0),
            )
            .cast("decimal(18,2)")
            .alias("outc")
        )
        .select(
            F.col("c_custkey").alias("ck"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("pred"),
            "outc",
        )
    )
    a = panel.select(
        F.col("ck").alias("cka"),
        F.col("pred").alias("pa"),
        F.col("outc").alias("oa"),
    )
    b = panel.select(
        F.col("ck").alias("ckb"),
        F.col("pred").alias("pb"),
        F.col("outc").alias("ob"),
    )
    prs = a.join(
        F.broadcast(b),
        (F.col("cka") < F.col("ckb")) & (F.col("oa") != F.col("ob")),
    )
    n_row = panel.agg(F.count("*").cast("bigint").alias("n_panel"))
    cnt = prs.agg(
        F.count("*").cast("bigint").alias("comparable"),
        F.sum(
            F.when(
                (F.col("pa") - F.col("pb"))
                * (F.col("oa") - F.col("ob"))
                > 0,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("concordant"),
        F.sum(F.when(F.col("pa") == F.col("pb"), 1).otherwise(0))
        .cast("bigint")
        .alias("pred_ties"),
    )
    return cnt.crossJoin(F.broadcast(n_row)).select(
        "n_panel",
        "comparable",
        "concordant",
        "pred_ties",
        F.round(
            (F.col("concordant") + 0.5 * F.col("pred_ties"))
            / F.col("comparable").cast("double"),
            6,
        ).alias("c_index"),
    )
