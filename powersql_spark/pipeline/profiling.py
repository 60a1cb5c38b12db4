"""Join-key skew profiling (driver north-star extension; the reference
has no analog — its surface ends at SQL orchestration,
src/execute.rs:101).

The pre-flight diagnostic for every shuffle decision in this repo: a
shuffled join/agg is only as fast as its hottest key, so before picking
broadcast vs shuffle vs salted (join_skew_salted) you measure the key
distribution. One pass per candidate key — a count-per-key aggregate
(partial map-side, so the exchange moves one row per distinct key) —
then a tiny rollup to the numbers that drive the decision: how many
rows the hottest key owns, how that compares to the typical (median)
key, and the salt factor that would level it.

Exact integer counts and interpolated percentiles over them are
deterministic on both engines, so the whole profile is hash-verified
against the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import DEC, sql_jround
from powersql_spark.registry import query


def _doc_tokens(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")

_KEYS = ("l_partkey", "l_suppkey", "l_orderkey")


def _profile_one(spark: SparkSession, key: str) -> DataFrame:
    counts = (
        spark.table("lineitem")
        .groupBy(key)
        .agg(F.count("*").alias("c"))
    )
    med = F.expr("percentile(c, 0.5)")
    return counts.agg(
        F.lit(key).alias("join_key"),
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        med.alias("p50_key_rows"),
        F.expr("percentile(c, 0.99)").alias("p99_key_rows"),
        F.ceil(F.max("c") / med).cast("bigint").alias("salt_factor"),
        # Empty table -> drop the degenerate all-null profile row, so
        # the output matches the oracle's GROUP BY (zero rows) shape.
    ).where(F.col("n_keys") > 0)


@query(
    "profile_key_skew",
    oracle=f"""
    WITH per_key AS (
        SELECT 'l_partkey' AS join_key, l_partkey AS k, COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'l_suppkey', l_suppkey, COUNT(*)
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'l_orderkey', l_orderkey, COUNT(*)
        FROM lineitem GROUP BY 1, 2
    )
    SELECT join_key,
           COUNT(*) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           MAX(c) AS max_key_rows,
           CAST(quantile_cont(c, 0.5) AS DOUBLE) AS p50_key_rows,
           CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99_key_rows,
           CAST(CEIL(MAX(c) / quantile_cont(c, 0.5)) AS BIGINT)
               AS salt_factor
    FROM per_key
    GROUP BY join_key
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of the three lineitem join keys: rows owned by the
    hottest key vs the median key, and the salt factor
    (``ceil(max/p50)``) that ``join_skew_salted`` would need to level
    the hot partition. This is the measurement step the scale notes
    throughout this repo assume — run it before choosing a join
    strategy, not after a straggler shows up.

    Scale shape: one partial-aggregated count per candidate key (the
    exchange carries one row per distinct key), then a rollup of
    key-count rows that is at most distinct-key-sized. Keys profile
    independently and union at the end — three bounded passes, no
    state on the driver."""
    profiles = [_profile_one(spark, k) for k in _KEYS]
    return reduce(DataFrame.unionAll, profiles)


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@query(
    "profile_table_summary",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM documents
        """
        for c in _PROFILE_COLS
    ),
)
def profile_table_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile of the documents table — row count,
    null count, exact distinct cardinality, lexicographic min/max per
    column: the ANALYZE/deequ-style summary every ingestion gate and
    skew investigation starts from (pairs with ``profile_key_skew``,
    which drills into per-key ownership).

    Scale shape: ONE pass over the table computes every column's
    stats in a single aggregate — Spark plans the 5 DISTINCT
    aggregates via Expand (5x row multiplication before the partial
    aggregate), the exact-cardinality trade; swap COUNT(DISTINCT) for
    approx_count_distinct to make the same plan strictly single-pass
    at 100 TB. The per-column reshape happens on the ONE aggregated
    row (stack — metadata-sized)."""
    d = spark.table("documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_str, max_str)"
        ),
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"
    )


_KS_BKTS = 256  # coarse value bins for the two-phase prefix sum
_KS_C05 = 1.358  # Kolmogorov critical coefficient, alpha = 0.05


@query(
    "stats_ks_two_sample",
    oracle=f"""
    WITH e AS (
        SELECT round(value, 6) AS v,
               CASE event_type WHEN 'click' THEN 1 ELSE 2 END AS g
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ),
    dv AS (
        SELECT v,
               COUNT(*) FILTER (g = 1) AS c1,
               COUNT(*) FILTER (g = 2) AS c2
        FROM e GROUP BY v
    ),
    n AS (
        SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM dv
    ),
    cum AS (
        SELECT v,
               SUM(c1) OVER (ORDER BY v) AS f1,
               SUM(c2) OVER (ORDER BY v) AS f2
        FROM dv
    ),
    top AS (
        SELECT v, abs(f1 * n.n2 - f2 * n.n1) AS dn
        FROM cum, n
        ORDER BY dn DESC, v
        LIMIT 1
    )
    SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
           round(CAST(top.dn AS DOUBLE) / (n.n1 * n.n2), 6) AS ks_d,
           top.v AS ks_at,
           CAST(top.dn AS DOUBLE)
               > {_KS_C05} * sqrt(CAST((n.n1 + n.n2) * n.n1 * n.n2
                                       AS DOUBLE)) AS reject_05
    FROM top, n
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the click and
    purchase value distributions: D = max ECDF gap, the value where it
    occurs, and the alpha=0.05 decision — the distribution-drift
    screen run between corpus versions or data sources (complements
    ts_changepoint_cusum, which watches ONE series over time).

    Scale shape: the ECDF needs a GLOBAL value order, but never a
    global sort: distinct rounded values aggregate first (one
    exchange), then the running counts use the two-phase distributed
    prefix sum (curation_token_budget's pattern) — per-bin subtotals
    over {_KS_BKTS} range bins get prefix offsets in a metadata-sized
    window, broadcast back, and each bin accumulates locally in
    parallel. The gap statistic stays INTEGER (|f1*n2 - f2*n1|) until
    one final division, so D and its argmax (ties -> min value) are
    exactly deterministic cross-engine; the argmax itself is a
    TakeOrderedAndProject, not a sort."""
    e = (
        spark.table("events")
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .select(
            F.round("value", 6).alias("v"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(2)
            .alias("g"),
        )
    )
    dv = e.groupBy("v").agg(
        F.count(F.when(F.col("g") == 1, 1)).alias("c1"),
        F.count(F.when(F.col("g") == 2, 1)).alias("c2"),
    )
    rng = dv.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
    )
    binned = dv.join(F.broadcast(rng)).select(
        "v",
        "c1",
        "c2",
        "n1",
        "n2",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    (F.col("v") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * _KS_BKTS
                ),
                F.lit(_KS_BKTS - 1),
            ),
        )
        .otherwise(0)
        .alias("bkt"),
    )
    from pyspark.sql import Window

    totals = binned.groupBy("bkt").agg(
        F.sum("c1").alias("t1"), F.sum("c2").alias("t2")
    )
    w_off = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bkt",
        F.coalesce(F.sum("t1").over(w_off), F.lit(0)).alias("b1"),
        F.coalesce(F.sum("t2").over(w_off), F.lit(0)).alias("b2"),
    )
    w_local = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gaps = binned.join(F.broadcast(offsets), "bkt").select(
        "v",
        "n1",
        "n2",
        F.abs(
            (F.col("b1") + F.sum("c1").over(w_local)) * F.col("n2")
            - (F.col("b2") + F.sum("c2").over(w_local)) * F.col("n1")
        ).alias("dn"),
    )
    top = gaps.orderBy(F.col("dn").desc(), "v").limit(1)
    return top.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(
            F.col("dn").cast("double") / (F.col("n1") * F.col("n2")), 6
        ).alias("ks_d"),
        F.col("v").alias("ks_at"),
        (
            F.col("dn").cast("double")
            > _KS_C05
            * F.sqrt(
                (
                    (F.col("n1") + F.col("n2"))
                    * F.col("n1")
                    * F.col("n2")
                ).cast("double")
            )
        ).alias("reject_05"),
    )


# Standard chi-square 0.05 critical values by degrees of freedom.
_CHI2_CRIT_05 = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070, 6: 12.592,
    7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307, 11: 19.675,
    12: 21.026, 13: 22.362, 14: 23.685, 15: 24.996, 16: 26.296,
    17: 27.587, 18: 28.869, 19: 30.144, 20: 31.410, 21: 32.671,
    22: 33.924, 23: 35.172, 24: 36.415, 25: 37.652, 26: 38.885,
    27: 40.113, 28: 41.337, 29: 42.557, 30: 43.773,
}

_CHI2_CRIT_CASE = "CASE dof " + " ".join(
    f"WHEN {k} THEN {v}" for k, v in _CHI2_CRIT_05.items()
) + " END"


@query(
    "stats_chi2_independence",
    oracle=f"""
    WITH cont AS (
        SELECT event_type, isodow(ts) AS dow, COUNT(*) AS obs
        FROM events GROUP BY event_type, isodow(ts)
    ),
    rt AS (SELECT event_type, SUM(obs) AS r FROM cont GROUP BY event_type),
    ct AS (SELECT dow, SUM(obs) AS c FROM cont GROUP BY dow),
    n AS (
        SELECT SUM(obs) AS n,
               (COUNT(DISTINCT event_type) - 1)
                   * (COUNT(DISTINCT dow) - 1) AS dof
        FROM cont
    ),
    mm AS (
        SELECT (SELECT MIN(r) FROM rt) AS min_r,
               (SELECT MIN(c) FROM ct) AS min_c
    ),
    terms AS (
        SELECT round(pow(COALESCE(cont.obs, 0)
                         - CAST(rt.r * ct.c AS DOUBLE) / n.n, 2)
                     / (CAST(rt.r * ct.c AS DOUBLE) / n.n), 6) AS t
        FROM rt CROSS JOIN ct
        LEFT JOIN cont USING (event_type, dow)
        CROSS JOIN n
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(n.dof AS BIGINT) AS dof,
           round(CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS chi2,
           CASE WHEN CAST(mm.min_r AS DOUBLE) * mm.min_c / n.n >= 5
                THEN round(CAST(SUM(CAST(t AS DECIMAL(18,6)))
                           AS DOUBLE), 4) > {_CHI2_CRIT_CASE}
           END AS reject_05
    FROM terms, n, mm
    GROUP BY n.n, n.dof, mm.min_r, mm.min_c
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between event type and ISO
    weekday — the categorical drift/association screen next to
    stats_ks_two_sample's continuous one (is behavior day-of-week
    dependent, did a source's category mix shift?). Emits N, degrees
    of freedom, the statistic, and the alpha=0.05 decision against
    the standard critical-value table — withheld (NULL) when the
    smallest expected cell count (min row marginal x min col marginal
    / N) is under 5, the textbook validity bound for the chi-square
    asymptote (VERDICT r8 count tranche).

    Scale shape: ONE exchange collapses the corpus to the (types x 7)
    contingency table; marginals, expected counts, and the statistic
    all live on that metadata-sized table (broadcast joins). The term
    sum runs over the FULL marginal cross product (absent cells
    contribute their (0-E)^2/E = E — ADVICE r9), matching the dof,
    which also counts those cells. Terms round to 6dp and
    decimal-sum, so the 4dp statistic and the threshold comparison
    are deterministic cross-engine."""
    cont = (
        spark.table("events")
        .groupBy(
            "event_type", (F.weekday("ts") + 1).alias("dow")
        )
        .agg(F.count("*").alias("obs"))
    )
    from powersql_spark.catalog import track_persist

    cont = track_persist(cont)
    rt = cont.groupBy("event_type").agg(F.sum("obs").alias("r"))
    ct = cont.groupBy("dow").agg(F.sum("obs").alias("c"))
    # Smallest expected cell count = min row total x min col total / N
    # (covers structurally-zero observed cells too, since expected
    # counts come from the marginals) — the classic Cochran >= 5 rule
    # gating the chi-square asymptote (VERDICT r8 count tranche).
    mins = rt.agg(F.min("r").alias("min_r")).crossJoin(
        ct.agg(F.min("c").alias("min_c"))
    )
    n = cont.agg(
        F.sum("obs").alias("n"),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("dow") - 1)
        ).alias("dof"),
    )
    exp = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    # Structurally-absent (event_type, dow) cells still contribute
    # their (0 - E)^2 / E = E term — the grid is the full marginal
    # cross product with obs COALESCEd to 0 (ADVICE r9: previously
    # only observed cells were summed while dof counted all cells).
    # Both frames are metadata-sized (types x 7), so the cross join
    # is constant work at any corpus scale.
    term = F.round(
        F.pow(F.coalesce(F.col("obs"), F.lit(0)) - exp, 2) / exp, 6
    ).cast(DEC)
    chi2 = F.round(F.sum(term).cast("double"), 4)
    crit = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for kv in _CHI2_CRIT_05.items()
                for x in kv
            ]
        ),
        F.col("dof").cast("int"),
    )
    return (
        rt.crossJoin(F.broadcast(ct))
        .join(F.broadcast(cont), ["event_type", "dow"], "left")
        .join(F.broadcast(n))
        .join(F.broadcast(mins))
        .groupBy("n", "dof", "min_r", "min_c")
        .agg(chi2.alias("chi2"))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("dof").cast("bigint").alias("dof"),
            "chi2",
            # Verdict withheld (NULL) when any expected cell count
            # falls under 5 — below that the asymptotic critical
            # value is not a 5% test (VERDICT r8 count tranche);
            # chi2/dof stay reported for exact-test consumers.
            F.when(
                F.col("min_r").cast("double")
                * F.col("min_c")
                / F.col("n")
                >= 5,
                F.col("chi2") > crit,
            ).alias("reject_05"),
        )
    )


# 3x3 Cramer templates over the normal-equation sums (shared between
# the Spark expression builder and the DuckDB oracle so both engines
# evaluate the IDENTICAL arithmetic tree).
_OLS_DET = (
    "({n} * ({s11} * {s22} - {s12} * {s12})"
    " - {s1} * ({s1} * {s22} - {s12} * {s2})"
    " + {s2} * ({s1} * {s12} - {s11} * {s2}))"
)
_OLS_DET0 = (
    "({sy} * ({s11} * {s22} - {s12} * {s12})"
    " - {s1} * ({s1y} * {s22} - {s12} * {s2y})"
    " + {s2} * ({s1y} * {s12} - {s11} * {s2y}))"
)
_OLS_DET1 = (
    "({n} * ({s1y} * {s22} - {s12} * {s2y})"
    " - {sy} * ({s1} * {s22} - {s12} * {s2})"
    " + {s2} * ({s1} * {s2y} - {s1y} * {s2}))"
)
_OLS_DET2 = (
    "({n} * ({s11} * {s2y} - {s1y} * {s12})"
    " - {s1} * ({s1} * {s2y} - {s1y} * {s2})"
    " + {sy} * ({s1} * {s12} - {s11} * {s2}))"
)
_OLS_NAMES = dict(
    n="n", s1="s1", s2="s2", sy="sy", s11="s11", s12="s12",
    s22="s22", s1y="s1y", s2y="s2y",
)


@query(
    "stats_ols_multi",
    oracle=f"""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
                    AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
                    AS DOUBLE) AS s11,
               CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(28,6)))
                    AS DOUBLE) AS s12,
               CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,6)))
                    AS DOUBLE) AS s22,
               CAST(SUM(CAST(l_quantity * l_extendedprice
                             AS DECIMAL(28,6))) AS DOUBLE) AS s1y,
               CAST(SUM(CAST(l_discount * l_extendedprice
                             AS DECIMAL(28,6))) AS DOUBLE) AS s2y,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(38,6))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round({_OLS_DET0.format(**_OLS_NAMES)}
                 / {_OLS_DET.format(**_OLS_NAMES)}, 6) AS b0,
           round({_OLS_DET1.format(**_OLS_NAMES)}
                 / {_OLS_DET.format(**_OLS_NAMES)}, 6) AS b1,
           round({_OLS_DET2.format(**_OLS_NAMES)}
                 / {_OLS_DET.format(**_OLS_NAMES)}, 6) AS b2,
           round(1.0 - (syy - {_OLS_DET0.format(**_OLS_NAMES)}
                              / {_OLS_DET.format(**_OLS_NAMES)} * sy
                            - {_OLS_DET1.format(**_OLS_NAMES)}
                              / {_OLS_DET.format(**_OLS_NAMES)} * s1y
                            - {_OLS_DET2.format(**_OLS_NAMES)}
                              / {_OLS_DET.format(**_OLS_NAMES)} * s2y)
                       / (syy - sy * sy / n), 4) AS r2
    FROM s
    """,
)
def stats_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS in closed form: price ~ b0 + b1*quantity +
    b2*discount per return flag, solved from the normal equations with
    Cramer's rule over the 3x3 Gram matrix — the step past agg_corr's
    bivariate REGR_SLOPE, and the pattern for ANY fixed-dimension
    linear model at 100 TB: ONE partial-aggregated pass collapses the
    corpus to ten decimal-exact sufficient statistics per group, the
    solve is constant-time arithmetic on the result row (no MLlib, no
    iterations, no second scan). R^2 comes from the same sums.

    Both engines evaluate the IDENTICAL determinant expression tree
    (shared string templates) over decimal-exact sums, so betas agree
    bit-for-bit before the 6dp guard."""
    li = spark.table("lineitem")
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")

    def dsum28(expr, alias):
        return F.sum(expr.cast("decimal(28,6)")).cast("double").alias(alias)

    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum28(q, "s1"),
        dsum28(d, "s2"),
        dsum28(y, "sy"),
        dsum28(q * q, "s11"),
        dsum28(q * d, "s12"),
        dsum28(d * d, "s22"),
        dsum28(q * y, "s1y"),
        dsum28(d * y, "s2y"),
        F.sum((y * y).cast("decimal(38,6)")).cast("double").alias("syy"),
    )
    det = F.expr(_OLS_DET.format(**_OLS_NAMES))
    det0 = F.expr(_OLS_DET0.format(**_OLS_NAMES))
    det1 = F.expr(_OLS_DET1.format(**_OLS_NAMES))
    det2 = F.expr(_OLS_DET2.format(**_OLS_NAMES))
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = (
        F.col("syy")
        - b0 * F.col("sy")
        - b1 * F.col("s1y")
        - b2 * F.col("s2y")
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(1.0 - sse / sst, 4).alias("r2"),
    )


@query(
    "profile_source_overlap",
    oracle=r"""
    WITH vocab AS (
        SELECT DISTINCT source, word FROM (
            SELECT source,
                   unnest(string_split_regex(trim(text), '\s+')) AS word
            FROM documents
        )
    ),
    sizes AS (
        SELECT source, COUNT(*) AS n FROM vocab GROUP BY source
    ),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_common
        FROM vocab a JOIN vocab b
          ON a.word = b.word AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n AS BIGINT) AS vocab_a,
           CAST(sb.n AS BIGINT) AS vocab_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           round(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    ORDER BY source_a, source_b
    """,
)
def profile_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair vocabulary overlap matrix: Jaccard similarity of
    the DISTINCT-word sets of every source pair — the corpus-level
    provenance diagnostic (two 'different' crawls sharing 90%+
    vocabulary are the same feed twice; mix weights built on them
    double-count). Complements the document-level dedup family with
    a between-SOURCE view.

    Scale shape: the corpus collapses once to the (source, word)
    distinct vocabulary (the only corpus-sized shuffle); the pair
    intersection is a word-keyed equi-join of that vocabulary table
    with an ordered source predicate (each unordered pair counted
    once, no self-pairs), and set sizes broadcast back. Jaccard via
    inclusion-exclusion on exact integers."""
    vocab = (
        spark.table("documents")
        .select(
            "source", F.explode(_doc_tokens()).alias("word")
        )
        .distinct()
    )
    from powersql_spark.catalog import track_persist

    vocab = track_persist(vocab)
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a = vocab.select(
        F.col("source").alias("source_a"), F.col("word").alias("wa")
    )
    b = vocab.select(
        F.col("source").alias("source_b"), F.col("word").alias("wb")
    )
    inter = (
        a.join(
            b,
            (F.col("wa") == F.col("wb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("sa_key"), F.col("n").alias("vocab_a")
    )
    sb = sizes.select(
        F.col("source").alias("sb_key"), F.col("n").alias("vocab_b")
    )
    return (
        inter.join(F.broadcast(sa), F.col("source_a") == F.col("sa_key"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("sb_key"))
        .select(
            "source_a",
            "source_b",
            F.col("vocab_a").cast("bigint").alias("vocab_a"),
            F.col("vocab_b").cast("bigint").alias("vocab_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("vocab_a")
                    + F.col("vocab_b")
                    - F.col("n_common")
                ),
                4,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


_PK_CANDIDATES: tuple[tuple[str, ...], ...] = (
    ("o_orderkey",),
    ("o_custkey",),
    ("o_orderdate",),
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderdate"),
    ("o_orderstatus", "o_orderpriority"),
)


@query(
    "profile_pk_candidate",
    oracle=f"""
    WITH tot AS (SELECT COUNT(*) AS n FROM orders),
    cand AS (
        {" UNION ALL ".join(
            f"SELECT '{','.join(cols)}' AS candidate,"
            f" COUNT(*) AS n_distinct FROM ("
            f"SELECT DISTINCT {', '.join(cols)} FROM orders)"
            for cols in _PK_CANDIDATES
        )}
    )
    SELECT cand.candidate,
           CAST(tot.n AS BIGINT) AS n_rows,
           CAST(cand.n_distinct AS BIGINT) AS n_distinct,
           CAST(round(CAST(CAST(CAST(cand.n_distinct AS DOUBLE)
                / tot.n AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
               AS uniqueness,
           cand.n_distinct = tot.n AS is_unique
    FROM cand, tot
    ORDER BY candidate
    """,
)
def profile_pk_candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key candidate discovery over a declared combination
    lattice: for each candidate column set, distinct count vs row
    count and a uniqueness verdict — the data-profiling step that
    finds (or refutes) join keys before anyone writes a MERGE against
    a non-unique key (lineitem's (orderkey, linenumber) is NOT unique
    in this synthetic feed — exactly the class of surprise this
    profile exists to catch; here it confirms o_orderkey and refutes
    the dimension-ish candidates).

    Scale shape: each candidate is one distinct-aggregate collapse
    (map-side partial, shuffle carries distinct keys only); the
    candidates union at metadata size and the total joins back as a
    one-row broadcast. At 100 TB you'd run the same lattice with
    approx_count_distinct first and confirm exact only for
    near-unique candidates."""
    orders = spark.table("orders")
    tot = orders.agg(F.count("*").alias("n"))
    cands = None
    for cols in _PK_CANDIDATES:
        c = (
            orders.select(*cols)
            .distinct()
            .agg(F.count("*").alias("n_distinct"))
            .select(
                F.lit(",".join(cols)).alias("candidate"), "n_distinct"
            )
        )
        cands = c if cands is None else cands.unionAll(c)
    return (
        cands.join(F.broadcast(tot))
        .select(
            "candidate",
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            F.when(
                F.col("n") > 0,
                F.round(
                    F.col("n_distinct").cast("double") / F.col("n"), 6
                ),
            ).alias("uniqueness"),
            (F.col("n_distinct") == F.col("n")).alias("is_unique"),
        )
        .orderBy("candidate")
    )


_SIR_M = 100  # target sample size


@query(
    "sample_importance_systematic",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, n_chars AS weight,
               SUM(n_chars) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents WHERE n_chars > 0
    ),
    tot AS (SELECT MAX(cum) AS W FROM w),
    copies AS (
        SELECT w.doc_id, w.weight,
               (w.cum * {_SIR_M}) // tot.W
               - ((w.cum - w.weight) * {_SIR_M}) // tot.W AS n_copies
        FROM w, tot
    )
    SELECT doc_id, CAST(weight AS BIGINT) AS weight,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM copies WHERE n_copies > 0
    ORDER BY doc_id
    """,
)
def sample_importance_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic importance resampling: draw exactly m=100 slots
    from the corpus with probability proportional to an integer
    quality weight (n_chars standing in for a curation score), by
    counting how many of the m evenly-spaced thresholds land in each
    document's cumulative-weight interval — floor(cum·m/W) -
    floor(prev·m/W), all INTEGER arithmetic, zero variance beyond
    the systematic grid and bit-replayable by the oracle. The
    weighted-mix sampling step that up-samples high-quality documents
    without rand() (sample_weighted_reservoir is the per-key
    streaming cousin; this is the exact-total batch form).

    Scale shape: one window cumsum in a declared total order (at
    100 TB: the classic two-phase prefix sum — per-partition totals
    first, broadcast offsets back, same as pack_sequences); copy
    counts are a map-side integer expression; only sampled docs are
    emitted. Multiplicities sum to exactly m by construction."""
    from pyspark.sql import Window

    w = (
        spark.table("documents")
        .where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.sum("n_chars")
            .over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("cum"),
        )
    )
    from powersql_spark.catalog import track_persist

    w = track_persist(w)
    tot = w.agg(F.max("cum").alias("W"))
    copies = w.join(F.broadcast(tot)).select(
        "doc_id",
        "weight",
        (
            F.expr(f"(cum * {_SIR_M}) div W")
            - F.expr(f"((cum - weight) * {_SIR_M}) div W")
        ).alias("n_copies"),
    )
    return (
        copies.where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            F.col("weight").cast("bigint").alias("weight"),
            F.col("n_copies").cast("bigint").alias("n_copies"),
        )
        .orderBy("doc_id")
    )


_FK_EDGES = (
    # (child table, child key, parent table, parent key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "profile_fk_orphan_report",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}.{ck}' AS fk_edge, '{p}.{pk}' AS parent,
               CAST((SELECT COUNT(*) FROM {c}
                     WHERE {ck} IS NOT NULL) AS BIGINT) AS n_child_rows,
               CAST((SELECT COUNT(*) FROM {c}
                     WHERE {ck} IS NOT NULL
                       AND {ck} NOT IN (SELECT {pk} FROM {p})) AS BIGINT)
                   AS n_orphan_rows,
               CAST((SELECT COUNT(DISTINCT {ck}) FROM {c}
                     WHERE {ck} IS NOT NULL
                       AND {ck} NOT IN (SELECT {pk} FROM {p})) AS BIGINT)
                   AS n_orphan_keys
        FROM (SELECT 1)
        """
        for c, ck, p, pk in _FK_EDGES
    )
    + " ORDER BY fk_edge, parent",
)
def profile_fk_orphan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep over the whole star schema: every
    declared FK edge gets one row with its orphan count (child keys
    with no parent) and distinct orphan keys — the report a warehouse
    runs after each load, generalizing assert_not_exists from one
    edge to the full constellation. NULL child keys pass (SQL FK
    semantics).

    Scale shape: each edge is one LEFT ANTI join on the key — the
    parent side is the (broadcastable) dimension for 6 of 7 edges;
    the lineitem->orders edge shuffles both sides on orderkey, the
    same co-partitioning every fact join already pays. Counts are
    map-side-combinable; the 7-row report unions constant rows."""
    out = []
    for c, ck, p, pk in _FK_EDGES:
        child = spark.table(c).where(F.col(ck).isNotNull())
        parent = spark.table(p).select(F.col(pk).alias("__pk"))
        orphans = child.join(
            parent, child[ck] == F.col("__pk"), "left_anti"
        )
        out.append(
            child.agg(F.count("*").alias("n_child_rows"))
            .join(
                orphans.agg(
                    F.count("*").alias("n_orphan_rows"),
                    F.countDistinct(ck).alias("n_orphan_keys"),
                )
            )
            .select(
                F.lit(f"{c}.{ck}").alias("fk_edge"),
                F.lit(f"{p}.{pk}").alias("parent"),
                F.col("n_child_rows").cast("bigint"),
                F.col("n_orphan_rows").cast("bigint"),
                F.col("n_orphan_keys").cast("bigint"),
            )
        )
    return reduce(DataFrame.unionAll, out).orderBy("fk_edge", "parent")


@query(
    "profile_snapshot_recon",
    oracle="""
    WITH snap_a AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 83 <> 0
    ),
    snap_b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0
                    THEN CAST(CAST(o_totalprice * 1.1 AS DECIMAL(18,2))
                              AS DOUBLE)
                    ELSE o_totalprice END AS o_totalprice,
               CASE WHEN o_orderkey % 101 = 0 THEN '9-RESTATED'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders WHERE o_orderkey % 89 <> 0
    ),
    recon AS (
        SELECT a.o_orderkey AS ka, b.o_orderkey AS kb,
               a.o_totalprice IS DISTINCT FROM b.o_totalprice
                   AS d_price,
               a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
                   AS d_prio
        FROM snap_a a FULL OUTER JOIN snap_b b
          ON a.o_orderkey = b.o_orderkey
    )
    SELECT category, n_rows FROM (
        SELECT 'added' AS category,
               CAST(COUNT(CASE WHEN ka IS NULL THEN 1 END) AS BIGINT)
                   AS n_rows FROM recon
        UNION ALL
        SELECT 'removed',
               CAST(COUNT(CASE WHEN kb IS NULL THEN 1 END) AS BIGINT)
        FROM recon
        UNION ALL
        SELECT 'changed',
               CAST(COUNT(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                    AND (d_price OR d_prio) THEN 1 END) AS BIGINT)
        FROM recon
        UNION ALL
        SELECT 'unchanged',
               CAST(COUNT(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                    AND NOT (d_price OR d_prio) THEN 1 END) AS BIGINT)
        FROM recon
        UNION ALL
        SELECT 'col_o_totalprice',
               CAST(COUNT(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                    AND d_price THEN 1 END) AS BIGINT)
        FROM recon
        UNION ALL
        SELECT 'col_o_orderpriority',
               CAST(COUNT(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                    AND d_prio THEN 1 END) AS BIGINT)
        FROM recon
    )
    ORDER BY category
    """,
)
def profile_snapshot_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot reconciliation: FULL OUTER join two table
    versions on the key and classify every row added / removed /
    changed / unchanged, plus per-column change counts — the recon a
    CDC pipeline runs to certify a replica before cutover (where
    diff_metric_snapshots compares aggregates, this attributes the
    drift to rows and columns). Snapshots are derived
    deterministically from orders: version B restates price (+10% on
    1/97 of keys) and priority (1/101), drops 1/89, and A lacks 1/83
    (B's adds). Null-safe comparison via IS DISTINCT FROM.

    Scale shape: ONE co-partitioned full-outer join on the key (the
    same shuffle a MERGE pays), with every classification and column
    diff folded into map-side-combinable conditional counts — no
    per-column joins, no second pass. The report is 6 constant rows."""
    o = spark.table("orders")
    snap_a = o.where(F.col("o_orderkey") % 83 != 0).select(
        F.col("o_orderkey").alias("ka"),
        F.col("o_totalprice").alias("pa"),
        F.col("o_orderpriority").alias("ra"),
    )
    snap_b = o.where(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("kb"),
        F.when(
            F.col("o_orderkey") % 97 == 0,
            (F.col("o_totalprice") * 1.1)
            .cast("decimal(18,2)")
            .cast("double"),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("pb"),
        F.when(F.col("o_orderkey") % 101 == 0, "9-RESTATED")
        .otherwise(F.col("o_orderpriority"))
        .alias("rb"),
    )
    recon = snap_a.join(
        snap_b, snap_a.ka == snap_b.kb, "full_outer"
    ).select(
        "ka",
        "kb",
        (~F.col("pa").eqNullSafe(F.col("pb"))).alias("d_price"),
        (~F.col("ra").eqNullSafe(F.col("rb"))).alias("d_prio"),
    )
    both = F.col("ka").isNotNull() & F.col("kb").isNotNull()
    agg = recon.agg(
        F.count(F.when(F.col("ka").isNull(), 1)).alias("added"),
        F.count(F.when(F.col("kb").isNull(), 1)).alias("removed"),
        F.count(
            F.when(both & (F.col("d_price") | F.col("d_prio")), 1)
        ).alias("changed"),
        F.count(
            F.when(both & ~(F.col("d_price") | F.col("d_prio")), 1)
        ).alias("unchanged"),
        F.count(F.when(both & F.col("d_price"), 1)).alias(
            "col_o_totalprice"
        ),
        F.count(F.when(both & F.col("d_prio"), 1)).alias(
            "col_o_orderpriority"
        ),
    )
    cats = (
        "added",
        "removed",
        "changed",
        "unchanged",
        "col_o_totalprice",
        "col_o_orderpriority",
    )
    unp = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("category"),
                        F.col(c).cast("bigint").alias("n_rows"),
                    )
                    for c in cats
                ]
            )
        ).alias("r")
    )
    return unp.select("r.category", "r.n_rows").orderBy("category")


_CRAMER_PAIRS = (
    ("orders", "o_orderstatus", "o_orderpriority"),
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("customer", "c_mktsegment", "c_nationkey"),
)

_CRAMER_CLASS = (
    "CASE WHEN v < 0.1 THEN 'negligible' WHEN v < 0.3 THEN 'weak' "
    "WHEN v < 0.5 THEN 'moderate' ELSE 'strong' END"
)


def _cramer_sql(tbl: str, a: str, b: str) -> str:
    return f"""
    SELECT '{tbl}.{a} x {b}' AS pair,
           CAST(n AS BIGINT) AS n,
           CAST(dof AS BIGINT) AS dof,
           round(chi2, 4) AS chi2,
           round(v, 4) AS cramers_v,
           {_CRAMER_CLASS} AS strength
    FROM (
        SELECT n, dof, chi2,
               CASE WHEN n * mindim > 0
                    THEN sqrt(chi2 / (n * mindim)) ELSE 0 END AS v
        FROM (
            WITH cont AS (
                SELECT {a} AS ra, {b} AS cb, COUNT(*) AS obs
                FROM {tbl} GROUP BY {a}, {b}
            ),
            rt AS (SELECT ra, SUM(obs) AS r FROM cont GROUP BY ra),
            ct AS (SELECT cb, SUM(obs) AS c FROM cont GROUP BY cb),
            nn AS (
                SELECT SUM(obs) AS n,
                       (COUNT(DISTINCT ra) - 1)
                           * (COUNT(DISTINCT cb) - 1) AS dof,
                       LEAST(COUNT(DISTINCT ra) - 1,
                             COUNT(DISTINCT cb) - 1) AS mindim
                FROM cont
            ),
            terms AS (
                SELECT round(
                    pow(COALESCE(cont.obs, 0)
                        - CAST(rt.r * ct.c AS DOUBLE) / nn.n, 2)
                    / (CAST(rt.r * ct.c AS DOUBLE) / nn.n), 6) AS t
                FROM rt CROSS JOIN ct
                LEFT JOIN cont USING (ra, cb)
                CROSS JOIN nn
            )
            SELECT nn.n, nn.dof, nn.mindim,
                   CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE) AS chi2
            FROM terms, nn GROUP BY nn.n, nn.dof, nn.mindim
        )
    )
    """


@query(
    "stats_cramers_v",
    oracle=" UNION ALL ".join(
        _cramer_sql(t, a, b) for t, a, b in _CRAMER_PAIRS
    )
    + " ORDER BY pair",
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect-size sweep over three categorical pairs
    (order status x priority, return flag x line status, market
    segment x nation): chi-squared normalized to [0, 1] by
    n*min(r-1, c-1), making association strength COMPARABLE across
    tables of different sizes and shapes — the screen that tells you
    which categorical dependencies are real structure vs big-n
    significance noise, with the conventional strength labels.

    Scale shape: per pair, ONE exchange collapses the table to its
    contingency cells; marginals/expected/statistic live on that
    metadata-sized table. The three reports union constant rows.
    Terms round 6dp and decimal-sum, and the sum covers the FULL
    marginal cross product (absent cells add their E term) exactly as
    stats_chi2_independence (shared discipline, ADVICE r9)."""
    out = []
    for tbl, a, b in _CRAMER_PAIRS:
        cont = (
            spark.table(tbl)
            .groupBy(F.col(a).alias("ra"), F.col(b).alias("cb"))
            .agg(F.count("*").alias("obs"))
        )
        from powersql_spark.catalog import track_persist

        cont = track_persist(cont)
        rt = cont.groupBy("ra").agg(F.sum("obs").alias("r"))
        ct = cont.groupBy("cb").agg(F.sum("obs").alias("c"))
        nn = cont.agg(
            F.sum("obs").alias("n"),
            (
                (F.countDistinct("ra") - 1) * (F.countDistinct("cb") - 1)
            ).alias("dof"),
            F.least(
                F.countDistinct("ra") - 1, F.countDistinct("cb") - 1
            ).alias("mindim"),
        )
        exp = F.col("r") * F.col("c") / F.col("n")
        # Full marginal cross product: structurally-absent cells
        # contribute (0-E)^2/E = E, matching the dof that counts them
        # (ADVICE r9, shared discipline with stats_chi2_independence).
        # rt x ct is category-cardinality-sized — constant work.
        terms = (
            rt.crossJoin(F.broadcast(ct))
            .join(F.broadcast(cont), ["ra", "cb"], "left")
            .join(F.broadcast(nn))
            .select(
                F.round(
                    F.pow(
                        F.coalesce(F.col("obs"), F.lit(0))
                        - exp.cast("double"),
                        2,
                    )
                    / exp.cast("double"),
                    6,
                ).alias("t"),
                "n",
                "dof",
                "mindim",
            )
        )
        stats = terms.groupBy("n", "dof", "mindim").agg(
            F.sum(F.col("t").cast("decimal(18,6)"))
            .cast("double")
            .alias("chi2")
        )
        v = F.when(
            F.col("n") * F.col("mindim") > 0,
            F.sqrt(F.col("chi2") / (F.col("n") * F.col("mindim"))),
        ).otherwise(0.0)
        out.append(
            stats.select(
                F.lit(f"{tbl}.{a} x {b}").alias("pair"),
                F.col("n").cast("bigint").alias("n"),
                F.col("dof").cast("bigint").alias("dof"),
                F.round("chi2", 4).alias("chi2"),
                F.round(v, 4).alias("cramers_v"),
                F.when(v < 0.1, "negligible")
                .when(v < 0.3, "weak")
                .when(v < 0.5, "moderate")
                .otherwise("strong")
                .alias("strength"),
            )
        )
    return reduce(DataFrame.unionAll, out).orderBy("pair")


# Benford expected first-digit probabilities log10(1 + 1/d), baked as
# 10dp literals so neither engine ever calls log10 (no libm risk).
_BENFORD_P = (
    0.3010299957, 0.1760912591, 0.1249387366, 0.0969100130,
    0.0791812460, 0.0669467896, 0.0579919470, 0.0511525224,
    0.0457574906,
)

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_P, start=1)
) + " END"


@query(
    "profile_benford_law",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER)
                   AS first_digit
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT first_digit, COUNT(*) AS n_obs,
               SUM(COUNT(*)) OVER () AS n_total
        FROM digits GROUP BY first_digit
    )
    SELECT first_digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(ROUND(n_obs / CAST(n_total AS DOUBLE), 6) AS DOUBLE)
               AS observed_p,
           CAST({_BENFORD_CASE} AS DOUBLE) AS expected_p,
           CAST(ROUND(abs(n_obs / CAST(n_total AS DOUBLE)
                          - {_BENFORD_CASE}), 6) AS DOUBLE)
               AS abs_deviation,
           CAST(ROUND(pow(n_obs - n_total * {_BENFORD_CASE}, 2)
                      / (n_total * {_BENFORD_CASE}), 4) AS DOUBLE)
               AS chi2_term
    FROM obs
    ORDER BY first_digit
    """,
)
def profile_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen on order totals: observed vs
    expected log10(1 + 1/d) digit distribution with per-digit
    deviation and chi-squared terms — the classic fabricated-data /
    unit-mix-error detector for financial columns (TPC-H's uniform
    price generator deliberately FAILS Benford, which the semantics
    test asserts — a synthetic-data tell, exactly what the screen is
    for). Expected probabilities are baked as 10dp literals so no
    engine ever calls log10.

    Scale shape: the digit extract is map-side string arithmetic; the
    whole profile is one 9-group aggregation with a window total —
    constant-sized after the collapse."""
    digits = (
        spark.table("orders")
        .where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice"))
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("first_digit")
        )
    )
    obs = (
        digits.groupBy("first_digit")
        .agg(F.count("*").alias("n_obs"))
        .withColumn("n_total", F.sum("n_obs").over(Window.partitionBy()))
    )
    expected = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_P]), F.col("first_digit")
    )
    return obs.select(
        "first_digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(F.col("n_obs") / F.col("n_total").cast("double"), 6).alias(
            "observed_p"
        ),
        expected.alias("expected_p"),
        F.round(
            F.abs(
                F.col("n_obs") / F.col("n_total").cast("double") - expected
            ),
            6,
        ).alias("abs_deviation"),
        F.round(
            F.pow(F.col("n_obs") - F.col("n_total") * expected, 2)
            / (F.col("n_total") * expected),
            4,
        ).alias("chi2_term"),
    ).orderBy("first_digit")


# (table, determinant, dependent) functional-dependency candidates:
# two true FDs (primary keys) and four expected violations, so the
# report exercises both verdicts.
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("part", "p_brand", "p_type"),
)


def _fd_cte(tbl: str, det: str, dep: str) -> str:
    return f"""
    SELECT '{tbl}' AS table_name, '{det}' AS determinant,
           '{dep}' AS dependent,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COALESCE(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_violating,
           {sql_jround(
               "COALESCE((SUM(tot) - SUM(max_cnt)) * 1e0 / SUM(tot),"
               " 0e0)", 6)}
               AS g3_error,
           COALESCE(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END), 0) = 0
               AS fd_holds
    FROM (
        SELECT {det}, MAX(cnt) AS max_cnt, SUM(cnt) AS tot,
               COUNT(*) AS n_dep
        FROM (SELECT {det}, {dep}, COUNT(*) AS cnt
              FROM {tbl} GROUP BY {det}, {dep}) cells
        GROUP BY {det}
    ) per_det
    """


@query(
    "profile_functional_dependency",
    oracle=f"""
    {" UNION ALL ".join(_fd_cte(t, a, b) for t, a, b in _FD_CANDIDATES)}
    ORDER BY table_name, determinant, dependent
    """,
)
def profile_functional_dependency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency discovery over a candidate list: for each
    (determinant -> dependent) pair, count determinant groups, groups
    that violate the FD (more than one dependent value), and the g3
    error — the minimum fraction of rows to delete for the FD to hold
    (Kivinen & Mannila's measure; the standard approximate-FD score in
    data profilers like Metanome). Two candidates are true key
    dependencies and four are expected violations, so both verdicts are
    exercised. The schema-discovery complement of profile_pk_candidate
    (which tests uniqueness, i.e. X -> everything).

    Scale shape: one column-pruned scan per candidate collapsing to
    (det, dep) cells with map-side partials, then a determinant-level
    rollup and a 1-row summary — the exchange carries distinct pairs,
    never rows. Candidates are independent plans unioned at the
    6-row report level."""
    frames = []
    for tbl, det, dep in _FD_CANDIDATES:
        cells = (
            spark.table(tbl)
            .groupBy(det, dep)
            .agg(F.count("*").alias("cnt"))
        )
        per_det = cells.groupBy(det).agg(
            F.max("cnt").alias("max_cnt"),
            F.sum("cnt").alias("tot"),
            F.count("*").alias("n_dep"),
        )
        # COALESCE makes the empty-table report vacuously clean:
        # 0 groups, 0 violations, 0 error, FD holds.
        viol = F.coalesce(
            F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0)), F.lit(0)
        )
        frames.append(
            per_det.agg(
                F.count("*").cast("bigint").alias("n_groups"),
                viol.cast("bigint").alias("n_violating"),
                F.round(
                    F.coalesce(
                        (F.sum("tot") - F.sum("max_cnt"))
                        * 1e0
                        / F.sum("tot"),
                        F.lit(0.0),
                    ),
                    6,
                ).alias("g3_error"),
                (viol == 0).alias("fd_holds"),
            ).select(
                F.lit(tbl).alias("table_name"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_groups",
                "n_violating",
                "g3_error",
                "fd_holds",
            )
        )
    out = reduce(DataFrame.unionAll, frames)
    return out.orderBy("table_name", "determinant", "dependent")


# ---------------------------------------------------------------------------
# Round-11 profiling widening: value-shape patterns, FK fanout
# classification, and string type inference.
# ---------------------------------------------------------------------------

_PATTERN_COLS = (
    ("customer", "c_name"),
    ("part", "p_brand"),
    ("orders", "o_orderpriority"),
    ("nation", "n_name"),
)


def _shape_sql(expr: str) -> str:
    """Collapsed character-class signature: runs of uppercase -> A,
    lowercase -> a, digits -> 9; everything else literal."""
    # DuckDB regexp_replace is first-match-only without the 'g' flag
    # (Spark's replaces all matches by default).
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '[A-Z]+', 'A', 'g'), '[a-z]+', 'a', 'g'),"
        " '[0-9]+', '9', 'g')"
    )


def _shape_col(c):
    out = F.regexp_replace(c, "[A-Z]+", "A")
    out = F.regexp_replace(out, "[a-z]+", "a")
    return F.regexp_replace(out, "[0-9]+", "9")


@query(
    "profile_value_pattern",
    oracle=f"""
    WITH vals AS (
        {" UNION ALL ".join(
            f"SELECT '{t}.{c}' AS col_name, {_shape_sql(c)} AS pattern"
            f" FROM {t}"
            for t, c in _PATTERN_COLS
        )}
    ),
    counts AS (
        SELECT col_name, pattern,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM vals GROUP BY col_name, pattern
    ),
    ranked AS (
        SELECT col_name, pattern, n_rows,
               SUM(n_rows) OVER (PARTITION BY col_name) AS col_total,
               ROW_NUMBER() OVER (PARTITION BY col_name
                   ORDER BY n_rows DESC, pattern) AS rn
        FROM counts
    )
    SELECT col_name, pattern, n_rows,
           {sql_jround("n_rows / CAST(col_total AS DOUBLE)", 6)}
               AS coverage
    FROM ranked WHERE rn <= 5
    ORDER BY col_name, n_rows DESC, pattern
    """,
)
def profile_value_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-shape pattern profile (the Potter's Wheel structure
    discovery): map every value of the audited string columns to its
    collapsed character-class signature (runs of upper -> A, lower ->
    a, digits -> 9; punctuation literal — 'Customer#000000001' ->
    'A#9'), then report each column's top-5 signatures with coverage
    — the screen that finds mixed formats, stray whitespace, and
    rogue encodings in columns that LOOK uniform.

    Scale shape: the signature map is per-row regexp work fused into
    each scan; patterns collapse to a tiny (column x signature)
    table; ranking and coverage ride that metadata. Column list is a
    curated audit panel (config, not discovery — the same panel on
    both engines)."""
    frames = []
    for t, c in _PATTERN_COLS:
        frames.append(
            spark.table(t).select(
                F.lit(f"{t}.{c}").alias("col_name"),
                _shape_col(F.col(c)).alias("pattern"),
            )
        )
    vals = frames[0]
    for fr in frames[1:]:
        vals = vals.unionAll(fr)
    counts = vals.groupBy("col_name", "pattern").agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    wtot = Window.partitionBy("col_name")
    wrank = Window.partitionBy("col_name").orderBy(
        F.col("n_rows").desc(), "pattern"
    )
    ranked = counts.select(
        "col_name",
        "pattern",
        "n_rows",
        F.sum("n_rows").over(wtot).alias("col_total"),
        F.row_number().over(wrank).alias("rn"),
    )
    return (
        ranked.where(F.col("rn") <= 5)
        .select(
            "col_name",
            "pattern",
            "n_rows",
            F.round(
                F.col("n_rows") / F.col("col_total").cast("double"), 6
            ).alias("coverage"),
        )
        .orderBy("col_name", F.col("n_rows").desc(), "pattern")
    )


_FK_PAIRS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)


def _fk_pair_sql(ct: str, ck: str, pt: str, pk: str) -> str:
    return f"""
    SELECT '{ct}.{ck} -> {pt}.{pk}' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {pt}) AS n_parents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {ct}) AS n_children,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT DISTINCT {ck} FROM {ct})) AS parents_referenced,
           (SELECT CAST(MAX(c) AS BIGINT) FROM
               (SELECT COUNT(*) AS c FROM {ct} GROUP BY {ck}))
               AS max_fanout,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {ct}
            WHERE {ck} NOT IN (SELECT {pk} FROM {pt}))
               AS orphan_children
    """


@query(
    "profile_join_cardinality",
    oracle=f"""
    WITH pairs AS (
        {" UNION ALL ".join(_fk_pair_sql(*p) for p in _FK_PAIRS)}
    )
    SELECT fk, n_parents, n_children, parents_referenced,
           max_fanout, orphan_children,
           {sql_jround(
               "n_children / CAST(parents_referenced AS DOUBLE)", 4)}
               AS avg_fanout,
           CASE WHEN max_fanout = 1 THEN '1:1' ELSE '1:N' END
               AS cardinality_class,
           parents_referenced < n_parents AS has_childless_parents
    FROM pairs
    ORDER BY fk
    """,
)
def profile_join_cardinality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-cardinality profile of the star schema's five FK
    relationships: parent/child counts, referenced-parent count,
    max/avg fanout, orphan children, and the inferred 1:1 vs 1:N
    class — the facts a query planner's estimates, a dimensional
    model review, and every JOIN-explosion postmortem start from
    (an unexpected N on the 'one' side is how fan-out duplicates
    revenue). Complements profile_fk_orphan_report (which lists the
    orphans; this classifies the relationship).

    Scale shape: each relationship costs one child-side key
    aggregation plus a broadcast existence probe against the parent
    key set — five independent constant-output subplans unioned; no
    cross-relationship shuffle."""
    # Fully lazy: every per-relationship scalar (parent count, orphan
    # count) rides the plan as a broadcast 1-row aggregate — no eager
    # .count() jobs at frame-construction time (construction stays
    # metadata-only; the driver's collect() runs the five subplans).
    rows = []
    for ct, ck, pt, pk in _FK_PAIRS:
        child = spark.table(ct)
        parent = spark.table(pt)
        fan = child.groupBy(ck).agg(F.count("*").alias("c"))
        npar = parent.agg(
            F.count("*").cast("bigint").alias("n_parents")
        )
        orph = (
            child.select(F.col(ck))
            .join(
                F.broadcast(parent.select(F.col(pk).alias(ck))),
                ck,
                "left_anti",
            )
            .agg(F.count("*").cast("bigint").alias("orphan_children"))
        )
        rows.append(
            fan.agg(
                F.lit(f"{ct}.{ck} -> {pt}.{pk}").alias("fk"),
                F.sum("c").cast("bigint").alias("n_children"),
                F.count("*").cast("bigint").alias(
                    "parents_referenced"
                ),
                F.max("c").cast("bigint").alias("max_fanout"),
            )
            .crossJoin(F.broadcast(npar))
            .crossJoin(F.broadcast(orph))
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.select(
        "fk",
        "n_parents",
        "n_children",
        "parents_referenced",
        "max_fanout",
        "orphan_children",
        F.round(
            F.col("n_children")
            / F.col("parents_referenced").cast("double"),
            4,
        ).alias("avg_fanout"),
        F.when(F.col("max_fanout") == 1, "1:1")
        .otherwise("1:N")
        .alias("cardinality_class"),
        (F.col("parents_referenced") < F.col("n_parents")).alias(
            "has_childless_parents"
        ),
    ).orderBy("fk")


_TYPE_COLS = (
    ("orders", "o_orderpriority"),
    ("part", "p_brand"),
    ("documents", "lang"),
    ("events", "props"),
    ("part", "p_size"),
)


@query(
    "profile_type_inference",
    oracle=f"""
    WITH vals AS (
        {" UNION ALL ".join(
            f"SELECT '{t}.{c}' AS col_name,"
            f" CAST({c} AS VARCHAR) AS v FROM {t}"
            for t, c in _TYPE_COLS
        )}
    ),
    probes AS (
        SELECT col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
               CAST(COUNT(CASE WHEN TRY_CAST(v AS BIGINT) IS NOT NULL
                    THEN 1 END) AS BIGINT) AS n_int,
               CAST(COUNT(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
                    THEN 1 END) AS BIGINT) AS n_float,
               CAST(COUNT(CASE WHEN TRY_CAST(v AS DATE) IS NOT NULL
                    THEN 1 END) AS BIGINT) AS n_date,
               CAST(COUNT(CASE WHEN lower(v) IN ('true', 'false')
                    THEN 1 END) AS BIGINT) AS n_bool
        FROM vals GROUP BY col_name
    )
    SELECT col_name, n_rows, n_distinct, n_int, n_float, n_date,
           n_bool,
           CASE
               WHEN n_bool = n_rows THEN 'boolean'
               WHEN n_int = n_rows THEN 'integer'
               WHEN n_float = n_rows THEN 'double'
               WHEN n_date = n_rows THEN 'date'
               ELSE 'string'
           END AS inferred_type
    FROM probes
    ORDER BY col_name
    """,
)
def profile_type_inference(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """String type inference over an audited column panel: for each
    column, the fraction of values parseable as integer / double /
    date / boolean (via TRY_CAST probes) and the inferred tightest
    type when 100% parse — the schema-sniffing pass behind every
    CSV/JSON ingestion ("this VARCHAR is really an INT") and schema
    drift audit. Columns that are numeric-typed upstream (p_size)
    round-trip through VARCHAR to prove the probe.

    Scale shape: probes are per-row TRY_CASTs fused into each scan,
    collapsed to one row per column — conditional-count sufficient
    statistics, no second pass, no driver-side sampling."""
    frames = []
    for t, c in _TYPE_COLS:
        frames.append(
            spark.table(t).select(
                F.lit(f"{t}.{c}").alias("col_name"),
                F.col(c).cast("string").alias("v"),
            )
        )
    vals = frames[0]
    for fr in frames[1:]:
        vals = vals.unionAll(fr)
    probes = vals.groupBy("col_name").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count_distinct("v").cast("bigint").alias("n_distinct"),
        F.count(F.col("v").try_cast("bigint"))
        .cast("bigint")
        .alias("n_int"),
        F.count(F.col("v").try_cast("double"))
        .cast("bigint")
        .alias("n_float"),
        F.count(F.col("v").try_cast("date"))
        .cast("bigint")
        .alias("n_date"),
        F.count(
            F.when(F.lower(F.col("v")).isin("true", "false"), 1)
        )
        .cast("bigint")
        .alias("n_bool"),
    )
    return probes.select(
        "col_name",
        "n_rows",
        "n_distinct",
        "n_int",
        "n_float",
        "n_date",
        "n_bool",
        F.when(F.col("n_bool") == F.col("n_rows"), "boolean")
        .when(F.col("n_int") == F.col("n_rows"), "integer")
        .when(F.col("n_float") == F.col("n_rows"), "double")
        .when(F.col("n_date") == F.col("n_rows"), "date")
        .otherwise("string")
        .alias("inferred_type"),
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Round-12 widening: mutual information between two categorical
# columns.
# ---------------------------------------------------------------------------


@query(
    "profile_mutual_information",
    oracle=f"""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY lang, source
    ),
    m AS (
        SELECT lang, source, c,
               SUM(c) OVER () AS n,
               SUM(c) OVER (PARTITION BY lang) AS c_lang,
               SUM(c) OVER (PARTITION BY source) AS c_src
        FROM cells
    ),
    mi AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE) * n
                        / (1e0 * c_lang * c_src)), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) / MAX(n) AS mi_nats
        FROM m
    ),
    hh AS (
        SELECT
            (SELECT -CAST(SUM(cl * CAST(round(ln(CAST(cl AS DOUBLE)
                     / nn), 8) AS DECIMAL(38,8))) AS DOUBLE) / MAX(nn)
             FROM (SELECT CAST(SUM(c) AS BIGINT) AS cl,
                          (SELECT SUM(c) FROM cells) AS nn
                   FROM cells GROUP BY lang)) AS h_lang,
            (SELECT -CAST(SUM(cs * CAST(round(ln(CAST(cs AS DOUBLE)
                     / nn), 8) AS DECIMAL(38,8))) AS DOUBLE) / MAX(nn)
             FROM (SELECT CAST(SUM(c) AS BIGINT) AS cs,
                          (SELECT SUM(c) FROM cells) AS nn
                   FROM cells GROUP BY source)) AS h_src
    )
    SELECT mi.n, mi.n_cells,
           {sql_jround("mi.mi_nats", 6)} AS mi_nats,
           {sql_jround("hh.h_lang", 6)} AS h_lang,
           {sql_jround("hh.h_src", 6)} AS h_source,
           {sql_jround(
               "mi.mi_nats / sqrt(hh.h_lang * hh.h_src)", 6)}
               AS nmi_sqrt
    FROM mi, hh
    WHERE hh.h_lang > 0 AND hh.h_src > 0
    """,
)
def profile_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual information between the lang and source columns of the
    documents table (with both marginal entropies and the
    sqrt-normalized NMI): MI = sum p(x,y) ln(p(x,y)/(p(x)p(y))) over
    OBSERVED cells — the dependence profile a partitioning/
    denormalization decision reads (high NMI: the columns are
    redundant, one predicts the other; near 0: independent, both
    needed as partition keys). Completes the profiling family's
    pairwise view (functional dependency: exact determinism;
    chi2/Cramer's V: significance/strength; this: the
    information-theoretic quantity in nats).

    Absent-cell note: a (lang, source) combination with zero count
    contributes exactly 0 MI mass (c ln(...) -> 0 as c -> 0), and the
    marginals are sums of observed counts, so restricting to observed
    cells is exact — the same argument as text_keyness_gtest's
    audit, recorded here per the r10/r11 absent-cell sweep.

    Scale shape: one scan collapses to the (lang x source)
    contingency cells (metadata-sized); marginals are windows over
    that grid; ln terms 8dp-rounded, integer-weighted, decimal-
    summed."""
    cells = spark.table("documents").groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("c")
    )
    from powersql_spark.catalog import track_persist

    cells = track_persist(cells)
    w_all = Window.partitionBy(F.lit(1))
    w_lang = Window.partitionBy("lang")
    w_src = Window.partitionBy("source")
    m = cells.select(
        "c",
        F.sum("c").over(w_all).alias("n"),
        F.sum("c").over(w_lang).alias("c_lang"),
        F.sum("c").over(w_src).alias("c_src"),
    )
    mi = m.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_cells"),
        (
            F.sum(
                F.col("c")
                * F.round(
                    F.log(
                        F.col("c").cast("double")
                        * F.col("n")
                        / (1.0 * F.col("c_lang") * F.col("c_src"))
                    ),
                    8,
                ).cast("decimal(38,8)")
            ).cast("double")
            / F.max("n")
        ).alias("mi_nats"),
    )

    def marg_entropy(key: str, alias: str) -> DataFrame:
        marg = cells.groupBy(key).agg(
            F.sum("c").cast("bigint").alias("ck")
        )
        tot = marg.agg(F.sum("ck").alias("nn"))
        return (
            marg.crossJoin(F.broadcast(tot))
            .agg(
                (
                    -F.sum(
                        F.col("ck")
                        * F.round(
                            F.log(
                                F.col("ck").cast("double")
                                / F.col("nn")
                            ),
                            8,
                        ).cast("decimal(38,8)")
                    ).cast("double")
                    / F.max("nn")
                ).alias(alias)
            )
        )

    h_lang = marg_entropy("lang", "h_lang")
    h_src = marg_entropy("source", "h_source")
    out = mi.crossJoin(F.broadcast(h_lang)).crossJoin(
        F.broadcast(h_src)
    )
    return (
        out.where((F.col("h_lang") > 0) & (F.col("h_source") > 0))
        .select(
            "n",
            "n_cells",
            F.round(F.col("mi_nats"), 6).alias("mi_nats"),
            F.round(F.col("h_lang"), 6).alias("h_lang"),
            F.round(F.col("h_source"), 6).alias("h_source"),
            F.round(
                F.col("mi_nats")
                / F.sqrt(F.col("h_lang") * F.col("h_source")),
                6,
            ).alias("nmi_sqrt"),
        )
    )
