"""Model / retrieval evaluation metrics over pipeline outputs.

A training-data pipeline doesn't end at curation: every classifier it
trains (quality gates, language ID) and every ranker it serves (BM25,
ANN) needs its accuracy measured INSIDE the engine, at data scale —
AUC-ROC for binary gates, calibration/ECE for score trustworthiness,
pass@k for generation eval, NDCG@k for ranking eval, Bradley-Terry for
arena-style pairwise preference. The reference (PowerSQL) delegates all
compute to a warehouse and has none of this surface; these keys follow
the repo's standard: built-in-function plans (no Python in the hot
path), decimal-summed statistics so results are partition-order
independent, and a DuckDB oracle twin per key.

The evaluated score/label pairs are the engine's own heuristics
(text_quality_score's components vs the `lang` gold column), so every
metric here is measuring a real upstream operator, not synthetic noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.catalog import track_checkpoint, values_df
from powersql_spark.operators.common import sql_jround
from powersql_spark.registry import query

# Same stopword marker set as pipeline/text.py — the score under
# evaluation IS text_quality_score's continuous component.
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

# Shared score CTE: continuous "English-ness/quality" score per doc =
# stopword ratio + length credit. Both engines evaluate the identical
# expression tree (ratio of ints + int/2000), so the doubles are
# bit-equal.
_SCORE_SQL = rf"""
    SELECT doc_id, source, lang,
           CAST(len(list_filter(t, x -> x IN ({_SW_SQL}))) AS DOUBLE)
               / len(t)
             + CAST(len(t) AS DOUBLE) / 2000.0 AS s
    FROM (SELECT doc_id, source, lang,
                 string_split_regex(trim(text), '\s+') AS t
          FROM documents)
"""


def _scored(spark: SparkSession) -> DataFrame:
    t = F.split(F.trim(F.col("text")), r"\s+")
    d = spark.table("documents").select(
        "doc_id", "source", "lang", t.alias("t")
    )
    n_tok = F.size("t")
    sw = F.size(F.filter("t", lambda x: x.isin(*_STOPWORDS)))
    s = sw.cast("double") / n_tok + n_tok.cast("double") / 2000.0
    return d.select("doc_id", "source", "lang", s.alias("s"))


@query(
    "eval_auc_roc",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ranked AS (
        SELECT source, lang = 'en' AS pos,
               CAST(RANK() OVER (PARTITION BY source ORDER BY s)
                    AS DOUBLE)
                 + (COUNT(*) OVER (PARTITION BY source, s) - 1) / 2.0
                 AS r_avg
        FROM scored
    ),
    st AS (
        SELECT source,
               CAST(COUNT(CASE WHEN pos THEN 1 END) AS BIGINT) AS n_pos,
               CAST(COUNT(CASE WHEN NOT pos THEN 1 END) AS BIGINT)
                   AS n_neg,
               SUM(CASE WHEN pos THEN r_avg END) AS r_pos
        FROM ranked GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           {sql_jround(
               "(r_pos - n_pos * (n_pos + 1) / 2.0)"
               " / (n_pos * n_neg)", 6)} AS auc
    FROM st WHERE n_pos > 0 AND n_neg > 0
    """,
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC per source for the heuristic quality score predicting
    the `lang = 'en'` gold label, via the rank-sum identity
    AUC = (R+ - n+(n+1)/2) / (n+ n-) with tie-corrected average ranks
    (rank + (ties-1)/2). This is the standard classifier-gate readout
    a curation pipeline runs before trusting a learned filter.

    Scale shape: one scan; the rank needs a sort per source partition
    (exact AUC is order-statistics — unavoidable), but the state after
    ranking collapses to three numbers per source. Average ranks are
    half-integers, so their sum is exact and partition-order
    independent with no decimal cast needed."""
    scored = _scored(spark)
    w_rank = Window.partitionBy("source").orderBy("s")
    w_tie = Window.partitionBy("source", "s")
    ranked = scored.select(
        "source",
        (F.col("lang") == "en").alias("pos"),
        (
            F.rank().over(w_rank).cast("double")
            + (F.count("*").over(w_tie) - 1) / 2.0
        ).alias("r_avg"),
    )
    st = (
        ranked.groupBy("source")
        .agg(
            F.count(F.when(F.col("pos"), 1))
            .cast("bigint")
            .alias("n_pos"),
            F.count(F.when(~F.col("pos"), 1))
            .cast("bigint")
            .alias("n_neg"),
            F.sum(F.when(F.col("pos"), F.col("r_avg"))).alias("r_pos"),
        )
        .where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    )
    auc = (
        F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    return st.select(
        "source", "n_pos", "n_neg", F.round(auc, 6).alias("auc")
    )


@query(
    "eval_calibration_ece",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    binned AS (
        SELECT least(CAST(floor(least(1.0, greatest(0.0, s)) * 10)
                          AS INTEGER), 9) AS bin,
               least(1.0, greatest(0.0, s)) AS p,
               lang = 'en' AS pos
        FROM scored
    ),
    per_bin AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               {sql_jround(
                   "CAST(SUM(CAST(round(p, 8) AS DECIMAL(38,8)))"
                   " AS DOUBLE) / COUNT(*)", 6)} AS avg_pred,
               {sql_jround(
                   "CAST(COUNT(CASE WHEN pos THEN 1 END) AS DOUBLE)"
                   " / COUNT(*)", 6)} AS pos_rate
        FROM binned GROUP BY bin
    ),
    gapped AS (
        SELECT bin, n_docs, avg_pred, pos_rate,
               {sql_jround("abs(avg_pred - pos_rate)", 6)} AS abs_gap
        FROM per_bin
    )
    SELECT bin, n_docs, avg_pred, pos_rate, abs_gap,
           {sql_jround(
               "CAST(SUM(CAST(round(n_docs * abs_gap, 6)"
               " AS DECIMAL(28,6))) OVER () AS DOUBLE)"
               " / SUM(n_docs) OVER ()", 6)} AS ece
    FROM gapped
    ORDER BY bin
    """,
)
def eval_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) table + expected calibration error
    for the quality score read as P(lang = 'en'): clip to [0,1], ten
    fixed-width bins, per-bin mean prediction vs empirical positive
    rate, ECE = sum_b (n_b/N) |avg_pred_b - pos_rate_b|. The
    trust-but-verify readout before a score threshold becomes a
    keep/drop gate.

    Scale shape: one scan collapsing to <= 10 bin rows (map-side
    combine); predictions decimal-summed at 8dp so the bin means are
    partition-order independent; the ECE window rides the 10-row
    result."""
    scored = _scored(spark)
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    binned = scored.select(
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("bin"),
        p.alias("p"),
        (F.col("lang") == "en").alias("pos"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.round(F.col("p"), 8).cast("decimal(38,8)")).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("avg_pred"),
        F.round(
            F.count(F.when(F.col("pos"), 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("pos_rate"),
    )
    gapped = per_bin.withColumn(
        "abs_gap",
        F.round(F.abs(F.col("avg_pred") - F.col("pos_rate")), 6),
    )
    w_all = Window.partitionBy(F.lit(1))
    ece = F.round(
        F.sum(
            F.round(F.col("n_docs") * F.col("abs_gap"), 6).cast(
                "decimal(28,6)"
            )
        )
        .over(w_all)
        .cast("double")
        / F.sum("n_docs").over(w_all),
        6,
    )
    return gapped.select(
        "bin", "n_docs", "avg_pred", "pos_rate", "abs_gap",
        ece.alias("ece"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# pass@k — the unbiased estimator from the Codex paper (Chen et al.
# 2021, "Evaluating Large Language Models Trained on Code", eq. 1):
# pass@k = 1 - C(n-c, k)/C(n, k), computed as a product of k ratios so
# nothing overflows at any n. Here each user's non-null events are the
# task's n trials and "success" is value > 150 — the same shape an
# eval harness produces (task_id, trial, passed).
# ---------------------------------------------------------------------------

_PASS_K = 5


def _pass_at_k_sql(n: str, c: str, k: int) -> str:
    """1 - prod_{i<k} (n-c-i)/(n-i) as one shared fp tree; 1.0 when
    fewer than k failures exist (the estimator's boundary case)."""
    # 1e0 (not 1.0): Spark parses a bare 1.0 literal as DECIMAL and
    # the whole product silently becomes decimal division with its
    # own scale/rounding; 1e0 is a DOUBLE literal in both engines.
    prod = " * ".join(
        f"(({n} - {c} - {i}) * 1e0 / ({n} - {i}))" for i in range(k)
    )
    return (
        f"CASE WHEN {n} - {c} < {k} THEN 1e0 ELSE 1e0 - {prod} END"
    )


@query(
    "eval_pass_at_k",
    oracle=f"""
    WITH trials AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN value > 150 THEN 1 END) AS BIGINT)
                   AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id HAVING COUNT(*) >= {_PASS_K}
    )
    SELECT user_id, n AS n_trials, c AS n_success,
           {sql_jround("c * 1e0 / n", 6)} AS pass_at_1,
           {sql_jround(_pass_at_k_sql('n', 'c', _PASS_K), 6)}
               AS pass_at_5
    FROM trials
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k (k=5) per task with the unbiased combinatorial
    estimator 1 - C(n-c,k)/C(n,k), evaluated as a product of k
    ratio terms — overflow-free at any trial count, identical fp
    tree in both engines. pass@1 = c/n is the same estimator at
    k=1. The generation-eval readout: given n sampled attempts per
    task and c successes, the probability at least one of k draws
    passes.

    Scale shape: one scan, one groupBy(user_id) with map-side
    partial counts; the estimator is per-row arithmetic on the
    (n, c) aggregate — no joins, no windows."""
    trials = (
        spark.table("events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count(F.when(F.col("value") > 150, 1))
            .cast("bigint")
            .alias("c"),
        )
        .where(F.col("n") >= _PASS_K)
    )
    return trials.select(
        "user_id",
        F.col("n").alias("n_trials"),
        F.col("c").alias("n_success"),
        F.round(F.col("c") * 1.0 / F.col("n"), 6).alias("pass_at_1"),
        F.round(
            F.expr(_pass_at_k_sql("n", "c", _PASS_K)), 6
        ).alias("pass_at_5"),
    )


# ---------------------------------------------------------------------------
# NDCG@10 — ranking-quality evaluation: does ordering documents by the
# heuristic quality score surface the graded-relevant ones first?
# Graded relevance from the gold lang column (en=2, de=1, else 0);
# gains (2^rel - 1) discounted by log2(rank+1), normalized by the
# ideal ordering's DCG.
# ---------------------------------------------------------------------------

_NDCG_K = 10
# (2^rel - 1) with rel graded from lang: en=2 -> 3, de=1 -> 1, else 0.
_GAIN_SQL = (
    "CASE WHEN lang = 'en' THEN 3.0"
    " WHEN lang = 'de' THEN 1.0 ELSE 0.0 END"
)


@query(
    "eval_ndcg_at_k",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ranked AS (
        SELECT source,
               {_GAIN_SQL} AS gain,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY s DESC, doc_id)
                   AS rk,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {_GAIN_SQL} DESC, doc_id) AS ideal_rk
        FROM scored
    ),
    terms AS (
        SELECT source,
               CASE WHEN rk <= {_NDCG_K} THEN CAST(round(
                   gain / (ln(rk + 1) / ln(2)), 8) AS DECIMAL(28,8))
                   ELSE CAST(0 AS DECIMAL(28,8)) END AS dcg_term,
               CASE WHEN ideal_rk <= {_NDCG_K} THEN CAST(round(
                   gain / (ln(ideal_rk + 1) / ln(2)), 8)
                   AS DECIMAL(28,8))
                   ELSE CAST(0 AS DECIMAL(28,8)) END AS idcg_term
        FROM ranked
    ),
    agg AS (
        SELECT source,
               CAST(SUM(dcg_term) AS DOUBLE) AS dcg,
               CAST(SUM(idcg_term) AS DOUBLE) AS idcg
        FROM terms GROUP BY source
    )
    SELECT source,
           {sql_jround("dcg", 6)} AS dcg_at_10,
           {sql_jround("idcg", 6)} AS idcg_at_10,
           {sql_jround("dcg / idcg", 6)} AS ndcg_at_10
    FROM agg WHERE idcg > 0
    """,
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per source for the heuristic-quality ranking against
    lang-graded relevance (en=2, de=1, else 0): DCG sums the top-10
    discounted gains in score order (tie-break doc_id), IDCG the same
    in ideal (relevance-sorted) order, NDCG = DCG/IDCG. The standard
    ranking-eval readout for any retrieval stack.

    Scale shape: one scan; two rank windows over the same per-source
    sort exchange; terms are 8dp-decimal so the two 10-term sums are
    partition-order independent; output is one row per source."""
    scored = _scored(spark)
    gain = F.expr(_GAIN_SQL)
    w_rank = Window.partitionBy("source").orderBy(
        F.col("s").desc(), "doc_id"
    )
    w_ideal = Window.partitionBy("source").orderBy(
        gain.desc(), "doc_id"
    )
    log2 = lambda c: F.log(c + 1) / F.log(F.lit(2.0))  # noqa: E731
    ranked = scored.select(
        "source",
        gain.alias("gain"),
        F.row_number().over(w_rank).alias("rk"),
        F.row_number().over(w_ideal).alias("ideal_rk"),
    )
    zero = F.lit(0).cast("decimal(28,8)")
    terms = ranked.select(
        "source",
        F.when(
            F.col("rk") <= _NDCG_K,
            F.round(F.col("gain") / log2(F.col("rk")), 8).cast(
                "decimal(28,8)"
            ),
        )
        .otherwise(zero)
        .alias("dcg_term"),
        F.when(
            F.col("ideal_rk") <= _NDCG_K,
            F.round(
                F.col("gain") / log2(F.col("ideal_rk")), 8
            ).cast("decimal(28,8)"),
        )
        .otherwise(zero)
        .alias("idcg_term"),
    )
    agg = terms.groupBy("source").agg(
        F.sum("dcg_term").cast("double").alias("dcg"),
        F.sum("idcg_term").cast("double").alias("idcg"),
    )
    return agg.where(F.col("idcg") > 0).select(
        "source",
        F.round("dcg", 6).alias("dcg_at_10"),
        F.round("idcg", 6).alias("idcg_at_10"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
    )


# ---------------------------------------------------------------------------
# Bradley-Terry pairwise-preference ratings (arena-style eval).
#
# Battles: each day every pair of event types present that day
# "fights"; the higher decimal-exact daily revenue wins (ties skipped).
# Ratings via Hunter (2004) MM updates, 3 iterations unrolled:
#   p_i <- W_i / sum_{j != i} n_ij / (p_i + p_j),   then rescale so
# sum(p) = m. Iteration boundaries are rounded to 10dp decimals so
# both engines carry bit-identical state into the next step.
# ---------------------------------------------------------------------------

_BT_ITERS = 3


def _bt_iter_sql(prev: str, nxt: str) -> str:
    """One MM iteration as SQL CTEs: denom per player from the
    directed pair table, unnormalized update, rescale to sum = m."""
    return f"""
    {nxt}_raw AS (
        SELECT d.i AS event_type,
               ANY_VALUE(w.wins) * 1e0 / CAST(SUM(CAST(round(
                   d.n_ij * 1e0 / (pi.p + pj.p), 10)
                   AS DECIMAL(38,10))) AS DOUBLE) AS p
        FROM directed d
        JOIN {prev} pi ON pi.event_type = d.i
        JOIN {prev} pj ON pj.event_type = d.j
        JOIN wintot w ON w.event_type = d.i
        GROUP BY d.i
    ),
    {nxt} AS (
        SELECT event_type,
               CAST(round(p * (SELECT COUNT(*) * 1e0 FROM {nxt}_raw)
                   / (SELECT CAST(SUM(CAST(round(p, 10)
                       AS DECIMAL(38,10))) AS DOUBLE) FROM {nxt}_raw),
                   10) AS DOUBLE) AS p
        FROM {nxt}_raw
    )"""


@query(
    "eval_bradley_terry",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    battles AS (
        SELECT a.event_type AS i, b.event_type AS j,
               CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END AS i_wins
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.event_type < b.event_type
        WHERE a.rev <> b.rev
    ),
    pairs AS (
        SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_ij,
               CAST(SUM(i_wins) AS BIGINT) AS w_i
        FROM battles GROUP BY i, j
    ),
    directed AS (
        SELECT i, j, n_ij, w_i AS wins FROM pairs
        UNION ALL
        SELECT j AS i, i AS j, n_ij, n_ij - w_i AS wins FROM pairs
    ),
    wintot AS (
        SELECT i AS event_type, CAST(SUM(wins) AS BIGINT) AS wins,
               CAST(SUM(n_ij) AS BIGINT) AS n_battles
        FROM directed GROUP BY i
    ),
    p0 AS (SELECT event_type, 1e0 AS p FROM wintot),
    {_bt_iter_sql('p0', 'p1')},
    {_bt_iter_sql('p1', 'p2')},
    {_bt_iter_sql('p2', 'p3')}
    SELECT w.event_type, w.n_battles, w.wins,
           {sql_jround("p3.p", 6)} AS bt_rating,
           CAST(RANK() OVER (ORDER BY round(p3.p, 6) DESC,
                             w.event_type) AS INTEGER) AS bt_rank
    FROM wintot w JOIN p3 ON p3.event_type = w.event_type
    ORDER BY bt_rank
    """,
)
def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry ratings over daily pairwise "battles" between
    event types (higher decimal-exact daily revenue wins), fit with
    three unrolled MM iterations (Hunter 2004):
    p_i <- W_i / sum_j n_ij/(p_i+p_j), rescaled to sum(p) = m each
    step. The arena-style preference readout (model A vs model B
    win-rates -> a single strength scale) expressed as pure
    DataFrame ops — the iteration state is m rows, so each step is
    a broadcast join against the 20-row directed pair table.

    Scale shape: one scan collapses events to the (type, day) daily
    table; the battle self-join is day-equi (never cartesian across
    days); everything after is constant-size (m players). 10dp
    decimal rounding at every iteration boundary keeps both engines'
    state bit-identical."""
    e = spark.table("events").where(F.col("value").isNotNull())
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    a, b = daily.alias("a"), daily.alias("b")
    battles = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .where(F.col("a.rev") != F.col("b.rev"))
        .select(
            F.col("a.event_type").alias("i"),
            F.col("b.event_type").alias("j"),
            F.when(F.col("a.rev") > F.col("b.rev"), 1)
            .otherwise(0)
            .alias("i_wins"),
        )
    )
    pairs = battles.groupBy("i", "j").agg(
        F.count("*").cast("bigint").alias("n_ij"),
        F.sum("i_wins").cast("bigint").alias("w_i"),
    )
    directed = pairs.select(
        "i", "j", "n_ij", F.col("w_i").alias("wins")
    ).unionAll(
        pairs.select(
            F.col("j").alias("i"),
            F.col("i").alias("j"),
            "n_ij",
            (F.col("n_ij") - F.col("w_i")).alias("wins"),
        )
    )
    from powersql_spark.catalog import track_persist

    directed = track_persist(directed)
    wintot = directed.groupBy(F.col("i").alias("event_type")).agg(
        F.sum("wins").cast("bigint").alias("wins"),
        F.sum("n_ij").cast("bigint").alias("n_battles"),
    )
    wintot = track_persist(wintot)

    p = wintot.select("event_type", F.lit(1.0).alias("p"))
    w_all = Window.partitionBy(F.lit(1))
    for _ in range(_BT_ITERS):
        pi = p.select(
            F.col("event_type").alias("i"), F.col("p").alias("p_i")
        )
        pj = p.select(
            F.col("event_type").alias("j"), F.col("p").alias("p_j")
        )
        raw = (
            directed.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .join(
                F.broadcast(
                    wintot.select(
                        F.col("event_type").alias("i"),
                        F.col("wins").alias("w_tot"),
                    )
                ),
                "i",
            )
            .groupBy(F.col("i").alias("event_type"))
            .agg(
                (
                    F.first("w_tot") * 1.0
                    / F.sum(
                        F.round(
                            F.col("n_ij")
                            * 1.0
                            / (F.col("p_i") + F.col("p_j")),
                            10,
                        ).cast("decimal(38,10)")
                    ).cast("double")
                ).alias("p")
            )
        )
        m = F.count("*").over(w_all) * 1.0
        tot = (
            F.sum(F.round(F.col("p"), 10).cast("decimal(38,10)"))
            .over(w_all)
            .cast("double")
        )
        # localCheckpoint the 5-row rating vector per MM round (the
        # kcore/HITS discipline): each round reads `p` twice (p_i and
        # p_j sides), so the analyzed plan doubles per round without
        # truncation — pure Catalyst overhead on constant-size state.
        p = (
            raw.select(
                "event_type",
                F.round(F.col("p") * m / tot, 10)
                .cast("double")
                .alias("p"),
            )
            .coalesce(1)
            .transform(track_checkpoint)
        )
    return (
        wintot.join(p, "event_type")
        .select(
            "event_type",
            "n_battles",
            "wins",
            F.round(F.col("p"), 6).alias("bt_rating"),
            F.rank()
            .over(
                Window.orderBy(
                    F.round(F.col("p"), 6).desc(), "event_type"
                )
            )
            .cast("int")
            .alias("bt_rank"),
        )
        .orderBy("bt_rank")
    )


# ---------------------------------------------------------------------------
# McNemar's test — paired comparison of two binary gates on the SAME
# documents (did switching filters actually change outcomes, or just
# shuffle them?). Only the discordant cells matter:
# chi2 = (|b - c| - 1)^2 / (b + c) with continuity correction.
# ---------------------------------------------------------------------------

_MCNEMAR_CRIT = 3.841  # chi-square(1 df), 5%


@query(
    "eval_mcnemar_paired",
    oracle=rf"""
    WITH gates AS (
        SELECT source,
               len(t) BETWEEN 10 AND 1000 AS gate_a,
               CAST(len(list_filter(t, x -> x IN ({_SW_SQL})))
                    AS DOUBLE) / len(t) BETWEEN 0.01 AND 0.5 AS gate_b
        FROM (SELECT source,
                     string_split_regex(trim(text), '\s+') AS t
              FROM documents)
    ),
    cells AS (
        SELECT source,
               CAST(COUNT(CASE WHEN gate_a AND gate_b THEN 1 END)
                    AS BIGINT) AS both_pass,
               CAST(COUNT(CASE WHEN gate_a AND NOT gate_b THEN 1 END)
                    AS BIGINT) AS only_a,
               CAST(COUNT(CASE WHEN NOT gate_a AND gate_b THEN 1 END)
                    AS BIGINT) AS only_b,
               CAST(COUNT(CASE WHEN NOT gate_a AND NOT gate_b THEN 1
                    END) AS BIGINT) AS neither
        FROM gates GROUP BY source
    )
    SELECT source, both_pass, only_a, only_b, neither,
           {sql_jround(
               "CASE WHEN only_a + only_b = 0 THEN 0e0 ELSE"
               " (abs(only_a - only_b) - 1)"
               " * (abs(only_a - only_b) - 1) * 1e0"
               " / (only_a + only_b) END", 6)} AS chi2_cc,
           CASE WHEN only_a + only_b = 0 THEN FALSE
                WHEN only_a + only_b >= 25 THEN
               (abs(only_a - only_b) - 1)
               * (abs(only_a - only_b) - 1) * 1e0
               / (only_a + only_b) > {_MCNEMAR_CRIT}
           END AS gates_differ_05
    FROM cells
    """,
)
def eval_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test per source between the two components of
    the heuristic quality gate (length-in-range vs stopword-ratio-in-
    range) applied to the SAME documents: the 2x2 concordance table,
    continuity-corrected chi2 = (|b-c|-1)^2/(b+c) over the discordant
    cells only, and the 5% verdict. The right test when comparing two
    filters/classifiers on one corpus — a two-proportion z-test would
    ignore the pairing. Small-sample boundary (r10 sweep, closing the
    ADVICE-r6 anti-conservatism note as a guard instead of a doc): at
    sub-25 discordant counts the chi2(1) asymptote is exact-binomial
    territory (e.g. b=5,c=0: chi2_cc 3.2 vs exact p 0.0625), so the
    verdict is WITHHELD (NULL) for 1-24 discordants, chi2_cc stays
    reported, and zero discordants remains the deterministic FALSE —
    mirrored in the oracle and pinned by the replay test.

    Scale shape: one scan, map-only gate evaluation, four conditional
    counts per source with map-side partials; the statistic is
    per-row arithmetic on the aggregate."""
    t = F.split(F.trim(F.col("text")), r"\s+")
    d = spark.table("documents").select("source", t.alias("t"))
    n_tok = F.size("t")
    sw_ratio = (
        F.size(F.filter("t", lambda x: x.isin(*_STOPWORDS))).cast(
            "double"
        )
        / n_tok
    )
    gates = d.select(
        "source",
        n_tok.between(10, 1000).alias("gate_a"),
        sw_ratio.between(0.01, 0.5).alias("gate_b"),
    )
    a, b = F.col("gate_a"), F.col("gate_b")
    cells = gates.groupBy("source").agg(
        F.count(F.when(a & b, 1)).cast("bigint").alias("both_pass"),
        F.count(F.when(a & ~b, 1)).cast("bigint").alias("only_a"),
        F.count(F.when(~a & b, 1)).cast("bigint").alias("only_b"),
        F.count(F.when(~a & ~b, 1)).cast("bigint").alias("neither"),
    )
    disc = F.col("only_a") + F.col("only_b")
    dev = F.abs(F.col("only_a") - F.col("only_b")) - 1
    chi2 = F.when(disc == 0, F.lit(0.0)).otherwise(
        dev * dev * 1.0 / disc
    )
    return cells.select(
        "source",
        "both_pass",
        "only_a",
        "only_b",
        "neither",
        F.round(chi2, 6).alias("chi2_cc"),
        # Zero discordant pairs is a DETERMINISTIC no-difference
        # (FALSE, not withheld); 1-24 discordants sit below the
        # chi2(1) continuity-corrected asymptote's >= 25 rule (exact
        # binomial territory), so the verdict is withheld (NULL)
        # there while chi2_cc stays reported — asymptotic-verdict
        # discipline, oracle-mirrored.
        F.when(disc == 0, F.lit(False))
        .when(disc >= 25, dev * dev * 1.0 / disc > _MCNEMAR_CRIT)
        .alias("gates_differ_05"),
    )


# ---------------------------------------------------------------------------
# Multiclass classification report — per-class precision / recall / F1
# plus support for the marker-word language-ID heuristic (the same rule
# as text_lang_id) against the gold lang column. The per-class view a
# confusion matrix summarizes; macro rows live in eval_cohens_kappa's
# agreement readout.
# ---------------------------------------------------------------------------

_LANG_PRED_SQL = """
    CASE
        WHEN (' ' || text || ' ') LIKE '% the %'
          OR (' ' || text || ' ') LIKE '% and %' THEN 'en'
        WHEN (' ' || text || ' ') LIKE '% der %'
          OR (' ' || text || ' ') LIKE '% und %' THEN 'de'
        WHEN (' ' || text || ' ') LIKE '% el %'
          OR (' ' || text || ' ') LIKE '% los %' THEN 'es'
        ELSE 'unk'
    END
"""


@query(
    "eval_classification_report",
    oracle=f"""
    WITH preds AS (
        SELECT lang AS gold, {_LANG_PRED_SQL} AS pred FROM documents
    ),
    classes AS (
        SELECT gold AS cls FROM preds
        UNION SELECT pred AS cls FROM preds
    ),
    counts AS (
        SELECT c.cls,
               CAST(COUNT(CASE WHEN p.gold = c.cls
                               AND p.pred = c.cls THEN 1 END)
                    AS BIGINT) AS tp,
               CAST(COUNT(CASE WHEN p.pred = c.cls
                               AND p.gold <> c.cls THEN 1 END)
                    AS BIGINT) AS fp,
               CAST(COUNT(CASE WHEN p.gold = c.cls
                               AND p.pred <> c.cls THEN 1 END)
                    AS BIGINT) AS fn,
               CAST(COUNT(CASE WHEN p.gold = c.cls THEN 1 END)
                    AS BIGINT) AS support
        FROM classes c CROSS JOIN preds p
        GROUP BY c.cls
    )
    SELECT cls, tp, fp, fn, support,
           {sql_jround(
               "CASE WHEN tp + fp = 0 THEN 0e0"
               " ELSE tp * 1e0 / (tp + fp) END", 6)} AS precision_,
           {sql_jround(
               "CASE WHEN tp + fn = 0 THEN 0e0"
               " ELSE tp * 1e0 / (tp + fn) END", 6)} AS recall_,
           {sql_jround(
               "CASE WHEN 2 * tp + fp + fn = 0 THEN 0e0"
               " ELSE 2 * tp * 1e0 / (2 * tp + fp + fn) END", 6)}
               AS f1
    FROM counts
    ORDER BY cls
    """,
)
def eval_classification_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-class precision / recall / F1 / support for the
    marker-word language-ID heuristic (text_lang_id's exact rule)
    against the gold lang column — the confusion-matrix summary every
    classifier gate ships with. F1 uses the fused 2tp/(2tp+fp+fn)
    form so zero-division cases collapse to one guard.

    Scale shape: predictions are map-only; the per-class tp/fp/fn
    collapse is one aggregation of the (gold, pred) count table —
    implemented as a groupBy over the tiny distinct-class frame
    joined against (gold, pred) cells, never a row-level cross
    join.

    Absent-cell audit (VERDICT r10/r11 sweep): no asymmetry is
    possible here — the class spine is gold UNION pred (every class
    that exists in the data appears), and each class's tp/fp/fn/support
    sums range over ALL observed (gold, pred) cells with conditional
    weights, so an absent cell is a true zero count, not a dropped
    grid entry; the zero-division guards handle the degenerate
    columns."""
    preds = spark.table("documents").select(
        F.col("lang").alias("gold"),
        F.expr(_LANG_PRED_SQL).alias("pred"),
    )
    from powersql_spark.catalog import track_persist

    # (gold, pred) confusion cells: the only corpus-sized pass.
    cells = track_persist(
        preds.groupBy("gold", "pred").agg(
            F.count("*").cast("bigint").alias("n")
        )
    )
    classes = (
        cells.select(F.col("gold").alias("cls"))
        .union(cells.select(F.col("pred").alias("cls")))
        .distinct()
    )
    joined = classes.join(F.broadcast(cells), how="cross")
    counts = joined.groupBy("cls").agg(
        F.sum(
            F.when(
                (F.col("gold") == F.col("cls"))
                & (F.col("pred") == F.col("cls")),
                F.col("n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.when(
                (F.col("pred") == F.col("cls"))
                & (F.col("gold") != F.col("cls")),
                F.col("n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fp"),
        F.sum(
            F.when(
                (F.col("gold") == F.col("cls"))
                & (F.col("pred") != F.col("cls")),
                F.col("n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fn"),
        F.sum(
            F.when(F.col("gold") == F.col("cls"), F.col("n")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("support"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return counts.select(
        "cls",
        "tp",
        "fp",
        "fn",
        "support",
        F.round(
            F.when(tp + fp == 0, F.lit(0.0)).otherwise(
                tp * 1.0 / (tp + fp)
            ),
            6,
        ).alias("precision_"),
        F.round(
            F.when(tp + fn == 0, F.lit(0.0)).otherwise(
                tp * 1.0 / (tp + fn)
            ),
            6,
        ).alias("recall_"),
        F.round(
            F.when(2 * tp + fp + fn == 0, F.lit(0.0)).otherwise(
                2 * tp * 1.0 / (2 * tp + fp + fn)
            ),
            6,
        ).alias("f1"),
    ).orderBy("cls")


# ---------------------------------------------------------------------------
# Cohen's kappa — chance-corrected agreement between two binary raters
# (the two quality-gate components on the same documents):
# kappa = (p_o - p_e) / (1 - p_e).
# ---------------------------------------------------------------------------


@query(
    "eval_cohens_kappa",
    oracle=rf"""
    WITH gates AS (
        SELECT source,
               len(t) BETWEEN 10 AND 1000 AS gate_a,
               CAST(len(list_filter(t, x -> x IN ({_SW_SQL})))
                    AS DOUBLE) / len(t) BETWEEN 0.01 AND 0.5 AS gate_b
        FROM (SELECT source,
                     string_split_regex(trim(text), '\s+') AS t
              FROM documents)
    ),
    cells AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN gate_a AND gate_b THEN 1 END)
                    AS BIGINT) AS yy,
               CAST(COUNT(CASE WHEN NOT gate_a AND NOT gate_b THEN 1
                    END) AS BIGINT) AS nn,
               CAST(COUNT(CASE WHEN gate_a THEN 1 END) AS BIGINT)
                   AS a_yes,
               CAST(COUNT(CASE WHEN gate_b THEN 1 END) AS BIGINT)
                   AS b_yes
        FROM gates GROUP BY source
    ),
    probs AS (
        SELECT source, n,
               (yy + nn) * 1e0 / n AS p_o,
               (a_yes * 1e0 / n) * (b_yes * 1e0 / n)
                 + ((n - a_yes) * 1e0 / n) * ((n - b_yes) * 1e0 / n)
                 AS p_e
        FROM cells
    )
    SELECT source, n AS n_docs,
           {sql_jround("p_o", 6)} AS observed_agreement,
           {sql_jround("p_e", 6)} AS expected_agreement,
           {sql_jround(
               "CASE WHEN p_e >= 1e0 THEN 1e0"
               " ELSE (p_o - p_e) / (1e0 - p_e) END", 6)} AS kappa
    FROM probs
    """,
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per source between the two quality-gate
    components rating the same documents: observed agreement
    corrected for the agreement two independent raters with these
    marginals would reach by chance, kappa = (p_o - p_e)/(1 - p_e)
    (1 when p_e saturates). The agreement readout that tells you
    whether two filters are redundant (high kappa) or complementary
    (low kappa) — McNemar (eval_mcnemar_paired) answers the sibling
    question of whether their RATES differ.

    Scale shape: identical to McNemar — one scan, map-only gates,
    five conditional counts per source with map-side partials.
    Absent-cell audit: all agreement cells are conditional counts
    over every document of the source (zeros are genuine), and the
    p_e = 1 saturation is explicitly guarded on both engines."""
    t = F.split(F.trim(F.col("text")), r"\s+")
    d = spark.table("documents").select("source", t.alias("t"))
    n_tok = F.size("t")
    sw_ratio = (
        F.size(F.filter("t", lambda x: x.isin(*_STOPWORDS))).cast(
            "double"
        )
        / n_tok
    )
    gates = d.select(
        "source",
        n_tok.between(10, 1000).alias("gate_a"),
        sw_ratio.between(0.01, 0.5).alias("gate_b"),
    )
    a, b = F.col("gate_a"), F.col("gate_b")
    cells = gates.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count(F.when(a & b, 1)).cast("bigint").alias("yy"),
        F.count(F.when(~a & ~b, 1)).cast("bigint").alias("nn"),
        F.count(F.when(a, 1)).cast("bigint").alias("a_yes"),
        F.count(F.when(b, 1)).cast("bigint").alias("b_yes"),
    )
    n = F.col("n")
    p_o = (F.col("yy") + F.col("nn")) * 1.0 / n
    p_e = (F.col("a_yes") * 1.0 / n) * (F.col("b_yes") * 1.0 / n) + (
        (n - F.col("a_yes")) * 1.0 / n
    ) * ((n - F.col("b_yes")) * 1.0 / n)
    kappa = F.when(p_e >= 1.0, F.lit(1.0)).otherwise(
        (p_o - p_e) / (1.0 - p_e)
    )
    return cells.select(
        "source",
        n.alias("n_docs"),
        F.round(p_o, 6).alias("observed_agreement"),
        F.round(p_e, 6).alias("expected_agreement"),
        F.round(kappa, 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# MRR@k — reciprocal rank of the first relevant document in each
# source's score ranking, plus the global mean. The retrieval
# counterpart of NDCG when only the FIRST hit matters (navigational
# queries, dedup-lookup, agent tool-selection).
# ---------------------------------------------------------------------------

_MRR_K = 10


@query(
    "eval_mrr_at_k",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ranked AS (
        SELECT source, lang = 'en' AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY s DESC, doc_id) AS rk
        FROM scored
    ),
    firsts AS (
        SELECT source,
               min(CASE WHEN rel THEN rk END) AS first_rel
        FROM ranked GROUP BY source
    ),
    rr AS (
        SELECT source,
               CAST(first_rel AS BIGINT) AS first_relevant_rank,
               CASE WHEN first_rel IS NULL
                         OR first_rel > {_MRR_K} THEN 0e0
                    ELSE 1e0 / first_rel END AS rr_at_k
        FROM firsts
    )
    SELECT source, first_relevant_rank,
           {sql_jround("rr_at_k", 6)} AS rr_at_10,
           {sql_jround(
               "CAST(SUM(CAST(round(rr_at_k, 8) AS DECIMAL(38,8)))"
               " OVER () AS DOUBLE) / COUNT(*) OVER ()", 6)}
               AS mrr_at_10
    FROM rr
    """,
)
def eval_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 treating each source as a query over its own documents
    ranked by the heuristic score (tie-break doc_id) with `lang='en'`
    as relevance: per source the rank of the first relevant document
    and its reciprocal (0 when none lands in the top 10), plus the
    corpus-level mean repeated on every row. The first-hit retrieval
    readout beside NDCG's graded view.

    Scale shape: the MIN(first relevant rank) collapses each source
    to one row right after the rank window — the corpus never leaves
    the per-source sort exchange; the global mean is a window over
    the source-count-sized result."""
    scored = _scored(spark)
    w_rank = Window.partitionBy("source").orderBy(
        F.col("s").desc(), "doc_id"
    )
    ranked = scored.select(
        "source",
        (F.col("lang") == "en").alias("rel"),
        F.row_number().over(w_rank).alias("rk"),
    )
    firsts = ranked.groupBy("source").agg(
        F.min(F.when(F.col("rel"), F.col("rk"))).alias("first_rel")
    )
    rr = firsts.select(
        "source",
        F.col("first_rel").cast("bigint").alias(
            "first_relevant_rank"
        ),
        F.when(
            F.col("first_rel").isNull()
            | (F.col("first_rel") > _MRR_K),
            F.lit(0.0),
        )
        .otherwise(1.0 / F.col("first_rel"))
        .alias("rr_at_k"),
    )
    w_all = Window.partitionBy(F.lit(1))
    return rr.select(
        "source",
        "first_relevant_rank",
        F.round(F.col("rr_at_k"), 6).alias("rr_at_10"),
        F.round(
            F.sum(F.round(F.col("rr_at_k"), 8).cast("decimal(38,8)"))
            .over(w_all)
            .cast("double")
            / F.count("*").over(w_all),
            6,
        ).alias("mrr_at_10"),
    )


# ---------------------------------------------------------------------------
# Brier score with the Murphy (1973) three-way decomposition over the
# same 10 calibration bins as eval_calibration_ece:
#   Brier = reliability - resolution + uncertainty
# computed bin-exactly (within-bin prediction variance is charged to
# the reliability-vs-Brier residual term we emit for reconciliation).
# ---------------------------------------------------------------------------


@query(
    "eval_brier_decomposition",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    binned AS (
        SELECT least(CAST(floor(least(1.0, greatest(0.0, s)) * 10)
                          AS INTEGER), 9) AS bin,
               least(1.0, greatest(0.0, s)) AS p,
               CASE WHEN lang = 'en' THEN 1e0 ELSE 0e0 END AS y
        FROM scored
    ),
    per_bin AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(round(p, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) / COUNT(*) AS pbar,
               CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS ybar,
               CAST(SUM(CAST(round((p - y) * (p - y), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS sq_err
        FROM binned GROUP BY bin
    ),
    totals AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
               CAST(SUM(CAST(round(sq_err, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sq_err_tot,
               CAST(SUM(CAST(round(n_docs * (pbar - ybar)
                        * (pbar - ybar), 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS rel_tot,
               CAST(SUM(CAST(round(n_docs * ybar, 6)
                    AS DECIMAL(28,6))) AS DOUBLE) AS pos_tot
        FROM per_bin
    ),
    readout AS (
        SELECT n,
               sq_err_tot / n AS brier,
               rel_tot / n AS reliability,
               (pos_tot / n) * (1e0 - pos_tot / n) AS uncertainty,
               (SELECT CAST(SUM(CAST(round(n_docs
                    * (ybar - t.pos_tot / t.n)
                    * (ybar - t.pos_tot / t.n), 6) AS DECIMAL(28,6)))
                    AS DOUBLE) FROM per_bin) / n AS resolution
        FROM totals t
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           {sql_jround("brier", 6)} AS brier,
           {sql_jround("reliability", 6)} AS reliability,
           {sql_jround("resolution", 6)} AS resolution,
           {sql_jround("uncertainty", 6)} AS uncertainty,
           {sql_jround(
               "brier - (reliability - resolution + uncertainty)",
               6)} AS within_bin_residual
    FROM readout
    """,
)
def eval_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brier score of the clipped quality score against the
    lang='en' outcome, with the Murphy decomposition over the same
    10 bins as eval_calibration_ece: reliability (calibration gap),
    resolution (how much bin outcome rates spread from the base
    rate), uncertainty (base-rate variance), and the within-bin
    residual that reconciles the bin-level decomposition with the
    exact Brier (zero only when predictions are constant within
    bins). One number each — the score-quality counterpart of ECE's
    table.

    Scale shape: one scan to 10 bin rows (map-side combine,
    8dp-decimal sums); the decomposition is arithmetic over the bin
    table; output is a single row."""
    scored = _scored(spark)
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    binned = scored.select(
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("bin"),
        p.alias("p"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum(F.round(F.col("p"), 8).cast("decimal(38,8)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("pbar"),
        (
            F.sum(F.col("y").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("ybar"),
        F.sum(
            F.round(
                (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")),
                8,
            ).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("sq_err"),
    )
    from powersql_spark.catalog import track_persist

    per_bin = track_persist(per_bin)
    dec28 = "decimal(28,6)"
    totals = per_bin.agg(
        F.sum("n_docs").cast("bigint").alias("n"),
        F.sum(F.round(F.col("sq_err"), 6).cast(dec28))
        .cast("double")
        .alias("sq_err_tot"),
        F.sum(
            F.round(
                F.col("n_docs")
                * (F.col("pbar") - F.col("ybar"))
                * (F.col("pbar") - F.col("ybar")),
                6,
            ).cast(dec28)
        )
        .cast("double")
        .alias("rel_tot"),
        F.sum(F.round(F.col("n_docs") * F.col("ybar"), 6).cast(dec28))
        .cast("double")
        .alias("pos_tot"),
    )
    res = per_bin.join(F.broadcast(totals), how="cross").agg(
        F.sum(
            F.round(
                F.col("n_docs")
                * (F.col("ybar") - F.col("pos_tot") / F.col("n"))
                * (F.col("ybar") - F.col("pos_tot") / F.col("n")),
                6,
            ).cast(dec28)
        )
        .cast("double")
        .alias("res_tot")
    )
    readout = totals.join(F.broadcast(res), how="cross").select(
        F.col("n").alias("n_docs"),
        (F.col("sq_err_tot") / F.col("n")).alias("brier"),
        (F.col("rel_tot") / F.col("n")).alias("reliability"),
        (F.col("res_tot") / F.col("n")).alias("resolution"),
        (
            (F.col("pos_tot") / F.col("n"))
            * (1.0 - F.col("pos_tot") / F.col("n"))
        ).alias("uncertainty"),
    )
    return readout.select(
        "n_docs",
        F.round("brier", 6).alias("brier"),
        F.round("reliability", 6).alias("reliability"),
        F.round("resolution", 6).alias("resolution"),
        F.round("uncertainty", 6).alias("uncertainty"),
        F.round(
            F.col("brier")
            - (
                F.col("reliability")
                - F.col("resolution")
                + F.col("uncertainty")
            ),
            6,
        ).alias("within_bin_residual"),
    )


# ---------------------------------------------------------------------------
# pipeline_eval_e2e — the model-evaluation dashboard as ONE query:
# every per-source readout of the eval family plus the corpus-level
# scalars, normalized to (entity, metric, value) rows. Reuses the
# registered component callables and their oracle texts verbatim, so
# the composite cannot drift from its parts.
# ---------------------------------------------------------------------------


def _component_oracle(key: str) -> str:
    # Earlier keys in this module are already registered by the time
    # this line runs at import; reading their oracle text here keeps
    # the composite's oracle literally the components'.
    from powersql_spark.registry import _REGISTRY

    return _REGISTRY[key].oracle


_EVAL_E2E_ORACLE = f"""
    SELECT source AS entity, 'auc_roc' AS metric, auc AS value
    FROM ({_component_oracle('eval_auc_roc')})
    UNION ALL
    SELECT source, 'cohens_kappa', kappa
    FROM ({_component_oracle('eval_cohens_kappa')})
    UNION ALL
    SELECT source, 'mcnemar_chi2', chi2_cc
    FROM ({_component_oracle('eval_mcnemar_paired')})
    UNION ALL
    SELECT source, 'ndcg_at_10', ndcg_at_10
    FROM ({_component_oracle('eval_ndcg_at_k')})
    UNION ALL
    SELECT source, 'rr_at_10', rr_at_10
    FROM ({_component_oracle('eval_mrr_at_k')})
    UNION ALL
    SELECT 'ALL', 'mrr_at_10', min(mrr_at_10)
    FROM ({_component_oracle('eval_mrr_at_k')})
    UNION ALL
    SELECT 'ALL', 'ece', min(ece)
    FROM ({_component_oracle('eval_calibration_ece')})
    UNION ALL
    SELECT 'ALL', 'brier', min(brier)
    FROM ({_component_oracle('eval_brier_decomposition')})
    UNION ALL
    SELECT 'ALL', 'macro_f1',
           {sql_jround(
               "CAST(SUM(CAST(f1 AS DECIMAL(18,6))) AS DOUBLE)"
               " / COUNT(*)", 6)}
    FROM ({_component_oracle('eval_classification_report')})
    UNION ALL
    SELECT 'ALL', 'accuracy',
           {sql_jround("SUM(tp) * 1e0 / SUM(support)", 6)}
    FROM ({_component_oracle('eval_classification_report')})
"""

# A dashboard over zero rows should emit zero rows: the global
# aggregates each yield one NULL-valued row on empty input — drop
# them (no real-data metric is ever NULL; every component guards its
# denominators).
_EVAL_E2E_ORACLE = f"""
    SELECT * FROM ({_EVAL_E2E_ORACLE}) WHERE value IS NOT NULL
"""


@query("pipeline_eval_e2e", oracle=_EVAL_E2E_ORACLE)
def pipeline_eval_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-evaluation dashboard as one long-format table:
    per-source AUC, kappa, McNemar chi2, NDCG@10, and reciprocal
    rank, plus corpus-level MRR, ECE, Brier, macro-F1, and accuracy
    — each row computed by the REGISTERED component key (the
    callables are invoked, not re-implemented), so the dashboard
    cannot disagree with the standalone readouts.

    Scale shape: the union of the component plans; each component is
    individually shuffle-light, and nothing joins across them."""
    from powersql_spark.registry import _REGISTRY

    def fn(key):
        return _REGISTRY[key].fn(spark, sf_dir)

    lit = F.lit
    parts = [
        fn("eval_auc_roc").select(
            F.col("source").alias("entity"),
            lit("auc_roc").alias("metric"),
            F.col("auc").alias("value"),
        ),
        fn("eval_cohens_kappa").select(
            F.col("source").alias("entity"),
            lit("cohens_kappa").alias("metric"),
            F.col("kappa").alias("value"),
        ),
        fn("eval_mcnemar_paired").select(
            F.col("source").alias("entity"),
            lit("mcnemar_chi2").alias("metric"),
            F.col("chi2_cc").alias("value"),
        ),
        fn("eval_ndcg_at_k").select(
            F.col("source").alias("entity"),
            lit("ndcg_at_10").alias("metric"),
            F.col("ndcg_at_10").alias("value"),
        ),
        fn("eval_mrr_at_k").select(
            F.col("source").alias("entity"),
            lit("rr_at_10").alias("metric"),
            F.col("rr_at_10").alias("value"),
        ),
        fn("eval_mrr_at_k").agg(
            F.min("mrr_at_10").alias("value")
        ).select(
            lit("ALL").alias("entity"),
            lit("mrr_at_10").alias("metric"),
            "value",
        ),
        fn("eval_calibration_ece").agg(
            F.min("ece").alias("value")
        ).select(
            lit("ALL").alias("entity"),
            lit("ece").alias("metric"),
            "value",
        ),
        fn("eval_brier_decomposition").select(
            lit("ALL").alias("entity"),
            lit("brier").alias("metric"),
            F.col("brier").alias("value"),
        ),
        fn("eval_classification_report").agg(
            F.round(
                F.sum(F.col("f1").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("value")
        ).select(
            lit("ALL").alias("entity"),
            lit("macro_f1").alias("metric"),
            "value",
        ),
        fn("eval_classification_report").agg(
            F.round(
                F.sum("tp") * 1.0 / F.sum("support"), 6
            ).alias("value")
        ).select(
            lit("ALL").alias("entity"),
            lit("accuracy").alias("metric"),
            "value",
        ),
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part)
    return out.where(F.col("value").isNotNull()).orderBy(
        "entity", "metric"
    )


# ---------------------------------------------------------------------------
# Average precision (PR-AUC, interpolation-free form): the mean of
# precision@i over the positive positions of the score ranking. The
# right headline when positives are rare — ROC-AUC saturates under
# class imbalance, AP does not.
# ---------------------------------------------------------------------------


@query(
    "eval_average_precision",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ranked AS (
        SELECT source, lang = 'en' AS pos,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY s DESC, doc_id) AS rk,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER (
                   PARTITION BY source ORDER BY s DESC, doc_id)
                   AS cum_pos
        FROM scored
    ),
    st AS (
        SELECT source,
               CAST(MAX(cum_pos) AS BIGINT) AS n_pos,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN pos THEN CAST(round(
                    cum_pos * 1e0 / rk, 8) AS DECIMAL(38,8)) END)
                    AS DOUBLE) AS prec_sum
        FROM ranked GROUP BY source
    )
    SELECT source, n_docs, n_pos,
           {sql_jround("prec_sum / n_pos", 6)} AS average_precision,
           {sql_jround("n_pos * 1e0 / n_docs", 6)} AS base_rate
    FROM st WHERE n_pos > 0
    """,
)
def eval_average_precision(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Average precision per source (the interpolation-free PR-AUC):
    AP = mean over positive rank positions i of precision@i =
    cum_pos(i)/i, ranking by the heuristic score (tie-break doc_id).
    The imbalance-robust sibling of eval_auc_roc — under rare
    positives ROC saturates while AP tracks the precision the gate
    actually delivers; base_rate is emitted as AP's no-skill floor.

    Scale shape: one scan, one per-source sort exchange shared by
    the rank and running-positive windows, then a constant-state
    collapse; precision terms are 8dp-decimal summed."""
    scored = _scored(spark)
    w = Window.partitionBy("source").orderBy(
        F.col("s").desc(), "doc_id"
    )
    pos = (F.col("lang") == "en").alias("pos")
    ranked = scored.select(
        "source",
        pos,
        F.row_number().over(w).alias("rk"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .over(w)
        .alias("cum_pos"),
    )
    st = (
        ranked.groupBy("source")
        .agg(
            F.max("cum_pos").cast("bigint").alias("n_pos"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("pos"),
                    F.round(
                        F.col("cum_pos") * 1.0 / F.col("rk"), 8
                    ).cast("decimal(38,8)"),
                )
            )
            .cast("double")
            .alias("prec_sum"),
        )
        .where(F.col("n_pos") > 0)
    )
    return st.select(
        "source",
        "n_docs",
        "n_pos",
        F.round(F.col("prec_sum") / F.col("n_pos"), 6).alias(
            "average_precision"
        ),
        F.round(F.col("n_pos") * 1.0 / F.col("n_docs"), 6).alias(
            "base_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Threshold sweep — precision / recall / F1 at nine operating points
# of the clipped score, per source: the table you read before turning
# a score into a keep/drop gate.
# ---------------------------------------------------------------------------

_THRESHOLDS = tuple(round(0.1 * k, 1) for k in range(1, 10))
_THRESH_SQL = ", ".join(f"({t})" for t in _THRESHOLDS)


@query(
    "eval_threshold_sweep",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    thresholds(thr) AS (VALUES {_THRESH_SQL}),
    cells AS (
        SELECT source, CAST(thr AS DOUBLE) AS threshold,
               CAST(COUNT(CASE WHEN least(1.0, greatest(0.0, s))
                    >= thr AND lang = 'en' THEN 1 END) AS BIGINT)
                    AS tp,
               CAST(COUNT(CASE WHEN least(1.0, greatest(0.0, s))
                    >= thr AND lang <> 'en' THEN 1 END) AS BIGINT)
                    AS fp,
               CAST(COUNT(CASE WHEN least(1.0, greatest(0.0, s))
                    < thr AND lang = 'en' THEN 1 END) AS BIGINT)
                    AS fn
        FROM scored CROSS JOIN thresholds
        GROUP BY source, thr
    )
    SELECT source, threshold, tp, fp, fn,
           {sql_jround(
               "CASE WHEN tp + fp = 0 THEN 0e0"
               " ELSE tp * 1e0 / (tp + fp) END", 6)} AS precision_,
           {sql_jround(
               "CASE WHEN tp + fn = 0 THEN 0e0"
               " ELSE tp * 1e0 / (tp + fn) END", 6)} AS recall_,
           {sql_jround(
               "CASE WHEN 2 * tp + fp + fn = 0 THEN 0e0"
               " ELSE 2 * tp * 1e0 / (2 * tp + fp + fn) END", 6)}
               AS f1
    FROM cells
    ORDER BY source, threshold
    """,
)
def eval_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 per source at nine fixed thresholds of
    the clipped score vs the lang='en' label — the operating-point
    table consulted before a score becomes a keep/drop gate
    (eval_calibration_ece says whether the scores are honest; this
    says what each cut costs).

    Scale shape: one scan crossed with a 9-row literal threshold
    frame (constant fan-out, broadcast by construction), collapsed
    by (source, threshold) with map-side partials.

    Absent-cell audit (VERDICT r10/r11 sweep): the (source, threshold)
    grid is structurally complete — the threshold fan-out attaches all
    nine thresholds to every document, so every source present in the
    corpus yields all nine rows and tp/fp/fn are true conditional
    counts (zero when empty), never dropped cells."""
    scored = _scored(spark)
    thr = values_df(
        spark, [(t,) for t in _THRESHOLDS], "thr double"
    )
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    joined = scored.crossJoin(F.broadcast(thr))
    en = F.col("lang") == "en"
    cells = joined.groupBy(
        "source", F.col("thr").cast("double").alias("threshold")
    ).agg(
        F.count(F.when((p >= F.col("thr")) & en, 1))
        .cast("bigint")
        .alias("tp"),
        F.count(F.when((p >= F.col("thr")) & ~en, 1))
        .cast("bigint")
        .alias("fp"),
        F.count(F.when((p < F.col("thr")) & en, 1))
        .cast("bigint")
        .alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cells.select(
        "source",
        "threshold",
        "tp",
        "fp",
        "fn",
        F.round(
            F.when(tp + fp == 0, F.lit(0.0)).otherwise(
                tp * 1.0 / (tp + fp)
            ),
            6,
        ).alias("precision_"),
        F.round(
            F.when(tp + fn == 0, F.lit(0.0)).otherwise(
                tp * 1.0 / (tp + fn)
            ),
            6,
        ).alias("recall_"),
        F.round(
            F.when(2 * tp + fp + fn == 0, F.lit(0.0)).otherwise(
                2 * tp * 1.0 / (2 * tp + fp + fn)
            ),
            6,
        ).alias("f1"),
    ).orderBy("source", "threshold")


# ---------------------------------------------------------------------------
# Cumulative gains / lift by score decile: the campaign-targeting view
# of a classifier — "scoring the top 30% captures X% of positives at
# Y× random". Complements AP (one number) with the whole capture
# curve at ten operating points.
# ---------------------------------------------------------------------------


@query(
    "eval_lift_gains",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    dec AS (
        SELECT source, lang = 'en' AS pos,
               NTILE(10) OVER (
                   PARTITION BY source ORDER BY s DESC, doc_id)
                   AS decile
        FROM scored
    ),
    cells AS (
        SELECT source, decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos
        FROM dec GROUP BY source, decile
    ),
    cum AS (
        SELECT source, decile, n_docs, n_pos,
               SUM(n_docs) OVER (
                   PARTITION BY source ORDER BY decile) AS cum_docs,
               SUM(n_pos) OVER (
                   PARTITION BY source ORDER BY decile) AS cum_pos,
               SUM(n_docs) OVER (PARTITION BY source) AS tot_docs,
               SUM(n_pos) OVER (PARTITION BY source) AS tot_pos
        FROM cells
    )
    SELECT source, decile, n_docs, n_pos,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           {sql_jround("cum_pos * 1e0 / tot_pos", 6)} AS cum_gain,
           {sql_jround(
               "(cum_pos * 1e0 / cum_docs)"
               " / (tot_pos * 1e0 / tot_docs)", 6)} AS cum_lift
    FROM cum WHERE tot_pos > 0
    ORDER BY source, decile
    """,
)
def eval_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift per score decile, per source: rank by
    the heuristic score (tie-break doc_id), NTILE into 10 equal
    buckets, then report what fraction of all positives the top-k
    deciles capture (cum_gain) and how that compares to random
    targeting (cum_lift = capture rate / base rate). The standard
    model-vs-random readout read next to eval_average_precision.

    Scale shape: the same single per-source sort exchange the other
    ranking metrics pay feeds NTILE; the collapse leaves 10 rows per
    source, and the cumulative/total windows run on that constant-
    size frame. All counters are BIGINT-exact; only the two final
    ratios are doubles (identical expression trees both engines)."""
    scored = _scored(spark)
    w = Window.partitionBy("source").orderBy(
        F.col("s").desc(), "doc_id"
    )
    dec = scored.select(
        "source",
        (F.col("lang") == "en").alias("pos"),
        F.ntile(10).over(w).alias("decile"),
    )
    cells = dec.groupBy("source", "decile").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    cum = cells.select(
        "source",
        "decile",
        "n_docs",
        "n_pos",
        F.sum("n_docs").over(wc).alias("cum_docs"),
        F.sum("n_pos").over(wc).alias("cum_pos"),
        F.sum("n_docs").over(wt).alias("tot_docs"),
        F.sum("n_pos").over(wt).alias("tot_pos"),
    ).where(F.col("tot_pos") > 0)
    cum_docs, cum_pos = F.col("cum_docs"), F.col("cum_pos")
    tot_docs, tot_pos = F.col("tot_docs"), F.col("tot_pos")
    return cum.select(
        "source",
        "decile",
        "n_docs",
        "n_pos",
        cum_pos.cast("bigint").alias("cum_pos"),
        F.round(cum_pos * 1e0 / tot_pos, 6).alias("cum_gain"),
        F.round(
            (cum_pos * 1e0 / cum_docs) / (tot_pos * 1e0 / tot_docs), 6
        ).alias("cum_lift"),
    ).orderBy("source", "decile")


# ---------------------------------------------------------------------------
# DeLong confidence interval for AUC: the standard error of the
# rank-sum AUC from the placement-value variances (DeLong, DeLong &
# Clarke-Pearson 1988) — deterministic, no bootstrap resampling.
# Placement identity used below: with tie-averaged ranks,
# r_all(i) - r_within_class(i) = #other-class below i + ties/2.
# ---------------------------------------------------------------------------


@query(
    "eval_auc_delong_ci",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ranked AS (
        SELECT source, lang = 'en' AS pos,
               CAST(RANK() OVER (PARTITION BY source ORDER BY s)
                    AS DOUBLE)
                 + (COUNT(*) OVER (PARTITION BY source, s) - 1) / 2.0
                   AS r_all,
               CAST(RANK() OVER (PARTITION BY source, lang = 'en'
                                 ORDER BY s) AS DOUBLE)
                 + (COUNT(*) OVER (PARTITION BY source, lang = 'en', s)
                    - 1) / 2.0 AS r_grp,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER (
                   PARTITION BY source) AS n_pos,
               SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) OVER (
                   PARTITION BY source) AS n_neg
        FROM scored
    ),
    placed AS (
        SELECT source, pos, n_pos, n_neg,
               CASE WHEN pos THEN (r_all - r_grp) / n_neg
                    ELSE 1 - (r_all - r_grp) / n_pos END AS v
        FROM ranked WHERE n_pos > 0 AND n_neg > 0
    ),
    st AS (
        SELECT source,
               CAST(ANY_VALUE(n_pos) AS BIGINT) AS n_pos,
               CAST(ANY_VALUE(n_neg) AS BIGINT) AS n_neg,
               CAST(SUM(CASE WHEN pos THEN CAST(round(v, 8)
                    AS DECIMAL(38,8)) END) AS DOUBLE) AS sv10,
               CAST(SUM(CASE WHEN pos THEN CAST(round(v * v, 8)
                    AS DECIMAL(38,8)) END) AS DOUBLE) AS svv10,
               CAST(SUM(CASE WHEN NOT pos THEN CAST(round(v, 8)
                    AS DECIMAL(38,8)) END) AS DOUBLE) AS sv01,
               CAST(SUM(CASE WHEN NOT pos THEN CAST(round(v * v, 8)
                    AS DECIMAL(38,8)) END) AS DOUBLE) AS svv01
        FROM placed GROUP BY source
    ),
    ci AS (
        SELECT source, n_pos, n_neg,
               sv10 / n_pos AS auc,
               sqrt(
                 CASE WHEN n_pos > 1
                      THEN (svv10 - sv10 * sv10 / n_pos)
                           / (n_pos - 1) / n_pos ELSE 0e0 END
                 + CASE WHEN n_neg > 1
                        THEN (svv01 - sv01 * sv01 / n_neg)
                             / (n_neg - 1) / n_neg ELSE 0e0 END)
                   AS se
        FROM st
    )
    SELECT source, n_pos, n_neg,
           {sql_jround("auc", 6)} AS auc,
           {sql_jround("se", 6)} AS se,
           {sql_jround("auc - 1.96 * se", 6)} AS ci_lo,
           {sql_jround("auc + 1.96 * se", 6)} AS ci_hi
    FROM ci
    """,
)
def eval_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong 95% confidence interval for the per-source AUC: placement
    values from the two tie-averaged rank windows (overall rank minus
    within-class rank = opposite-class mass below, ties halved),
    Var(AUC) = S10/n+ + S01/n- from their sample variances, CI =
    AUC +- 1.96 SE. The uncertainty the bare eval_auc_roc point
    estimate needs before two classifier gates are compared — exact
    and deterministic where a bootstrap would burn passes and inject
    resampling noise.

    Scale shape: the same single per-source sort exchange as
    eval_auc_roc feeds all four windows (the within-class ranks
    partition by (source, pos) — a sub-partitioning of the same sort
    order); placements are 8dp-decimal-pinned before the variance
    sums, so the CI is bit-identical across engines and partition
    counts."""
    scored = _scored(spark)
    pos = F.col("lang") == "en"
    w_all = Window.partitionBy("source").orderBy("s")
    w_tie = Window.partitionBy("source", "s")
    w_grp = Window.partitionBy("source", pos).orderBy("s")
    w_gtie = Window.partitionBy("source", pos, "s")
    w_src = Window.partitionBy("source")
    ranked = scored.select(
        "source",
        pos.alias("pos"),
        (
            F.rank().over(w_all).cast("double")
            + (F.count("*").over(w_tie) - 1) / 2.0
        ).alias("r_all"),
        (
            F.rank().over(w_grp).cast("double")
            + (F.count("*").over(w_gtie) - 1) / 2.0
        ).alias("r_grp"),
        F.sum(F.when(pos, 1).otherwise(0)).over(w_src).alias("n_pos"),
        F.sum(F.when(pos, 0).otherwise(1)).over(w_src).alias("n_neg"),
    )
    placed = ranked.where(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    ).select(
        "source",
        "pos",
        "n_pos",
        "n_neg",
        F.when(
            F.col("pos"),
            (F.col("r_all") - F.col("r_grp")) / F.col("n_neg"),
        )
        .otherwise(
            1 - (F.col("r_all") - F.col("r_grp")) / F.col("n_pos")
        )
        .alias("v"),
    )
    v = F.col("v")
    dec8 = lambda c: F.round(c, 8).cast("decimal(38,8)")  # noqa: E731
    st = placed.groupBy("source").agg(
        F.any_value("n_pos").cast("bigint").alias("n_pos"),
        F.any_value("n_neg").cast("bigint").alias("n_neg"),
        F.sum(F.when(F.col("pos"), dec8(v))).cast("double").alias("sv10"),
        F.sum(F.when(F.col("pos"), dec8(v * v)))
        .cast("double")
        .alias("svv10"),
        F.sum(F.when(~F.col("pos"), dec8(v))).cast("double").alias("sv01"),
        F.sum(F.when(~F.col("pos"), dec8(v * v)))
        .cast("double")
        .alias("svv01"),
    )
    n_pos, n_neg = F.col("n_pos"), F.col("n_neg")
    auc = F.col("sv10") / n_pos
    s10 = F.when(
        n_pos > 1,
        (F.col("svv10") - F.col("sv10") * F.col("sv10") / n_pos)
        / (n_pos - 1)
        / n_pos,
    ).otherwise(F.lit(0.0))
    s01 = F.when(
        n_neg > 1,
        (F.col("svv01") - F.col("sv01") * F.col("sv01") / n_neg)
        / (n_neg - 1)
        / n_neg,
    ).otherwise(F.lit(0.0))
    se = F.sqrt(s10 + s01)
    return st.select(
        "source",
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(se, 6).alias("se"),
        F.round(auc - 1.96 * se, 6).alias("ci_lo"),
        F.round(auc + 1.96 * se, 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Round-11 eval widening: binary-metric completions (MCC, log loss),
# multi-rater agreement (Fleiss kappa, Krippendorff alpha), LLM-arena
# readouts (pairwise win-rate matrix, length bias), and rank-list
# similarity (RBO).
# ---------------------------------------------------------------------------

_MCC_THRESH = 0.09  # fixed decision threshold on the shared score


@query(
    "eval_matthews_corr",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    cm AS (
        SELECT
            CAST(COUNT(CASE WHEN s > {_MCC_THRESH}
                 AND lang = 'en' THEN 1 END) AS BIGINT) AS tp,
            CAST(COUNT(CASE WHEN s > {_MCC_THRESH}
                 AND lang <> 'en' THEN 1 END) AS BIGINT) AS fp,
            CAST(COUNT(CASE WHEN s <= {_MCC_THRESH}
                 AND lang = 'en' THEN 1 END) AS BIGINT) AS fn,
            CAST(COUNT(CASE WHEN s <= {_MCC_THRESH}
                 AND lang <> 'en' THEN 1 END) AS BIGINT) AS tn
        FROM scored
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) = 0
                THEN 0.0  -- degenerate margin: MCC defined as 0
                ELSE round((CAST(tp AS DOUBLE) * tn
                            - CAST(fp AS DOUBLE) * fn)
                     / sqrt((CAST(tp AS DOUBLE) + fp) * (tp + fn)
                            * (CAST(tn AS DOUBLE) + fp) * (tn + fn)),
                     6) END AS mcc
    FROM cm
    """,
)
def eval_matthews_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the shared quality score
    (thresholded at ``_MCC_THRESH`` = 0.09, chosen so both predicted
    classes are populated on the fixture) as an English-document
    detector: MCC =
    (TP*TN - FP*FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)) — the
    single-number binary metric that stays honest under class
    imbalance, where accuracy and even F1 (which ignores TN) flatter
    a majority-class predictor. Completes the binary-eval family
    (AUC: threshold-free; F1: report; MCC: balanced single number).

    Scale shape: one corpus scan to four confusion counts — integer
    sufficient statistics; the coefficient is one float expression
    over them. Absent-cell audit: the four cells are conditional
    counts over the full scan (a zero cell is a genuine 0, not a
    dropped grid row), and the all-zero-margin case returns the
    guarded NULL on both engines."""
    scored = _scored(spark)
    pred = F.col("s") > _MCC_THRESH
    gold = F.col("lang") == "en"
    cm = scored.agg(
        F.count(F.when(pred & gold, 1)).cast("bigint").alias("tp"),
        F.count(F.when(pred & ~gold, 1)).cast("bigint").alias("fp"),
        F.count(F.when(~pred & gold, 1)).cast("bigint").alias("fn"),
        F.count(F.when(~pred & ~gold, 1)).cast("bigint").alias("tn"),
    )
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn, tn = F.col("fn").cast("double"), F.col("tn").cast("double")
    degenerate = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) == 0
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(degenerate, F.lit(0.0))
        .otherwise(
            F.round(
                (tp * tn - fp * fn)
                / F.sqrt(
                    (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
                ),
                6,
            )
        )
        .alias("mcc"),
    )


@query(
    "eval_log_loss",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    clipped AS (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               LEAST(GREATEST(s, 0.000001), 0.999999) AS p
        FROM scored
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(
                   -(y * ln(p) + (1 - y) * ln(1 - p)), 8)
                   AS DECIMAL(38,8))) AS DOUBLE) AS ll_sum,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS base
        FROM clipped
    )
    SELECT n,
           {sql_jround("ll_sum / n", 6)} AS log_loss,
           round(-(base * ln(base) + (1 - base) * ln(1 - base)), 6)
               AS baseline_loss,
           round(1 - (ll_sum / n)
                 / (-(base * ln(base) + (1 - base) * ln(1 - base))),
                 6) AS skill_score
    FROM s
    """,
)
def eval_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary cross-entropy (log loss) of the shared quality score as
    an English-probability estimate, with probabilities clipped to
    [1e-6, 1-1e-6]: the PROPER scoring rule that punishes confident
    wrong predictions quadratically harder than AUC's pure ranking
    view, reported against the base-rate entropy baseline and as a
    skill score (1 - LL/LL_baseline, > 0 means the score beats
    always-predict-the-base-rate). Completes the probability-quality
    trio (calibration_ece: reliability; brier: quadratic; this:
    logarithmic).

    Scale shape: one corpus scan; per-doc loss terms are 8dp-rounded
    and decimal-summed so the mean is order-independent."""
    scored = _scored(spark)
    y = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    p = F.least(F.greatest(F.col("s"), F.lit(0.000001)), F.lit(0.999999))
    clipped = scored.select(y.alias("y"), p.alias("p"))
    term = -(
        F.col("y") * F.log(F.col("p"))
        + (1 - F.col("y")) * F.log(1 - F.col("p"))
    )
    s = clipped.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.round(term, 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("ll_sum"),
        (F.sum("y").cast("double") / F.count("*")).alias("base"),
    )
    base = F.col("base")
    baseline = -(base * F.log(base) + (1 - base) * F.log(1 - base))
    return s.select(
        "n",
        F.round(F.col("ll_sum") / F.col("n"), 6).alias("log_loss"),
        F.round(baseline, 6).alias("baseline_loss"),
        F.round(
            1 - (F.col("ll_sum") / F.col("n")) / baseline, 6
        ).alias("skill_score"),
    )


@query(
    "eval_win_rate_matrix",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    AS DECIMAL(18,6)) AS rev
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END)
                AS BIGINT) AS wins_a,
           CAST(SUM(CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END)
                AS BIGINT) AS ties,
           {sql_jround(
               "(SUM(CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END)"
               " + 0.5 * SUM(CASE WHEN a.rev = b.rev"
               " THEN 1 ELSE 0 END))"
               " / CAST(COUNT(*) AS DOUBLE)", 6)} AS win_rate_a
    FROM daily a JOIN daily b
      ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
)
def eval_win_rate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise win-rate matrix over the daily event-type battles
    (higher decimal-exact daily revenue wins, ties credit 1/2): the
    raw arena table behind eval_bradley_terry's fitted strength
    scale — the artifact every LLM-arena leaderboard publishes
    alongside its ratings, because intransitive pockets (A beats B
    beats C beats A) are visible HERE and destroyed by the fit.

    Scale shape: one corpus collapse to the (type, day) daily table;
    the battle join is day-equi (never cartesian across days); the
    matrix is category-pair bounded. Exact decimal revenue makes
    every win/tie decision engine-identical."""
    e = spark.table("events").where(F.col("value").isNotNull())
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    a, b = daily.alias("a"), daily.alias("b")
    j = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    )
    win = F.when(F.col("a.rev") > F.col("b.rev"), 1).otherwise(0)
    tie = F.when(F.col("a.rev") == F.col("b.rev"), 1).otherwise(0)
    return (
        j.groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(win).cast("bigint").alias("wins_a"),
            F.sum(tie).cast("bigint").alias("ties"),
        )
        .select(
            "type_a",
            "type_b",
            "n_days",
            "wins_a",
            "ties",
            F.round(
                (F.col("wins_a") + 0.5 * F.col("ties"))
                / F.col("n_days").cast("double"),
                6,
            ).alias("win_rate_a"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "eval_length_bias",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    obs AS (
        SELECT sc.source, sc.s, d.n_chars
        FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
    ),
    cells AS (
        SELECT source, s AS x, CAST(n_chars AS DOUBLE) AS y,
               COUNT(*) AS cnt
        FROM obs GROUP BY 1, 2, 3
    ),
    xr AS (
        SELECT source, x,
               SUM(t) OVER (PARTITION BY source ORDER BY x
                            ROWS UNBOUNDED PRECEDING)
                   - t + (t + 1) / 2.0 AS rx
        FROM (SELECT source, x, SUM(cnt) AS t FROM cells GROUP BY 1, 2)
    ),
    yr AS (
        SELECT source, y,
               SUM(t) OVER (PARTITION BY source ORDER BY y
                            ROWS UNBOUNDED PRECEDING)
                   - t + (t + 1) / 2.0 AS ry
        FROM (SELECT source, y, SUM(cnt) AS t FROM cells GROUP BY 1, 2)
    ),
    st AS (
        SELECT c.source,
               CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(CAST(cnt * rx AS DECIMAL(28,6))) AS DOUBLE)
                   AS sx,
               CAST(SUM(CAST(cnt * ry AS DECIMAL(28,6))) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(cnt * rx * ry AS DECIMAL(28,6)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(cnt * rx * rx AS DECIMAL(28,6)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(cnt * ry * ry AS DECIMAL(28,6)))
                    AS DOUBLE) AS syy
        FROM cells c
        JOIN xr ON xr.source = c.source AND xr.x = c.x
        JOIN yr ON yr.source = c.source AND yr.y = c.y
        GROUP BY c.source
    )
    SELECT source, n,
           round((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
                 4) AS length_bias_rho,
           abs((sxy - sx * sy / n)
               / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)))
               > 0.5 AS strongly_biased
    FROM st
    WHERE (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
    ORDER BY source
    """,
)
def eval_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bias of the shared quality score, per source: Spearman
    rank correlation between score and document length — the
    judge-bias audit every LLM-eval pipeline runs, because a scorer
    that secretly rewards length gets gamed by verbosity (and a
    curation gate built on it silently selects for long documents).
    |rho| > 0.5 flags a strongly length-confounded source.

    Scale shape: the spearman midrank-histogram machinery (cells
    bounded by distinct (score, length) values per source, not doc
    count); decimal-exact half-integer rank sums make rho
    bit-identical across engines."""
    scored = _scored(spark)
    obs = scored.join(
        spark.table("documents").select("doc_id", "n_chars"), "doc_id"
    )
    cells = obs.groupBy(
        "source",
        F.col("s").alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    ).agg(F.count("*").alias("cnt"))

    def midranks(col: str, alias: str) -> DataFrame:
        hist = cells.groupBy("source", col).agg(
            F.sum("cnt").alias("t")
        )
        w = (
            Window.partitionBy("source")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return hist.select(
            "source",
            col,
            (
                F.sum("t").over(w) - F.col("t") + (F.col("t") + 1) / 2.0
            ).alias(alias),
        )

    joined = cells.join(midranks("x", "rx"), ["source", "x"]).join(
        midranks("y", "ry"), ["source", "y"]
    )
    dec = lambda c: F.sum(c.cast("decimal(28,6)")).cast("double")
    st = joined.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        dec(F.col("cnt") * F.col("rx")).alias("sx"),
        dec(F.col("cnt") * F.col("ry")).alias("sy"),
        dec(F.col("cnt") * F.col("rx") * F.col("ry")).alias("sxy"),
        dec(F.col("cnt") * F.col("rx") * F.col("rx")).alias("sxx"),
        dec(F.col("cnt") * F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    rho = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / F.sqrt(
        vx * vy
    )
    return (
        st.where((vx > 0) & (vy > 0))
        .select(
            "source",
            "n",
            F.round(rho, 4).alias("length_bias_rho"),
            (F.abs(rho) > 0.5).alias("strongly_biased"),
        )
        .orderBy("source")
    )


# Three deterministic rule-based "raters" bucket each document into
# low/mid/high quality by thresholding the shared score at slightly
# different cutoffs — the reproducible stand-in for human annotators
# that makes multi-rater agreement oracle-checkable.
_RATER_CUTS = ((0.20, 0.35), (0.18, 0.33), (0.22, 0.37))


def _rater_sql(lo: float, hi: float) -> str:
    return (
        f"CASE WHEN s < {lo} THEN 'low' "
        f"WHEN s < {hi} THEN 'mid' ELSE 'high' END"
    )


_RATINGS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {_rater_sql(lo, hi)} AS cat FROM scored"
    for lo, hi in _RATER_CUTS
)


def _ratings(spark: SparkSession) -> DataFrame:
    """(doc_id, cat) with one row per rater per document."""
    scored = _scored(spark)
    parts = []
    for lo, hi in _RATER_CUTS:
        cat = (
            F.when(F.col("s") < lo, "low")
            .when(F.col("s") < hi, "mid")
            .otherwise("high")
        )
        parts.append(scored.select("doc_id", cat.alias("cat")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "eval_fleiss_kappa",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ratings AS ({_RATINGS_SQL}),
    item_cat AS (
        SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS n_ic
        FROM ratings GROUP BY doc_id, cat
    ),
    per_item AS (  -- P_i = (sum n_ic^2 - m) / (m (m - 1)), m = 3
        SELECT doc_id,
               (SUM(n_ic * n_ic) - 3) / (3.0 * 2.0) AS p_i
        FROM item_cat GROUP BY doc_id
    ),
    pbar AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(round(p_i, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) / COUNT(*) AS p_bar
        FROM per_item
    ),
    pe AS (
        SELECT SUM(pow(cnt / tot, 2)) AS p_e FROM (
            SELECT CAST(COUNT(*) AS DOUBLE) AS cnt,
                   CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS tot
            FROM ratings GROUP BY cat
        )
    )
    SELECT pbar.n_items, {sql_jround("pbar.p_bar", 6)} AS p_bar,
           {sql_jround("pe.p_e", 6)} AS p_e,
           {sql_jround(
               "(pbar.p_bar - pe.p_e) / (1 - pe.p_e)", 6)}
               AS fleiss_kappa
    FROM pbar, pe
    """,
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over three deterministic quality raters (the
    shared score thresholded at three cutoff pairs into
    low/mid/high): chance-corrected agreement for MANY raters —
    kappa = (P_bar - P_e) / (1 - P_e) with per-item agreement P_i =
    (sum n_ic^2 - m)/(m(m-1)) — generalizing eval_cohens_kappa's
    two-rater form to the annotation-pool setting every labeling
    pipeline audits before trusting majority votes.

    Scale shape: ratings explode to 3 rows per doc, collapse to
    (doc, category) counts; P_i terms are exact rationals
    (8dp-rounded, decimal-summed) and P_e comes from the pooled
    category margin — no per-rater pairwise blowup."""
    ratings = _ratings(spark)
    item_cat = ratings.groupBy("doc_id", "cat").agg(
        F.count("*").cast("bigint").alias("n_ic")
    )
    per_item = item_cat.groupBy("doc_id").agg(
        (
            (F.sum(F.col("n_ic") * F.col("n_ic")) - 3) / (3.0 * 2.0)
        ).alias("p_i")
    )
    pbar = per_item.agg(
        F.count("*").cast("bigint").alias("n_items"),
        (
            F.sum(F.round(F.col("p_i"), 8).cast("decimal(38,8)"))
            .cast("double")
            / F.count("*")
        ).alias("p_bar"),
    )
    tot = Window.partitionBy()
    pe = (
        ratings.groupBy("cat")
        .agg(F.count("*").cast("double").alias("cnt"))
        .select(
            F.pow(
                F.col("cnt") / F.sum("cnt").over(tot), 2
            ).alias("sq")
        )
        .agg(F.sum("sq").alias("p_e"))
    )
    return pbar.crossJoin(F.broadcast(pe)).select(
        "n_items",
        F.round(F.col("p_bar"), 6).alias("p_bar"),
        F.round(F.col("p_e"), 6).alias("p_e"),
        F.round(
            (F.col("p_bar") - F.col("p_e")) / (1 - F.col("p_e")), 6
        ).alias("fleiss_kappa"),
    )


@query(
    "eval_krippendorff_alpha",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ratings AS ({_RATINGS_SQL}),
    item_cat AS (
        SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS n_ic
        FROM ratings GROUP BY doc_id, cat
    ),
    within AS (  -- disagreeing pairs within each item (m = 3 raters)
        SELECT doc_id,
               (9 - SUM(n_ic * n_ic)) / 2 AS dis_pairs
        FROM item_cat GROUP BY doc_id
    ),
    do_ AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(dis_pairs) AS DOUBLE) / (COUNT(*) * 3)
                   AS d_o  -- per-pair rate: m(m-1)/2 = 3 pairs/item
        FROM within
    ),
    marg AS (
        SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_c FROM ratings
        GROUP BY cat
    ),
    de AS (
        SELECT 1.0 - SUM(CAST(n_c AS DOUBLE) * (n_c - 1))
                     / (CAST(nt AS DOUBLE) * (nt - 1)) AS d_e
        FROM marg, (SELECT SUM(n_c) AS nt FROM marg)
        GROUP BY nt
    )
    SELECT do_.n_items,
           {sql_jround("do_.d_o", 6)} AS d_o,
           {sql_jround("de.d_e", 6)} AS d_e,
           {sql_jround("1 - do_.d_o / de.d_e", 6)}
               AS krippendorff_alpha
    FROM do_, de
    """,
)
def eval_krippendorff_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Krippendorff's alpha (nominal) over the same three
    deterministic raters: 1 - D_o / D_e, where D_o is the observed
    within-item pairwise disagreement rate and D_e the disagreement
    expected from the pooled category margin WITH the (N-1)
    small-sample correction — the agreement coefficient that (unlike
    Fleiss' kappa) generalizes to missing ratings and other metrics,
    and the conventional >= 0.8 publication bar. Reporting both
    alongside fleiss_kappa shows the chance-model disagreement
    directly.

    Scale shape: same (doc, category) count collapse as Fleiss —
    integer disagreeing-pair counts per item, one margin aggregate;
    floats only in the two final rates."""
    ratings = _ratings(spark)
    item_cat = ratings.groupBy("doc_id", "cat").agg(
        F.count("*").cast("bigint").alias("n_ic")
    )
    within = item_cat.groupBy("doc_id").agg(
        ((9 - F.sum(F.col("n_ic") * F.col("n_ic"))) / 2).alias(
            "dis_pairs"
        )
    )
    do_ = within.agg(
        F.count("*").cast("bigint").alias("n_items"),
        (
            F.sum("dis_pairs").cast("double") / (F.count("*") * 3)
        ).alias("d_o"),
    )
    marg = ratings.groupBy("cat").agg(
        F.count("*").cast("bigint").alias("n_c")
    )
    nt = marg.agg(F.sum("n_c").alias("nt"))
    de = (
        marg.crossJoin(F.broadcast(nt))
        .agg(
            (
                1.0
                - F.sum(
                    F.col("n_c").cast("double") * (F.col("n_c") - 1)
                )
                / F.any_value(
                    F.col("nt").cast("double") * (F.col("nt") - 1)
                )
            ).alias("d_e")
        )
    )
    return do_.crossJoin(F.broadcast(de)).select(
        "n_items",
        F.round(F.col("d_o"), 6).alias("d_o"),
        F.round(F.col("d_e"), 6).alias("d_e"),
        F.round(1 - F.col("d_o") / F.col("d_e"), 6).alias(
            "krippendorff_alpha"
        ),
    )


_RBO_P = 0.9
_RBO_DEPTH = 20


@query(
    "eval_rbo_overlap",
    oracle=f"""
    WITH ra AS (
        SELECT l_partkey AS pk,
               ROW_NUMBER() OVER (
                   ORDER BY SUM(CAST(l_extendedprice
                       AS DECIMAL(18,2))) DESC, l_partkey) AS r
        FROM lineitem GROUP BY l_partkey
        ORDER BY r LIMIT {_RBO_DEPTH}
    ),
    rb AS (
        SELECT l_partkey AS pk,
               ROW_NUMBER() OVER (
                   ORDER BY COUNT(*) DESC, l_partkey) AS r
        FROM lineitem GROUP BY l_partkey
        ORDER BY r LIMIT {_RBO_DEPTH}
    ),
    pref AS (
        SELECT ra.r AS r_a, rb.r AS r_b
        FROM ra JOIN rb ON ra.pk = rb.pk
    ),
    depths AS (
        SELECT gs.d,
               CAST((SELECT COUNT(*) FROM pref
                     WHERE r_a <= gs.d AND r_b <= gs.d) AS BIGINT)
                   AS overlap
        FROM generate_series(1, {_RBO_DEPTH}) AS gs(d)
    )
    SELECT CAST({_RBO_DEPTH} AS BIGINT) AS depth,
           CAST({_RBO_P} AS DOUBLE) AS p,
           CAST(MAX(CASE WHEN d = {_RBO_DEPTH} THEN overlap END)
                AS BIGINT) AS overlap_at_depth,
           {sql_jround(
               f"(1 - {_RBO_P}) * CAST(SUM(CAST(round("
               f"pow({_RBO_P}, d - 1) * overlap / d, 8)"
               " AS DECIMAL(38,8))) AS DOUBLE)", 6)} AS rbo_min
    FROM depths
    """,
)
def eval_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (RBO, p = 0.9, truncated at depth 20)
    between two part rankings — by revenue vs by order-line count:
    (1-p) sum p^(d-1) |A_d intersect B_d| / d, the top-weighted
    rank-list similarity that answers "do these two rankers agree
    where it matters (the head)?" — indefinite-list-safe where
    Kendall/Spearman need identical support. The truncated (lower
    bound) form is reported.

    Scale shape: both rankings are TakeOrderedAndProject top-20 cuts
    with decimal-exact keys and partkey tie-breaks; the depth curve
    rides a 20-row spine against the joined prefix table. Everything
    after the two aggregations is constant-sized."""
    li = spark.table("lineitem")
    ra = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("rev")
        )
        .select(
            "pk",
            F.row_number()
            .over(Window.orderBy(F.col("rev").desc(), F.col("pk")))
            .alias("r"),
        )
        .where(F.col("r") <= _RBO_DEPTH)
    )
    rb = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "pk",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("pk")))
            .alias("r"),
        )
        .where(F.col("r") <= _RBO_DEPTH)
    )
    both = ra.join(
        rb.withColumnRenamed("r", "r_b"), "pk"
    ).select(F.col("r").alias("r_a"), "r_b")
    depths = spark.range(1, _RBO_DEPTH + 1).select(
        F.col("id").alias("d")
    )
    curve = (
        depths.join(
            F.broadcast(both),
            (F.col("r_a") <= F.col("d")) & (F.col("r_b") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(F.count("r_a").cast("bigint").alias("overlap"))
    )
    term = F.round(
        F.pow(F.lit(_RBO_P), F.col("d") - 1)
        * F.col("overlap")
        / F.col("d"),
        8,
    ).cast("decimal(38,8)")
    return curve.agg(
        F.lit(_RBO_DEPTH).cast("bigint").alias("depth"),
        F.lit(_RBO_P).alias("p"),
        F.max(
            F.when(F.col("d") == _RBO_DEPTH, F.col("overlap"))
        )
        .cast("bigint")
        .alias("overlap_at_depth"),
        F.round(
            (1 - _RBO_P) * F.sum(term).cast("double"), 6
        ).alias("rbo_min"),
    )


# ---------------------------------------------------------------------------
# Round-12 widening: retrieval operating points, calibration tests,
# prevalence-robust and ordinal agreement.
# ---------------------------------------------------------------------------

_PRK_KS = (3, 5, 10)
_PRK_KS_SQL = ", ".join(str(k) for k in _PRK_KS)


@query(
    "eval_precision_recall_at_k",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ranked AS (
        SELECT source, doc_id, lang = 'en' AS rel,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY s DESC, doc_id) AS rnk
        FROM scored
    ),
    tot AS (
        SELECT source,
               CAST(COUNT(CASE WHEN rel THEN 1 END) AS BIGINT)
                   AS n_rel
        FROM ranked GROUP BY source
    ),
    ks AS (SELECT unnest([{_PRK_KS_SQL}]) AS k),
    hits AS (
        SELECT r.source, ks.k,
               CAST(COUNT(CASE WHEN r.rel THEN 1 END) AS BIGINT)
                   AS n_hits
        FROM ranked r JOIN ks ON r.rnk <= ks.k
        GROUP BY r.source, ks.k
    )
    SELECT h.source, CAST(h.k AS BIGINT) AS k, h.n_hits, t.n_rel,
           round(CAST(h.n_hits AS DOUBLE) / h.k, 6) AS precision_at_k,
           CASE WHEN t.n_rel > 0
                THEN round(CAST(h.n_hits AS DOUBLE) / t.n_rel, 6)
           END AS recall_at_k
    FROM hits h JOIN tot t ON t.source = h.source
    ORDER BY h.source, h.k
    """,
)
def eval_precision_recall_at_k(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Precision@k and recall@k per source for the quality-score
    ranking against the lang='en' relevance labels, at k = 3/5/10 —
    the operating-point table that completes the ranking-eval family
    (MRR: first hit; NDCG: graded positions; AP: area; this: the
    plain what-you-get-at-the-cutoff numbers a retrieval gate is
    actually configured with). Rank ties break on doc_id, so both
    engines rank identically.

    Scale shape: one rank window per source partition, then each k
    is a bounded conditional count (the k-spine join fans out rows
    with rnk <= max(k) only); precision/recall are small-integer
    ratios."""
    scored = _scored(spark)
    w = Window.partitionBy("source").orderBy(
        F.desc("s"), F.col("doc_id")
    )
    ranked = scored.select(
        "source",
        "doc_id",
        (F.col("lang") == "en").alias("rel"),
        F.row_number().over(w).alias("rnk"),
    )
    tot = ranked.groupBy("source").agg(
        F.count(F.when(F.col("rel"), 1)).cast("bigint").alias("n_rel")
    )
    ks = values_df(
        spark, [(k,) for k in _PRK_KS], "k int"
    )
    hits = (
        ranked.join(
            F.broadcast(ks), F.col("rnk") <= F.col("k")
        )
        .groupBy("source", "k")
        .agg(
            F.count(F.when(F.col("rel"), 1))
            .cast("bigint")
            .alias("n_hits")
        )
    )
    return (
        hits.join(tot, "source")
        .select(
            "source",
            F.col("k").cast("bigint").alias("k"),
            "n_hits",
            "n_rel",
            F.round(
                F.col("n_hits").cast("double") / F.col("k"), 6
            ).alias("precision_at_k"),
            F.when(
                F.col("n_rel") > 0,
                F.round(
                    F.col("n_hits").cast("double") / F.col("n_rel"),
                    6,
                ),
            ).alias("recall_at_k"),
        )
        .orderBy("source", "k")
    )


@query(
    "eval_spiegelhalter_z",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    clipped AS (
        SELECT source, least(1.0, greatest(0.0, s)) AS p,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM scored
    ),
    s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round((y - p) * (1 - 2 * p), 8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS num,
               CAST(SUM(CAST(round((1 - 2 * p) * (1 - 2 * p)
                                   * p * (1 - p), 8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS den
        FROM clipped GROUP BY source
    )
    SELECT source, n,
           {sql_jround("num / sqrt(den)", 4)} AS spiegelhalter_z,
           CASE WHEN n >= 30 AND den > 0
                THEN abs(num / sqrt(den)) > 1.96
           END AS miscalibrated_5pct
    FROM s WHERE den > 0
    ORDER BY source
    """,
)
def eval_spiegelhalter_z(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spiegelhalter's Z calibration test per source for the clipped
    quality score read as P(lang='en'): Z = sum (y-p)(1-2p) / sqrt(
    sum (1-2p)^2 p(1-p)) — the SIGNIFICANCE companion to
    eval_calibration_ece's magnitude readout (ECE says how big the
    calibration gap is; this says whether it exceeds chance given n,
    with the Brier decomposition's exact null variance). Verdict
    withheld below n = 30 per source (normal approximation); Z stays
    reported. Degenerate sources where every p is exactly 0 or 1
    (den = 0) are excluded on both engines.

    Scale shape: one scan to two 8dp-rounded decimal sums per
    source; the statistic is closed-form per row."""
    scored = _scored(spark)
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    y = F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    clipped = scored.select(
        "source", p.alias("p"), y.alias("y")
    )
    pc = F.col("p")
    s = clipped.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.round(
                (F.col("y") - pc) * (1 - 2 * pc), 8
            ).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("num"),
        F.sum(
            F.round(
                (1 - 2 * pc) * (1 - 2 * pc) * pc * (1 - pc), 8
            ).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("den"),
    )
    z = F.col("num") / F.sqrt(F.col("den"))
    return (
        s.where(F.col("den") > 0)
        .select(
            "source",
            "n",
            F.round(z, 4).alias("spiegelhalter_z"),
            F.when(
                (F.col("n") >= 30) & (F.col("den") > 0),
                F.abs(z) > 1.96,
            ).alias("miscalibrated_5pct"),
        )
        .orderBy("source")
    )


@query(
    "eval_hosmer_lemeshow",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    clipped AS (
        SELECT doc_id, least(1.0, greatest(0.0, s)) AS p,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM scored
    ),
    binned AS (
        SELECT p, y,
               NTILE(10) OVER (ORDER BY p, doc_id) AS decile
        FROM clipped
    ),
    g AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS o1,
               CAST(SUM(CAST(round(p, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS e1
        FROM binned GROUP BY decile
    ),
    terms AS (
        SELECT decile, n_g, o1, e1,
               round(CASE WHEN e1 > 0 AND e1 < n_g THEN
                   (o1 - e1) * (o1 - e1) / (e1 * (1 - e1 / n_g))
               END, 8) AS term
        FROM g
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_g, o1,
           {sql_jround("e1", 6)} AS e1,
           {sql_jround("term", 6)} AS hl_term,
           {sql_jround(
               "CAST(SUM(CAST(term AS DECIMAL(38,8))) OVER ()"
               " AS DOUBLE)", 4)} AS hl_chi2,
           CAST(SUM(CAST(term AS DECIMAL(38,8))) OVER () AS DOUBLE)
               > 15.507 AS miscalibrated_5pct
    FROM terms
    ORDER BY decile
    """,
)
def eval_hosmer_lemeshow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit for the clipped quality score
    as P(lang='en'): split the corpus into score deciles (NTILE,
    ties broken by doc_id so both engines cut identically), compare
    observed vs expected positives per decile, chi2 = sum
    (O-E)^2/(E(1-E/n)) against chi-square(8)'s 15.507 — the named
    decile-calibration TEST complementing eval_calibration_ece's
    fixed-width descriptive bins. Degenerate deciles (expected 0 or
    n) contribute NULL terms, excluded from the decimal-summed chi2
    on both engines (SUM skips NULLs).

    Scale shape: one rank window (the only sort), then ten-row
    arithmetic; expected counts are 8dp-rounded decimal sums."""
    scored = _scored(spark)
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    clipped = scored.select(
        "doc_id",
        p.alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    w = Window.orderBy("p", "doc_id")
    binned = clipped.select(
        "p", "y", F.ntile(10).over(w).alias("decile")
    )
    g = binned.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("y").cast("bigint").alias("o1"),
        F.sum(F.round(F.col("p"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("e1"),
    )
    e1, n_g, o1 = F.col("e1"), F.col("n_g"), F.col("o1")
    term = F.round(
        F.when(
            (e1 > 0) & (e1 < n_g),
            (o1 - e1) * (o1 - e1) / (e1 * (1 - e1 / n_g)),
        ),
        8,
    )
    terms = g.select(
        "decile", "n_g", "o1", "e1", term.alias("term")
    )
    w_all = Window.partitionBy(F.lit(1))
    chi2 = (
        F.sum(F.col("term").cast("decimal(38,8)"))
        .over(w_all)
        .cast("double")
    )
    return terms.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_g",
        "o1",
        F.round(e1, 6).alias("e1"),
        F.round(F.col("term"), 6).alias("hl_term"),
        F.round(chi2, 4).alias("hl_chi2"),
        (chi2 > 15.507).alias("miscalibrated_5pct"),
    ).orderBy("decile")


@query(
    "eval_gwets_ac1",
    oracle=rf"""
    WITH gates AS (
        SELECT source,
               len(t) BETWEEN 10 AND 1000 AS gate_a,
               CAST(len(list_filter(t, x -> x IN ({_SW_SQL})))
                    AS DOUBLE) / len(t) BETWEEN 0.01 AND 0.5 AS gate_b
        FROM (SELECT source,
                     string_split_regex(trim(text), '\s+') AS t
              FROM documents)
    ),
    cells AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN gate_a AND gate_b THEN 1 END)
                    AS BIGINT) AS yy,
               CAST(COUNT(CASE WHEN NOT gate_a AND NOT gate_b THEN 1
                    END) AS BIGINT) AS nn,
               CAST(COUNT(CASE WHEN gate_a THEN 1 END) AS BIGINT)
                   AS a_yes,
               CAST(COUNT(CASE WHEN gate_b THEN 1 END) AS BIGINT)
                   AS b_yes
        FROM gates GROUP BY source
    ),
    probs AS (
        SELECT source, n,
               (yy + nn) * 1e0 / n AS p_o,
               2.0 * ((a_yes * 1e0 / n + b_yes * 1e0 / n) / 2)
                   * (1 - (a_yes * 1e0 / n + b_yes * 1e0 / n) / 2)
                   AS p_e
        FROM cells
    )
    SELECT source, n AS n_docs,
           {sql_jround("p_o", 6)} AS observed_agreement,
           {sql_jround("p_e", 6)} AS chance_agreement,
           {sql_jround(
               "CASE WHEN p_e >= 1e0 THEN 1e0"
               " ELSE (p_o - p_e) / (1e0 - p_e) END", 6)} AS ac1
    FROM probs
    ORDER BY source
    """,
)
def eval_gwets_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 agreement per source between the same two binary
    quality-gate raters as eval_cohens_kappa: AC1's chance term is
    2 pi (1 - pi) with pi the MEAN of the two raters' yes-rates —
    the prevalence-robust coefficient that does not collapse when
    both raters agree on a dominant class (the "kappa paradox":
    kappa can be near zero at 95% observed agreement; AC1 stays
    high). Shipping both makes the paradox auditable per source.

    Scale shape: identical to the kappa key — one scan, map-only
    gates, five conditional counts per source; AC1 is closed-form
    per row with the same p_e-saturation guard."""
    t = F.split(F.trim(F.col("text")), r"\s+")
    d = spark.table("documents").select("source", t.alias("t"))
    n_tok = F.size("t")
    sw_ratio = (
        F.size(F.filter("t", lambda x: x.isin(*_STOPWORDS))).cast(
            "double"
        )
        / n_tok
    )
    gates = d.select(
        "source",
        n_tok.between(10, 1000).alias("gate_a"),
        sw_ratio.between(0.01, 0.5).alias("gate_b"),
    )
    a, b = F.col("gate_a"), F.col("gate_b")
    cells = gates.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count(F.when(a & b, 1)).cast("bigint").alias("yy"),
        F.count(F.when(~a & ~b, 1)).cast("bigint").alias("nn"),
        F.count(F.when(a, 1)).cast("bigint").alias("a_yes"),
        F.count(F.when(b, 1)).cast("bigint").alias("b_yes"),
    )
    n = F.col("n")
    p_o = (F.col("yy") + F.col("nn")) * 1.0 / n
    pi = (F.col("a_yes") * 1.0 / n + F.col("b_yes") * 1.0 / n) / 2
    p_e = 2.0 * pi * (1 - pi)
    ac1 = F.when(p_e >= 1.0, F.lit(1.0)).otherwise(
        (p_o - p_e) / (1.0 - p_e)
    )
    return cells.select(
        "source",
        n.alias("n_docs"),
        F.round(p_o, 6).alias("observed_agreement"),
        F.round(p_e, 6).alias("chance_agreement"),
        F.round(ac1, 6).alias("ac1"),
    ).orderBy("source")


@query(
    "eval_weighted_kappa",
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    rated AS (
        SELECT least(CAST(floor(least(1.0, greatest(0.0, s)) * 4)
                          AS INTEGER), 3) AS ra,
               least(CAST(n_chars // 1000 AS INTEGER), 3) AS rb
        FROM scored s0
        JOIN documents d USING (doc_id)
    ),
    obs AS (
        SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM rated GROUP BY ra, rb
    ),
    grid AS (  -- FULL 4x4 grid: absent cells are true zeros
        SELECT gi.i AS ra, gj.j AS rb, COALESCE(o.cnt, 0) AS cnt
        FROM generate_series(0, 3) AS gi(i)
        CROSS JOIN generate_series(0, 3) AS gj(j)
        LEFT JOIN obs o ON o.ra = gi.i AND o.rb = gj.j
    ),
    m AS (
        -- the grid always has 16 rows, so on EMPTY input n is 0 (not
        -- NULL): every division is guarded so zero-row tables produce
        -- zero output rows instead of 0/0
        SELECT ra, rb, cnt,
               SUM(cnt) OVER () AS n,
               SUM(cnt) OVER (PARTITION BY ra) AS row_m,
               SUM(cnt) OVER (PARTITION BY rb) AS col_m,
               1.0 - abs(ra - rb) / 3.0 AS w
        FROM grid
    ),
    s AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(CAST(round(w * cnt, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS s_po,
               CAST(SUM(CAST(round(CASE WHEN n > 0 THEN
                                   w * row_m * col_m / (1e0 * n) END,
                                   8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS s_pe
        FROM m
    ),
    r AS (
        SELECT n, s_po / n AS po_w, s_pe / n AS pe_w
        FROM s WHERE n > 0
    )
    SELECT n AS n_docs, {sql_jround("po_w", 6)} AS po_weighted,
           {sql_jround("pe_w", 6)} AS pe_weighted,
           {sql_jround(
               "CASE WHEN pe_w >= 1e0 THEN 1e0"
               " ELSE (po_w - pe_w) / (1e0 - pe_w) END", 6)}
               AS weighted_kappa
    FROM r
    """,
)
def eval_weighted_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linearly weighted Cohen's kappa between two ORDINAL raters of
    the same documents — the score quartile (fixed-width bins of the
    clipped quality score) vs the length quartile (n_chars // 1000,
    capped) — where near-misses earn partial credit w = 1 - |i-j|/3:
    the ordinal-scale agreement readout the unweighted kappa family
    cannot express (a 0-vs-3 disagreement should cost more than
    0-vs-1). The 4x4 grid is built FULL (absent cells as true zeros,
    the absent-cell discipline), so the marginal products in the
    chance term are complete even when a rating level never
    co-occurs.

    Scale shape: one scan collapses to at most 16 observed cells;
    the full grid, marginals, and both weighted sums are
    constant-sized; weighted terms are 8dp-rounded decimal sums."""
    scored = _scored(spark)
    d = spark.table("documents").select("doc_id", "n_chars")
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    rated = scored.join(d, "doc_id").select(
        F.least(F.floor(p * 4).cast("int"), F.lit(3)).alias("ra"),
        F.least(
            (F.col("n_chars") / 1000).cast("int"), F.lit(3)
        ).alias("rb"),
    )
    obs = rated.groupBy("ra", "rb").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    gi = spark.range(0, 4).select(F.col("id").cast("int").alias("ra"))
    gj = spark.range(0, 4).select(F.col("id").cast("int").alias("rb"))
    grid = (
        gi.crossJoin(F.broadcast(gj))
        .join(F.broadcast(obs), ["ra", "rb"], "left")
        .select(
            "ra",
            "rb",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    w_all = Window.partitionBy(F.lit(1))
    w_row = Window.partitionBy("ra")
    w_col = Window.partitionBy("rb")
    # The grid always holds 16 rows, so on EMPTY input n is 0, not
    # NULL — every division is guarded (per-row and post-aggregate)
    # so zero-row tables produce zero output rows instead of 0/0.
    m = grid.select(
        "ra",
        "rb",
        "cnt",
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("cnt").over(w_row).alias("row_m"),
        F.sum("cnt").over(w_col).alias("col_m"),
        (1.0 - F.abs(F.col("ra") - F.col("rb")) / 3.0).alias("w"),
    )
    s = m.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(
            F.round(F.col("w") * F.col("cnt"), 8).cast(
                "decimal(38,8)"
            )
        )
        .cast("double")
        .alias("s_po"),
        F.sum(
            F.round(
                F.when(
                    F.col("n") > 0,
                    F.col("w")
                    * F.col("row_m")
                    * F.col("col_m")
                    / (1.0 * F.col("n")),
                ),
                8,
            ).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("s_pe"),
    )
    s = s.where(F.col("n") > 0).select(
        "n",
        (F.col("s_po") / F.col("n")).alias("po_w"),
        (F.col("s_pe") / F.col("n")).alias("pe_w"),
    )
    po_w, pe_w = F.col("po_w"), F.col("pe_w")
    kw = F.when(pe_w >= 1.0, F.lit(1.0)).otherwise(
        (po_w - pe_w) / (1.0 - pe_w)
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.round(po_w, 6).alias("po_weighted"),
        F.round(pe_w, 6).alias("pe_weighted"),
        F.round(kw, 6).alias("weighted_kappa"),
    )


@query(
    "eval_kendalls_w",
    oracle=r"""
    WITH metrics AS (  -- three integer judge scores per source
        SELECT source,
               CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                    AS BIGINT) AS m_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS m_chars,
               CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END)
                    AS BIGINT) AS m_en
        FROM documents GROUP BY source
    ),
    long AS (
        SELECT source, 1 AS rater, m_tokens AS v FROM metrics
        UNION ALL
        SELECT source, 2, m_chars FROM metrics
        UNION ALL
        SELECT source, 3, m_en FROM metrics
    ),
    ranked AS (
        SELECT source, rater, v,
               CAST(RANK() OVER (PARTITION BY rater ORDER BY v)
                    AS DOUBLE)
                 + (COUNT(*) OVER (PARTITION BY rater, v) - 1) / 2.0
                   AS r
        FROM long
    ),
    ties AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
        FROM (SELECT rater, v, COUNT(*) AS t
              FROM long GROUP BY rater, v)
    ),
    items AS (
        SELECT source,
               CAST(SUM(CAST(r AS DECIMAL(28,4))) AS DOUBLE) AS ri
        FROM ranked GROUP BY source
    ),
    framed AS (  -- materialize n before aggregating (no window
                 -- calls inside aggregate arguments)
        SELECT ri, COUNT(*) OVER () AS n_w,
               ri - 3 * (COUNT(*) OVER () + 1) / 2.0 AS dev
        FROM items
    ),
    s AS (
        SELECT CAST(MAX(n_w) AS BIGINT) AS n,
               CAST(SUM(CAST(dev * dev AS DECIMAL(38,4)))
                    AS DOUBLE) AS ss
        FROM framed
    ),
    w AS (
        SELECT s.n, s.ss,
               s.ss / (9.0 * (CAST(s.n AS DOUBLE) * s.n * s.n - s.n)
                       / 12.0
                       - 3.0 * t.tsum / 12.0) AS kw
        FROM s, ties t
        WHERE 9.0 * (CAST(s.n AS DOUBLE) * s.n * s.n - s.n) / 12.0
              - 3.0 * t.tsum / 12.0 > 0
    )
    SELECT n AS n_items, CAST(3 AS BIGINT) AS m_raters,
           round(kw, 6) AS kendalls_w,
           round(3 * (n - 1) * kw, 4) AS chi2,
           CASE WHEN n = 20 THEN 3 * (n - 1) * kw > 30.1435 END
               AS significant_5pct
    FROM w
    """,
)
def eval_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across three
    deterministic integer judges ranking the sources (total tokens,
    total characters, English-document count): W = S / (m^2 (n^3 -
    n)/12 - m sum T /12) with the standard tie correction, plus the
    chi-square approximation m(n-1)W against df = n-1 (the 30.1435
    literal encodes df = 19, so the verdict is withheld unless
    exactly the fixture's 20 sources are present). The MANY-rater
    generalization the agreement family needed: kappa/AC1 rate two
    categorical raters, Fleiss m categorical raters, Kendall's W m
    ORDINAL rankings — "do the judges order the items the same way".

    All ranks are midranks over INTEGER metrics, so rank sums are
    half-integer exact and every statistic is closed-form on exact
    sums.

    Scale shape: one corpus scan to the 20-row metric table; the
    unpivot, rank windows, and tie groups all ride that metadata-
    sized frame."""
    t = F.split(F.trim(F.col("text")), r"\s+")
    metrics = spark.table("documents").groupBy("source").agg(
        F.sum(F.size(t)).cast("bigint").alias("m_tokens"),
        F.sum("n_chars").cast("bigint").alias("m_chars"),
        F.count(F.when(F.col("lang") == "en", 1))
        .cast("bigint")
        .alias("m_en"),
    )
    from powersql_spark.catalog import track_persist

    metrics = track_persist(metrics)
    long = (
        metrics.select(
            "source", F.lit(1).alias("rater"),
            F.col("m_tokens").alias("v"),
        )
        .unionAll(
            metrics.select(
                "source", F.lit(2), F.col("m_chars")
            )
        )
        .unionAll(
            metrics.select("source", F.lit(3), F.col("m_en"))
        )
    )
    w_rank = Window.partitionBy("rater").orderBy("v")
    w_tie = Window.partitionBy("rater", "v")
    ranked = long.select(
        "source",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count("*").over(w_tie) - 1) / 2.0
        ).alias("r"),
    )
    ties = long.groupBy("rater", "v").agg(
        F.count("*").alias("t")
    ).agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("bigint")
        .alias("tsum")
    )
    items = ranked.groupBy("source").agg(
        F.sum(F.col("r").cast("decimal(28,4)"))
        .cast("double")
        .alias("ri")
    )
    w_all = Window.partitionBy(F.lit(1))
    dev = F.col("ri") - 3 * (F.count("*").over(w_all) + 1) / 2.0
    framed = items.select(
        "ri", F.count("*").over(w_all).alias("n_w"), dev.alias("dev")
    )
    s = framed.agg(
        F.max("n_w").cast("bigint").alias("n"),
        F.sum((F.col("dev") * F.col("dev")).cast("decimal(38,4)"))
        .cast("double")
        .alias("ss"),
    )
    j = s.crossJoin(F.broadcast(ties))
    n = F.col("n")
    denom = (
        9.0 * (n.cast("double") * n * n - n) / 12.0
        - 3.0 * F.col("tsum") / 12.0
    )
    kw = F.col("ss") / denom
    return j.where(denom > 0).select(
        n.alias("n_items"),
        F.lit(3).cast("bigint").alias("m_raters"),
        F.round(kw, 6).alias("kendalls_w"),
        F.round(3 * (n - 1) * kw, 4).alias("chi2"),
        F.when(n == 20, 3 * (n - 1) * kw > 30.1435).alias(
            "significant_5pct"
        ),
    )
