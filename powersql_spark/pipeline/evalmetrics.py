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
