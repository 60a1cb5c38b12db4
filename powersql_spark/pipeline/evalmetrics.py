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
