"""Round-13 second-wave text keys: Yule's characteristic K and the
Coleman-Liau readability index.

Extensions beyond the reference (SURVEY.md §2.B.11), ranked after the
r13 first wave per the README tranche plan. Shares text_r13's
vocabulary-cell device and the house numeric discipline:
integer-exact counts, one shared double tree per score, jround-
replayed terminating rationals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.operators.common import sql_jround
from powersql_spark.pipeline.text import _tokens
from powersql_spark.pipeline.text_r13 import _TOK_CTE, _tok_cells
from powersql_spark.registry import query

# ---------------------------------------------------------------------------
# Yule's characteristic K per source.
# ---------------------------------------------------------------------------


@query(
    "text_yule_k",
    oracle=f"""
    WITH {_TOK_CTE},
    s AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS v_types,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM tok GROUP BY source
    )
    SELECT source, n_tokens, v_types,
           {sql_jround(
               "10000.0 * (s2 - n_tokens)"
               " / (CAST(n_tokens AS DOUBLE) * n_tokens)", 4)}
               AS yule_k
    FROM s WHERE n_tokens > 0
    ORDER BY source
    """,
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source: 10^4 (sum m^2 V_m - N) /
    N^2 = 10^4 (sum c^2 - N) / N^2 over the token-frequency cells —
    the classical repeat-rate constant, designed to be SAMPLE-SIZE
    INVARIANT where raw TTR (text_lexical_diversity) collapses with
    length. High K = a few types dominate (template farms); the
    scale-free companion to text_simpson_diversity (K is 10^4 times
    the unbiased repeat rate less the self-match term) and
    text_pielou_evenness's size-normalized J.

    Numerics: N, V and the sum of squared counts are integer-exact
    (cell counts are far below the int64 square bound at any SF); K
    is one shared double rational, jround-replayed since it can
    terminate.

    Scale shape: one explode to (source, word) cells with map-side
    partial counts, one aggregation of the vocabulary-bounded
    table."""
    tok = _tok_cells(spark)
    c = F.col("c")
    s = tok.groupBy("source").agg(
        F.sum(c).cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("v_types"),
        F.sum(c * c).cast("bigint").alias("s2"),
    )
    k = (
        10000.0
        * (F.col("s2") - F.col("n_tokens"))
        / (F.col("n_tokens").cast("double") * F.col("n_tokens"))
    )
    return (
        s.where(F.col("n_tokens") > 0)
        .select(
            "source",
            "n_tokens",
            "v_types",
            F.round(k, 4).alias("yule_k"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Coleman-Liau readability index per document.
# ---------------------------------------------------------------------------


@query(
    "text_coleman_liau",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    AS BIGINT) AS n_letters,
               CAST(len(string_split_regex(trim(text), '\s+'))
                    AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[.!?]')) + 1
                    AS BIGINT) AS n_sents
        FROM documents
    )
    SELECT doc_id, n_letters, n_words, n_sents,
           CAST(round(CAST(CAST(
               0.0588 * (100.0 * n_letters / n_words)
               - 0.296 * (100.0 * n_sents / n_words) - 15.8
           AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) AS cli
    FROM t WHERE n_words > 0
    ORDER BY doc_id
    """,
)
def text_coleman_liau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coleman-Liau readability index per document: 0.0588 L -
    0.296 S - 15.8 with L = letters per 100 words and S = sentences
    per 100 words. The third standard readability scale in the
    family, and the only one needing NO syllable proxy — it was
    designed for machine scoring from character counts alone, so it
    cross-checks the vowel-group heuristic shared by
    text_readability (Flesch) and text_gunning_fog: a document the
    proxy-based scales band as easy but CLI bands as hard has
    letter-dense jargon the vowel counter underestimates.

    Numerics: letters, words and sentence marks are integer-exact
    codegen regexp counts; the index is a terminating rational of
    three integers and three exact decimal coefficients —
    sql_jround replays Spark's rounding digit-for-digit.

    Scale shape: map-only regexp counting on one scan, no shuffle,
    no Python."""
    d = spark.table("documents")
    n_letters = F.length(
        F.regexp_replace(F.col("text"), "[^A-Za-z]", "")
    ).cast("bigint")
    n_words = F.size(_tokens()).cast("bigint")
    n_sents = (
        F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")) + 1
    ).cast("bigint")
    t = d.select(
        "doc_id",
        n_letters.alias("n_letters"),
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
    )
    cli = (
        0.0588 * (100.0 * F.col("n_letters") / F.col("n_words"))
        - 0.296 * (100.0 * F.col("n_sents") / F.col("n_words"))
        - 15.8
    )
    return (
        t.where(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_letters",
            "n_words",
            "n_sents",
            F.round(cli, 3).alias("cli"),
        )
        .orderBy("doc_id")
    )
