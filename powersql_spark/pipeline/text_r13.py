"""Round-13 text-analysis widening: species-richness estimation
(Chao1 + Good-Turing coverage), Shannon/Pielou diversity-evenness,
and pairwise Bray-Curtis source dissimilarity.

Extensions beyond the reference (SURVEY.md §2.B.11), ranked after
every banked key per the README r13 tranche plan. Shares text.py's
whitespace tokenization (``_tokens``) and the house numeric
discipline: integer-exact vocabulary-cell sums, 8dp-rounded ln terms
decimal-summed, shared double trees with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.operators.common import sql_jround
from powersql_spark.pipeline.text import _tokens
from powersql_spark.registry import query

# Shared SQL: per-(source, word) token counts.
_TOK_CTE = r"""
    tok AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents)
        GROUP BY source, word
    )
"""


def _tok_cells(spark: SparkSession) -> DataFrame:
    """Spark twin of ``_TOK_CTE``: (source, word, c) vocabulary
    cells — one explode, one partial-aggregated collapse."""
    return (
        spark.table("documents")
        .select("source", F.explode(_tokens()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


@query(
    "text_chao1_richness",
    oracle=f"""
    WITH {_TOK_CTE},
    s AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS v_obs,
               CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT)
                   AS f1,
               CAST(COUNT(CASE WHEN c = 2 THEN 1 END) AS BIGINT)
                   AS f2
        FROM tok GROUP BY source
    )
    SELECT source, n_tokens, v_obs, f1, f2,
           {sql_jround(
               "v_obs + 1e0 * f1 * (f1 - 1) / (2 * (f2 + 1))", 2)}
               AS chao1,
           {sql_jround("1.0 - 1e0 * f1 / n_tokens", 6)}
               AS gt_coverage
    FROM s WHERE n_tokens > 0
    ORDER BY source
    """,
)
def text_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness ESTIMATION per source: the bias-corrected
    Chao1 estimator V + f1(f1-1)/(2(f2+1)) of the true (unseen-
    inclusive) vocabulary size, plus Good-Turing sample coverage
    C = 1 - f1/N (the probability mass NOT yet seen is ~f1/N). Where
    text_frequency_spectrum reports the raw f1/f2 head, this key
    answers the curation question those counts exist for: 'how much
    vocabulary (and probability mass) does this source still hide?' —
    the stopping rule for corpus collection. The bias-corrected form
    is defined even at f2 = 0 — no extra guard needed.

    Numerics: all inputs are integer-exact vocabulary-cell counts;
    the two estimators are shared-tree double rationals.

    Scale shape: one explode to (source, word) cells (partial
    map-side counts), one aggregation of the vocabulary-bounded
    table."""
    tok = _tok_cells(spark)
    c = F.col("c")
    s = tok.groupBy("source").agg(
        F.sum(c).cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("v_obs"),
        F.count(F.when(c == 1, 1)).cast("bigint").alias("f1"),
        F.count(F.when(c == 2, 1)).cast("bigint").alias("f2"),
    )
    f1, f2 = F.col("f1"), F.col("f2")
    chao1 = F.col("v_obs") + 1.0 * f1 * (f1 - 1) / (2 * (f2 + 1))
    cov = 1.0 - 1.0 * f1 / F.col("n_tokens")
    return (
        s.where(F.col("n_tokens") > 0)
        .select(
            "source",
            "n_tokens",
            "v_obs",
            "f1",
            "f2",
            F.round(chao1, 2).alias("chao1"),
            F.round(cov, 6).alias("gt_coverage"),
        )
        .orderBy("source")
    )


@query(
    "text_pielou_evenness",
    oracle=f"""
    WITH {_TOK_CTE},
    s AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS v_types,
               -CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)
                        / (SELECT SUM(c) FROM tok t2
                           WHERE t2.source = tok.source)), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) / SUM(c) AS h
        FROM tok GROUP BY source
    )
    SELECT source, n_tokens, v_types,
           {sql_jround("h", 6)} AS shannon_h,
           CASE WHEN v_types > 1 THEN
               {sql_jround("h / ln(CAST(v_types AS DOUBLE))", 6)} END
               AS pielou_j
    FROM s WHERE n_tokens > 0
    ORDER BY source
    """,
)
def text_pielou_evenness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram Shannon entropy H and Pielou evenness J = H / ln V per
    source: how uniformly a source spreads its token mass over its
    vocabulary (J -> 1: all types equally used; J -> 0: a few
    templates dominate). The size-normalized companion to the
    repeat-rate constants (Yule K, Simpson D) — two sources with
    equal K can differ sharply in J when their vocabulary sizes
    differ. Single-type sources report NULL evenness (ln V = 0).

    Numerics: ln(p) terms 8dp-rounded, integer-weighted,
    decimal-summed (the profile_mutual_information discipline); the
    normalization is one guarded ratio.

    Scale shape: one explode to vocabulary cells; H aggregates that
    bounded table (the per-source total rides a window, not a second
    corpus pass)."""
    from pyspark.sql import Window

    tok = _tok_cells(spark)
    wsrc = Window.partitionBy("source")
    m = tok.select(
        "source",
        "c",
        F.sum("c").over(wsrc).alias("n_src"),
    )
    s = m.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("v_types"),
        (
            -F.sum(
                F.col("c")
                * F.round(
                    F.log(F.col("c").cast("double") / F.col("n_src")),
                    8,
                ).cast("decimal(38,8)")
            ).cast("double")
            / F.sum("c")
        ).alias("h"),
    )
    return (
        s.where(F.col("n_tokens") > 0)
        .select(
            "source",
            "n_tokens",
            "v_types",
            F.round("h", 6).alias("shannon_h"),
            F.when(
                F.col("v_types") > 1,
                F.round(
                    F.col("h")
                    / F.log(F.col("v_types").cast("double")),
                    6,
                ),
            ).alias("pielou_j"),
        )
        .orderBy("source")
    )


@query(
    "text_bray_curtis_sources",
    oracle=f"""
    WITH {_TOK_CTE},
    marg AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tok
        GROUP BY source
    ),
    shared AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS s_min
        FROM tok a JOIN tok b
          ON b.word = a.word AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT ma.source AS src_a, mb.source AS src_b,
           COALESCE(sh.s_min, 0) AS shared_mass,
           {sql_jround(
               "1.0 - 2.0 * COALESCE(sh.s_min, 0)"
               " / (ma.n + mb.n)", 6)} AS bray_curtis
    FROM marg ma
    JOIN marg mb ON ma.source < mb.source
    LEFT JOIN shared sh
      ON sh.src_a = ma.source AND sh.src_b = mb.source
    WHERE ma.n + mb.n > 0
    ORDER BY src_a, src_b
    """,
)
def text_bray_curtis_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Bray-Curtis dissimilarity between source token
    distributions: BC = 1 - 2 sum(min(c_a, c_b)) / (N_a + N_b) over
    the shared vocabulary — the abundance-weighted overlap measure
    (0: identical token mixes; 1: disjoint). The corpus-mixing
    diagnostic behind dedup_cross_source_matrix's exact-duplicate
    view: two sources can share zero duplicate DOCUMENTS yet be
    near-identical distributions (template farms), which BC exposes.
    Disjoint-vocabulary pairs get shared_mass 0 via the outer join.

    Numerics: shared mass and both marginals are integer-exact; BC is
    one shared-tree rational per pair.

    Scale shape: one explode to vocabulary cells; the pair overlap is
    a WORD-equi join of the cell table with itself (never a document
    cartesian), collapsing to (sources x sources)/2 rows."""
    tok = _tok_cells(spark)
    from powersql_spark.catalog import track_persist

    tok = track_persist(tok)
    marg = tok.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    a, b = tok.alias("a"), tok.alias("b")
    shared = (
        a.join(
            b,
            (F.col("b.word") == F.col("a.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(
            F.sum(F.least(F.col("a.c"), F.col("b.c")))
            .cast("bigint")
            .alias("s_min")
        )
    )
    ma, mb = marg.alias("ma"), marg.alias("mb")
    pairs = ma.join(
        mb, F.col("ma.source") < F.col("mb.source")
    ).join(
        shared,
        (F.col("src_a") == F.col("ma.source"))
        & (F.col("src_b") == F.col("mb.source")),
        "left",
    )
    sm = F.coalesce(F.col("s_min"), F.lit(0))
    return (
        pairs.where(F.col("ma.n") + F.col("mb.n") > 0)
        .select(
            F.col("ma.source").alias("src_a"),
            F.col("mb.source").alias("src_b"),
            sm.alias("shared_mass"),
            F.round(
                1.0 - 2.0 * sm / (F.col("ma.n") + F.col("mb.n")), 6
            ).alias("bray_curtis"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# Gunning fog readability (per document).
# ---------------------------------------------------------------------------


@query(
    "text_gunning_fog",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, word
        FROM (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents)
    ),
    t AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(COUNT(CASE WHEN
                    len(regexp_extract_all(lower(word), '[aeiouy]+'))
                        >= 3 THEN 1 END) AS BIGINT) AS n_complex
        FROM w GROUP BY doc_id
    ),
    s AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[.!?]')) + 1
                    AS BIGINT) AS n_sents
        FROM documents
    )
    SELECT t.doc_id, t.n_words, t.n_complex, s.n_sents,
           CAST(round(CAST(CAST(0.4 * (
                CAST(t.n_words AS DOUBLE) / s.n_sents
                + 100.0 * t.n_complex / t.n_words)
                AS VARCHAR) AS DECIMAL(38,18)), 2) AS DOUBLE)
               AS fog_index
    FROM t JOIN s ON s.doc_id = t.doc_id
    WHERE t.n_words > 0
    ORDER BY t.doc_id
    """,
)
def text_gunning_fog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gunning fog index per document: 0.4 (words/sentences +
    100 complex/words), where a complex word has >= 3 vowel groups
    (the same syllable proxy as text_readability's Flesch — exact
    syllabification needs a dictionary; the proxy suffices for
    FILTERING). Fog weights long-WORD density where Flesch weights
    total syllable load, so the pair disagrees exactly on
    jargon-dense short-sentence text — the style curation bands care
    about. The complement lands this family's second standard
    readability scale from one extra per-word aggregation.

    Scale shape: one explode for per-word complexity counts
    (codegen regexp, no Python), one per-doc sentence count on the
    raw scan, one doc-grain equi-join. The index is a terminating
    rational of three integers — sql_jround replays Spark's
    rounding."""
    w = spark.table("documents").select(
        "doc_id", F.explode(_tokens()).alias("word")
    )
    n_syll = F.size(
        F.expr("regexp_extract_all(lower(word), '[aeiouy]+', 0)")
    )
    t = w.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.count(F.when(n_syll >= 3, 1))
        .cast("bigint")
        .alias("n_complex"),
    )
    s = spark.table("documents").select(
        "doc_id",
        (
            F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")) + 1
        )
        .cast("bigint")
        .alias("n_sents"),
    )
    fog = 0.4 * (
        F.col("n_words").cast("double") / F.col("n_sents")
        + 100.0 * F.col("n_complex") / F.col("n_words")
    )
    return (
        t.join(s, "doc_id")
        .where(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            "n_complex",
            "n_sents",
            F.round(fog, 2).alias("fog_index"),
        )
        .orderBy("doc_id")
    )
