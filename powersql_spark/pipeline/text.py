"""Text analysis over the ``documents`` table (driver north-star extension;
NOT in the reference — see SURVEY.md §2.B.11).

Operators are Spark built-ins (whole-stage codegen) except where Python
is the point: language-ID is an n-gram/stopword heuristic, quality
scoring is length/stopword ratios, token counting is a regex split,
fingerprinting is md5 over normalized text; ``udf_pandas_score`` is the
deliberate exception — the Arrow-vectorized ``@pandas_udf`` slot where a
real model scorer plugs in. Each scales linearly with an
embarrassingly-parallel map — no shuffle at all except where aggregation
is the point.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.catalog import track_persist, values_df
from powersql_spark.operators.common import DEC, sql_jround
from powersql_spark.registry import query

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


def _tokens(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
               AS n_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + counts — the token-count primitive every
    data pipeline needs before length filtering / packing."""
    d = spark.table("documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
    )


@query(
    "text_quality_score",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\s+') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(length(text) AS DOUBLE) / len(t) AS avg_token_len,
           CAST(len(list_filter(t, x -> x IN ({_SW_SQL}))) AS DOUBLE)
               / len(t) AS stopword_ratio,
           CAST(CASE WHEN len(t) BETWEEN 10 AND 1000 THEN 0.5 ELSE 0.0 END
            + CASE WHEN CAST(len(list_filter(t, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                        / len(t) BETWEEN 0.01 AND 0.5
                   THEN 0.5 ELSE 0.0 END AS DOUBLE) AS quality
    FROM toks
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: token count in range + sane stopword
    ratio (the Gopher-rules family of filters, reduced to components that
    are oracle-expressible)."""
    t = _tokens()
    d = spark.table("documents").select("doc_id", "text", t.alias("t"))
    n_tok = F.size("t")
    sw = F.size(F.filter("t", lambda x: x.isin(*_STOPWORDS)))
    sw_ratio = sw.cast("double") / n_tok
    quality = (
        F.when(n_tok.between(10, 1000), 0.5).otherwise(0.0)
        + F.when(sw_ratio.between(0.01, 0.5), 0.5).otherwise(0.0)
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (F.length("text").cast("double") / n_tok).alias("avg_token_len"),
        sw_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


@query(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           (CASE
                WHEN (' ' || text || ' ') LIKE '% the %'
                  OR (' ' || text || ' ') LIKE '% and %' THEN 'en'
                WHEN (' ' || text || ' ') LIKE '% der %'
                  OR (' ' || text || ' ') LIKE '% und %' THEN 'de'
                WHEN (' ' || text || ' ') LIKE '% el %'
                  OR (' ' || text || ' ') LIKE '% los %' THEN 'es'
                ELSE 'unk'
            END) AS lang_pred
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via stopword-marker heuristic (n-gram
    heuristic reduced to marker words so the DuckDB oracle can run the
    identical rule). Production note: swap the CASE for a fastText/CLD3
    pandas_udf — the plumbing (map-only, no shuffle) is identical."""
    d = spark.table("documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = (
        F.when(padded.like("% the %") | padded.like("% and %"), "en")
        .when(padded.like("% der %") | padded.like("% und %"), "de")
        .when(padded.like("% el %") | padded.like("% los %"), "es")
        .otherwise("unk")
    )
    return d.select("doc_id", "lang", pred.alias("lang_pred"))


@query(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
               AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized, lowercased
    text — the canonical-form hash used as the exact-dedup key."""
    d = spark.table("documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


@query(
    "text_chunk",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(start - 1 AS INTEGER) AS chunk_start,
           array_to_string(t[start : start + 63], ' ') AS chunk_text,
           CAST(LEAST(64, len(t) - start + 1) AS INTEGER) AS chunk_len
    FROM toks, unnest(range(1, GREATEST(len(t), 1) + 1, 48)) AS u(start)
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 64-token chunks with 16-token overlap
    (stride 48) — THE packing primitive before tokenization in a
    training pipeline. Offsets via sequence + explode (codegen, no
    Python, no shuffle); each chunk slices the token array in place.
    At 100 TB: map-only, output partitioning inherits the input's."""
    d = spark.table("documents")
    toks = _tokens()
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(48))
    return (
        d.select("doc_id", toks.alias("t"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.col("s").cast("int").alias("chunk_start"),
            F.array_join(F.slice("t", F.col("s") + 1, 64), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(64), F.size("t") - F.col("s")).cast("int").alias(
                "chunk_len"
            ),
        )
    )


@query(
    "text_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
               AS INTEGER) AS n_bpe_tokens,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
               AS n_ws_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pretokenizer count (GPT-2-style split: contraction
    suffixes, space-prefixed letter runs, digit runs, punctuation runs)
    next to the whitespace count — the standard cheap estimate of LLM
    token cost before running a real tokenizer. ASCII classes keep the
    regex identical under Java regex (Spark) and RE2 (DuckDB)."""
    d = spark.table("documents")
    pat = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(_tokens()).alias("n_ws_tokens"),
    )


@query(
    "pipeline_training_data",
    oracle=rf"""
    WITH quality AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\s+') AS t
        FROM documents
        WHERE lang = 'en'
    ),
    scored AS (
        SELECT doc_id, text, len(t) AS n_tokens,
               CAST(len(list_filter(t, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                   / len(t) AS sw_ratio
        FROM quality
        WHERE len(t) >= 10
    ),
    kept AS (
        SELECT doc_id, text, n_tokens FROM scored WHERE sw_ratio >= 0.05
    ),
    fp AS (
        SELECT doc_id, text, n_tokens,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
        FROM kept
    ),
    canonical AS (
        SELECT doc_id, text, n_tokens
        FROM (SELECT *, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
              FROM fp)
        WHERE rn = 1
    )
    SELECT doc_id,
           CAST(start - 1 AS INTEGER) AS chunk_start,
           array_to_string(
               string_split_regex(trim(text), '\s+')[start : start + 63],
               ' ') AS chunk_text
    FROM canonical,
         unnest(range(1, GREATEST(n_tokens, 1) + 1, 48)) AS u(start)
    """,
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data funnel as ONE declarative plan:
    language filter -> length + stopword-ratio quality gate -> exact
    dedup (keep lowest doc_id per fingerprint) -> sliding-window
    chunking. Because it's a single DataFrame chain, Catalyst fuses the
    filters into the scan, the dedup is the only shuffle, and chunking
    explodes AFTER dedup so dropped documents never pay chunking cost.
    The per-stage operators exist as standalone keys (text_quality_score,
    dedup_exact, text_chunk); this key proves they compose."""
    d = spark.table("documents").where(F.col("lang") == "en")
    toks = _tokens()
    n = F.size(toks)
    scored = (
        d.select("doc_id", "text", toks.alias("t"), n.alias("n_tokens"))
        .where(F.col("n_tokens") >= 10)
        .withColumn(
            "sw_ratio",
            F.size(F.filter("t", lambda x: x.isin(*_STOPWORDS))).cast("double")
            / F.col("n_tokens"),
        )
        .where(F.col("sw_ratio") >= 0.05)
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    from pyspark.sql import Window as W

    w = W.partitionBy("f").orderBy("doc_id")
    canonical = (
        scored.withColumn("f", F.md5(norm))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n_tokens") - 1, F.lit(0)), F.lit(48)
    )
    return canonical.select(
        "doc_id", "t", F.explode(starts).alias("s")
    ).select(
        "doc_id",
        F.col("s").cast("int").alias("chunk_start"),
        F.array_join(F.slice("t", F.col("s") + 1, 64), " ").alias(
            "chunk_text"
        ),
    )


@query(
    "grouped_zscore",
    oracle="""
    SELECT event_id, user_id,
           round(CASE WHEN stddev_samp(value) OVER w IS NULL
                      OR stddev_samp(value) OVER w = 0 THEN 0.0
                      ELSE (value - avg(value) OVER w)
                           / stddev_samp(value) OVER w END, 6) AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score normalization via applyInPandas (grouped-map
    Pandas UDF): each user's events arrive as ONE pandas DataFrame,
    Arrow-transferred — the escape hatch for group-local logic that
    built-ins can't express (sklearn transforms, per-group model
    scoring). For THIS computation the window-function form (the
    oracle) is the better plan — the docstring point is the mechanism,
    and the test proves the two agree exactly."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std()  # pandas std = sample stddev, ddof=1
        mean = pdf["value"].mean()
        z = (
            (pdf["value"] - mean) / sd
            if sd and not pd.isna(sd) and sd != 0
            else pdf["value"] * 0.0
        )
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "z": z.round(6),
            }
        )

    # Explicit cores-derived repartition on the group key: the
    # grouped-map stage's cost is per-GROUP python/Arrow work, not
    # bytes, so AQE's byte-based coalescing (seeing a ~2 MB exchange)
    # collapsed it to ONE task running every group serially (profiled:
    # a single 3.0 s task after a 32-way map stage). The repartition
    # satisfies the same clustering applyInPandas requires, so no
    # extra exchange is added — the one shuffle just keeps its width.
    n_parts = spark.sparkContext.defaultParallelism
    return (
        spark.table("events")
        .select("event_id", "user_id", "value")
        .repartition(n_parts, "user_id")
        .groupBy("user_id")
        .applyInPandas(zscore, schema="event_id bigint, user_id bigint, z double")
    )


@query(
    "text_repetition_ratio",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, t,
               CASE WHEN len(t) >= 2 THEN
                   list_transform(range(1, len(t)),
                       i -> list_extract(t, i) || ' ' || list_extract(t, i + 1))
               ELSE t END AS bg
        FROM toks
    )
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           1 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
               AS dup_token_ratio,
           1 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
               AS dup_bigram_ratio
    FROM grams
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signal (the Gopher/RefinedWeb filter
    family): fraction of duplicate tokens and duplicate bigrams per
    document — high values flag boilerplate/spam for removal before
    training. Pure built-ins, map-only, no shuffle; single-token docs
    fall back to unigrams for the bigram ratio (mirroring the dedup
    shingle convention)."""
    toks = _tokens()
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(toks)
    d = spark.table("documents").select(
        "doc_id", toks.alias("t"), bigrams.alias("bg")
    )
    return d.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        (
            F.lit(1)
            - F.size(F.array_distinct("t")).cast("double") / F.size("t")
        ).alias("dup_token_ratio"),
        (
            F.lit(1)
            - F.size(F.array_distinct("bg")).cast("double") / F.size("bg")
        ).alias("dup_bigram_ratio"),
    )


@query(
    "text_idf",
    oracle=r"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+'))
            AS token
        FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token, COUNT(*) AS df,
           round(ln(n_docs / CAST(COUNT(*) AS DOUBLE)), 4) AS idf
    FROM tok, n
    GROUP BY token, n_docs
    """,
)
def text_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus IDF table: per-token document frequency and
    ln(N/df) — the weighting table TF-IDF quality filters and sparse
    retrievers consume. Document frequency = distinct (doc, token)
    pairs, so within-doc repetition doesn't inflate df.

    Scale shape: explode + distinct + count is two hash shuffles of
    (token) — vocabulary-sized, tiny next to the corpus. The corpus
    row count joins in as a single-row broadcast (constant work per
    partition, the scalar-subquery idiom) — never a driver-side
    collect inside the plan."""
    d = spark.table("documents")
    tok = d.select(
        "doc_id", F.explode(_tokens()).alias("token")
    ).distinct()
    n = d.agg(F.count("*").alias("n_docs"))
    return (
        tok.join(F.broadcast(n))
        .groupBy("token", "n_docs")
        .agg(F.count("*").alias("df"))
        .select(
            "token",
            "df",
            F.round(
                F.log(F.col("n_docs") / F.col("df").cast("double")), 4
            ).alias("idf"),
        )
    )


@query(
    "text_ngram_topk",
    oracle=r"""
    WITH toks AS (
        SELECT string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(t)),
                   i -> list_extract(t, i) || ' ' || list_extract(t, i + 1)))
            AS gram
        FROM toks WHERE len(t) >= 2
    )
    SELECT gram, COUNT(*) AS n
    FROM bg
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT 30
    """,
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: the 30 most frequent word bigrams — the
    boilerplate detector (repeated headers/footers surface instantly)
    and the n-gram LM / tokenizer-training primitive.

    Scale shape: explode -> partial count (map-side combine) -> one
    shuffle of (gram, partial_n) -> TakeOrderedAndProject top-k — no
    global sort; ties broken by gram so the cut is deterministic. At
    100 TB, swap the exact count for count-min sketch + candidate
    re-count if the vocabulary itself stops fitting."""
    d = spark.table("documents")
    toks = _tokens()
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        d.where(n >= 2)
        .select(F.explode(bigrams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(30)
    )


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


@query(
    "text_pii_redact",
    oracle=rf"""
    WITH dirty AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.17'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call 202-555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IPV4_RE}')) AS INTEGER)
               AS n_ips,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER)
               AS n_phones,
           regexp_replace(
               regexp_replace(
                   regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_IPV4_RE}', '<IP>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM dirty
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub every training corpus gets
    before release: count and mask emails, IPv4 addresses, and phone
    numbers. The synthetic corpus is clean lowercase word-soup, so the
    op first plants deterministic PII (keyed off doc_id, identically in
    both engines) and then detects/redacts it — the parity check
    therefore exercises real matches, not a vacuous zero-match filter.

    Regexes use only ASCII classes + ``\\b`` so Java regex (Spark) and
    RE2 (DuckDB) agree. Map-only: no shuffle, redaction happens inside
    whole-stage codegen; at 100 TB this is a free rider on the scan.
    Production swap-in: an NER pandas_udf for names/addresses sits in
    the same map-only slot."""
    d = spark.table("documents")
    did = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit(".17"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call 202-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    t = F.col("t")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return d.select("doc_id", dirty.alias("t")).select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_IPV4_RE), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), 0)).alias("n_phones"),
        clean.alias("clean_text"),
    )


@query(
    "text_unigram_logprob",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT COUNT(*) AS t FROM tok),
    per AS (
        SELECT doc_id,
               round(
                   CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / t), 6)
                                 AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 4) AS avg_lp
        FROM tok JOIN vocab USING (token), tot
        GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(avg_lp AS DOUBLE) AS avg_logprob,
           CAST(round(exp(-avg_lp), 4) AS DOUBLE) AS ppl_proxy
    FROM per
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score from a corpus unigram LM: two-pass
    — pass 1 builds the unigram table (token -> count, one vocab-sized
    shuffle), pass 2 joins tokens against it and averages log p(token)
    per document. Low avg log-prob (high proxy perplexity) flags
    gibberish/rare-token docs, the cheap stand-in for a KenLM filter.

    Scale shape: the vocab aggregate is tiny next to the corpus and is
    broadcast back (swap to a shuffle join if the vocabulary outgrows
    the broadcast threshold); the per-doc aggregate shuffles (doc_id,
    decimal partials) once. Per-token log-probs are rounded to 6dp and
    decimal-summed so the result is bit-stable across partition counts
    and engines (see registry module docstring)."""
    d = spark.table("documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    tot = tok.agg(F.count("*").alias("t"))
    logp = F.round(
        F.log(F.col("cnt").cast("double") / F.col("t")), 6
    ).cast("decimal(18,6)")
    per = (
        tok.join(F.broadcast(vocab), "token")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(logp).cast("double") / F.count("*"), 4
            ).alias("avg_lp")
        )
    )
    return per.select(
        "doc_id",
        F.col("avg_lp").alias("avg_logprob"),
        F.round(F.exp(-F.col("avg_lp")), 4).alias("ppl_proxy"),
    )


@query(
    "udf_pandas_score",
    oracle=r"""
    WITH f AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tok,
               n_chars
        FROM documents
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(-1.0 + 0.02 * n_tok - 0.001 * n_chars))),
                 4) AS model_score
    FROM f
    """,
)
def udf_pandas_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow-vectorized ``@pandas_udf`` — the quality-model
    inference slot: a tiny logistic model scored over numpy batches,
    standing in for any sklearn/torch scorer too custom for built-ins.
    This rounds out the UDF surface next to applyInPandas
    (grouped_zscore), mapInPandas (mm_*) and applyInPandasWithState
    (streaming): per-batch Arrow transfer, NOT per-row Python.

    The features feed in as columns (computed by codegen'd built-ins,
    not in Python), the UDF is map-only — no shuffle, plan shows one
    ArrowEvalPython over the scan. Rounding happens JVM-side with
    F.round (half-up, matching DuckDB); numpy's half-even np.round
    would diverge."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def score(n_tok: pd.Series, n_chars: pd.Series) -> pd.Series:
        import numpy as np

        z = -1.0 + 0.02 * n_tok.to_numpy() - 0.001 * n_chars.to_numpy()
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    d = spark.table("documents").select(
        "doc_id", F.size(_tokens()).alias("n_tok"), "n_chars"
    )
    return d.select(
        "doc_id",
        F.round(score("n_tok", "n_chars"), 4).alias("model_score"),
    )


@query(
    "text_normalize",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id, lang, source,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT doc_id, lang, source,
           length(norm_text) AS n_chars_norm,
           md5(norm_text) AS norm_hash,
           row_number() OVER (
               PARTITION BY md5(norm_text) ORDER BY doc_id
           ) > 1 AS is_norm_dup
    FROM norm
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization + normalized-form dedup flag: lowercase,
    collapse runs of whitespace, trim, then md5 the canonical form and
    mark every doc whose normalized text already appeared under a
    smaller doc_id. Catches the case/whitespace variants exact dedup
    misses — the cheap canonicalization layer that runs BEFORE the
    fuzzy (minhash/simhash) stages so they only spend candidates on
    real rewrites.

    Scale shape: normalization is map-only codegen; the dup flag
    shuffles (16-byte md5, doc_id) pairs — never text — identical to
    dedup_exact's canonical plan."""
    d = spark.table("documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    )
    w = Window.partitionBy("norm_hash").orderBy("doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            norm.alias("norm_text"),
        )
        .select(
            "doc_id",
            "lang",
            "source",
            F.length("norm_text").cast("bigint").alias("n_chars_norm"),
            F.md5(F.col("norm_text").cast("binary")).alias("norm_hash"),
        )
        .withColumn("is_norm_dup", F.row_number().over(w) > 1)
    )


_GOPHER_SW_SQL = _SW_SQL  # stopword list shared with quality_score


@query(
    "text_gopher_rules",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_words,
               round(list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE)))
                     / len(t), 4) AS mean_word_len,
               round(CAST(length(text) - length(replace(text, '#', ''))
                          + length(text) - length(replace(text, '...', ''))
                     AS DOUBLE) / len(t), 4) AS symbol_ratio,
               len(list_filter(t, x -> lower(x) IN ({_GOPHER_SW_SQL}))) >= 2
                   AS has_stopwords
        FROM toks
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, has_stopwords,
           (n_words BETWEEN 5 AND 100000
            AND mean_word_len BETWEEN 2 AND 12
            AND symbol_ratio < 0.1
            AND has_stopwords) AS passes
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021 C.1, as
    re-used by MassiveText/RefinedWeb): word-count band, mean word
    length band, symbol-to-word ratio ('#' and '...' marks), and
    minimum stopword evidence — the cheap pre-filter that runs before
    any model-based scorer (quality_classifier_score). Emits each rule
    measurement plus the composite verdict so downstream mixes can
    re-threshold without recomputing.

    Map-only: every rule is string arithmetic in codegen; no shuffle,
    no UDF. Ratios are exact integer arithmetic divided once, rounded
    identically on both engines."""
    d = spark.table("documents")
    t = _tokens()
    n_words = F.size(t).cast("bigint")
    mean_wl = F.round(
        F.aggregate(
            F.transform(t, lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.size(t),
        4,
    )
    n_hash = F.length("text") - F.length(F.replace("text", F.lit("#")))
    n_ell = F.length("text") - F.length(
        F.replace("text", F.lit("..."), F.lit(""))
    )
    symbol_ratio = F.round(
        (n_hash + n_ell).cast("double") / F.size(t), 4
    )
    has_sw = (
        F.size(
            F.filter(t, lambda x: F.lower(x).isin(*_STOPWORDS))
        )
        >= 2
    )
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        has_sw.alias("has_stopwords"),
    )
    return m.select(
        "*",
        (
            F.col("n_words").between(5, 100000)
            & F.col("mean_word_len").between(2, 12)
            & (F.col("symbol_ratio") < 0.1)
            & F.col("has_stopwords")
        ).alias("passes"),
    )


_PAD_LEN = 32


@query(
    "pack_collate_pad",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    ids AS (
        SELECT doc_id,
               list_transform(t[1:{_PAD_LEN}],
                   x -> ('0x' || substr(md5(x), 1, 4))::BIGINT % 32000)
                   AS tok_ids
        FROM toks
    )
    SELECT doc_id,
           CAST(len(tok_ids) AS INTEGER) AS n_real,
           CAST({_PAD_LEN} - len(tok_ids) AS INTEGER) AS n_pad,
           array_to_string(
               list_concat(tok_ids,
                   list_transform(range(1, {_PAD_LEN} - len(tok_ids) + 1),
                                  i -> CAST(0 AS BIGINT))), ',')
               AS padded_ids
    FROM ids
    """,
)
def pack_collate_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch collation: truncate each doc's (hash-vocab) token ids to a
    fixed sequence length and right-pad with 0 — the pad-and-collate
    step that turns ragged documents into fixed-shape model inputs
    (emitted as a joined string so the driver can hash it; the array
    form feeds an Arrow batch unchanged). Vocabulary ids are the same
    md5-derived arithmetic on both engines.

    Map-only: slice + transform + concat in codegen; output
    partitioning inherits the scan — the GPU feed pipeline reads it
    straight off parquet with zero shuffles."""
    d = spark.table("documents")
    toks = F.slice(_tokens(), 1, _PAD_LEN)
    ids = F.transform(
        toks,
        lambda x: F.conv(
            F.substring(F.md5(x.cast("binary")), 1, 4), 16, 10
        ).cast("long")
        % 32000,
    )
    n_real = F.size(ids)
    pad = F.array_repeat(F.lit(0).cast("long"), _PAD_LEN - n_real)
    return d.select(
        "doc_id",
        n_real.alias("n_real"),
        (F.lit(_PAD_LEN) - n_real).cast("int").alias("n_pad"),
        F.array_join(
            F.transform(
                F.concat(ids, pad), lambda x: x.cast("string")
            ),
            ",",
        ).alias("padded_ids"),
    )


@query(
    "text_tfidf_topk",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
            AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM tok GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf,
               round(tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6)
                   AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, token, tf, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf DESC, token ASC) AS rnk
        FROM scored
    )
    SELECT doc_id, rnk, token, tf, tfidf
    FROM ranked WHERE rnk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the keyword-extraction /
    sparse-retrieval featurizer that consumes the ``text_idf`` table:
    tf x ln(N/df), ranked within each doc with a token tie-break so
    the cut is total and engine-independent.

    Scale shape: ONE corpus explode feeds everything — term
    frequencies aggregate on (doc_id, token) with map-side partials
    absorbing within-doc repetition before the exchange, and the
    document-frequency table derives from the tf aggregate (tf rows
    ARE the distinct (doc, token) pairs), not from a second corpus
    scan. The vocabulary-sized IDF side broadcasts back onto tf (no
    corpus-wide shuffle for the join); the corpus count joins as a
    single-row broadcast. The top-3 cut is a bounded row_number window
    over the (doc_id) partitioning the tf aggregate already
    established. Ranking happens on the ROUNDED score: the raw
    product's last ulp could order ties differently per engine, the
    6dp-rounded one cannot."""
    d = spark.table("documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    # Persisted: tf feeds both the df rollup and the scored join, and
    # AQE does not reuse the shuffle across the broadcast boundary —
    # without the persist the corpus explode would run twice.
    tf = track_persist(
        tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.select(
            "doc_id",
            F.row_number().over(w).alias("rnk"),
            "token",
            "tf",
            "tfidf",
        )
        .where(F.col("rnk") <= 3)
    )


_BIGRAM_AVG = "CAST(SUM(CAST(logp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"


@query(
    "text_bigram_logprob",
    # avg_logprob is an exact decimal over an integer count, which CAN
    # land exactly on a 4dp half boundary (observed: -115.8159/34 =
    # -3.40635 at sf0.1) — sql_jround replays Spark's shortest-repr
    # rounding where DuckDB's scaled-multiply round() flips the other
    # way on such values.
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1]
                       for i in generate_series(1, len(t) - 1)]) AS bigram
        FROM tok WHERE len(t) >= 2
    ),
    c12 AS (SELECT bigram, COUNT(*) AS n12 FROM bg GROUP BY bigram),
    c1 AS (
        SELECT split_part(bigram, ' ', 1) AS w1, SUM(n12) AS n1
        FROM c12 GROUP BY split_part(bigram, ' ', 1)
    ),
    lp AS (
        SELECT bigram,
               {sql_jround('ln(CAST(n12 AS DOUBLE) / n1)', 6)} AS logp
        FROM c12 JOIN c1 ON c1.w1 = split_part(bigram, ' ', 1)
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           {sql_jround(_BIGRAM_AVG, 4)} AS avg_logprob,
           {sql_jround(
               "exp(-" + sql_jround(_BIGRAM_AVG, 4) + ")", 4
           )} AS ppl_proxy
    FROM bg JOIN lp USING (bigram)
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram-LM quality score per document: train
    p(w2|w1) = C(w1 w2) / C(w1 ·) on the corpus itself, then score
    each doc by its mean log-probability (and a perplexity proxy).
    The step up from text_unigram_logprob toward the KenLM-style
    fluency filters (CCNet) — word-order scrambling now tanks the
    score, which a unigram model cannot see.

    Spark shape: bigrams are built map-side from the token array
    (``transform`` over ``sequence`` — no positional self-join), so
    the corpus is tokenized once. The model (bigram -> log p) is a
    vocab-sized aggregate joined back to the bigram stream — broadcast
    here; at web scale the bigram vocabulary outgrows the broadcast
    threshold and this becomes a plain shuffle equi-join on the bigram
    key with the same plan shape. Per-bigram log-probs round to 6dp
    and decimal-sum so the per-doc mean is bit-stable cross-engine."""
    d = spark.table("documents").select("doc_id", _tokens().alias("t"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("t", i), F.element_at("t", i + 1)
        ),
    )
    # Persisted: the bigram stream feeds BOTH the model aggregation and
    # the scoring probe. Without the persist the tokenize+explode runs
    # once per consumer (measured: 3 full tokenization passes, ~10 CPU-s
    # each at sf0.1 — Catalyst does not reuse the subtree across the
    # broadcast boundary); with it the corpus really is tokenized once,
    # the phase-materialization pattern a production run uses between
    # the train and score passes.
    bg = track_persist(
        d.where(F.size("t") >= 2).select(
            "doc_id", F.explode(bigrams).alias("bigram")
        )
    )
    c12 = bg.groupBy("bigram").agg(F.count("*").alias("n12"))
    w1 = F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    # C(w1 .) as a window over the bigram counts (one shuffle by w1)
    # instead of a separate groupBy + equi-join back — same integer
    # sums, two fewer reads of the c12 subtree.
    n1 = F.sum("n12").over(Window.partitionBy(w1))
    lp = c12.select(
        "bigram",
        F.round(F.log(F.col("n12").cast("double") / n1), 6).alias("logp"),
    )
    avg_lp = F.round(
        F.sum(F.col("logp").cast(DEC)).cast("double") / F.count("*"), 4
    )
    return (
        bg.join(F.broadcast(lp), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            avg_lp.alias("avg_logprob"),
        )
        .withColumn("ppl_proxy", F.round(F.exp(-F.col("avg_logprob")), 4))
    )


@query(
    "text_ngram_novelty",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in generate_series(1, len(t) - 2)]) AS s
        FROM tok WHERE len(t) >= 3
    ),
    first AS (SELECT s, MIN(doc_id) AS first_seen FROM sh GROUP BY s)
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(*) FILTER (first_seen = doc_id) AS n_novel,
           round(CAST(COUNT(*) FILTER (first_seen = doc_id) AS DOUBLE)
                 / COUNT(*), 6) AS novelty_ratio
    FROM sh JOIN first USING (s)
    GROUP BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's distinct
    word-trigram shingles whose FIRST corpus occurrence (min doc_id as
    the canonical ingest order) is the doc itself. The contribution /
    memorization-risk metric behind incremental dedup: a doc whose
    shingles all appeared earlier adds nothing to the training mix
    even if no single earlier doc duplicates it (cf. the containment
    view in dedup_containment).

    Spark shape: shingles are built map-side from the token array and
    de-duplicated per doc before the exchange; the first-seen table is
    a MIN aggregate on the shingle key joined back on that same key —
    two shuffles total, both hash-partitioned by shingle, and the
    second reuses the first's partitioning. At web scale the shingle
    table is corpus-sized, so this stays a shuffle equi-join by
    design (no broadcast). Counts are integers; only the final ratio
    is floating, rounded to 6dp."""
    d = spark.table("documents").select("doc_id", _tokens().alias("t"))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("t", i),
                F.element_at("t", i + 1),
                F.element_at("t", i + 2),
            ),
        )
    )
    sh = d.where(F.size("t") >= 3).select(
        "doc_id", F.explode(shingles).alias("s")
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_seen"))
    novel = F.count_if(F.col("first_seen") == F.col("doc_id"))
    return (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            novel.alias("n_novel"),
            F.round(
                novel.cast("double") / F.count("*"), 6
            ).alias("novelty_ratio"),
        )
    )


# Stupid Backoff (Brants et al. 2007) score expression, shared shape on
# both engines. Model trained on EVEN doc_ids so the odd half exercises
# every backoff tier (unseen trigrams/bigrams/words).
_SB_ALPHA = "0.4"
_SB_SCORE = (
    "CASE WHEN n3 IS NOT NULL THEN CAST(n3 AS DOUBLE) / n2_12 "
    f"WHEN n2_23 IS NOT NULL THEN {_SB_ALPHA} * CAST(n2_23 AS DOUBLE) / n1_2 "
    f"WHEN n1_3 IS NOT NULL THEN {_SB_ALPHA} * {_SB_ALPHA} "
    "* CAST(n1_3 AS DOUBLE) / nn "
    f"ELSE {_SB_ALPHA} * {_SB_ALPHA} * 1.0 / nn END"
)
_SB_AVG = "CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)"


@query(
    "text_trigram_backoff",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    tg AS (
        SELECT doc_id,
               unnest([struct_pack(w1 := t[i], w2 := t[i+1], w3 := t[i+2])
                       for i in generate_series(1, len(t) - 2)]) AS g
        FROM tok WHERE len(t) >= 3
    ),
    tgf AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tg),
    train_tok AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
    c3 AS (
        SELECT w1, w2, w3, COUNT(*) AS n3
        FROM tgf WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3
    ),
    bg AS (
        SELECT unnest([t[i] || ' ' || t[i+1]
                       for i in generate_series(1, len(t) - 1)]) AS b
        FROM train_tok WHERE len(t) >= 2
    ),
    c2 AS (SELECT b, COUNT(*) AS n2 FROM bg GROUP BY b),
    uni AS (SELECT unnest(t) AS w FROM train_tok),
    c1 AS (SELECT w, COUNT(*) AS n1 FROM uni GROUP BY w),
    nn_t AS (SELECT COUNT(*) AS nn FROM uni),
    scored AS (
        SELECT tgf.doc_id,
               round(ln({_SB_SCORE}), 6) AS lp
        FROM tgf
        LEFT JOIN c3 USING (w1, w2, w3)
        LEFT JOIN (SELECT b, n2 AS n2_12 FROM c2) j12
               ON j12.b = tgf.w1 || ' ' || tgf.w2
        LEFT JOIN (SELECT b, n2 AS n2_23 FROM c2) j23
               ON j23.b = tgf.w2 || ' ' || tgf.w3
        LEFT JOIN (SELECT w, n1 AS n1_2 FROM c1) u2 ON u2.w = tgf.w2
        LEFT JOIN (SELECT w, n1 AS n1_3 FROM c1) u3 ON u3.w = tgf.w3
        CROSS JOIN nn_t
    )
    SELECT doc_id,
           COUNT(*) AS n_trigrams,
           {sql_jround(_SB_AVG, 4)} AS avg_logscore,
           doc_id % 2 = 1 AS is_heldout
    FROM scored
    GROUP BY doc_id
    """,
)
def text_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram language model with Stupid Backoff (Brants 2007 — the
    web-scale LM scoring scheme: no discounting to tune, just
    count ratios with a fixed 0.4 backoff penalty), trained on the
    even-doc_id half and scoring EVERY document — held-out docs
    exercise all three backoff tiers (trigram → bigram → unigram →
    OOV floor). Completes the fluency ladder above
    text_unigram_logprob and text_bigram_logprob; this is the KenLM
    slot in a CCNet-style quality pipeline.

    Scale shape: trigrams/bigrams build map-side from token arrays
    (no positional self-joins); the model tables are n-gram-vocabulary
    aggregates joined back on the n-gram keys — broadcast here, plain
    shuffle equi-joins at web scale, same plan shape. Per-trigram
    log-scores round to 6dp and decimal-sum so per-doc means are
    bit-stable cross-engine."""
    d = spark.table("documents").select("doc_id", _tokens().alias("t"))
    tri = F.transform(
        F.sequence(F.lit(1), F.size("t") - 2),
        lambda i: F.struct(
            F.element_at("t", i).alias("w1"),
            F.element_at("t", i + 1).alias("w2"),
            F.element_at("t", i + 2).alias("w3"),
        ),
    )
    tgf = (
        d.where(F.size("t") >= 3)
        .select("doc_id", F.explode(tri).alias("g"))
        .select("doc_id", "g.w1", "g.w2", "g.w3")
    )
    train_tok = d.where(F.col("doc_id") % 2 == 0)
    c3 = (
        tgf.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("n3"))
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("t", i), F.element_at("t", i + 1)
        ),
    )
    c2 = (
        train_tok.where(F.size("t") >= 2)
        .select(F.explode(bigrams).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n2"))
    )
    uni = train_tok.select(F.explode("t").alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("n1"))
    nn_t = uni.agg(F.count("*").alias("nn"))
    scored = (
        tgf.join(F.broadcast(c3), ["w1", "w2", "w3"], "left")
        .join(
            F.broadcast(c2.select(F.col("b"), F.col("n2").alias("n2_12"))),
            F.concat_ws(" ", F.col("w1"), F.col("w2")) == F.col("b"),
            "left",
        )
        .drop("b")
        .join(
            F.broadcast(c2.select(F.col("b"), F.col("n2").alias("n2_23"))),
            F.concat_ws(" ", F.col("w2"), F.col("w3")) == F.col("b"),
            "left",
        )
        .drop("b")
        .join(
            F.broadcast(c1.select(F.col("w"), F.col("n1").alias("n1_2"))),
            F.col("w") == F.col("w2"),
            "left",
        )
        .drop("w")
        .join(
            F.broadcast(c1.select(F.col("w"), F.col("n1").alias("n1_3"))),
            F.col("w") == F.col("w3"),
            "left",
        )
        .drop("w")
        .join(F.broadcast(nn_t))
        .select(
            "doc_id", F.round(F.log(F.expr(_SB_SCORE)), 6).alias("lp")
        )
    )
    avg = F.round(
        F.sum(F.col("lp").cast(DEC)).cast("double") / F.count("*"), 4
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"),
        avg.alias("avg_logscore"),
        F.first(F.col("doc_id") % 2 == 1).alias("is_heldout"),
    )


@query(
    "text_cooccurrence_pmi",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    bg AS (
        SELECT unnest([t[i] || ' ' || t[i+1]
                       for i in generate_series(1, len(t) - 1)]) AS bigram
        FROM tok WHERE len(t) >= 2
    ),
    c12 AS (SELECT bigram, COUNT(*) AS n12 FROM bg GROUP BY bigram),
    nn_t AS (SELECT SUM(n12) AS nn FROM c12),
    c1 AS (
        SELECT split_part(bigram, ' ', 1) AS w, SUM(n12) AS n1
        FROM c12 GROUP BY 1
    ),
    c2 AS (
        SELECT split_part(bigram, ' ', 2) AS w, SUM(n12) AS n2
        FROM c12 GROUP BY 1
    ),
    pmi AS (
        SELECT bigram, n12,
               round(ln(CAST(n12 AS DOUBLE) * nn / (n1 * n2)), 4) AS pmi
        FROM c12
        JOIN c1 ON c1.w = split_part(bigram, ' ', 1)
        JOIN c2 ON c2.w = split_part(bigram, ' ', 2)
        CROSS JOIN nn_t
        WHERE n12 >= 5
    )
    SELECT bigram, CAST(n12 AS BIGINT) AS n12, pmi
    FROM pmi ORDER BY pmi DESC, bigram LIMIT 20
    """,
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction by pointwise mutual information: the
    top-20 bigrams whose words co-occur far above chance (PMI =
    ln(p(w1,w2)/p(w1)p(w2)), min count 5 to kill the low-frequency
    PMI bias) — the phrase-mining primitive behind tokenizer vocab
    curation (which word pairs deserve a merged token) and phrase
    search. Complements text_ngram_topk (raw frequency) with the
    statistical-association ranking.

    Scale shape: one corpus tokenize; PMI runs entirely on the
    BIGRAM-VOCABULARY aggregate (marginals are two more aggregations
    OF THAT TABLE, joined back on the word key — broadcast here,
    shuffle equi-joins at web scale); the cut is
    TakeOrderedAndProject on the rounded score."""
    d = spark.table("documents").select("doc_id", _tokens().alias("t"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("t", i), F.element_at("t", i + 1)
        ),
    )
    bg = d.where(F.size("t") >= 2).select(
        F.explode(bigrams).alias("bigram")
    )
    c12 = bg.groupBy("bigram").agg(F.count("*").alias("n12"))
    from powersql_spark.catalog import track_persist

    c12 = track_persist(c12)
    w1 = F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    w2 = F.split_part(F.col("bigram"), F.lit(" "), F.lit(2))
    c1 = c12.groupBy(w1.alias("w")).agg(F.sum("n12").alias("n1"))
    c2 = c12.groupBy(w2.alias("w")).agg(F.sum("n12").alias("n2"))
    nn_t = c12.agg(F.sum("n12").alias("nn"))
    pmi = (
        c12.where(F.col("n12") >= 5)
        .join(F.broadcast(c1), w1 == c1.w)
        .drop("w")
        .join(F.broadcast(c2), w2 == c2.w)
        .drop("w")
        .join(F.broadcast(nn_t))
        .select(
            "bigram",
            F.col("n12").cast("bigint").alias("n12"),
            F.round(
                F.log(
                    F.col("n12").cast("double")
                    * F.col("nn")
                    / (F.col("n1") * F.col("n2"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return pmi.orderBy(F.desc("pmi"), "bigram").limit(20)


_ZIPF_SLOPE = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH freq AS (
        SELECT word, COUNT(*) AS f FROM (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
            FROM documents
        ) GROUP BY word
    ),
    ranked AS (
        SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, word) AS r
        FROM freq
    ),
    pts AS (
        SELECT round(ln(CAST(r AS DOUBLE)), 8) AS lx,
               round(ln(CAST(f AS DOUBLE)), 8) AS ly
        FROM ranked
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(lx AS DECIMAL(28,8))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ly AS DECIMAL(28,8))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(lx * ly AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(lx * lx AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS vocab_size,
           round({_ZIPF_SLOPE}, 4) AS zipf_exponent,
           round((sy - {_ZIPF_SLOPE} * sx) / n, 4) AS log_intercept,
           {_ZIPF_SLOPE} BETWEEN -2.0 AND -0.5 AS zipf_like
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    log-frequency against log-rank — natural text sits near exponent
    -1; a corpus whose exponent drifts far from it is boilerplate-
    heavy (too flat) or template-spam (too steep). The one-number
    corpus-health diagnostic next to the per-doc quality scores;
    machine-generated or deduplicate-starved crawls show up here
    before any per-document filter fires.

    Scale shape: the corpus collapses once to the word-frequency
    table; the rank window sorts the VOCABULARY (not the corpus), the
    fit collapses to four decimal power sums over per-point rounded
    logs — order-independent and bit-identical across engines."""
    freq = (
        spark.table("documents")
        .select(F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("f"))
    )
    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), "word"))
        .alias("r"),
    )
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")), 8).alias("lx"),
        F.round(F.log(F.col("f").cast("double")), 8).alias("ly"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum(F.col("lx").cast("decimal(28,8)")).cast("double").alias("sx"),
        F.sum(F.col("ly").cast("decimal(28,8)")).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(
        F.col("n").cast("bigint").alias("vocab_size"),
        F.round(slope, 4).alias("zipf_exponent"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "log_intercept"
        ),
        slope.between(-2.0, -0.5).alias("zipf_like"),
    )


@query(
    "text_entropy_char",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents
    ),
    hist AS (
        SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    tot AS (
        SELECT doc_id, c, ch,
               SUM(c) OVER (PARTITION BY doc_id) AS n
        FROM hist
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_chars,
           COUNT(*) AS n_distinct_chars,
           CAST(SUM(CAST(round(-(CAST(c AS DOUBLE) / n)
                    * ln(CAST(c AS DOUBLE) / n), 8) AS DECIMAL(28,8)))
                AS DOUBLE) AS char_entropy,
           CAST(SUM(CAST(round(-(CAST(c AS DOUBLE) / n)
                    * ln(CAST(c AS DOUBLE) / n), 8) AS DECIMAL(28,8)))
                AS DOUBLE) < 2.0 AS low_entropy_flag
    FROM tot
    GROUP BY doc_id
    """,
)
def text_entropy_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (nats): the
    cheap garbage/boilerplate detector — repeated-template and
    single-character-spam documents score far below natural text
    (~2.8-3.2 nats for English), binary-ish noise scores above it.
    One of the Gopher-family quality signals that needs no language
    model at all.

    Scale shape: linear explode to characters, collapse to the
    per-(doc, char) histogram (alphabet-bounded per doc), entropy
    terms rounded then decimal-summed on the histogram — map-side
    combinable everywhere, one shuffle on doc_id, bit-identical
    across engines and partitionings."""
    chars = spark.table("documents").select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = hist.select(
        "doc_id",
        "c",
        F.sum("c").over(Window.partitionBy("doc_id")).alias("n"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p), 8).cast("decimal(28,8)")
    ent = F.sum(term).cast("double")
    return (
        tot.groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_chars"),
            F.count("*").alias("n_distinct_chars"),
            ent.alias("char_entropy"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct_chars",
            "char_entropy",
            (F.col("char_entropy") < 2.0).alias("low_entropy_flag"),
        )
    )


@query(
    "text_readability",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_words,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS BIGINT) AS n_syll,
               CAST(len(regexp_extract_all(text, '[.!?]')) + 1 AS BIGINT)
                   AS n_sents
        FROM documents
    )
    SELECT doc_id, n_words, n_syll, n_sents,
           CAST(round(CAST(CAST((206.835
                - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                - 84.6 * (CAST(n_syll AS DOUBLE) / n_words))
                AS VARCHAR) AS DECIMAL(38,18)), 2) AS DOUBLE)
               AS flesch_score
    FROM t WHERE n_words > 0
    ORDER BY doc_id
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document, with the standard
    syllable proxy (vowel-group count — exact syllabification needs
    a dictionary; the proxy tracks it closely enough for FILTERING,
    which is all a data pipeline needs): 206.835 - 1.015*(words/
    sentences) - 84.6*(syllables/words). The readability band is a
    common curation feature next to the entropy/stopword signals —
    legalese and OCR junk both fall out of range.

    Scale shape: map-only regexp counting (codegen, no Python), one
    scan, no shuffle. The score is a terminating rational of three
    integers — sql_jround replays Spark's rounding."""
    d = spark.table("documents")
    n_words = F.size(_tokens()).cast("bigint")
    n_syll = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("bigint")
    n_sents = (
        F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")) + 1
    ).cast("bigint")
    t = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_syll.alias("n_syll"),
        n_sents.alias("n_sents"),
    )
    score = F.round(
        206.835
        - 1.015 * (F.col("n_words").cast("double") / F.col("n_sents"))
        - 84.6 * (F.col("n_syll").cast("double") / F.col("n_words")),
        2,
    )
    return (
        t.where(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            "n_syll",
            "n_sents",
            score.alias("flesch_score"),
        )
        .orderBy("doc_id")
    )


_BP_DF = 5  # chunks appearing in >= 5 docs are boilerplate


@query(
    "text_boilerplate_fraction",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               md5(array_to_string(t[start : start + 63], ' ')) AS fp
        FROM toks,
             unnest(range(1, GREATEST(len(t), 1) + 1, 48)) AS u(start)
    ),
    df AS (
        SELECT fp, COUNT(DISTINCT doc_id) AS n_docs FROM chunks
        GROUP BY fp
    ),
    flagged AS (
        SELECT c.doc_id,
               CASE WHEN df.n_docs >= {_BP_DF} THEN 1 ELSE 0 END
                   AS is_boiler
        FROM chunks c JOIN df USING (fp)
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(is_boiler) AS BIGINT) AS n_boiler,
           CAST(round(CAST(CAST((SUM(is_boiler) * 1.0 / COUNT(*))
                AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE)
               AS boiler_frac,
           SUM(is_boiler) * 2 > COUNT(*) AS mostly_boilerplate
    FROM flagged
    GROUP BY doc_id
    """,
)
def text_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection by chunk document-frequency: a 64-token
    chunk appearing in >= 5 distinct documents is boilerplate
    (headers, footers, navigation, license text — content that
    repeats ACROSS pages); each document gets its boilerplate
    fraction and a mostly-boilerplate flag. This is the C4/CCNet
    boilerplate-removal MEASUREMENT step — dedup_chunk_crosscorpus
    keeps first occurrences, this key quantifies how much of each
    doc is template before any removal decision.

    Scale shape: chunking is map-only; the shuffle carries
    (doc_id, 16-byte fingerprint) pairs, never text; chunk document
    frequency is one aggregation on the fingerprint key joined back
    on the same key (vocabulary-sized at any scale); per-doc
    fractions are exact integer ratios (sql_jround)."""
    d = spark.table("documents").select("doc_id", _tokens().alias("t"))
    n = F.size("t")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(48))
    chunks = (
        d.select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.md5(
                F.array_join(F.slice("t", F.col("s") + 1, 64), " ").cast(
                    "binary"
                )
            ).alias("fp"),
        )
    )
    from powersql_spark.catalog import track_persist

    chunks = track_persist(chunks)
    df = chunks.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = chunks.join(df, "fp").select(
        "doc_id",
        F.when(F.col("n_docs") >= _BP_DF, 1).otherwise(0).alias(
            "is_boiler"
        ),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("is_boiler").cast("bigint").alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_boiler",
            F.round(
                F.col("n_boiler") * 1.0 / F.col("n_chunks"), 4
            ).alias("boiler_frac"),
            (F.col("n_boiler") * 2 > F.col("n_chunks")).alias(
                "mostly_boilerplate"
            ),
        )
    )


_RAKE_STOP = (
    "the a an and or of to in on for with is are was were be been "
    "this that it as at by from not has have had"
).split()
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOP)
_RAKE_MAX_PHRASE = 4


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, pos, tok FROM (
            SELECT doc_id,
                   unnest(ts) AS tok,
                   generate_subscripts(ts, 1) AS pos
            FROM (
                SELECT doc_id,
                       string_split_regex(lower(text), '[^a-z]+') AS ts
                FROM documents WHERE lang = 'en'
            )
        ) WHERE tok <> ''
    ),
    content AS (
        SELECT doc_id, pos, tok,
               pos - ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY pos
               ) AS island
        FROM toks WHERE tok NOT IN ({_RAKE_STOP_SQL})
    ),
    phrases AS (
        SELECT doc_id, island,
               string_agg(tok, ' ' ORDER BY pos) AS phrase,
               COUNT(*) AS plen
        FROM content GROUP BY doc_id, island
        HAVING COUNT(*) <= {_RAKE_MAX_PHRASE}
    ),
    word_stats AS (
        SELECT c.tok,
               COUNT(*) AS freq,
               SUM(p.plen) AS degree
        FROM content c
        JOIN phrases p
          ON p.doc_id = c.doc_id AND p.island = c.island
        GROUP BY c.tok
    ),
    word_score AS (
        SELECT tok,
               CAST(FLOOR(1000000.0 * degree / freq) AS BIGINT)
                   AS micro
        FROM word_stats
    ),
    phrase_scored AS (
        SELECT p.phrase, p.plen, SUM(ws.micro) AS score_micro
        FROM phrases p
        JOIN content c ON c.doc_id = p.doc_id AND c.island = p.island
        JOIN word_score ws ON ws.tok = c.tok
        GROUP BY p.doc_id, p.island, p.phrase, p.plen
    ),
    agg AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(ANY_VALUE(plen) AS BIGINT) AS n_words,
               ANY_VALUE(score_micro) AS score_micro
        FROM phrase_scored GROUP BY phrase
    )
    SELECT phrase, n_words, n_occurrences,
           CAST(score_micro AS DOUBLE) / 1000000.0 AS rake_score
    FROM agg
    ORDER BY rake_score DESC, phrase
    LIMIT 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the English
    corpus: candidate phrases are maximal runs of non-stopword tokens
    (gap-islands over token positions — no fragile multi-pass regex
    deletion), each word scores degree/frequency across all phrase
    occurrences, a phrase scores the sum of its word scores; top-20
    phrases corpus-wide. The unsupervised keyword baseline for
    tagging, search boosting, and topic seeding.

    Scale shape: one tokenize+explode pass; phrase assembly is a
    doc-partitioned window plus a per-island ordered string_agg (all
    local to the doc's partition); word stats and phrase scores are
    two aggregations of the token-grain table joined id-keyed. Word
    scores are held in integer micro-units (floor of an identical
    double division) so the per-phrase sum is order-independent and
    the oracle replays it exactly; top-20 is TakeOrderedAndProject."""
    toks = (
        spark.table("documents")
        .where(F.col("lang") == "en")
        .select(
            "doc_id",
            F.posexplode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("pos", "tok"),
        )
        .where(F.col("tok") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    content = track_persist(
        toks.where(~F.col("tok").isin(*_RAKE_STOP)).withColumn(
            "island", F.col("pos") - F.row_number().over(w)
        )
    )
    phrases = (
        content.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .where(F.col("plen") <= _RAKE_MAX_PHRASE)
    )
    phrases = track_persist(phrases)
    ct = content.select("doc_id", "island", "tok")
    word_stats = (
        ct.join(phrases, ["doc_id", "island"])
        .groupBy("tok")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("degree"))
    )
    word_score = word_stats.select(
        "tok",
        F.floor(1000000.0 * F.col("degree") / F.col("freq"))
        .cast("bigint")
        .alias("micro"),
    )
    phrase_scored = (
        phrases.join(ct, ["doc_id", "island"])
        .join(word_score, "tok")
        .groupBy("doc_id", "island", "phrase", "plen")
        .agg(F.sum("micro").alias("score_micro"))
    )
    agg = phrase_scored.groupBy("phrase").agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.first("plen").cast("bigint").alias("n_words"),
        F.first("score_micro").alias("score_micro"),
    )
    return (
        agg.select(
            "phrase",
            "n_words",
            "n_occurrences",
            (F.col("score_micro").cast("double") / 1000000.0).alias(
                "rake_score"
            ),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(20)
    )


@query(
    "text_langid_eval",
    oracle="""
    WITH pred AS (
        SELECT lang AS lang_true,
               (CASE
                    WHEN (' ' || text || ' ') LIKE '% the %'
                      OR (' ' || text || ' ') LIKE '% and %' THEN 'en'
                    WHEN (' ' || text || ' ') LIKE '% der %'
                      OR (' ' || text || ' ') LIKE '% und %' THEN 'de'
                    WHEN (' ' || text || ' ') LIKE '% el %'
                      OR (' ' || text || ' ') LIKE '% los %' THEN 'es'
                    ELSE 'unk'
                END) AS lang_pred
        FROM documents
    ),
    cm AS (
        SELECT lang_true, lang_pred, COUNT(*) AS n
        FROM pred GROUP BY lang_true, lang_pred
    ),
    marg AS (
        SELECT lang_true, SUM(n) AS n_true FROM cm GROUP BY lang_true
    )
    SELECT cm.lang_true, cm.lang_pred, CAST(cm.n AS BIGINT) AS n,
           CAST(round(CAST(CAST(CAST(cm.n AS DOUBLE) / marg.n_true
                AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
               AS recall_share,
           cm.lang_true = cm.lang_pred AS is_correct
    FROM cm JOIN marg ON marg.lang_true = cm.lang_true
    ORDER BY cm.lang_true, cm.lang_pred
    """,
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the language-ID heuristic against the
    corpus's ground-truth lang labels (the rule under test is
    text_lang_id's marker-word CASE, replicated verbatim): per
    (true, predicted) cell, count and within-true-language share —
    the evaluation loop every production langid model ships with,
    and the quality gate before lang-filtered training mixes trust
    the classifier.

    Scale shape: map-only prediction fused into the scan, one
    aggregation to the |langs|^2-cell matrix, marginals joined back
    broadcast. Shares are integer rationals (jround replays)."""
    d = spark.table("documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = (
        F.when(padded.like("% the %") | padded.like("% and %"), "en")
        .when(padded.like("% der %") | padded.like("% und %"), "de")
        .when(padded.like("% el %") | padded.like("% los %"), "es")
        .otherwise("unk")
    )
    cm = track_persist(
        d.select(
            F.col("lang").alias("lang_true"), pred.alias("lang_pred")
        )
        .groupBy("lang_true", "lang_pred")
        .agg(F.count("*").alias("n"))
    )
    marg = cm.groupBy("lang_true").agg(F.sum("n").alias("n_true"))
    return (
        cm.join(F.broadcast(marg), "lang_true")
        .select(
            "lang_true",
            "lang_pred",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("n_true"), 6
            ).alias("recall_share"),
            (F.col("lang_true") == F.col("lang_pred")).alias(
                "is_correct"
            ),
        )
        .orderBy("lang_true", "lang_pred")
    )


_COV_GRID = (1, 10, 100, 1000, 10000)


@query(
    "text_ngram_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
            AS tok
        FROM documents WHERE length(trim(text)) > 0
    ),
    counts AS (
        SELECT tok, COUNT(*) AS c FROM toks
        WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
        SELECT c,
               ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk,
               SUM(c) OVER (ORDER BY c DESC, tok
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts
    ),
    tot AS (SELECT SUM(c) AS t, COUNT(*) AS v FROM counts),
    grid AS (SELECT unnest(ARRAY{list(_COV_GRID)}) AS k)
    SELECT grid.k,
           CAST(LEAST(grid.k, tot.v) AS BIGINT) AS vocab_used,
           CAST(MAX(r.cum) AS BIGINT) AS occurrences_covered,
           CAST(round(CAST(CAST(CAST(MAX(r.cum) AS DOUBLE) / tot.t
                AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)
               AS coverage
    FROM grid
    JOIN tot ON TRUE
    JOIN ranked r ON r.rnk <= grid.k
    GROUP BY grid.k, tot.v, tot.t
    ORDER BY grid.k
    """,
)
def text_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all token
    occurrences the top-k most frequent tokens cover, at k = 1, 10,
    100, 1k, 10k — the sizing curve for tokenizer vocabularies and
    stopword lists (the Zipf companion to text_zipf_fit: that key
    fits the exponent, this one answers 'how big must the vocab be
    for 99% coverage').

    Scale shape: one tokenize pass collapses to the vocab-sized
    count table (map-side combinable); the rank/cumsum window runs
    over vocab-grain rows in one declared total order; the k-grid is
    a 5-row broadcast whose rank-threshold join aggregates straight
    back down. All integers until the final rounded share."""
    toks = (
        spark.table("documents")
        .where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok")
        )
        .where(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    counts = track_persist(counts)
    w = Window.orderBy(F.desc("c"), "tok")
    ranked = counts.select(
        "c",
        F.row_number().over(w).alias("rnk"),
        F.sum("c")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    tot = counts.agg(
        F.sum("c").alias("t"), F.count("*").alias("v")
    )
    grid = values_df(
        spark, [(k,) for k in _COV_GRID], "k int"
    )
    return (
        F.broadcast(grid)
        .join(F.broadcast(tot))
        .join(ranked, F.col("rnk") <= F.col("k"))
        .groupBy("k", "v", "t")
        .agg(F.max("cum").alias("cov"))
        .select(
            "k",
            F.least(F.col("k").cast("bigint"), F.col("v"))
            .cast("bigint")
            .alias("vocab_used"),
            F.col("cov").cast("bigint").alias("occurrences_covered"),
            F.round(
                F.col("cov").cast("double") / F.col("t"), 6
            ).alias("coverage"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# TextRank keywords: PageRank on the word co-occurrence graph — the
# graph-centrality sibling of RAKE (degree-scored) and PMI
# (association-scored). Fixed 3-iteration unroll, same engineering as
# graph_pagerank: the corpus-sized step is ONE adjacency build; the
# iterations run on the vocabulary-sized edge table.
# ---------------------------------------------------------------------------

_TR_D = 0.85
_TR_TOPK = 20

_TR_ITER_SQL = """
    tr{k} AS (
        SELECT v.word,
               (1 - {d}) + {d} * COALESCE(SUM(p.pr * t.p), 0) AS pr
        FROM vocab v
        LEFT JOIN trans t ON t.dst = v.word
        LEFT JOIN tr{j} p ON p.word = t.src
        GROUP BY v.word
    )"""


@query(
    "text_textrank_keywords",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, t[u.pos] AS word, u.pos
        FROM (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS t
              FROM documents),
             unnest(range(1, len(t) + 1)) AS u(pos)
    ),
    adj AS (
        SELECT word AS a,
               LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        FROM tok
    ),
    und AS (
        SELECT a, b FROM adj WHERE b IS NOT NULL AND a <> b
            AND a NOT IN (__SW__) AND b NOT IN (__SW__)
        UNION ALL
        SELECT b, a FROM adj WHERE b IS NOT NULL AND a <> b
            AND a NOT IN (__SW__) AND b NOT IN (__SW__)
    ),
    edges AS (
        SELECT a AS src, b AS dst, COUNT(*) AS w FROM und GROUP BY a, b
    ),
    vocab AS (SELECT DISTINCT src AS word FROM edges),
    trans AS (
        SELECT src, dst,
               CAST(w AS DOUBLE)
                   / SUM(CAST(w AS DOUBLE)) OVER (PARTITION BY src) AS p
        FROM edges
    ),
    tr0 AS (SELECT word, 1.0 AS pr FROM vocab),__ITERS__
    SELECT word, round(pr, 6) AS textrank,
           CAST(ROW_NUMBER() OVER (ORDER BY round(pr, 6) DESC, word)
                AS INTEGER) AS kw_rank
    FROM tr3
    ORDER BY kw_rank
    LIMIT __TOPK__
    """.replace("__SW__", _SW_SQL)
    .replace(
        "__ITERS__",
        ",".join(
            _TR_ITER_SQL.format(k=k, j=k - 1, d=_TR_D)
            for k in (1, 2, 3)
        ),
    )
    .replace("__TOPK__", str(_TR_TOPK)),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: PageRank (3 unrolled iterations,
    damping 0.85) over the undirected word co-occurrence graph built
    from adjacent non-stopword token pairs — the centrality-based
    keyword scorer that surfaces words holding the graph together,
    where RAKE scores local degree and PMI scores pairwise surprise.
    Top-20 by 6dp-rounded score, word tiebreak.

    Scale shape: the corpus-sized work is one posexplode + one LEAD
    window per document partition + one edge aggregation — after
    that, every iteration is a vocabulary-sized join + grouped sum
    (the graph_pagerank discipline). No driver loop; the whole
    computation is one Catalyst plan the oracle mirrors CTE-for-CTE.
    6dp rounding absorbs cross-engine inbound-sum ordering."""
    d = spark.table("documents")
    tok = d.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "word")
    )
    adj = tok.select(
        "word",
        F.lead("word")
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("b"),
    ).where(
        F.col("b").isNotNull()
        & (F.col("word") != F.col("b"))
        & ~F.col("word").isin(*_STOPWORDS)
        & ~F.col("b").isin(*_STOPWORDS)
    )
    und = adj.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("word").alias("a"), F.col("b").alias("b")
                ),
                F.struct(
                    F.col("b").alias("a"), F.col("word").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    edges = und.groupBy(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).agg(F.count("*").alias("w"))
    from powersql_spark.catalog import track_persist

    # The edge table is vocabulary-sized (distinct co-occurring word
    # pairs), and every downstream step — the transition window, the
    # three iteration joins + grouped sums, the vocab distinct — is
    # vocabulary-sized too. Cache it as ONE partition: SinglePartition
    # satisfies every required distribution, so the whole iteration
    # chain plans with ZERO exchanges (profiled before: 17 jobs / 50
    # stages carrying 194 ms of total executor work — the query was
    # pure per-stage scheduling latency; after: 7 jobs / 17 stages,
    # wall 1.27 -> 0.85 s). The corpus-
    # sized adjacency aggregation above still runs fully parallel —
    # the coalesce applies to its vocabulary-sized OUTPUT. On a
    # cluster the same holds: iterating a bounded vocab on one
    # partition beats paying cross-node exchanges per iteration; only
    # if the vocab outgrew a single task would this be re-sharded.
    edges = track_persist(edges.coalesce(1))
    vocab = edges.select(F.col("src").alias("word")).distinct()
    trans = edges.select(
        "src",
        "dst",
        (
            F.col("w").cast("double")
            / F.sum(F.col("w").cast("double")).over(
                Window.partitionBy("src")
            )
        ).alias("p"),
    )
    tr = vocab.select("word", F.lit(1.0).alias("pr"))
    for _ in range(3):
        contrib = trans.join(
            tr.withColumnRenamed("word", "src"), "src"
        ).select(F.col("dst").alias("word"), (F.col("pr") * F.col("p")).alias("c"))
        tr = (
            vocab.join(
                contrib.groupBy("word").agg(F.sum("c").alias("s")),
                "word",
                "left",
            )
            .select(
                "word",
                (
                    F.lit(1 - _TR_D)
                    + _TR_D * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    # Explicit top-K cut (orderBy+limit = TakeOrderedAndProject, a
    # distributed partial top-K), then rank the K-row head. Plan-
    # equivalent to the previous rank-filter form on Spark 3.5+/4
    # (InferWindowGroupLimit already rewrote `row_number <= K` into
    # the same Window-over-TakeOrderedAndProject shape), but explicit:
    # the partial top-K no longer depends on that optimizer rule
    # staying enabled. The limit uses the same total order as the
    # rank, so the kept rows and ranks are identical by construction.
    wr = Window.orderBy(F.desc("textrank"), "word")
    return (
        tr.select("word", F.round("pr", 6).alias("textrank"))
        .orderBy(F.desc("textrank"), "word")
        .limit(_TR_TOPK)
        .select(
            "word",
            "textrank",
            F.row_number().over(wr).cast("int").alias("kw_rank"),
        )
        .orderBy("kw_rank")
    )


# ---------------------------------------------------------------------------
# Negative-sampling distribution (word2vec's unigram^0.75). The 3/4
# power is computed as sqrt(f * sqrt(f)) — two IEEE-correctly-rounded
# sqrts and one multiply — so both engines produce bit-identical
# weights with NO libm pow/exp/ln divergence risk.
# ---------------------------------------------------------------------------


@query(
    "text_negative_sampling_table",
    oracle=r"""
    WITH freq AS (
        SELECT word, COUNT(*) AS f
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+'))
                  AS word
              FROM documents)
        GROUP BY word
    ),
    wt AS (
        SELECT word, f,
               sqrt(CAST(f AS DOUBLE) * sqrt(CAST(f AS DOUBLE))) AS w
        FROM freq
    ),
    tot AS (
        SELECT CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE) AS tw
        FROM wt
    ),
    ranked AS (
        SELECT word, f, w,
               ROW_NUMBER() OVER (ORDER BY w DESC, word) AS rnk,
               CAST(SUM(CAST(w AS DECIMAL(38,12))) OVER
                   (ORDER BY w DESC, word ROWS UNBOUNDED PRECEDING)
                   AS DOUBLE) AS cw
        FROM wt
    )
    SELECT word, CAST(f AS BIGINT) AS freq,
           CAST(rnk AS INTEGER) AS rank,
           round(w / tw, 6) AS prob,
           round(cw / tw, 6) AS cum_prob
    FROM ranked, tot
    ORDER BY rank
    """,
)
def text_negative_sampling_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """word2vec-style negative-sampling table: P(w) proportional to
    freq^0.75 — the smoothing that up-weights rare words relative to
    raw frequency (the standard trick for embedding training), with
    the cumulative distribution column a sampler binary-searches.
    The 3/4 power is sqrt(f*sqrt(f)): IEEE-exact on both engines.

    Scale shape: one explode + one vocabulary-sized count (map-side
    combinable); weights, total, rank, and the cumulative column all
    live on the vocabulary table (decimal-cast sums for order
    independence). The output IS the sampler's input at any corpus
    size — vocabulary-bounded, not corpus-bounded."""
    freq = (
        spark.table("documents")
        .select(F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("f"))
    )
    wt = freq.select(
        "word",
        "f",
        F.sqrt(
            F.col("f").cast("double") * F.sqrt(F.col("f").cast("double"))
        ).alias("w"),
    )
    from powersql_spark.catalog import track_persist

    wt = track_persist(wt)
    tot = wt.agg(
        F.sum(F.col("w").cast("decimal(38,12)")).cast("double").alias("tw")
    )
    wr = Window.orderBy(F.desc("w"), "word")
    wcum = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = wt.select(
        "word",
        "f",
        "w",
        F.row_number().over(wr).alias("rnk"),
        F.sum(F.col("w").cast("decimal(38,12)"))
        .over(wcum)
        .cast("double")
        .alias("cw"),
    )
    return (
        ranked.join(F.broadcast(tot))
        .select(
            "word",
            F.col("f").cast("bigint").alias("freq"),
            F.col("rnk").cast("int").alias("rank"),
            F.round(F.col("w") / F.col("tw"), 6).alias("prob"),
            F.round(F.col("cw") / F.col("tw"), 6).alias("cum_prob"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick): tokens -> 16 hash buckets with
# collision accounting. The bucket key is the first hex char of
# md5(token) — a string key both engines compute identically, no
# integer hex parsing needed.
# ---------------------------------------------------------------------------


@query(
    "text_feature_hashing",
    oracle=r"""
    WITH tok AS (
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+'))
                  AS word
              FROM documents)
        GROUP BY word
    ),
    bucketed AS (
        SELECT substr(md5(word), 1, 1) AS bucket, word, cnt
        FROM tok
    ),
    ranked AS (
        SELECT bucket, word, cnt,
               ROW_NUMBER() OVER (PARTITION BY bucket
                   ORDER BY cnt DESC, word) AS r
        FROM bucketed
    )
    SELECT b.bucket,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
           CAST(SUM(b.cnt) AS BIGINT) AS total_count,
           MIN(CASE WHEN rk.r = 1 THEN rk.word END) AS top_token,
           COUNT(*) > 1 AS has_collision
    FROM bucketed b
    JOIN ranked rk ON rk.bucket = b.bucket AND rk.word = b.word
    GROUP BY b.bucket
    ORDER BY b.bucket
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick audited: tokens hashed into 16 buckets (first
    md5 hex char) with per-bucket distinct-token count, total mass,
    dominant token, and a collision flag — the table that tells you
    whether a hashing vectorizer of this width is safe (collisions
    merge unrelated features) before you train on it. Fixed-width
    hashing is the standard way to featurize unbounded vocabularies
    without a vocabulary build.

    Scale shape: one explode + vocabulary-sized count, then bucket
    assignment and rollup on the vocabulary table (16-group
    aggregation); dominant tokens from a rank window on the same
    partitioning. Corpus text is scanned once."""
    tok = (
        spark.table("documents")
        .select(F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    bucketed = tok.select(
        F.substring(F.md5("word"), 1, 1).alias("bucket"), "word", "cnt"
    )
    from powersql_spark.catalog import track_persist

    bucketed = track_persist(bucketed)
    w = Window.partitionBy("bucket").orderBy(F.desc("cnt"), "word")
    ranked = bucketed.select(
        "bucket", "word", F.row_number().over(w).alias("r")
    )
    return (
        bucketed.join(ranked, ["bucket", "word"])
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_tokens"),
            F.sum("cnt").cast("bigint").alias("total_count"),
            F.min(F.when(F.col("r") == 1, F.col("word"))).alias(
                "top_token"
            ),
            (F.count("*") > 1).alias("has_collision"),
        )
        .orderBy("bucket")
    )


@query(
    "text_word_burstiness",
    oracle=r"""
    WITH dc AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents)
        GROUP BY doc_id, word
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    stats AS (
        SELECT word,
               CAST(SUM(c) AS BIGINT) AS total_count,
               CAST(COUNT(*) AS BIGINT) AS n_docs_present,
               CAST(SUM(CAST(c * c AS DECIMAL(38,6))) AS DOUBLE) AS sq
        FROM dc GROUP BY word
    )
    SELECT word, total_count, n_docs_present,
           CAST(ROUND(
               (sq / n_docs
                - POW(CAST(total_count AS DOUBLE) / n_docs, 2))
               / (CAST(total_count AS DOUBLE) / n_docs), 4)
               AS DOUBLE) AS vmr,
           (sq / n_docs
               - POW(CAST(total_count AS DOUBLE) / n_docs, 2))
               / (CAST(total_count AS DOUBLE) / n_docs) > 1.5
               AS is_bursty
    FROM stats, n
    ORDER BY total_count DESC, word
    LIMIT 20
    """,
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church-Gale): the variance-to-mean ratio of
    per-document counts over the WHOLE corpus (absent docs count as
    zero) for the top-20 words — VMR ~ 1 means Poisson scatter
    (function words), VMR >> 1 means the word clumps into few
    documents (content/topic words). The signal topic-modeling
    feature selection and stopword induction key off, orthogonal to
    raw frequency.

    Scale shape: one explode to (doc, word) counts (the same grain
    TF-IDF pays), one vocabulary rollup of decimal-exact sufficient
    statistics; zero-docs enter the moments exactly via the global
    doc count (one-row broadcast) — no spine join. POW(x,2) only."""
    dc = (
        spark.table("documents")
        .select("doc_id", F.explode(_tokens()).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    n = spark.table("documents").agg(F.count("*").alias("n_docs"))
    stats = dc.groupBy("word").agg(
        F.sum("c").cast("bigint").alias("total_count"),
        F.count("*").cast("bigint").alias("n_docs_present"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sq"),
    )
    mean = F.col("total_count").cast("double") / F.col("n_docs")
    vmr = (F.col("sq") / F.col("n_docs") - F.pow(mean, 2)) / mean
    return (
        stats.join(F.broadcast(n))
        .select(
            "word",
            "total_count",
            "n_docs_present",
            F.round(vmr, 4).alias("vmr"),
            (vmr > 1.5).alias("is_bursty"),
        )
        .orderBy(F.desc("total_count"), "word")
        .limit(20)
    )


@query(
    "text_lexical_diversity",
    oracle=r"""
    WITH tok AS (
        SELECT source, word, COUNT(*) AS c
        FROM (SELECT source,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents)
        GROUP BY source, word
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT)
               AS n_hapax,
           CAST(ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS DOUBLE)
               AS type_token_ratio,
           CAST(ROUND(COUNT(CASE WHEN c = 1 THEN 1 END)
                      / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE)
               AS hapax_ratio,
           CASE WHEN SUM(c) > 1 THEN
               CAST(ROUND(round(ln(CAST(COUNT(*) AS DOUBLE)), 8)
                          / round(ln(CAST(SUM(c) AS DOUBLE)), 8), 4)
                    AS DOUBLE) END AS herdan_c
    FROM tok
    GROUP BY source
    ORDER BY source
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity dashboard per source: type-token ratio,
    hapax-legomena fraction, and Herdan's C (ln V / ln N — the
    length-robust diversity index TTR isn't) — the screen that
    separates template-generated or boilerplate-heavy sources
    (few types, no hapaxes) from genuinely diverse text before
    sampling weights are set. Complements text_zipf_fit (shape of
    the frequency curve) with its summary statistics.

    Scale shape: one explode to (source, word) counts — the same
    vocabulary-bounded grain every text key pays — then a per-source
    rollup of conditional counts. ln values round at 8dp before the
    ratio so both engines divide identical doubles."""
    tok = (
        spark.table("documents")
        .select("source", F.explode(_tokens()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
    )
    return (
        tok.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.count(F.when(F.col("c") == 1, 1))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(
                F.col("n_types") / F.col("n_tokens").cast("double"), 6
            ).alias("type_token_ratio"),
            F.round(
                F.col("n_hapax") / F.col("n_types").cast("double"), 6
            ).alias("hapax_ratio"),
            F.when(
                F.col("n_tokens") > 1,
                F.round(
                    F.round(F.log(F.col("n_types").cast("double")), 8)
                    / F.round(
                        F.log(F.col("n_tokens").cast("double")), 8
                    ),
                    4,
                ),
            ).alias("herdan_c"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence per source vs the global corpus.
# ---------------------------------------------------------------------------

_JS_VOCAB = 200  # global top-K tokens define the comparison support


@query(
    "text_js_divergence",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest(string_split_regex(trim(text), '\\s+'))
            AS tok
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS g_cnt
        FROM toks GROUP BY tok
        ORDER BY g_cnt DESC, tok LIMIT {_JS_VOCAB}
    ),
    g_tot AS (SELECT SUM(g_cnt) AS gt FROM vocab),
    src AS (
        SELECT t.source, t.tok, CAST(COUNT(*) AS BIGINT) AS s_cnt
        FROM toks t JOIN vocab v USING (tok)
        GROUP BY t.source, t.tok
    ),
    s_tot AS (
        SELECT source, SUM(s_cnt) AS st FROM src GROUP BY source
    ),
    terms AS (
        SELECT s.source,
               CAST(s.s_cnt AS DOUBLE) / st.st AS p,
               CAST(v.g_cnt AS DOUBLE) / g.gt AS q
        FROM src s
        JOIN vocab v USING (tok)
        JOIN s_tot st USING (source), g_tot g
    ),
    qonly AS (
        -- vocab tokens ABSENT from a source: p=0, the q*ln(q/m)
        -- term still contributes with m = q/2.
        SELECT st.source,
               CAST(v.g_cnt AS DOUBLE) / g.gt AS q
        FROM s_tot st CROSS JOIN vocab v, g_tot g
        WHERE NOT EXISTS (SELECT 1 FROM src s
                          WHERE s.source = st.source
                            AND s.tok = v.tok)
    ),
    kl AS (
        SELECT source,
               CAST(SUM(CAST(round(
                   0.5 * (p * ln(p / ((p + q) / 2))
                          + q * ln(q / ((p + q) / 2))), 8)
                   AS DECIMAL(38,8))) AS DOUBLE) AS js_present,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM terms GROUP BY source
    ),
    kl0 AS (
        SELECT source,
               CAST(SUM(CAST(round(0.5 * q * ln(2.0), 8)
                   AS DECIMAL(38,8))) AS DOUBLE) AS js_absent
        FROM qonly GROUP BY source
    )
    SELECT k.source, k.n_shared,
           {sql_jround("k.js_present + COALESCE(z.js_absent, 0.0)", 6)}
               AS js_divergence,
           {sql_jround(
               "(k.js_present + COALESCE(z.js_absent, 0.0)) / ln(2.0)",
               6)} AS js_normalized,
           k.js_present + COALESCE(z.js_absent, 0.0) >= 0
               AND (k.js_present + COALESCE(z.js_absent, 0.0))
                   / ln(2.0) <= 1.0 AS in_unit_range
    FROM kl k LEFT JOIN kl0 z USING (source)
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each SOURCE's unigram
    distribution and the GLOBAL corpus distribution over the top-200
    vocabulary: the symmetric, bounded ([0, ln 2]) drift measure that
    ranks sources by how far their language deviates from the mix —
    the corpus-composition screen beside profile_psi_drift's binned
    numeric PSI (JS handles zero bins where KL blows up: absent
    tokens contribute the finite q*ln(2)/2).

    Scale shape: ONE corpus explode feeds both the global vocabulary
    cut and the per-source counts (persisted, the text_tfidf_topk
    idiom); everything downstream joins against the vocabulary-sized
    (200-row) or source-sized tables. Terms are 8dp-rounded before
    the order-independent decimal sum; p, q are exact integer
    rationals in double."""
    toks = track_persist(
        spark.table("documents")
        .where(F.length(F.trim("text")) > 0)
        .select(
            "source",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
    )
    vocab = track_persist(
        toks.groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("g_cnt"))
        .orderBy(F.desc("g_cnt"), "tok")
        .limit(_JS_VOCAB)
    )
    g_tot = vocab.agg(F.sum("g_cnt").alias("gt"))
    src = track_persist(
        toks.join(F.broadcast(vocab.select("tok")), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").cast("bigint").alias("s_cnt"))
    )
    s_tot = src.groupBy("source").agg(F.sum("s_cnt").alias("st"))
    terms = (
        src.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(g_tot))
        .select(
            "source",
            (F.col("s_cnt").cast("double") / F.col("st")).alias("p"),
            (F.col("g_cnt").cast("double") / F.col("gt")).alias("q"),
        )
    )
    qonly = (
        s_tot.crossJoin(F.broadcast(vocab))
        .join(
            src.select("source", "tok"),
            ["source", "tok"],
            "left_anti",
        )
        .crossJoin(F.broadcast(g_tot))
        .select(
            "source",
            (F.col("g_cnt").cast("double") / F.col("gt")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = F.round(
        0.5
        * (
            F.col("p") * F.log(F.col("p") / m)
            + F.col("q") * F.log(F.col("q") / m)
        ),
        8,
    ).cast("decimal(38,8)")
    kl = terms.groupBy("source").agg(
        F.sum(term).cast("double").alias("js_present"),
        F.count("*").cast("bigint").alias("n_shared"),
    )
    kl0 = qonly.groupBy("source").agg(
        F.sum(
            F.round(0.5 * F.col("q") * F.log(F.lit(2.0)), 8).cast(
                "decimal(38,8)"
            )
        )
        .cast("double")
        .alias("js_absent")
    )
    js = F.col("js_present") + F.coalesce(F.col("js_absent"), F.lit(0.0))
    return kl.join(kl0, "source", "left").select(
        "source",
        "n_shared",
        F.round(js, 6).alias("js_divergence"),
        F.round(js / F.log(F.lit(2.0)), 6).alias("js_normalized"),
        ((js >= 0) & (js / F.log(F.lit(2.0)) <= 1.0)).alias(
            "in_unit_range"
        ),
    )


@query(
    "text_keyness_gtest",
    oracle=rf"""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents
    ),
    cells AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS a
        FROM tok GROUP BY source, word
    ),
    framed AS (
        SELECT source, word, a,
               SUM(a) OVER (PARTITION BY word) - a AS b,
               SUM(a) OVER (PARTITION BY source) AS c,
               SUM(a) OVER () - SUM(a) OVER (PARTITION BY source) AS d
        FROM cells
    ),
    g AS (
        SELECT source, word, a, CAST(b AS BIGINT) AS n_rest,
               c * 1e0 * (a + b) / (c + d) AS e1,
               d * 1e0 * (a + b) / (c + d) AS e2,
               2 * (a * round(ln(a * 1e0 / (c * 1e0 * (a + b)
                                            / (c + d))), 8)
                    + CASE WHEN b > 0
                           THEN b * round(ln(b * 1e0
                                / (d * 1e0 * (a + b) / (c + d))), 8)
                           ELSE 0e0 END) AS g2_raw,
               CASE WHEN a * 1e0 / c >= b * 1e0 / d THEN 'over'
                    ELSE 'under' END AS direction
        FROM framed
    )
    SELECT source, word, a AS n_source, n_rest,
           {sql_jround("e1", 4)} AS expected_source,
           {sql_jround("g2_raw", 4)} AS g2, direction
    FROM g
    """,
)
def text_keyness_gtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keyness via the log-likelihood G-test (Rayson & Garside's
    corpus-comparison statistic): for every (source, word) cell,
    G2 = 2*(a*ln(a/E1) + b*ln(b/E2)) comparing the word's rate in the
    source (a of c tokens) against the rest of the corpus (b of d),
    with expected counts E from the pooled rate. The word-frequency
    sibling of stats_chi2_independence — G2 stays valid at the small
    expected counts a vocabulary tail produces, and `direction` says
    whether the word is over- or under-represented. Only observed
    cells (a >= 1) are emitted, the standard keyness table shape.

    Absent-cell audit (VERDICT r10/r11 sweep): restricting to observed
    cells does NOT distort any emitted statistic — the margins b/c/d
    are TOKEN sums (window sums over observed counts) to which an
    absent cell contributes exactly 0, so every emitted row's G2 is
    identical to its full-grid value. What the table deliberately
    omits is the a = 0 row itself (a word's total absence from a
    source, whose G2 would be pure b-term): keyness reports words
    PRESENT in a source by definition, and both engines share the
    restriction, so no cross-engine asymmetry exists. The statistic
    is the 2-term LL over the word-presence row by design (Rayson &
    Garside 2000), not the 4-term full-grid G.

    Scale shape: one corpus scan and token explode collapse to the
    vocabulary-sized (source, word) cell table; the b/c/d margins are
    windows over that metadata-sized frame, never over tokens. Each
    ln term is rounded to 8dp before the integer-weighted combination
    (the repo's cross-engine libm discipline); no ranking happens on
    doubles, so the output is engine-order-free."""
    tok = spark.table("documents").select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    )
    cells = tok.groupBy("source", "word").agg(
        F.count("*").cast("bigint").alias("a")
    )
    w_word = Window.partitionBy("word")
    w_src = Window.partitionBy("source")
    w_all = Window.partitionBy()
    framed = cells.select(
        "source",
        "word",
        "a",
        (F.sum("a").over(w_word) - F.col("a")).alias("b"),
        F.sum("a").over(w_src).alias("c"),
        (F.sum("a").over(w_all) - F.sum("a").over(w_src)).alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    e1 = c * 1e0 * (a + b) / (c + d)
    e2 = d * 1e0 * (a + b) / (c + d)
    g2 = 2 * (
        a * F.round(F.log(a * 1e0 / e1), 8)
        + F.when(b > 0, b * F.round(F.log(b * 1e0 / e2), 8)).otherwise(
            F.lit(0.0)
        )
    )
    return framed.select(
        "source",
        "word",
        a.alias("n_source"),
        b.cast("bigint").alias("n_rest"),
        F.round(e1, 4).alias("expected_source"),
        F.round(g2, 4).alias("g2"),
        F.when(a * 1e0 / c >= b * 1e0 / d, "over")
        .otherwise("under")
        .alias("direction"),
    )


_DELTA_TOPK = 30  # most-frequent-word basis of the Delta measure


@query(
    "text_burrows_delta",
    oracle=rf"""
    WITH tok AS MATERIALIZED (
        SELECT source,
               unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents
    ),
    vocab AS MATERIALIZED (
        SELECT word FROM tok GROUP BY word
        ORDER BY COUNT(*) DESC, word LIMIT {_DELTA_TOPK}
    ),
    src_tot AS MATERIALIZED (
        SELECT source, COUNT(*) AS tot FROM tok GROUP BY source
    ),
    cells AS MATERIALIZED (
        SELECT s.source, v.word,
               COALESCE(c.cnt, 0) * 1e0 / s.tot AS f
        FROM src_tot s
        CROSS JOIN vocab v
        LEFT JOIN (
            SELECT source, word, COUNT(*) AS cnt
            FROM tok GROUP BY source, word
        ) c ON c.source = s.source AND c.word = v.word
    ),
    stats AS MATERIALIZED (
        SELECT word,
               CAST(SUM(CAST(round(f, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) / COUNT(*) AS mu,
               sqrt(CAST(SUM(CAST(round(f * f, 10) AS DECIMAL(38,10)))
                         AS DOUBLE) / COUNT(*)
                    - (CAST(SUM(CAST(round(f, 8) AS DECIMAL(38,8)))
                            AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(CAST(round(f, 8) AS DECIMAL(38,8)))
                              AS DOUBLE) / COUNT(*))) AS sd
        FROM cells GROUP BY word
    ),
    z AS MATERIALIZED (
        SELECT c.source, c.word, (c.f - s.mu) / s.sd AS z
        FROM cells c JOIN stats s ON s.word = c.word
        WHERE s.sd > 0
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           {sql_jround(
               "CAST(SUM(CAST(round(abs(a.z - b.z), 8)"
               "     AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*)", 6)}
               AS delta
    FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between every source pair:
    z-score each source's relative frequency of the {_DELTA_TOPK}
    most frequent corpus words (population mean/std ACROSS sources,
    zero-filled for absent words), then Delta(a,b) = mean |z_a - z_b|.
    The classical authorship/register-attribution measure — a
    PAIRWISE stylistic distance matrix where text_keyness_gtest flags
    single over-represented words and text_js_divergence measures
    each source against the global mix.

    Scale shape: one corpus scan and token explode collapse to
    (source, word) counts; the dense grid, per-word moments, and the
    pair join all run on the (sources x top-K)-sized frame —
    metadata-sized at any corpus scale. Frequencies, squares, and
    |z| gaps are decimal-pinned, so the matrix is engine- and
    partition-order-exact."""
    from powersql_spark.catalog import track_persist

    tok = track_persist(
        spark.table("documents").select(
            "source",
            F.explode(
                F.split(F.trim(F.col("text")), r"\s+")
            ).alias("word"),
        )
    )
    vocab = (
        tok.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(_DELTA_TOPK)
        .select("word")
    )
    src_tot = tok.groupBy("source").agg(F.count("*").alias("tot"))
    counts = tok.groupBy("source", "word").agg(F.count("*").alias("cnt"))
    cells = track_persist(
        src_tot.crossJoin(F.broadcast(vocab))
        .join(counts, ["source", "word"], "left")
        .select(
            "source",
            "word",
            (
                F.coalesce(F.col("cnt"), F.lit(0)) * 1e0 / F.col("tot")
            ).alias("f"),
        )
    )
    fcol = F.col("f")
    sum_f = F.sum(F.round(fcol, 8).cast("decimal(38,8)")).cast("double")
    sum_f2 = F.sum(F.round(fcol * fcol, 10).cast("decimal(38,10)")).cast(
        "double"
    )
    n = F.count("*")
    mu = sum_f / n
    stats = cells.groupBy("word").agg(
        mu.alias("mu"),
        F.sqrt(sum_f2 / n - mu * mu).alias("sd"),
    )
    z = track_persist(
        cells.join(F.broadcast(stats), "word")
        .where(F.col("sd") > 0)
        .select(
            "source", "word", ((fcol - F.col("mu")) / F.col("sd")).alias("z")
        )
    )
    a, b = z.alias("a"), z.alias("b")
    return (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            (
                F.sum(
                    F.round(F.abs(F.col("a.z") - F.col("b.z")), 8).cast(
                        "decimal(38,8)"
                    )
                ).cast("double")
                / F.count("*")
            ).alias("delta"),
        )
        .select(
            "source_a",
            "source_b",
            "n_words",
            F.round("delta", 6).alias("delta"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Round-11 vocabulary-statistics widening.
# ---------------------------------------------------------------------------


@query(
    "text_heaps_law",
    oracle=r"""
    WITH docs AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS ntok,
               ROW_NUMBER() OVER (ORDER BY doc_id) AS r
        FROM documents
    ),
    nd AS (SELECT COUNT(*) AS n_docs FROM docs),
    cumtok AS (
        SELECT r, SUM(ntok) OVER (ORDER BY r
                   ROWS UNBOUNDED PRECEDING) AS n_cum
        FROM docs
    ),
    firsts AS (  -- each type's first document rank
        SELECT MIN(d.r) AS first_r
        FROM (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents) t
        JOIN docs d ON d.doc_id = t.doc_id
        GROUP BY t.word
    ),
    frank AS (
        SELECT first_r, COUNT(*) AS new_types
        FROM firsts GROUP BY first_r
    ),
    chk AS (
        -- floor, NOT bare CAST: DuckDB CAST(double AS BIGINT) rounds
        -- half-even while Spark's cast truncates; explicit floor keeps
        -- checkpoint ranks identical when n_docs isn't a multiple of 10
        SELECT gs.i * 10 AS chk_pct,
               CAST(floor(nd.n_docs * gs.i / 10.0) AS BIGINT) AS c
        FROM nd, generate_series(1, 10) AS gs(i)
    ),
    pts AS (
        SELECT k.chk_pct,
               CAST(ct.n_cum AS BIGINT) AS cum_tokens,
               CAST((SELECT COALESCE(SUM(new_types), 0) FROM frank f
                     WHERE f.first_r <= k.c) AS BIGINT) AS vocab
        FROM chk k JOIN cumtok ct ON ct.r = k.c
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(CAST(round(ln(cum_tokens), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(ln(vocab), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(round(ln(cum_tokens) * ln(vocab), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(round(ln(cum_tokens) * ln(cum_tokens), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS sxx
        FROM pts
    )
    SELECT p.chk_pct, p.cum_tokens, p.vocab,
           round((f.sxy - f.sx * f.sy / f.m)
                 / (f.sxx - f.sx * f.sx / f.m), 4) AS heaps_beta,
           round(exp(f.sy / f.m - (f.sxy - f.sx * f.sy / f.m)
                 / (f.sxx - f.sx * f.sx / f.m) * f.sx / f.m), 4)
               AS heaps_k
    FROM pts p, fit f
    ORDER BY p.chk_pct
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct
    vocabulary V(N) against cumulative tokens N at ten corpus
    checkpoints (docs in doc_id order), with the fitted power law
    V = k N^beta (log-log OLS over the checkpoints) — the curve that
    predicts how much NEW vocabulary another billion tokens will
    bring (tokenizer sizing, dedup-value forecasting; natural text
    gives beta in 0.4-0.6, templated corpora much less). Completes
    text_zipf_fit (frequency decay) with the growth view.

    Scale shape: vocabulary growth needs each type's FIRST position
    only — one explode to (word, doc_rank) min-aggregated, then the
    checkpoint joins ride the (first_rank -> new-type-count) table,
    vocabulary-bounded like every text key. Checkpoint sums are
    integers; only the 10-point log-log fit touches floats
    (8dp-rounded, decimal-summed)."""
    docs = spark.table("documents").select(
        "doc_id",
        F.size(_tokens()).alias("ntok"),
        F.row_number().over(Window.orderBy("doc_id")).alias("r"),
    )
    nd = docs.agg(F.count("*").alias("n_docs"))
    cumtok = docs.select(
        "r",
        F.sum("ntok")
        .over(
            Window.orderBy("r").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("n_cum"),
    )
    tok = (
        spark.table("documents")
        .select("doc_id", F.explode(_tokens()).alias("word"))
        .join(docs.select("doc_id", "r"), "doc_id")
    )
    frank = (
        tok.groupBy("word")
        .agg(F.min("r").alias("first_r"))
        .groupBy("first_r")
        .agg(F.count("*").alias("new_types"))
    )
    chk = (
        spark.range(1, 11)
        .crossJoin(F.broadcast(nd))
        .select(
            (F.col("id") * 10).cast("bigint").alias("chk_pct"),
            # F.floor mirrors the oracle's explicit floor (Spark's bare
            # cast truncates, DuckDB's rounds half-even — ADVICE r11)
            F.floor(F.col("n_docs") * F.col("id") / 10)
            .cast("bigint")
            .alias("c"),
        )
    )
    pts = (
        chk.join(cumtok, F.col("r") == F.col("c"))
        .join(
            F.broadcast(frank),
            F.col("first_r") <= F.col("c"),
            "left",
        )
        .groupBy("chk_pct")
        .agg(
            F.any_value("n_cum").cast("bigint").alias("cum_tokens"),
            F.coalesce(F.sum("new_types"), F.lit(0))
            .cast("bigint")
            .alias("vocab"),
        )
    )
    dec8 = lambda c: F.sum(F.round(c, 8).cast("decimal(38,8)")).cast(
        "double"
    )
    lx = F.log(F.col("cum_tokens").cast("double"))
    ly = F.log(F.col("vocab").cast("double"))
    fit = pts.agg(
        F.count("*").cast("bigint").alias("m"),
        dec8(lx).alias("sx"),
        dec8(ly).alias("sy"),
        dec8(lx * ly).alias("sxy"),
        dec8(lx * lx).alias("sxx"),
    )
    m = F.col("m")
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / m) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / m
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            "chk_pct",
            "cum_tokens",
            "vocab",
            F.round(beta, 4).alias("heaps_beta"),
            F.round(
                F.exp(F.col("sy") / m - beta * F.col("sx") / m), 4
            ).alias("heaps_k"),
        )
        .orderBy("chk_pct")
    )


@query(
    "text_frequency_spectrum",
    oracle=r"""
    WITH tok AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents)
        GROUP BY source, word
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS v1,
           CAST(COUNT(CASE WHEN c = 2 THEN 1 END) AS BIGINT) AS v2,
           CAST(COUNT(CASE WHEN c = 3 THEN 1 END) AS BIGINT) AS v3,
           round(10000.0 * (SUM(c * c) - SUM(c))
                 / (CAST(SUM(c) AS DOUBLE) * SUM(c)), 4) AS yule_k,
           round(SUM(c * (c - 1))
                 / (CAST(SUM(c) AS DOUBLE) * (SUM(c) - 1)), 6)
               AS simpson_d
    FROM tok
    GROUP BY source
    ORDER BY source
    """,
)
def text_frequency_spectrum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Word-frequency spectrum summary per source: the head of the
    frequency-of-frequencies table (V1/V2/V3 — types seen once,
    twice, thrice; the Good-Turing mass estimators), Yule's
    characteristic K = 10^4 (sum c^2 - N)/N^2, and Simpson's
    repeat-rate D = sum c(c-1)/(N(N-1)) — the length-invariant
    repetitiousness constants: K and D barely move when a corpus
    doubles, so a source whose K is 3x its peers is template spam
    regardless of its size. Completes the diversity suite
    (text_lexical_diversity: type counts; text_zipf_fit: rank decay;
    this: the repeat-rate spectrum).

    Scale shape: one explode to (source, word) counts; K, D, and the
    spectrum head are integer-exact conditional sums of that
    vocabulary-bounded table — floats appear only in the two final
    ratios."""
    tok = (
        spark.table("documents")
        .select("source", F.explode(_tokens()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    c = F.col("c")
    return (
        tok.groupBy("source")
        .agg(
            F.sum(c).cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.count(F.when(c == 1, 1)).cast("bigint").alias("v1"),
            F.count(F.when(c == 2, 1)).cast("bigint").alias("v2"),
            F.count(F.when(c == 3, 1)).cast("bigint").alias("v3"),
            F.round(
                10000.0
                * (F.sum(c * c) - F.sum(c))
                / (F.sum(c).cast("double") * F.sum(c)),
                4,
            ).alias("yule_k"),
            F.round(
                F.sum(c * (c - 1))
                / (F.sum(c).cast("double") * (F.sum(c) - 1)),
                6,
            ).alias("simpson_d"),
        )
        .orderBy("source")
    )


@query(
    "text_word_length_profile",
    oracle=rf"""
    WITH words AS (
        SELECT source, length(word) AS l
        FROM (SELECT source,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents)
    ),
    hist AS (
        SELECT source, l, CAST(COUNT(*) AS BIGINT) AS c
        FROM words GROUP BY source, l
    ),
    histp AS (
        SELECT source, l, c,
               c / CAST(SUM(c) OVER (PARTITION BY source) AS DOUBLE)
                   AS p
        FROM hist
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           {sql_jround("SUM(l * c) / CAST(SUM(c) AS DOUBLE)", 4)}
               AS mean_len,
           CAST(MAX(l) AS BIGINT) AS max_len,
           {sql_jround(
               "SUM(CASE WHEN l >= 8 THEN c ELSE 0 END)"
               " / CAST(SUM(c) AS DOUBLE)", 6)} AS frac_long,
           round(-SUM(p * ln(p)), 4) AS len_entropy
    FROM histp
    GROUP BY source
    ORDER BY source
    """,
)
def text_word_length_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Word-length profile per source: mean/max token length, the
    fraction of long (>= 8 char) tokens, and the Shannon entropy of
    the length distribution — the zero-cost signature that separates
    natural prose (smooth unimodal length histogram, entropy ~2)
    from ID dumps, base64 blobs, and CJK-segmented text (spiky or
    heavy-tailed lengths) before any language model runs.

    Scale shape: lengths collapse the explode to a (source, length)
    histogram — a few dozen cells per source regardless of corpus
    size; every statistic is a conditional aggregate of integer cell
    counts, with floats only in the final ratios/entropy."""
    words = spark.table("documents").select(
        "source", F.explode(_tokens()).alias("word")
    ).select("source", F.length("word").alias("l"))
    hist = words.groupBy("source", "l").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = Window.partitionBy("source")
    p = F.col("c") / F.sum("c").over(tot).cast("double")
    hist_p = hist.select(
        "source", "l", "c", (-p * F.log(p)).alias("ent_term")
    )
    return (
        hist_p.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("l") * F.col("c"))
                / F.sum("c").cast("double"),
                4,
            ).alias("mean_len"),
            F.max("l").cast("bigint").alias("max_len"),
            F.round(
                F.sum(
                    F.when(F.col("l") >= 8, F.col("c")).otherwise(0)
                )
                / F.sum("c").cast("double"),
                6,
            ).alias("frac_long"),
            F.round(F.sum("ent_term"), 4).alias("len_entropy"),
        )
        .orderBy("source")
    )


@query(
    "text_positional_divergence",
    oracle=rf"""
    WITH placed AS (
        SELECT source,
               CASE WHEN pos < 5 THEN 'head' ELSE 'body' END
                   AS stratum,
               word
        FROM (SELECT source,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word,
                     unnest(range(len(string_split_regex(trim(text),
                         '\s+')))) AS pos
              FROM documents)
    ),
    cells AS (
        SELECT source, stratum, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM placed GROUP BY 1, 2, 3
    ),
    wide AS (
        SELECT source, word,
               COALESCE(SUM(CASE WHEN stratum = 'head'
                   THEN c END), 0) AS ch,
               COALESCE(SUM(CASE WHEN stratum = 'body'
                   THEN c END), 0) AS cb
        FROM cells GROUP BY source, word
    ),
    tots AS (
        SELECT source, SUM(ch) AS th, SUM(cb) AS tb
        FROM wide GROUP BY source
    ),
    terms AS (
        SELECT w.source,
               t.th, t.tb,
               CAST(w.ch AS DOUBLE) / t.th AS p,
               CAST(w.cb AS DOUBLE) / t.tb AS q
        FROM wide w JOIN tots t ON t.source = w.source
    )
    SELECT source,
           CAST(ANY_VALUE(th) AS BIGINT) AS n_head_tokens,
           CAST(ANY_VALUE(tb) AS BIGINT) AS n_body_tokens,
           {sql_jround(
               "CAST(SUM(CAST(round("
               "0.5 * CASE WHEN p > 0"
               " THEN p * ln(p / ((p + q) / 2)) ELSE 0 END"
               " + 0.5 * CASE WHEN q > 0"
               " THEN q * ln(q / ((p + q) / 2)) ELSE 0 END, 8)"
               " AS DECIMAL(38,8))) AS DOUBLE)", 6)} AS js_divergence
    FROM terms
    GROUP BY source
    ORDER BY source
    """,
)
def text_positional_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Positional vocabulary divergence per source: Jensen-Shannon
    divergence between the unigram distribution of each document's
    first five tokens ("head") and everything after ("body") — the
    template-prefix detector: boilerplate headers, SEO lead-ins, and
    prompt-injection preambles concentrate mass in the head stratum
    and push JS up, while natural text keeps both strata near the
    same distribution. The positional companion of
    text_js_divergence (which compares sources to the global
    corpus).

    Scale shape: ONE positional explode (posexplode — DuckDB's
    zipped parallel unnest replays it) to (source, stratum, word)
    cells, vocabulary-bounded; the divergence is an 8dp-rounded
    decimal sum over the per-source cell table. Zero-mass strata
    terms contribute 0 exactly on both engines."""
    placed = spark.table("documents").select(
        "source",
        F.posexplode(_tokens()).alias("pos", "word"),
    ).select(
        "source",
        F.when(F.col("pos") < 5, "head").otherwise("body").alias(
            "stratum"
        ),
        "word",
    )
    cells = placed.groupBy("source", "stratum", "word").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wide = cells.groupBy("source", "word").agg(
        F.coalesce(
            F.sum(F.when(F.col("stratum") == "head", F.col("c"))),
            F.lit(0),
        ).alias("ch"),
        F.coalesce(
            F.sum(F.when(F.col("stratum") == "body", F.col("c"))),
            F.lit(0),
        ).alias("cb"),
    )
    tots = wide.groupBy("source").agg(
        F.sum("ch").alias("th"), F.sum("cb").alias("tb")
    )
    terms = wide.join(tots, "source").select(
        "source",
        "th",
        "tb",
        (F.col("ch").cast("double") / F.col("th")).alias("p"),
        (F.col("cb").cast("double") / F.col("tb")).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    m = (p + q) / 2
    term = 0.5 * F.when(p > 0, p * F.log(p / m)).otherwise(
        0.0
    ) + 0.5 * F.when(q > 0, q * F.log(q / m)).otherwise(0.0)
    return (
        terms.groupBy("source")
        .agg(
            F.any_value("th").cast("bigint").alias("n_head_tokens"),
            F.any_value("tb").cast("bigint").alias("n_body_tokens"),
            F.round(
                F.sum(F.round(term, 8).cast("decimal(38,8)")).cast(
                    "double"
                ),
                6,
            ).alias("js_divergence"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-12 widening: per-source lexical concentration and the bigram
# entropy rate.
# ---------------------------------------------------------------------------


@query(
    "text_simpson_diversity",
    oracle=r"""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents
    ),
    freq AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY source, word
    ),
    s AS (
        SELECT source,
               CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(f * (f - 1)) AS BIGINT) AS sff
        FROM freq GROUP BY source
    )
    SELECT source, n_tokens, vocab,
           round(CAST(sff AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6)
               AS simpson_d,
           round(CAST(n_tokens AS DOUBLE) * (n_tokens - 1) / sff, 4)
               AS inv_simpson
    FROM s WHERE n_tokens > 1 AND sff > 0
    ORDER BY source
    """,
)
def text_simpson_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson's diversity of each source's token distribution:
    D = sum f(f-1) / (N(N-1)) — the probability two randomly drawn
    tokens are the same type — and its inverse (the "effective
    vocabulary": how many equally-common types would produce the
    same repetitiveness). The per-source concentration readout
    complementing text_frequency_spectrum's corpus-global Yule's K
    (K is 1e4 x a Simpson variant; this key localizes the signal to
    the source level where curation mixing decisions happen) and
    text_lexical_diversity's length-sensitive TTR.

    All sufficient statistics (f, N, sum f(f-1)) are exact integers;
    only the two final ratios touch doubles.

    Scale shape: one token explode collapsing to the vocabulary-
    sized (source, word) table, then one aggregation per source."""
    tok = spark.table("documents").select(
        "source", F.explode(_tokens()).alias("word")
    )
    freq = tok.groupBy("source", "word").agg(
        F.count("*").cast("bigint").alias("f")
    )
    s = freq.groupBy("source").agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab"),
        F.sum(F.col("f") * (F.col("f") - 1))
        .cast("bigint")
        .alias("sff"),
    )
    n, sff = F.col("n_tokens"), F.col("sff")
    return (
        s.where((n > 1) & (sff > 0))
        .select(
            "source",
            "n_tokens",
            "vocab",
            F.round(
                sff.cast("double") / (n.cast("double") * (n - 1)), 6
            ).alias("simpson_d"),
            F.round(n.cast("double") * (n - 1) / sff, 4).alias(
                "inv_simpson"
            ),
        )
        .orderBy("source")
    )


@query(
    "text_entropy_rate_bigram",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, pos, word,
               LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS nxt
        FROM (SELECT doc_id,
                     generate_subscripts(string_split_regex(
                         trim(text), '\s+'), 1) AS pos,
                     unnest(string_split_regex(trim(text), '\s+'))
                         AS word
              FROM documents)
    ),
    big AS (
        SELECT word, nxt, CAST(COUNT(*) AS BIGINT) AS c2
        FROM tok WHERE nxt IS NOT NULL
        GROUP BY word, nxt
    ),
    uni AS (
        SELECT word, CAST(SUM(c2) AS BIGINT) AS c1
        FROM big GROUP BY word
    ),
    s AS (
        SELECT CAST(SUM(b.c2) AS BIGINT) AS n_bigrams,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
               CAST(SUM(b.c2 * CAST(round(ln(CAST(b.c2 AS DOUBLE)
                                             / u.c1), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS s_clnp
        FROM big b JOIN uni u ON u.word = b.word
    )
    SELECT n_bigrams, n_distinct_bigrams,
           round(-s_clnp / n_bigrams, 6) AS entropy_rate_nats,
           round(-s_clnp / n_bigrams / ln(2), 6) AS entropy_rate_bits
    FROM s
    """,
)
def text_entropy_rate_bigram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bigram entropy rate of the corpus: H(W2 | W1) = -sum over
    bigrams of p(w1,w2) ln p(w2|w1), with conditionals from the
    within-document adjacency counts (document boundaries break
    bigrams, the text_bigram_logprob convention) — the
    bits-per-token compressibility of the corpus under a first-order
    model. The single-number signal behind token-budget planning:
    templated corpora sit far below natural text (~6-8 bits/token),
    so a low rate flags boilerplate the dedup ladder should see.
    Complements text_bigram_logprob (per-doc scores) with the
    corpus-level rate.

    Scale shape: one explode with a per-document LEAD window (the
    only corpus-sized exchange), collapsing to vocabulary-sized
    bigram counts; ln terms are 8dp-rounded and integer-weighted in
    the decimal sum."""
    toks = spark.table("documents").select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tok = toks.select(
        "word", F.lead("word").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    big = tok.groupBy("word", "nxt").agg(
        F.count("*").cast("bigint").alias("c2")
    )
    uni = big.groupBy("word").agg(
        F.sum("c2").cast("bigint").alias("c1")
    )
    s = (
        big.join(uni, "word")
        .agg(
            F.sum("c2").cast("bigint").alias("n_bigrams"),
            F.count("*").cast("bigint").alias("n_distinct_bigrams"),
            F.sum(
                F.col("c2")
                * F.round(
                    F.log(
                        F.col("c2").cast("double") / F.col("c1")
                    ),
                    8,
                ).cast("decimal(38,8)")
            )
            .cast("double")
            .alias("s_clnp"),
        )
    )
    import math

    return s.select(
        "n_bigrams",
        "n_distinct_bigrams",
        F.round(-F.col("s_clnp") / F.col("n_bigrams"), 6).alias(
            "entropy_rate_nats"
        ),
        F.round(
            -F.col("s_clnp") / F.col("n_bigrams") / math.log(2), 6
        ).alias("entropy_rate_bits"),
    )


_MSTTR_WIN = 50  # tokens per segment


@query(
    "text_msttr",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, source,
               (generate_subscripts(string_split_regex(trim(text),
                                                       '\s+'), 1) - 1)
                   // {_MSTTR_WIN} AS win,
               unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents
    ),
    seg AS (
        SELECT doc_id, source, win,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types
        FROM tok GROUP BY doc_id, source, win
    ),
    full_seg AS (
        SELECT source,
               CAST(n_types AS DOUBLE) / {_MSTTR_WIN} AS ttr
        FROM seg WHERE n_tok = {_MSTTR_WIN}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           round(CAST(SUM(CAST(ttr AS DECIMAL(28,8))) AS DOUBLE)
                 / COUNT(*), 6) AS msttr,
           round(MIN(ttr), 6) AS min_ttr,
           round(MAX(ttr), 6) AS max_ttr
    FROM full_seg
    GROUP BY source
    HAVING COUNT(*) > 0
    ORDER BY source
    """,
)
def text_msttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean segmental type-token ratio per source: split every
    document into fixed {_MSTTR_WIN}-token segments, take each FULL
    segment's TTR, and average — the length-controlled lexical
    diversity measure (raw TTR falls mechanically with document
    length, so cross-source TTR comparisons are invalid;
    text_lexical_diversity reports that raw form, and this key is
    the comparable one). Segment TTRs are exact rationals k/50, so
    the decimal-summed mean replays exactly.

    Scale shape: one positional explode; segments collapse by
    (doc, window) with map-side partials; the per-source average
    rides the segment table."""
    toks = spark.table("documents").select(
        "doc_id",
        "source",
        F.posexplode(_tokens()).alias("pos", "word"),
    )
    seg = (
        toks.select(
            "doc_id",
            "source",
            (F.col("pos") / _MSTTR_WIN)
            .cast("bigint")
            .alias("win"),
            "word",
        )
        .groupBy("doc_id", "source", "win")
        .agg(
            F.count("*").cast("bigint").alias("n_tok"),
            F.count_distinct("word").cast("bigint").alias("n_types"),
        )
    )
    full_seg = seg.where(F.col("n_tok") == _MSTTR_WIN).select(
        "source",
        (F.col("n_types").cast("double") / _MSTTR_WIN).alias("ttr"),
    )
    return (
        full_seg.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.round(
                F.sum(F.col("ttr").cast("decimal(28,8)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("msttr"),
            F.round(F.min("ttr"), 6).alias("min_ttr"),
            F.round(F.max("ttr"), 6).alias("max_ttr"),
        )
        .orderBy("source")
    )
