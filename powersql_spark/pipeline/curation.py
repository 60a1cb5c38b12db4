"""Dataset-curation operators: deterministic splits and weighted source
mixing (driver north-star extensions; the reference has no analog —
its surface ends at SQL orchestration, src/execute.rs:101).

Both ops assign rows to buckets by content hash (md5 of the key), not
``rand()``: assignment is a pure function of the row, so it is
reproducible across engines, runs, partitionings, and cluster sizes,
and a document keeps its split when the corpus around it grows — the
property a training pipeline needs so examples never leak from test
into train between dataset versions.

Cross-engine note: the bucket is the first two hex chars of the md5
compared LEXICOGRAPHICALLY — lowercase hex ordering equals numeric
ordering, and both Spark and DuckDB emit lowercase hex, so the same
literal thresholds work on both engines with no integer parsing
('cd' = 205/256 ~ 80%).

Each DECISION hashes with its own salt (':split' vs ':mix'): with a
shared hash the two decisions are fully correlated — rows surviving a
50%/25% downsample all have low buckets and would land entirely in
'train' when the ops compose, so downsampled sources would contribute
zero val/test examples. Independent salts make the decisions
independent coin flips per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.catalog import values_df
from powersql_spark.operators.common import lit_array, sql_jround
from powersql_spark.pipeline.text import _SW_SQL
from powersql_spark.registry import query


def _bucket(col, salt: str):
    """First two hex chars of md5(key || salt) — 256 deterministic
    buckets, independent across salts."""
    return F.substring(
        F.md5(F.concat(col.cast("string"), F.lit(salt)).cast("binary")), 1, 2
    )


@query(
    "split_train_val_test",
    oracle="""
    SELECT lang, split, COUNT(*) AS n_docs
    FROM (
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cd'
                       THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6'
                       THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) assigned
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split, reported per
    language. Pure row-local hashing — no shuffle at assignment time,
    stays in whole-stage codegen; at 100 TB the split is a free column
    on the scan, and the only shuffle is the reporting aggregate."""
    b = _bucket(F.col("doc_id"), ":split")
    split = (
        F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    )
    return (
        spark.table("documents")
        .select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


@query(
    "mix_sources_weighted",
    oracle="""
    SELECT source, COUNT(*) AS n_docs
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 2) <
          CASE WHEN source IN ('src0','src1','src2','src3','src4')
                    THEN 'zz'
               WHEN source IN ('src5','src6','src7','src8','src9')
                    THEN '80'
               ELSE '40' END
    GROUP BY source
    ORDER BY source
    """,
)
def mix_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: keep 100% of the first five sources, 50%
    of the next five, 25% of the rest — the training-mix downsampling
    step, as a deterministic per-row hash filter (no rand(), no
    shuffle until the reporting aggregate). Changing the mix is a
    threshold edit, not a re-shuffle; rows keep their fate across
    dataset versions so incremental rebuilds only touch changed
    sources."""
    b = _bucket(F.col("doc_id"), ":mix")
    threshold = (
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3", "src4"), "zz"
        )
        .when(
            F.col("source").isin("src5", "src6", "src7", "src8", "src9"), "80"
        )
        .otherwise("40")
    )
    return (
        spark.table("documents")
        .where(b < threshold)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source")
    )


@query(
    "curation_contamination_check",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 3),
                      i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM toks WHERE len(t) >= 5
    ),
    bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 0
    )
    SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_contaminated_grams
    FROM grams c JOIN bench USING (g)
    WHERE c.doc_id % 100 <> 0
    GROUP BY c.doc_id
    """,
)
def curation_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: corpus documents sharing any word
    5-gram with the benchmark set (stand-in: every 100th doc), with the
    count of distinct colliding 5-grams — the decontamination step every
    training pipeline runs against eval suites.

    Scale shape: the benchmark n-gram set is tiny relative to the corpus
    (eval suites are fixed-size), so it BROADCASTS; the corpus side is a
    map-only explode scanned once — no shuffle of corpus text, and the
    only aggregation shuffles (doc_id, gram) hits. At 100 TB this is the
    canonical plan: dimension-side broadcast, fact-side linear scan."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    grams5 = F.transform(
        F.sequence(F.lit(1), n - 4),
        lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(5))),
    )
    d = spark.table("documents").where(n >= 5).select(
        "doc_id", F.explode(grams5).alias("g")
    )
    bench = (
        d.where(F.col("doc_id") % 100 == 0).select("g").distinct()
    )
    corpus = d.where(F.col("doc_id") % 100 != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_contaminated_grams"))
    )


@query(
    "mix_epochs_weighted",
    oracle="""
    SELECT source, CAST(e AS INTEGER) AS epoch, COUNT(*) AS n_docs
    FROM (
        SELECT source,
               unnest(range(1,
                   CASE WHEN source IN ('src0','src1','src2','src3','src4')
                             THEN 3
                        WHEN source IN ('src5','src6','src7','src8','src9')
                             THEN 2
                        ELSE 1 END + 1)) AS e
        FROM documents
    )
    GROUP BY source, e
    ORDER BY source, epoch
    """,
)
def mix_epochs_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted upsampling — the complement of mix_sources_weighted:
    high-quality sources repeat for 3 training epochs, mid-tier for 2,
    the tail for 1, implemented as a map-only sequence+explode (row
    multiplication without a join or shuffle; the epoch column lets the
    trainer interleave copies). Changing the mix is a literal edit, and
    the replication happens at scan time — nothing is materialized
    three times."""
    epochs = (
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3", "src4"), 3
        )
        .when(
            F.col("source").isin("src5", "src6", "src7", "src8", "src9"), 2
        )
        .otherwise(1)
    )
    return (
        spark.table("documents")
        .select("source", F.explode(F.sequence(F.lit(1), epochs)).alias("epoch"))
        .groupBy("source", "epoch")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "epoch")
    )


@query(
    "pack_sequences",
    oracle=r"""
    WITH d AS (
        SELECT source, doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok
                   AS tok_before
        FROM d
    )
    SELECT source,
           CAST(floor(tok_before / 512.0) AS INTEGER) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM cum
    GROUP BY source, bin
    ORDER BY source, bin
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: concatenate documents per source in
    deterministic (doc_id) order and split the stream at 512-token
    context boundaries — each doc is assigned to the bin where it
    starts. This is the concat-and-chunk packing GPT-style pre-training
    uses to avoid padding; the output is (bin -> docs, tokens), i.e.
    the shard manifest a data loader consumes.

    Packing is inherently order-sensitive, so it keys on a total order
    (source, doc_id), never on partition layout — the same bins come
    out of any cluster size. Scale shape: one hash shuffle on source
    for the running sum; at 100 TB you pack per OUTPUT SHARD (source ×
    shard_id from a doc_id hash) so window partitions stay
    executor-sized — same plan, finer key."""
    d = spark.table("documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.select(
        "source",
        "doc_id",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("tok_before"),
    )
    return (
        cum.groupBy(
            "source",
            F.floor(F.col("tok_before") / 512.0).cast("int").alias("bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "bin")
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 20
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 20 documents per language, chosen by a
    salted content hash so the sample is deterministic, uniform within
    each stratum, and stable as the corpus grows (a kept doc stays kept
    until 20 better hashes exist in its stratum) — the eval-set /
    inspection-sample primitive, where rand() would be unreproducible.

    Scale shape: one shuffle on lang + a rank window. For 100 TB strata,
    pre-filter with a hash-prefix threshold derived from approximate
    stratum counts (keeps ~k·safety candidates per group) and run the
    same window over the survivors — two linear passes, no giant
    window partition."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":strat")).cast(
                "binary"
            )
        ),
        "doc_id",
    )
    return (
        spark.table("documents")
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@query(
    "curation_quality_buckets",
    oracle=r"""
    WITH s AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS score
        FROM documents
    ),
    b AS (
        SELECT quantile_cont(score,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        FROM s
    )
    SELECT CAST(len(list_filter(bs, x -> score > x)) AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(score) AS INTEGER) AS min_score,
           CAST(MAX(score) AS INTEGER) AS max_score,
           CAST(SUM(score) AS BIGINT) AS total_tokens
    FROM s, b
    GROUP BY 1
    """,
)
def curation_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum decile binning: bucket documents into 10 quality tiers
    (here: token count, the stand-in for any scalar quality score) —
    the curriculum-learning / quality-pruning primitive ("train on the
    top 3 deciles first", "drop the bottom decile").

    Scale shape: the naive form is ``ntile(10) OVER (ORDER BY score)``
    — a GLOBAL sort window that funnels 100 TB through one partition.
    Instead: pass 1 computes the 9 decile boundaries (one tiny
    aggregate), pass 2 assigns each row by comparing against the
    broadcast boundary array — two linear map passes, no global sort,
    and the bucket assignment is a pure function of the score so it is
    stable across partitionings. Boundary percentiles are exact and
    linearly interpolated identically in both engines; integer scores
    make the interpolated boundaries exactly representable."""
    d = spark.table("documents")
    s = d.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("score")
    )
    bounds = s.agg(
        F.percentile(
            "score", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
        ).alias("bs")
    )
    bucket = F.size(
        F.filter("bs", lambda x: F.col("score") > x)
    ).alias("bucket")
    return (
        s.join(F.broadcast(bounds))
        .select("doc_id", "score", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.sum("score").cast("bigint").alias("total_tokens"),
        )
    )


@query(
    "sample_weighted_reservoir",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                             || ':wres'), 1, 8)) AS BIGINT)
                    + 1) / 4294967296.0)
               / n_chars AS k
        FROM documents
    )
    SELECT doc_id, n_chars
    FROM (SELECT doc_id, n_chars,
                 ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn
          FROM keyed)
    WHERE rn <= 50
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis): keep
    the 50 docs with the smallest -ln(u)/w, where w is the row weight
    (n_chars — longer docs sampled proportionally more often) and u is
    a DETERMINISTIC uniform in (0,1] derived from md5(doc_id) — the
    importance-sampling primitive for building eval/inspection sets
    biased toward high-weight rows, reproducible across runs, engines,
    and partitionings (rand() is none of those).

    Scale shape: map-only key computation + a global top-k — which
    Spark plans as TakeOrderedAndProject (per-partition heaps, no
    global sort). One 50-row result; no shuffle of the corpus."""
    d = spark.table("documents")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":wres"))
                    .cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    key = -F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", key.alias("k"))
        .orderBy("k", "doc_id")
        .limit(50)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering — the fastText-classifier pattern
# (CCNet / DCLM / FineWeb-edu): distill a quality signal into a cheap
# linear model and score the whole corpus with it. Spark's own MLlib
# does both halves distributed: LogisticRegression trains via
# treeAggregate (gradients partial-aggregate map-side, exactly like any
# other partial agg here), and scoring is a map-only transform.
# ---------------------------------------------------------------------------

_CLF_FEATURES = 1024
_CLF_TRAIN_BUCKET = "cd"  # md5 bucket < 'cd' = ~80% train split


def _weak_label_frame(spark: SparkSession) -> DataFrame:
    """(doc_id, words, label): weak label = stopword-presence ratio
    above the corpus median — the stand-in for the expensive teacher
    (an LLM judge or human ratings) the classifier distills."""
    from powersql_spark.pipeline.text import _STOPWORDS

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    swlit = F.array(*[F.lit(w) for w in _STOPWORDS])
    base = spark.table("documents").select(
        "doc_id", toks.alias("words")
    )
    heur = base.select(
        "doc_id",
        "words",
        (
            F.size(F.array_intersect("words", swlit))
            / F.size("words").cast("double")
        ).alias("h"),
    )
    # One scalar to the driver: the label threshold (a model
    # parameter), not data. The LOWER MEDIAN — the h value at 0-based
    # ascending rank (n-1)//2 — rather than percentile_approx: a data
    # value selected by rank is exactly replayable in the DuckDB
    # oracle (row_number), where interpolated or sketched quantiles
    # can drift by an ulp and flip every h == threshold label.
    # None = empty corpus (cold-start partition); the caller returns a
    # schema-stable empty result instead of fitting on nothing.
    #
    # Two-pass exact rank pick (ADVICE r12, replacing a global
    # sort + OFFSET): pass 1 counts; pass 2 pre-aggregates h into a
    # distinct-value histogram (partial counts map-side, one tiny
    # exchange) and takes min(h) where the cumulative count reaches
    # the target rank. The only ordered stage left runs on the
    # HISTOGRAM (bounded by distinct stopword-ratio values), never a
    # whole-corpus single-partition sort pipeline.
    n = heur.count()
    if n == 0:
        return None
    hist = heur.groupBy("h").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    med = (
        hist.select("h", F.sum("cnt").over(wcum).alias("cum"))
        .where(F.col("cum") >= (n - 1) // 2 + 1)
        .agg(F.min("h"))
        .collect()[0][0]
    )
    return heur.select(
        "doc_id",
        "words",
        (F.col("h") >= med).cast("double").alias("label"),
    )


_CLF_MIN_HOLDOUT_ACC = 0.70  # generalization gate on the ~20% holdout


def _classifier_scores(spark: SparkSession) -> DataFrame | None:
    """Full per-document score frame (doc_id, weak_label, is_train,
    p_good, pred_label), or None on an empty corpus. The registered
    query projects the oracle-replayable columns plus the holdout
    accuracy gate; tests consume the probabilities directly."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    labeled = _weak_label_frame(spark)
    if labeled is None:
        return None
    tf = HashingTF(
        inputCol="words",
        outputCol="features",
        numFeatures=_CLF_FEATURES,
        binary=True,
    )
    feat = tf.transform(labeled).withColumn(
        "is_train", _bucket(F.col("doc_id"), ":clf") < _CLF_TRAIN_BUCKET
    )
    model = LogisticRegression(maxIter=25, regParam=0.01).fit(
        feat.where(F.col("is_train"))
    )
    # Score with the LEARNED WEIGHTS AS PLAN LITERALS rather than
    # model.transform: the fitted weights are the model — embedding
    # them keeps scoring pure whole-stage-codegen arithmetic with no
    # JVM model object captured in any task closure (the model's
    # training summary pins the SparkSession, which is not
    # serializable), and makes the scoring plan auditable like every
    # other operator here. At real scale the same literal weight
    # vector rides a pandas_udf matmul (the dedup_embedding_lsh
    # pattern) instead of a 1024-step fold.
    coef = F.array(
        *[F.lit(float(c)) for c in model.coefficients.toArray()]
    )
    margin = F.lit(float(model.intercept)) + F.aggregate(
        F.zip_with(
            vector_to_array("features"), coef, lambda a, c: a * c
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    p_good = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return feat.select(
        "doc_id",
        F.col("label").cast("int").alias("weak_label"),
        "is_train",
        p_good.alias("p_good"),
        (p_good >= 0.5).cast("int").alias("pred_label"),
    )


@query(
    "quality_classifier_score",
    # The learned weights have no SQL twin; the replayable claim is
    # (a) the weak labels (rank-selected median threshold), (b) the
    # deterministic md5 train split, and (c) the boolean holdout
    # accuracy gate — same banded-gate pattern as agg_approx_distinct.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               len(list_distinct(list_filter(
                   w, t -> list_contains([{_SW_SQL}], t))))
                   / CAST(len(w) AS DOUBLE) AS h
        FROM toks
    ),
    med AS (
        SELECT max(h) AS m FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS rn,
                   count(*) OVER () AS n
            FROM h
        ) WHERE rn = (n - 1) // 2 + 1
    )
    SELECT h.doc_id,
           CAST(h.h >= med.m AS INTEGER) AS weak_label,
           substr(md5(CAST(h.doc_id AS VARCHAR) || ':clf'), 1, 2) < 'cd'
               AS is_train,
           TRUE AS holdout_acc_ok
    FROM h CROSS JOIN med
    """,
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a bag-of-words logistic-regression quality classifier on a
    deterministic 80% hash split, score EVERY document, and emit per
    document its weak label, split membership, and whether the model
    generalizes (holdout accuracy >= _CLF_MIN_HOLDOUT_ACC, computed
    in-query as a 1-row aggregate broadcast onto every row) — the
    model-based filter stage of a curation pipeline.

    Scale shape: featurization (HashingTF, 1024-dim binary
    bag-of-words) is map-only; training never collects rows — MLlib's
    LBFGS partial-aggregates gradient contributions per partition
    (treeAggregate), moving one 1025-float vector per partition per
    iteration regardless of corpus size; scoring is again map-only.
    The train/score split is salt-independent of every other curation
    decision, and the weak-label median is the only driver-side
    scalar. Probability-level checks live in tests/test_semantics.py
    via _classifier_scores."""
    scores = _classifier_scores(spark)
    if scores is None:
        return spark.createDataFrame(
            [],
            schema=(
                "doc_id bigint, weak_label int, is_train boolean,"
                " holdout_acc_ok boolean"
            ),
        )
    acc = scores.where(~F.col("is_train")).agg(
        (
            F.avg((F.col("pred_label") == F.col("weak_label")).cast("int"))
            >= _CLF_MIN_HOLDOUT_ACC
        ).alias("holdout_acc_ok")
    )
    return scores.select("doc_id", "weak_label", "is_train").crossJoin(
        F.broadcast(acc)
    )


_CAP_PER_SOURCE = 20


@query(
    "curation_domain_cap",
    oracle=f"""
    SELECT doc_id, source, cap_rank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id
             ) AS cap_rank
      FROM documents
    ) ranked
    WHERE cap_rank <= {_CAP_PER_SOURCE}
    """,
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — keep at most N docs per source/domain,
    chosen by a salted-hash priority (the C4/RefinedWeb "domain
    frequency cap" that stops one crawl domain from dominating the
    mix). Hash priority instead of "first N by id" means the kept
    sample is unbiased w.r.t. crawl order and stable as the corpus
    grows. Scale shape: one shuffle on source; within-partition
    top-N via rank window (no global sort). A pathologically hot
    domain is exactly what the cap removes, so the skew fixes itself:
    only ≤N survivors per key leave the exchange."""
    w = Window.partitionBy("source").orderBy(
        _bucket_full(F.col("doc_id"), ":cap"), "doc_id"
    )
    return (
        spark.table("documents")
        .select(
            "doc_id",
            "source",
            F.row_number().over(w).alias("cap_rank"),
        )
        .where(F.col("cap_rank") <= _CAP_PER_SOURCE)
    )


def _bucket_full(col, salt: str):
    """Full md5 hex of (key || salt) — a deterministic total priority
    order shared with the DuckDB oracle."""
    return F.md5(F.concat(col.cast("string"), F.lit(salt)).cast("binary"))


_DSIR_B = 128  # hashed feature buckets
_DSIR_TARGET = ("src0", "src1")  # stand-in high-quality target corpus
_DSIR_TARGET_SQL = ", ".join(f"'{s}'" for s in _DSIR_TARGET)


@query(
    "curation_dsir_weights",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        FROM documents
    ),
    bucketed AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(t), 1, 4))::BIGINT % {_DSIR_B} AS b
        FROM tok
    ),
    spine AS (SELECT unnest(range(0, {_DSIR_B})) AS b),
    tgt AS (
        SELECT s.b, COUNT(t.b) AS c
        FROM spine s LEFT JOIN
             (SELECT b FROM bucketed WHERE source IN ({_DSIR_TARGET_SQL})) t
             ON s.b = t.b
        GROUP BY s.b
    ),
    raw AS (
        SELECT s.b, COUNT(t.b) AS c
        FROM spine s LEFT JOIN bucketed t ON s.b = t.b
        GROUP BY s.b
    ),
    lr AS (
        SELECT tgt.b,
               ln((tgt.c + 1.0) / ((SELECT SUM(c) FROM tgt) + {_DSIR_B}))
             - ln((raw.c + 1.0) / ((SELECT SUM(c) FROM raw) + {_DSIR_B}))
                   AS logratio
        FROM tgt JOIN raw ON tgt.b = raw.b
    )
    SELECT bucketed.doc_id,
           COUNT(*) AS n_tokens,
           round(SUM(lr.logratio), 4) AS dsir_logratio
    FROM bucketed JOIN lr ON bucketed.b = lr.b
    GROUP BY bucketed.doc_id
    """,
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each raw
    document by how much its hashed-unigram distribution looks like a
    target corpus — sum over tokens of log p_target(bucket) -
    log p_raw(bucket), Laplace-smoothed over a fixed 128-bucket hashed
    vocabulary. High scorers get upsampled into the training mix.

    Scale shape: tokenize is a map-side explode; both language models
    aggregate to a CONSTANT 128-row table regardless of corpus size;
    the per-token log-ratio lookup is a broadcast join; the final
    per-doc sum shuffles only (doc_id, partial sum). The md5-derived
    bucketing is the same arithmetic on both engines, so the driver
    hash-verifies the weights bit-for-bit after 4dp rounding."""
    d = spark.table("documents")
    tok = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "t"
        ),
    )
    bucketed = tok.select(
        "doc_id",
        "source",
        (
            F.conv(
                F.substring(F.md5(F.col("t").cast("binary")), 1, 4), 16, 10
            ).cast("long")
            % _DSIR_B
        ).alias("b"),
    )
    # BOTH language models from ONE pass over the token stream: count
    # per bucket overall and within the target subset, then smooth.
    # (A per-model aggregate would re-explode the corpus per model —
    # the aggregate is 128 rows either way, the scans are not.)
    spine = spark.range(_DSIR_B).select(F.col("id").alias("b"))
    # Aggregate BEFORE any join (guide §2.3): the token stream
    # partial-aggregates map-side to <=128 (bucket, raw/tgt) counters
    # per partition, and the spine left-joins the FINISHED 128-row
    # aggregate (broadcast) only to zero-fill absent buckets. The
    # previous shape joined spine LEFT-> raw token stream first — and
    # a left-outer join cannot broadcast-build its left side, so the
    # ENTIRE token stream shuffled by bucket (128 distinct keys) just
    # to be counted afterwards.
    bcounts = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.count(
            F.when(F.col("source").isin(*_DSIR_TARGET), 1)
        ).alias("c_tgt"),
    )
    counts = spine.join(F.broadcast(bcounts), "b", "left").select(
        "b",
        F.coalesce("c_raw", F.lit(0).cast("bigint")).alias("c_raw"),
        F.coalesce("c_tgt", F.lit(0).cast("bigint")).alias("c_tgt"),
    )
    total = Window.partitionBy()
    smooth = F.lit(float(_DSIR_B))
    lr = counts.select(
        "b",
        (
            F.log(
                (F.col("c_tgt") + 1.0)
                / (F.sum("c_tgt").over(total) + smooth)
            )
            - F.log(
                (F.col("c_raw") + 1.0)
                / (F.sum("c_raw").over(total) + smooth)
            )
        ).alias("logratio"),
    )
    return (
        bucketed.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("logratio"), 4).alias("dsir_logratio"),
        )
    )


_TOKEN_BUDGET = 15_000


@query(
    "curation_token_budget",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tok,
               CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 0 ELSE 1 END
                   AS tier,
               md5(CAST(doc_id AS VARCHAR) || ':budget') AS pri,
               substr(md5(CAST(doc_id AS VARCHAR) || ':budget'), 1, 2)
                   AS bkt
        FROM documents
    ),
    bucket_totals AS (
        SELECT tier, bkt, SUM(n_tok) AS bkt_tok
        FROM scored GROUP BY tier, bkt
    ),
    offsets AS (
        SELECT tier, bkt,
               COALESCE(SUM(bkt_tok) OVER (
                   ORDER BY tier, bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS base
        FROM bucket_totals
    )
    SELECT s.doc_id, s.tier, s.n_tok,
           CAST(o.base + SUM(s.n_tok) OVER (
               PARTITION BY s.tier, s.bkt ORDER BY s.pri, s.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens,
           (o.base + SUM(s.n_tok) OVER (
               PARTITION BY s.tier, s.bkt ORDER BY s.pri, s.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) <= {_TOKEN_BUDGET} AS selected
    FROM scored s JOIN offsets o ON s.tier = o.tier AND s.bkt = o.bkt
    """,
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: fill a fixed training-token budget with
    the best documents — quality tier first (tier 0 = length band
    200..2000 chars), salted-hash order within tier — by computing each
    doc's running token total over the global priority order and
    keeping docs whose total fits the budget.

    Scale shape: the global running sum NEVER does a global sort.
    Priority order is (tier, hash-bucket, hash): per-(tier, bucket)
    token subtotals (256 rows per tier) get prefix offsets in a
    metadata-sized window, broadcast back, and each bucket computes its
    LOCAL running sum in parallel — the classic two-phase distributed
    prefix sum, same pattern as curation_quality_buckets' broadcast
    percentiles. Integer token counts end-to-end, so both engines
    agree exactly."""
    d = spark.table("documents")
    pri = _bucket_full(F.col("doc_id"), ":budget")
    scored = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tok"),
        F.when(F.col("n_chars").between(200, 2000), 0)
        .otherwise(1)
        .alias("tier"),
        pri.alias("pri"),
        F.substring(pri, 1, 2).alias("bkt"),
    )
    bucket_totals = scored.groupBy("tier", "bkt").agg(
        F.sum("n_tok").alias("bkt_tok")
    )
    w_off = (
        Window.orderBy("tier", "bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_totals.select(
        "tier",
        "bkt",
        F.coalesce(F.sum("bkt_tok").over(w_off), F.lit(0)).alias("base"),
    )
    w_local = (
        Window.partitionBy("tier", "bkt")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.col("base") + F.sum("n_tok").over(w_local)
    return scored.join(F.broadcast(offsets), ["tier", "bkt"]).select(
        "doc_id",
        "tier",
        "n_tok",
        cum.cast("bigint").alias("cum_tokens"),
        (cum <= _TOKEN_BUDGET).alias("selected"),
    )


_BOOT_R = 16  # bootstrap replicates
# Inverse-CDF thresholds for Poisson(1): P(X<=k) cumulative.
_POIS = ((0.36788, 0), (0.73576, 1), (0.91970, 2), (0.98101, 3),
         (0.99634, 4))


def _pois_case_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {p} THEN {k}" for p, k in _POIS
    )
    return f"CASE {arms} ELSE 5 END"


@query(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (
        SELECT e.event_type, e.value, r.r,
               {_pois_case_sql(
                   "(('0x' || substr(md5(CAST(e.event_id AS VARCHAR)"
                   " || ':' || r.r), 1, 8))::BIGINT / 4294967296.0)")}
                   AS w
        FROM events e, (SELECT unnest(range(0, {_BOOT_R})) AS r) r
    ),
    per_rep AS (
        SELECT event_type, r,
               CAST(SUM(CAST(w * value AS DECIMAL(18,6))) AS DOUBLE)
                   / SUM(w) AS mean_r
        FROM reps GROUP BY event_type, r
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_reps,
           round(AVG(mean_r), 6) AS boot_mean,
           round(stddev_samp(mean_r), 6) AS boot_se
    FROM per_rep
    GROUP BY event_type
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the big-data bootstrap used in production
    eval pipelines): estimate the standard error of each event type's
    mean value WITHOUT resampling the dataset — every (event,
    replicate) pair gets a deterministic Poisson(1) weight via
    inverse-CDF on an md5-uniform, and each replicate's weighted mean
    stands in for a resample. 16 replicates -> bootstrap mean + SE.

    Scale shape: the x16 replicate explode happens map-side and
    partially aggregates IN THE SAME STAGE, so the exchange carries
    only (type, replicate) sums — the bootstrap costs 16x compute,
    never 16x shuffle or storage. Weighted sums go through DECIMAL so
    both engines agree bit-for-bit before the final 6dp rounding."""
    e = spark.table("events")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("r").cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(5)
    for p, k in reversed(_POIS):
        w = F.when(u < p, k).otherwise(w)
    reps = e.select(
        "event_type",
        "value",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    ).select("event_type", "r", w.alias("w"), "value")
    per_rep = reps.groupBy("event_type", "r").agg(
        (
            F.sum((F.col("w") * F.col("value")).cast("decimal(18,6)"))
            .cast("double")
            / F.sum("w")
        ).alias("mean_r")
    )
    return per_rep.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.round(F.avg("mean_r"), 6).alias("boot_mean"),
        F.round(F.stddev_samp("mean_r"), 6).alias("boot_se"),
    )


_MIX_TAU = 0.7  # temperature: 1.0 = natural, 0 = uniform


@query(
    "curation_mix_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source, n_docs,
               round(pow(CAST((SELECT MIN(n_docs) FROM counts) AS DOUBLE)
                         / n_docs, 1 - {_MIX_TAU}), 6) AS keep_rate
        FROM counts
    )
    SELECT r.source,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           r.keep_rate,
           CAST(COUNT(CASE WHEN
                 ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'),
                                 1, 4))::BIGINT
                 < CAST(floor(r.keep_rate * 65536) AS BIGINT)
                 THEN 1 END) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY r.source, r.n_docs, r.keep_rate
    """,
)
def curation_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source balancing (the multilingual sampling
    trick from mBERT/XLM-R: sample share proportional to n^tau, tau<1
    flattening the distribution): per-source keep rate
    (n_min/n_i)^(1-tau) — the smallest source keeps everything, hot
    sources are hash-downsampled toward balance — applied as a
    deterministic per-doc threshold filter, no rand().

    Scale shape: the rate table is one tiny aggregate broadcast back
    to the scan; the keep decision is row-local hash arithmetic; the
    report is one more aggregate. Changing tau re-thresholds without
    reshuffling anything."""
    d = spark.table("documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_docs",
        F.round(
            F.pow(
                F.col("n_min").cast("double") / F.col("n_docs"),
                1 - _MIX_TAU,
            ),
            6,
        ).alias("keep_rate"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(":temp"))
                .cast("binary")
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    kept = bucket < F.floor(F.col("keep_rate") * 65536).cast("long")
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "keep_rate")
        .agg(F.count(F.when(kept, 1)).alias("n_kept"))
        .select("source", "n_docs", "keep_rate", "n_kept")
    )


_KCENTER_K = 8
_KC_DIM = 64

_KC_SQDIST = (
    "round(list_reduce(list_transform(range(1, {dim} + 1), i ->"
    " round(pow({a}[i] - {b}[i], 2), 6)), (x, y) -> x + y), 6)"
)


def _kcenter_oracle() -> str:
    """Staged-CTE mirror of the greedy loop: stage k refines the
    running min-distance with the k-th pick and selects the argmax."""
    dim = _KC_DIM
    parts = [
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings),",
        "n AS (SELECT vec_id, v,"
        " round(list_reduce(list_transform(v, x -> round(x * x, 6)),"
        " (a, b) -> a + b), 6) AS norm FROM e),",
        "s1 AS (SELECT vec_id, v, CAST(NULL AS DOUBLE) AS radius"
        " FROM n ORDER BY norm DESC, vec_id LIMIT 1),",
        "d1 AS (SELECT n.vec_id, n.v, "
        + _KC_SQDIST.format(dim=dim, a="n.v", b="s1.v")
        + " AS mind FROM n, s1 WHERE n.vec_id <> s1.vec_id),",
    ]
    for k in range(2, _KCENTER_K + 1):
        parts.append(
            f"s{k} AS (SELECT vec_id, v, mind AS radius FROM d{k-1}"
            f" ORDER BY mind DESC, vec_id LIMIT 1),"
        )
        if k < _KCENTER_K:
            parts.append(
                f"d{k} AS (SELECT d.vec_id, d.v, least(d.mind, "
                + _KC_SQDIST.format(dim=dim, a="d.v", b=f"s{k}.v")
                + f") AS mind FROM d{k-1} d, s{k}"
                f" WHERE d.vec_id <> s{k}.vec_id),"
            )
    sel = " UNION ALL ".join(
        f"SELECT {k} AS sel_round, vec_id, radius FROM s{k}"
        for k in range(1, _KCENTER_K + 1)
    )
    return "\n".join(parts)[:-1] + "\n" + sel


@query("sample_coreset_kcenter", oracle=_kcenter_oracle())
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal,
    Gonzalez 1985; the active-learning/data-selection coreset of
    Sener & Savarese 2018): seed with the max-norm vector, then
    repeatedly pick the point farthest (squared L2) from everything
    selected so far — 8 picks whose running min-distance IS the
    2-approximation coverage radius, emitted per pick.

    Spark shape: the canonical k-bounded driver loop (BPE learn-merge
    precedent): each round is ONE distributed job — refine the running
    min-distance against the latest pick shipped as plan literals
    (map-only; cf. emb_whitening), take the argmax via
    TakeOrderedAndProject, collect exactly ONE row. k jobs total,
    never a pairwise stage, state on the driver is k vectors. Squared
    distances round per-term to 6dp and fold in index order, ties
    break on vec_id, so every pick is cross-engine deterministic; the
    oracle replays the same greedy as staged CTEs."""
    e = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    def sqdist_to(vec: list) -> "F.Column":
        # lit_array: one py4j call / one Literal node per greedy pick
        # instead of 64 (same values, same fold order).
        lit = lit_array([float(x) for x in vec])
        terms = F.zip_with(
            "v", lit, lambda a, b: F.round(F.pow(a - b, 2), 6)
        )
        return F.round(
            F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x), 6
        )

    seed_row = (
        e.select("vec_id", "v", sqdist_to([0.0] * _KC_DIM).alias("norm"))
        .orderBy(F.col("norm").desc(), "vec_id")
        .limit(1)
        .collect()
    )
    out_rows = []
    if seed_row:
        sel = seed_row[0]
        out_rows.append((1, sel["vec_id"], None))
        cand = e.where(F.col("vec_id") != sel["vec_id"]).select(
            "vec_id", "v", sqdist_to(sel["v"]).alias("mind")
        )
        for k in range(2, _KCENTER_K + 1):
            pick = (
                cand.orderBy(F.col("mind").desc(), "vec_id")
                .limit(1)
                .collect()
            )
            if not pick:
                break
            sel = pick[0]
            out_rows.append((k, sel["vec_id"], sel["mind"]))
            if k < _KCENTER_K:
                cand = cand.where(
                    F.col("vec_id") != sel["vec_id"]
                ).select(
                    "vec_id",
                    "v",
                    F.least(
                        "mind", sqdist_to(sel["v"])
                    ).alias("mind"),
                )
    ddl = "sel_round int, vec_id bigint, radius double"
    return (
        values_df(spark, out_rows, ddl)
        if out_rows
        else spark.createDataFrame([], ddl)
    )


@query(
    "split_group_holdout",
    oracle="""
    WITH assigned AS (
        SELECT user_id, event_id,
               CASE
                   WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)
                        || ':grp'), 1, 8))::BIGINT % 10 < 8
                       THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)
                        || ':grp'), 1, 8))::BIGINT % 10 < 9
                       THEN 'val'
                   ELSE 'test'
               END AS split
        FROM events
    )
    SELECT split,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM assigned
    GROUP BY split
    """,
)
def split_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level holdout split (80/10/10 by USER, not by row): every
    event of a user lands in the same split, the leakage-safe protocol
    for behavioral data — a row-level split (split_train_val_test's
    shape) would put one user's history on both sides of the
    train/test boundary and leak identity features. Assignment is a
    salted md5 of the group key, so it is stable across runs, corpus
    growth, and engines (the DuckDB oracle reproduces it bit-for-bit).

    Scale shape: the assignment is map-only (hash of the key, no
    lookup table, no shuffle by user); only the report aggregates.
    The no-straddle invariant — each user appears in exactly one
    split — is pinned in tests/test_semantics.py."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"), F.lit(":grp")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, "train")
        .when(bucket < 9, "val")
        .otherwise("test")
    )
    return (
        spark.table("events")
        .select("user_id", "event_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH sized AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    cap_t AS (SELECT MIN(n) AS cap FROM sized),
    ranked AS (
        SELECT d.doc_id, d.lang,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':bal'),
                            d.doc_id) AS rn
        FROM documents d
    )
    SELECT r.lang,
           COUNT(*) AS n_kept,
           MIN(c.cap) AS class_cap,
           CAST(SUM(CASE WHEN r.doc_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_even_ids
    FROM ranked r CROSS JOIN cap_t c
    WHERE r.rn <= c.cap
    GROUP BY r.lang
    ORDER BY r.lang
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: cap every language class at the
    smallest class's size, picking members by salted-hash rank
    (deterministic, uniform within class) — the rebalancing step
    before training a classifier on skewed data (and the language-
    rebalancing move multilingual corpus builders apply). Emits the
    per-class audit (kept counts all equal to the cap) plus an id-
    parity checksum so the oracle verifies WHICH docs were kept, not
    just how many.

    Scale shape: class sizes are one aggregation; the cap is a 1-row
    broadcast; the per-class rank is a window on the class key whose
    cut happens partition-locally (rank-limit pushdown) — nothing
    beyond the class partitioning is shuffled. Hash ranking means no
    global sort and no RNG: the same corpus always yields the same
    sample, on any cluster."""
    d = spark.table("documents")
    sized = d.groupBy("lang").agg(F.count("*").alias("n"))
    cap_t = sized.agg(F.min("n").alias("cap"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":bal")).cast(
                "binary"
            )
        ),
        "doc_id",
    )
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).alias("rn")
    )
    kept = ranked.join(F.broadcast(cap_t)).where(
        F.col("rn") <= F.col("cap")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("cap").alias("class_cap"),
            F.sum(
                F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_even_ids"),
        )
        .orderBy("lang")
    )


_NEYMAN_BUDGET = 1000


@query(
    "sample_stratified_neyman",
    oracle=f"""
    WITH strata AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pop,
               sqrt(GREATEST(
                   (CAST(SUM(CAST(value * value AS DECIMAL(38,6)))
                         AS DOUBLE)
                    - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                      * CAST(SUM(CAST(value AS DECIMAL(28,6)))
                             AS DOUBLE) / COUNT(*))
                   / COUNT(*), 0.0)) AS sigma
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    ),
    weighted AS (
        SELECT event_type, n_pop, sigma,
               CAST(n_pop * sigma AS DECIMAL(38,6)) AS w,
               CAST(n_pop AS DECIMAL(38,6)) AS pw
        FROM strata
    ),
    alloc AS (
        SELECT event_type, n_pop, sigma,
               {_NEYMAN_BUDGET} * CAST(w AS DOUBLE)
                   / CAST((SELECT SUM(w) FROM weighted) AS DOUBLE)
                   AS exact_ney,
               {_NEYMAN_BUDGET} * CAST(pw AS DOUBLE)
                   / CAST((SELECT SUM(pw) FROM weighted) AS DOUBLE)
                   AS exact_prop
        FROM weighted
    ),
    floored AS (
        SELECT *,
               CAST(FLOOR(exact_ney) AS BIGINT) AS fl_n,
               exact_ney - FLOOR(exact_ney) AS rem_n,
               CAST(FLOOR(exact_prop) AS BIGINT) AS fl_p,
               exact_prop - FLOOR(exact_prop) AS rem_p
        FROM alloc
    )
    SELECT event_type, n_pop,
           {sql_jround("sigma", 4)} AS sigma_value,
           CAST(fl_n + CASE WHEN ROW_NUMBER() OVER
                    (ORDER BY rem_n DESC, event_type)
                    <= {_NEYMAN_BUDGET}
                        - (SELECT SUM(fl_n) FROM floored)
                THEN 1 ELSE 0 END AS BIGINT) AS alloc_neyman,
           CAST(fl_p + CASE WHEN ROW_NUMBER() OVER
                    (ORDER BY rem_p DESC, event_type)
                    <= {_NEYMAN_BUDGET}
                        - (SELECT SUM(fl_p) FROM floored)
                THEN 1 ELSE 0 END AS BIGINT) AS alloc_proportional
    FROM floored
    ORDER BY event_type
    """,
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) stratified-sampling allocation for a
    1000-row budget: n_h proportional to N_h * sigma_h — strata with
    more internal variance get more of the budget, minimizing the
    estimator's variance at fixed cost (vs sample_stratified's
    proportional allocation, also emitted for comparison). Integer
    allocations via the largest-remainder method with a deterministic
    stratum-name tiebreak, so each column sums exactly to the budget.

    Scale shape: one map-side-combinable pass computes every
    stratum's decimal-exact sufficient statistics; everything after
    runs on the 3-row stratum table (windows, scalar totals). The
    N*sigma weights are decimal-cast before the cross-stratum sum so
    the shares are order-independent."""
    e = spark.table("events").where(F.col("value").isNotNull())
    strata = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pop"),
        F.sqrt(
            F.greatest(
                (
                    F.sum(
                        (F.col("value") * F.col("value")).cast(
                            "decimal(38,6)"
                        )
                    ).cast("double")
                    - F.sum(F.col("value").cast("decimal(28,6)"))
                    .cast("double")
                    * F.sum(F.col("value").cast("decimal(28,6)"))
                    .cast("double")
                    / F.count("*")
                )
                / F.count("*"),
                F.lit(0.0),
            )
        ).alias("sigma"),
    )
    weighted = strata.select(
        "*",
        (F.col("n_pop") * F.col("sigma")).cast("decimal(38,6)").alias("w"),
        F.col("n_pop").cast("decimal(38,6)").alias("pw"),
    )
    tot = weighted.agg(
        F.sum("w").cast("double").alias("tw"),
        F.sum("pw").cast("double").alias("tp"),
    )
    alloc = weighted.join(F.broadcast(tot)).select(
        "event_type",
        "n_pop",
        "sigma",
        (
            _NEYMAN_BUDGET * F.col("w").cast("double") / F.col("tw")
        ).alias("exact_ney"),
        (
            _NEYMAN_BUDGET * F.col("pw").cast("double") / F.col("tp")
        ).alias("exact_prop"),
    )
    floored = alloc.select(
        "*",
        F.floor("exact_ney").cast("bigint").alias("fl_n"),
        (F.col("exact_ney") - F.floor("exact_ney")).alias("rem_n"),
        F.floor("exact_prop").cast("bigint").alias("fl_p"),
        (F.col("exact_prop") - F.floor("exact_prop")).alias("rem_p"),
    )
    from powersql_spark.catalog import track_persist

    floored = track_persist(floored)
    deficits = floored.agg(
        (_NEYMAN_BUDGET - F.sum("fl_n")).alias("def_n"),
        (_NEYMAN_BUDGET - F.sum("fl_p")).alias("def_p"),
    )
    wn = Window.orderBy(F.desc("rem_n"), "event_type")
    wp = Window.orderBy(F.desc("rem_p"), "event_type")
    return (
        floored.join(F.broadcast(deficits))
        .select(
            "event_type",
            "n_pop",
            F.round("sigma", 4).alias("sigma_value"),
            (
                F.col("fl_n")
                + F.when(
                    F.row_number().over(wn) <= F.col("def_n"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_neyman"),
            (
                F.col("fl_p")
                + F.when(
                    F.row_number().over(wp) <= F.col("def_p"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_proportional"),
        )
        .orderBy("event_type")
    )


@query(
    "curation_source_report",
    oracle=r"""
    WITH base AS (
        SELECT source, doc_id, lang, n_chars,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                   AS fingerprint
        FROM documents
    ),
    per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT fingerprint) AS BIGINT)
                   AS n_distinct,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM base GROUP BY source
    ),
    lang_mix AS (
        SELECT source,
               round(CAST(SUM(CAST(
                   -(cnt / CAST(tot AS DOUBLE))
                       * ln(cnt / CAST(tot AS DOUBLE))
                   AS DECIMAL(18,12))) AS DOUBLE), 4) AS lang_entropy
        FROM (
            SELECT source, lang, COUNT(*) AS cnt,
                   SUM(COUNT(*)) OVER (PARTITION BY source) AS tot
            FROM base GROUP BY source, lang
        )
        GROUP BY source
    )
    SELECT p.source, p.n_docs, p.total_tokens, p.total_chars,
           p.n_langs, l.lang_entropy,
           CAST(ROUND(1.0 - p.n_distinct / CAST(p.n_docs AS DOUBLE), 4)
                AS DOUBLE) AS dup_rate
    FROM per_source p JOIN lang_mix l USING (source)
    ORDER BY p.source
    """,
)
def curation_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard in one query: document and token
    volumes, exact-duplicate rate (1 - distinct fingerprints / docs),
    language count and language-mix entropy — the table a data-mix
    owner reads before setting per-source sampling weights
    (curation_mix_temperature / curation_domain_cap consume exactly
    these volumes and quality signals).

    Scale shape: ONE corpus pass derives tokens + fingerprint
    map-side; the per-source rollup carries a distinct-aggregate on
    the 16-byte fingerprint (exact-dedup cost); the language-entropy
    branch collapses to (source, lang) cells first — all shuffles are
    key-bounded, and entropy terms are decimal-summed for order
    independence."""
    base = spark.table("documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.md5(
            F.lower(
                F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
            )
        ).alias("fingerprint"),
    )
    per_source = base.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("fingerprint").cast("bigint").alias("n_distinct"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    cells = base.groupBy("source", "lang").agg(
        F.count("*").alias("cnt")
    )
    p = F.col("cnt") / F.col("tot").cast("double")
    lang_mix = (
        cells.withColumn(
            "tot",
            F.sum("cnt").over(Window.partitionBy("source")),
        )
        .groupBy("source")
        .agg(
            F.round(
                F.sum((-p * F.log(p)).cast("decimal(18,12)")).cast(
                    "double"
                ),
                4,
            ).alias("lang_entropy")
        )
    )
    return (
        per_source.join(lang_mix, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            "n_langs",
            "lang_entropy",
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_docs").cast("double"),
                4,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "sample_seed_independence",
    oracle=f"""
    WITH flags AS (
        SELECT substr(md5(CAST(doc_id AS VARCHAR) || ':seedA'), 1, 2)
                   < '80' AS in_a,
               substr(md5(CAST(doc_id AS VARCHAR) || ':seedB'), 1, 2)
                   < '80' AS in_b
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN in_a AND in_b THEN 1 END) AS BIGINT)
               AS n_both,
           CAST(COUNT(CASE WHEN in_a AND NOT in_b THEN 1 END)
                AS BIGINT) AS n_only_a,
           CAST(COUNT(CASE WHEN NOT in_a AND in_b THEN 1 END)
                AS BIGINT) AS n_only_b,
           CAST(COUNT(CASE WHEN NOT in_a AND NOT in_b THEN 1 END)
                AS BIGINT) AS n_neither,
           {sql_jround(
               "COUNT(CASE WHEN in_a AND in_b THEN 1 END)"
               " / CAST(COUNT(*) AS DOUBLE)", 4)} AS joint_rate,
           {sql_jround(
               "(COUNT(CASE WHEN in_a THEN 1 END)"
               " / CAST(COUNT(*) AS DOUBLE))"
               " * (COUNT(CASE WHEN in_b THEN 1 END)"
               " / CAST(COUNT(*) AS DOUBLE))", 4)} AS expected_joint,
           abs(COUNT(CASE WHEN in_a AND in_b THEN 1 END)
                   / CAST(COUNT(*) AS DOUBLE)
               - (COUNT(CASE WHEN in_a THEN 1 END)
                      / CAST(COUNT(*) AS DOUBLE))
                 * (COUNT(CASE WHEN in_b THEN 1 END)
                      / CAST(COUNT(*) AS DOUBLE))) < 0.05
               AS independent_ok
    FROM flags
    """,
)
def sample_seed_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-independence audit for hash sampling: two ~50% samples
    drawn with DIFFERENT salts must overlap at ~p*q, not p (the
    correlated-salt failure this module's header warns about: with a
    shared hash, a downsample and a split reuse the same coin and
    compose wrong). Emits the 2x2 membership table, observed vs
    expected joint rate, and an in-plan independence gate the oracle
    replays.

    Scale shape: pure map-side hashing folded into ONE conditional
    aggregate — the audit costs a single scan, no shuffle beyond the
    one-row rollup."""
    a = _bucket(F.col("doc_id"), ":seedA") < "80"
    b = _bucket(F.col("doc_id"), ":seedB") < "80"
    flags = spark.table("documents").select(
        a.alias("in_a"), b.alias("in_b")
    )
    counts = flags.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("in_a"), 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("in_b"), 1)).cast("bigint").alias("n_b"),
        F.count(F.when(F.col("in_a") & F.col("in_b"), 1))
        .cast("bigint")
        .alias("n_both"),
        F.count(F.when(F.col("in_a") & ~F.col("in_b"), 1))
        .cast("bigint")
        .alias("n_only_a"),
        F.count(F.when(~F.col("in_a") & F.col("in_b"), 1))
        .cast("bigint")
        .alias("n_only_b"),
        F.count(F.when(~F.col("in_a") & ~F.col("in_b"), 1))
        .cast("bigint")
        .alias("n_neither"),
    ).where(F.col("n_docs") > 0)
    nd = F.col("n_docs").cast("double")
    joint = F.col("n_both") / nd
    expected = (F.col("n_a") / nd) * (F.col("n_b") / nd)
    return counts.select(
        "n_docs",
        "n_both",
        "n_only_a",
        "n_only_b",
        "n_neither",
        F.round(joint, 4).alias("joint_rate"),
        F.round(expected, 4).alias("expected_joint"),
        (F.abs(joint - expected) < 0.05).alias("independent_ok"),
    )


@query(
    "split_kfold",
    oracle=f"""
    WITH assigned AS (
        SELECT lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || ':kfold'), 1, 8))::BIGINT % 5 AS INTEGER)
                   AS fold
        FROM documents
    ),
    cells AS (
        SELECT fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_en
        FROM assigned GROUP BY fold
    )
    SELECT fold, n_docs, n_en,
           {sql_jround("n_en * 1e0 / n_docs", 6)} AS en_frac,
           {sql_jround("n_docs * 1e0 / SUM(n_docs) OVER ()", 6)}
               AS share
    FROM cells
    ORDER BY fold
    """,
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment, reported as a
    per-fold balance table (row count, English count, class fraction,
    corpus share). fold = md5(doc_id || salt)[:8] % 5 — the same
    salted-hash protocol as split_train_val_test, so folds are stable
    across runs, corpus growth, and engines, and a k-fold sweep is
    five WHERE clauses over one free column rather than five shuffled
    materializations.

    Scale shape: assignment is map-only hashing inside whole-stage
    codegen; the report collapses to exactly 5 rows with map-side
    partial counts, and the share window runs on that constant
    5-row frame."""
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":kfold")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 5
    ).cast("int")
    cells = (
        spark.table("documents")
        .select(fold.alias("fold"), "lang")
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("bigint")
            .alias("n_en"),
        )
    )
    w = Window.partitionBy()
    return cells.select(
        "fold",
        "n_docs",
        "n_en",
        F.round(F.col("n_en") * 1e0 / F.col("n_docs"), 6).alias(
            "en_frac"
        ),
        F.round(
            F.col("n_docs") * 1e0 / F.sum("n_docs").over(w), 6
        ).alias("share"),
    ).orderBy("fold")


@query(
    "curation_rejection_sampling",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               least(1.0, greatest(0.0,
                   CAST(len(list_filter(t, x -> x IN
                        ('the','a','and','of','to','in','is','it')))
                        AS DOUBLE) / len(t)
                   + CAST(len(t) AS DOUBLE) / 2000.0)) AS p_keep
        FROM (SELECT doc_id, source,
                     string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
    ),
    drawn AS (
        SELECT source, p_keep,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':rej'),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN u < p_keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           {sql_jround(
               "SUM(CASE WHEN u < p_keep THEN 1 ELSE 0 END)"
               " * 1e0 / COUNT(*)", 6)} AS keep_rate,
           {sql_jround(
               "CAST(SUM(CAST(round(p_keep, 8) AS DECIMAL(38,8)))"
               "      AS DOUBLE) / COUNT(*)", 6)} AS mean_p_keep
    FROM drawn
    GROUP BY source
    ORDER BY source
    """,
)
def curation_rejection_sampling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Soft quality filtering by rejection sampling: each document is
    kept with probability equal to its clipped quality score (the
    FineWeb-style alternative to a hard threshold — borderline
    documents survive in proportion to their quality instead of
    dying at a cliff). The coin flip is a salted md5 uniform
    u = hash[:8]/2^32, so the decision is deterministic, replayable
    across runs/engines, and independent of the score (a different
    salt than every other sampling key). Reported per source: corpus
    size, kept count, realized keep rate, and the mean acceptance
    probability (their agreement is the sampler's sanity check,
    asserted in tests).

    Scale shape: scoring and the coin flip are pure map-side codegen
    on the scan; the only shuffle is the per-source report collapse
    with map-side partials. Changing the quality model re-flips
    nothing (u is score-independent), so an incremental re-curation
    only moves documents whose p crossed their fixed u."""
    from powersql_spark.pipeline.evalmetrics import _scored

    scored = _scored(spark)
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":rej")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    drawn = scored.select(
        "source", p.alias("p_keep"), u.alias("u")
    )
    kept = F.sum(
        F.when(F.col("u") < F.col("p_keep"), 1).otherwise(0)
    )
    return (
        drawn.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            kept.cast("bigint").alias("n_kept"),
            F.round(kept * 1e0 / F.count("*"), 6).alias("keep_rate"),
            F.round(
                F.sum(
                    F.round(F.col("p_keep"), 8).cast("decimal(38,8)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_p_keep"),
        )
        .orderBy("source")
    )


_GATE_THRESHOLD = 0.1  # fixed operating point of the clipped score


@query(
    "curation_gate_parity_audit",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               least(1.0, greatest(0.0,
                   CAST(len(list_filter(t, x -> x IN
                        ('the','a','and','of','to','in','is','it')))
                        AS DOUBLE) / len(t)
                   + CAST(len(t) AS DOUBLE) / 2000.0)) AS p
        FROM (SELECT source,
                     string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
    ),
    per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN p >= {_GATE_THRESHOLD}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM scored GROUP BY source
    )
    SELECT source, n_docs, n_kept,
           {sql_jround("n_kept * 1e0 / n_docs", 6)} AS keep_rate,
           {sql_jround(
               "(n_kept * 1e0 / n_docs)"
               " / (MAX(n_kept * 1e0 / n_docs) OVER ())", 6)}
               AS parity_ratio,
           (n_kept * 1e0 / n_docs)
               / (MAX(n_kept * 1e0 / n_docs) OVER ()) >= 0.8
               AS passes_four_fifths
    FROM per_src
    ORDER BY source
    """,
)
def curation_gate_parity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Disparate-impact audit of the quality gate: per-source keep rate
    at a fixed operating point of the clipped score, each source's
    selection ratio against the most-kept source, and the four-fifths
    rule verdict (selection ratio >= 0.8, the classical adverse-impact
    screen applied to data curation) — the governance readout that
    says whether a quality filter silently erases a source before the
    mix is trained on. Pairs with curation_source_report (what's in
    the corpus) and eval_threshold_sweep (what the cut costs
    globally).

    Scale shape: scoring and gating are map-side codegen; the only
    corpus shuffle is the per-source collapse, and the parity window
    runs on the source-count-sized frame."""
    from powersql_spark.pipeline.evalmetrics import _scored

    scored = _scored(spark)
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("s")))
    per_src = (
        scored.select("source", p.alias("p"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("p") >= _GATE_THRESHOLD, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept"),
        )
    )
    rate = F.col("n_kept") * 1e0 / F.col("n_docs")
    w = Window.partitionBy()
    ratio = rate / F.max(rate).over(w)
    return per_src.select(
        "source",
        "n_docs",
        "n_kept",
        F.round(rate, 6).alias("keep_rate"),
        F.round(ratio, 6).alias("parity_ratio"),
        (ratio >= 0.8).alias("passes_four_fifths"),
    ).orderBy("source")


_SPLIT_TRAIN_END = "2024-01-21"  # train < this day
_SPLIT_VAL_END = "2024-01-26"    # val < this day; test = rest


@query(
    "split_time_based",
    oracle=f"""
    WITH tagged AS (
        SELECT user_id, ts,
               CASE WHEN ts < TIMESTAMP '{_SPLIT_TRAIN_END}'
                        THEN 'train'
                    WHEN ts < TIMESTAMP '{_SPLIT_VAL_END}'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM events
    ),
    train_users AS (
        SELECT DISTINCT user_id FROM tagged WHERE split = 'train'
    ),
    per AS (
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT t.user_id) AS BIGINT) AS n_users,
               CAST(MIN(CAST(ts AS DATE)) AS DATE) AS first_day,
               CAST(MAX(CAST(ts AS DATE)) AS DATE) AS last_day,
               CAST(COUNT(DISTINCT CASE WHEN tu.user_id IS NOT NULL
                    THEN t.user_id END) AS BIGINT)
                   AS users_seen_in_train
        FROM tagged t
        LEFT JOIN train_users tu ON tu.user_id = t.user_id
        GROUP BY split
    )
    SELECT split, n_events, n_users, first_day, last_day,
           users_seen_in_train,
           round(n_events / CAST(SUM(n_events) OVER () AS DOUBLE), 4)
               AS event_share
    FROM per
    ORDER BY split
    """,
)
def split_time_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/val/test split of the event stream at fixed
    date cutoffs (the leakage-safe split for anything
    time-structured: random splits let the model peek at the
    future), with the audit columns that make it trustworthy —
    per-split event/user counts, date ranges that must not overlap,
    and users_seen_in_train per split (the returning-user fraction:
    expected overlap for user-level features, but a warm-start bias
    to KNOW about). Completes the split family (random:
    train_val_test; grouped: group_holdout; k-fold: kfold; this:
    temporal).

    Scale shape: the split tag is a map-side CASE on the scan; the
    train-user set joins back broadcast; one aggregation to three
    rows. Cutoffs are literals, so the filter pushes down when a
    consumer selects one split."""
    e = spark.table("events")
    split = (
        F.when(
            F.col("ts") < F.lit(_SPLIT_TRAIN_END).cast("timestamp"),
            "train",
        )
        .when(
            F.col("ts") < F.lit(_SPLIT_VAL_END).cast("timestamp"),
            "val",
        )
        .otherwise("test")
    )
    tagged = e.select("user_id", "ts", split.alias("split"))
    train_users = (
        tagged.where(F.col("split") == "train")
        .select("user_id")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    per = (
        tagged.join(F.broadcast(train_users), "user_id", "left")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias(
                "n_users"
            ),
            F.min(F.col("ts").cast("date")).alias("first_day"),
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count_distinct(
                F.when(F.col("in_train").isNotNull(), F.col("user_id"))
            )
            .cast("bigint")
            .alias("users_seen_in_train"),
        )
    )
    wall = Window.partitionBy()
    return per.select(
        "split",
        "n_events",
        "n_users",
        "first_day",
        "last_day",
        "users_seen_in_train",
        F.round(
            F.col("n_events")
            / F.sum("n_events").over(wall).cast("double"),
            4,
        ).alias("event_share"),
    ).orderBy("split")
