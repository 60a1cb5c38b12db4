"""Frequency-sketch operators (driver north-star extension; the
reference has no analog — its surface ends at SQL orchestration,
src/execute.rs:101).

``text_ngram_topk`` counts the vocabulary exactly — correct while the
(gram, partial count) state fits the shuffle. Count-min sketch is the
scale path past that point: d hash rows × w buckets of counters,
O(d·w) memory regardless of vocabulary size, answering point
frequency queries with one-sided error (estimate ≥ truth, over by at
most ~e/w·N with high probability).

The whole sketch is plain relational algebra — no UDFs, no driver
state: build = explode d (seed, bucket) pairs per gram and aggregate;
query = broadcast-join the (d·w)-row sketch and take MIN over seeds.
Hashes are md5-derived on BOTH engines (Spark ``conv(substr(md5,1,8),
16,10)`` ≡ DuckDB ``('0x'||substr(md5,1,8))::BIGINT``), so the DuckDB
oracle reproduces the estimates bit-for-bit — the sketch itself is
hash-verified, not just its row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.catalog import track_persist
from powersql_spark.registry import query

_D = 4  # hash rows (seeds)
_W = 256  # buckets per row


def _bucket(gram: Column, seed: int) -> Column:
    """Bucket index for one hash row: top 32 bits of md5(gram#seed),
    mod the row width. Identical arithmetic exists in the oracle."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(gram, F.lit(f"#{seed}")).cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _W
    )


def _bigrams() -> Column:
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )


@query(
    "sketch_countmin_bigrams",
    oracle=rf"""
    WITH toks AS (
        SELECT string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(t)),
                   i -> list_extract(t, i) || ' ' || list_extract(t, i + 1)))
            AS gram
        FROM toks WHERE len(t) >= 2
    ),
    seeds AS (SELECT unnest(range(0, {_D})) AS s),
    sketch AS (
        SELECT s,
               ('0x' || substr(md5(gram || '#' || s), 1, 8))::BIGINT % {_W}
                   AS b,
               COUNT(*) AS c
        FROM bg CROSS JOIN seeds
        GROUP BY s, b
    ),
    exact AS (
        SELECT gram, COUNT(*) AS n_exact
        FROM bg GROUP BY gram
        ORDER BY n_exact DESC, gram LIMIT 30
    )
    SELECT e.gram, e.n_exact,
           CAST(MIN(sk.c) AS BIGINT) AS n_est,
           CAST(MIN(sk.c) - e.n_exact AS BIGINT) AS overestimate,
           MIN(sk.c) >= e.n_exact AS ok_lower
    FROM exact e
    CROSS JOIN seeds js
    JOIN sketch sk
      ON sk.s = js.s
     AND sk.b = ('0x' || substr(md5(e.gram || '#' || js.s), 1, 8))::BIGINT
                % {_W}
    GROUP BY e.gram, e.n_exact
    """,
)
def sketch_countmin_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus bigram stream, evaluated against
    the exact top-30: build the d×w counter table, estimate each heavy
    hitter as min over hash rows, and emit estimate + one-sided-error
    verdict. The oracle recomputes the identical sketch, so the
    estimates themselves are hash-compared.

    Scale shape: the build explodes each gram into d (seed, bucket)
    pairs but partial-aggregates BEFORE the exchange — each partition
    ships at most d·w counters no matter how many grams it saw, and the
    finished sketch is d·w rows total. The probe side broadcasts the
    sketch (1 KB-scale) against the 30 candidates. Exact counting dies
    when the vocabulary outgrows the shuffle; this plan's state is
    constant."""
    d = spark.table("documents")
    n = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    # Both consumers (sketch build + exact evaluation side) read the
    # exploded gram stream; persist so the explode runs once — same
    # idiom as the MinHash shingle stage. Production CMS has no exact
    # side and would skip this.
    bg = track_persist(
        d.where(n >= 2).select(F.explode(_bigrams()).alias("gram"))
    )

    pairs = bg.select(
        "gram",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("long").alias("s"),
                        _bucket(F.col("gram"), s).alias("b"),
                    )
                    for s in range(_D)
                ]
            )
        ).alias("sb"),
    ).select(F.col("sb.s").alias("s"), F.col("sb.b").alias("b"))
    sketch = pairs.groupBy("s", "b").agg(F.count("*").alias("c"))

    exact = (
        bg.groupBy("gram")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "gram")
        .limit(30)
    )
    probes = exact.select(
        "gram",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("long").alias("s"),
                        _bucket(F.col("gram"), s).alias("b"),
                    )
                    for s in range(_D)
                ]
            )
        ).alias("sb"),
    ).select("gram", "n_exact", F.col("sb.s").alias("s"), F.col("sb.b").alias("b"))

    est = (
        probes.join(F.broadcast(sketch), ["s", "b"])
        .groupBy("gram", "n_exact")
        .agg(F.min("c").cast("bigint").alias("n_est"))
    )
    return est.select(
        "gram",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).cast("bigint").alias(
            "overestimate"
        ),
        (F.col("n_est") >= F.col("n_exact")).alias("ok_lower"),
    )


@query(
    "sketch_hll_by_source",
    # Sketch binaries are engine-specific, so the driver hash-verifies the
    # ACCURACY GATE (the agg_approx_* pattern): the merged-estimate-vs-exact
    # tolerance boolean, which the oracle asserts holds for every language.
    oracle="""
    SELECT lang,
           COUNT(DISTINCT source) AS n_partials,
           true AS merged_within_5pct
    FROM documents GROUP BY lang
    """,
)
def sketch_hll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch rollup (Apache DataSketches via Spark's
    hll_sketch_agg / hll_union_agg): build one sketch per (lang, source)
    partial, then MERGE the binary sketches per lang — never recount the
    raw rows. This is the pre-aggregated-sketch-table pattern that makes
    distinct-count rollups O(partials) instead of O(rows) at 100 TB:
    partials are built once map-side next to ingest, and any rollup
    (per lang, per day, global) is a union of kilobyte sketches.

    The exact count-distinct alongside exists only to feed the 5%
    tolerance gate; production keeps only the sketch column."""
    d = spark.table("documents")
    partials = d.groupBy("lang", "source").agg(
        F.hll_sketch_agg("doc_id").alias("sk")
    )
    merged = partials.groupBy("lang").agg(
        F.count("*").alias("n_partials"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = d.groupBy("lang").agg(F.count_distinct("doc_id").alias("ex"))
    return merged.join(exact, "lang").select(
        "lang",
        "n_partials",
        (
            F.abs(F.col("est") - F.col("ex")) <= 0.05 * F.col("ex")
        ).alias("merged_within_5pct"),
    )
