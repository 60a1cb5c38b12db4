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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.catalog import track_persist
from powersql_spark.operators.common import lit_array, sql_jround
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

    Scale shape: the gram stream partial-aggregates map-side into
    per-gram counts (the exact side's inherent cost), then the sketch
    build explodes each DISTINCT gram into d (seed, bucket) pairs and
    partial-aggregates again BEFORE the exchange — each partition
    ships at most d·w counters, and the finished sketch is d·w rows
    total. The probe side broadcasts the sketch (1 KB-scale) against
    the 30 candidates. Exact counting dies when the vocabulary
    outgrows the shuffle; pure production CMS drops the exact side and
    hashes the stream directly, keeping the same constant state."""
    d = spark.table("documents")
    n = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bg = d.where(n >= 2).select(F.explode(_bigrams()).alias("gram"))
    # Collapse the gram stream to DISTINCT-gram counts FIRST and build
    # BOTH consumers from that table. The exact evaluation side needs
    # this aggregation anyway, and riding it means the d md5 bucket
    # hashes are computed once per VOCABULARY entry instead of once
    # per corpus OCCURRENCE (profiled: the two per-occurrence hashing
    # stages were 12.9 + 10.5 s of executor time at sf0.1 — hashing
    # dominated, guide §1.2 "don't compute things twice"). The sketch
    # cell values are unchanged: summing per-gram counts into (s, b)
    # cells is the same integer as counting occurrences per cell.
    # Production CMS has no exact side and hashes the stream directly
    # (one pass, partial-aggregated map-side, constant d*w state).
    counts = track_persist(
        bg.groupBy("gram").agg(F.count("*").alias("n_exact"))
    )

    pairs = counts.select(
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
    ).select(F.col("sb.s").alias("s"), F.col("sb.b").alias("b"), "n_exact")
    sketch = pairs.groupBy("s", "b").agg(F.sum("n_exact").alias("c"))

    exact = counts.orderBy(F.desc("n_exact"), "gram").limit(30)
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


_BLOOM_M = 16384  # filter bits
_BLOOM_K = 5  # hash functions
_BLOOM_WORD = 32  # bits per word => BIGINT masks stay positive

_BLOOM_POS_SQL = (
    "(('0x' || substr(md5({key} || '#b{seed}'), 1, 8))"
    f"::BIGINT % {_BLOOM_M} + {_BLOOM_M}) % {_BLOOM_M}"
)


def _bloom_pos(key: Column, seed: int) -> Column:
    """Bit position for one Bloom hash: top 32 bits of
    md5(key#b<seed>) mod m. Identical arithmetic in the oracle."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(key, F.lit(f"#b{seed}")).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _BLOOM_M
    )


@query(
    "sketch_bloom_prefilter",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderdate >= DATE '1997-01-01'
          AND o_orderdate < DATE '1998-01-01'
    ),
    bits AS (
        SELECT {_BLOOM_POS_SQL.format(key="CAST(members.k AS VARCHAR)",
                                      seed="' || s.seed || '")} AS pos
        FROM members, (SELECT unnest(range({_BLOOM_K})) AS seed) s
    ),
    sketch AS (
        SELECT pos // {_BLOOM_WORD} AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD}
                                                AS INTEGER)) AS word
        FROM bits GROUP BY pos // {_BLOOM_WORD}
    ),
    probe AS (
        SELECT c_custkey, c_nationkey,
               {_BLOOM_POS_SQL.format(key="CAST(c_custkey AS VARCHAR)",
                                      seed="' || s.seed || '")} AS pos
        FROM customer, (SELECT unnest(range({_BLOOM_K})) AS seed) s
    ),
    verdict AS (
        SELECT c_custkey, ANY_VALUE(c_nationkey) AS c_nationkey,
               bool_and(COALESCE(
                   (sketch.word
                    & (CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD}
                                                 AS INTEGER))) <> 0,
                   FALSE)) AS bloom_pos
        FROM probe LEFT JOIN sketch
            ON sketch.word_idx = probe.pos // {_BLOOM_WORD}
        GROUP BY c_custkey
    )
    SELECT v.c_nationkey,
           COUNT(*) AS n_customers,
           COUNT(*) FILTER (v.bloom_pos) AS n_bloom_pos,
           COUNT(*) FILTER (m.k IS NOT NULL) AS n_exact,
           COUNT(*) FILTER (v.bloom_pos AND m.k IS NULL)
               AS n_false_pos
    FROM verdict v LEFT JOIN members m ON m.k = v.c_custkey
    GROUP BY v.c_nationkey
    """,
)
def sketch_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join pruning, the runtime-filter pattern at
    100 TB: build a {_BLOOM_M}-bit / {_BLOOM_K}-hash filter over the
    1997 buyer keys (the small join side), probe every customer
    through it, and report per-nation how the filter would prune an
    exact semi-join — positives, true members, and false positives.
    This is what Spark's AQE injects automatically as
    `bloom_filter_agg`/`might_contain` (runtime filters); built here
    from relational algebra so the mechanism is visible, tunable, and
    oracle-verifiable.

    Scale shape: the build explodes k (word, bit) pairs per member
    key and collapses to a CONSTANT {_BLOOM_M // _BLOOM_WORD}-row
    word table (bit_or partial-aggregates map-side; the exchange
    carries words, not keys); the word table then rides into the probe
    as PLAN LITERALS (the broadcast-variable pattern, cf.
    emb_whitening), so the probe is MAP-ONLY — the corpus-sized stream
    never shuffles on the key, which is the entire point of the
    pattern (prune BEFORE the expensive exchange). md5-derived positions make the DuckDB oracle reproduce
    the filter bit-for-bit: the sketch is hash-verified, not just
    row-counted. The one-sided guarantee (no false negatives:
    n_exact - true positives = 0) is asserted in
    tests/test_semantics.py."""
    o = spark.table("orders")
    # The build-key set feeds the sketch collect AND the evaluation
    # join; persist it (build-side bounded by assumption) so the
    # orders scan runs once.
    members = track_persist(
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = members.select(
        F.explode(
            F.array(
                *[
                    _bloom_pos(F.col("k").cast("string"), i)
                    for i in range(_BLOOM_K)
                ]
            )
        ).alias("pos")
    )
    sketch = (
        bits.groupBy(
            (F.col("pos") / _BLOOM_WORD).cast("long").alias("word_idx")
        )
        .agg(
            F.bit_or(
                # shiftleft() needs a literal shift; 2^bit is exact in
                # a double for bit <= 31 (word width caps it).
                F.pow(F.lit(2.0), (F.col("pos") % _BLOOM_WORD))
                .cast("long")
            ).alias("word")
        )
    )
    # Materialize the CONSTANT-sized word table into plan literals (the
    # broadcast-variable pattern; cf. emb_whitening's matrix literals):
    # the probe side then needs NO join and NO per-key shuffle — each
    # row tests its k bits against the literal array map-side, which is
    # exactly how a runtime filter sits in front of an exchange.
    words = [0] * (_BLOOM_M // _BLOOM_WORD)
    for r in sketch.collect():  # constant rows, not data-sized
        words[int(r["word_idx"])] = int(r["word"])
    # The whole probe predicate as ONE F.expr (one py4j round trip):
    # the original per-seed Column construction cost ~1k py4j calls to
    # build 5 copies of a 512-literal array plus 5 hash-test trees —
    # ~1.9 s of plan build on EVERY bench pass (and identically in the
    # driver's low-core PERF run, since plan build is single-threaded
    # driver work). Here the word table is inlined once as SQL text and
    # referenced once inside a forall lambda over the seed sequence —
    # the identical arithmetic per seed (conv/substr/md5 position, pow
    # mask, element_at word, & test) AND-folded exactly as before
    # (tests are never NULL, so forall == the chained &&).
    warr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    pos_sql = (
        "(cast(conv(substr(md5(cast(concat(cast(c_custkey as string),"
        f"'#b', cast(s as string)) as binary)), 1, 8), 16, 10) as bigint)"
        f" % {_BLOOM_M})"
    )
    bloom_pos = F.expr(
        f"forall(sequence(0, {_BLOOM_K - 1}), s -> "
        f"(element_at({warr_sql}, cast({pos_sql} / {_BLOOM_WORD} as int)"
        f" + 1) & cast(pow(2.0D, {pos_sql} % {_BLOOM_WORD}) as bigint))"
        f" != 0)"
    )
    c = spark.table("customer").select("c_custkey", "c_nationkey")
    verdict = c.select(
        "c_custkey", "c_nationkey", bloom_pos.alias("bloom_pos")
    )
    return (
        verdict.join(
            F.broadcast(members),
            verdict.c_custkey == members.k,
            "left",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.count(F.when(F.col("bloom_pos"), 1)).alias("n_bloom_pos"),
            F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_exact"),
            F.count(
                F.when(F.col("bloom_pos") & F.col("k").isNull(), 1)
            ).alias("n_false_pos"),
        )
    )


_KMV_K = 64  # minima kept per scope


@query(
    "sketch_kmv_distinct",
    # The estimator is a pure function of the k smallest md5-derived
    # hashes, so the oracle replays the ENTIRE sketch — minima,
    # thresholds, and estimates — bit-for-bit (no tolerance gate
    # needed, unlike HLL whose register layout is engine-internal).
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        FROM documents
    ),
    ranked AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM h
    ),
    per AS (
        SELECT source AS scope, MAX(h) AS kth_hash,
               COUNT(*) AS n_kept
        FROM ranked WHERE rn <= {_KMV_K} GROUP BY source
    ),
    gall AS (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM h)
    ),
    gper AS (
        SELECT '__all__' AS scope, MAX(h) AS kth_hash, COUNT(*) AS n_kept
        FROM gall WHERE rn <= {_KMV_K}
    ),
    u AS (SELECT * FROM per UNION ALL SELECT * FROM gper)
    SELECT scope, CAST(n_kept AS BIGINT) AS n_kept, kth_hash,
           CASE WHEN n_kept < {_KMV_K} THEN CAST(n_kept AS DOUBLE)
                ELSE round(({_KMV_K} - 1) * 4294967296.0 / kth_hash, 4)
           END AS est_distinct
    FROM u
    ORDER BY scope
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) distinct sketch: per
    source AND globally, keep the k smallest 32-bit content hashes;
    the kth minimum estimates distinct count as (k-1)/theta with
    theta = kth/2^32. Unlike HLL the sketch state is plain rows, so
    two sketches UNION by merging minima and re-cutting at k — which
    is exactly how the global scope is computed here, proving the
    mergeability a 1000-executor rollup relies on.

    Scale shape: ONE corpus scan; the only data-sized shuffle carries
    distinct (source, 8-byte hash) pairs. The per-scope k-smallest is
    written as a row_number window, which Spark's rank-limit pushdown
    plans as a PARTIAL WindowGroupLimit — a partition-local bounded
    top-k before the exchange, i.e. exactly the classic KMV
    accumulator, so only k rows per scope per partition shuffle
    (asserted in test_plans). The estimate is deterministic (md5 base
    hash), hence hash-verified against the oracle bit-for-bit."""
    d = spark.table("documents")
    h = d.select(
        "source",
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    hp = track_persist(h)

    def _cut(scoped: DataFrame) -> DataFrame:
        w = Window.partitionBy("scope").orderBy("h")
        return (
            scoped.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _KMV_K)
            .groupBy("scope")
            .agg(
                F.count("*").alias("n_kept"),
                F.max("h").alias("kth_hash"),
            )
        )
    per = _cut(hp.select(F.col("source").alias("scope"), "h"))
    # Global scope: union of per-source minima would suffice (KMV
    # mergeability); using the deduplicated hash set directly is the
    # same cut and shares the persisted frame.
    gall = _cut(
        hp.select(F.lit("__all__").alias("scope"), "h").distinct()
    )
    u = per.unionByName(gall)
    est = F.when(
        F.col("n_kept") < _KMV_K, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(_KMV_K - 1)) * F.lit(4294967296.0)
            / F.col("kth_hash"),
            4,
        )
    )
    return u.select(
        "scope", "n_kept", "kth_hash", est.alias("est_distinct")
    ).orderBy("scope")


# Mergeable histogram-quantile sketch: fixed equi-width grid (literal
# bins — the same scheme as profile_psi_drift's binning), bin counts
# are the mergeable state, quantiles read off the CDF.
_HQ_WIDTH = 10.0
_HQ_BINS = 60  # covers [0, 600) — value observed 0..561 at all SFs


@query(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH binned AS (
        SELECT event_type,
               LEAST(CAST(FLOOR(value / {_HQ_WIDTH}) AS INTEGER),
                     {_HQ_BINS - 1}) AS bin,
               COUNT(*) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    cdf AS (
        SELECT event_type, bin, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM binned
    ),
    qs AS (
        SELECT event_type, n,
               MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN bin END) AS b50,
               MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN bin END) AS b95,
               MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN bin END) AS b99
        FROM cdf GROUP BY event_type, n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(b50 * {_HQ_WIDTH} AS DOUBLE) AS p50_lo,
           CAST(b95 * {_HQ_WIDTH} AS DOUBLE) AS p95_lo,
           CAST(b99 * {_HQ_WIDTH} AS DOUBLE) AS p99_lo,
           CAST({_HQ_WIDTH} AS DOUBLE) AS max_error
    FROM qs
    ORDER BY event_type
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: p50/p95/p99 per event_type from a
    fixed equi-width histogram — bin counts are the sketch state
    (trivially mergeable across partitions/days/clusters by adding
    counts; the property t-digest/KLL also buy, here with a
    DETERMINISTIC, oracle-replayable structure), and every quantile
    is exact to within one bin width (emitted as max_error). The
    quantile slot in the sketch family beside count-min (frequency),
    HLL/KMV (distinct), and Bloom (membership).

    Scale shape: the corpus collapses to (type, bin) counts —
    constant state per type, map-side combinable, which IS the merge
    operation; the CDF walk runs on the 60-bin table. Integer
    arithmetic end-to-end: quantiles report the bin lower bound, no
    interpolation to diverge on."""
    e = spark.table("events").where(F.col("value").isNotNull())
    binned = e.groupBy(
        "event_type",
        F.least(
            F.floor(F.col("value") / _HQ_WIDTH).cast("int"),
            F.lit(_HQ_BINS - 1),
        ).alias("bin"),
    ).agg(F.count("*").alias("c"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    cdf = binned.select(
        "event_type",
        "bin",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )

    def q_bin(p):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(p * F.col("n")), F.col("bin")
            )
        )

    qs = cdf.groupBy("event_type", "n").agg(
        q_bin(0.5).alias("b50"),
        q_bin(0.95).alias("b95"),
        q_bin(0.99).alias("b99"),
    )
    return qs.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("b50") * _HQ_WIDTH).cast("double").alias("p50_lo"),
        (F.col("b95") * _HQ_WIDTH).cast("double").alias("p95_lo"),
        (F.col("b99") * _HQ_WIDTH).cast("double").alias("p99_lo"),
        F.lit(_HQ_WIDTH).cast("double").alias("max_error"),
    ).orderBy("event_type")


_THETA_SRCS = ("src0", "src1", "src10", "src11")
_THETA_SRC_SQL = ", ".join(f"'{s}'" for s in _THETA_SRCS)


@query(
    "sketch_theta_intersection",
    # Like KMV above, the whole sketch is a pure function of md5
    # hashes, so the oracle replays minima, thetas, and estimates
    # bit-for-bit — set OPERATIONS included (no tolerance gate).
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        FROM documents WHERE source IN ({_THETA_SRC_SQL})
    ),
    sk AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h)
                       AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}
    ),
    stats AS (
        SELECT source, MAX(h) AS kth, COUNT(*) AS n_kept
        FROM sk GROUP BY source
    ),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               a.kth AS kth_a, b.kth AS kth_b,
               a.n_kept AS k_a, b.n_kept AS k_b,
               LEAST(CASE WHEN a.n_kept < {_KMV_K}
                          THEN 4294967296 ELSE a.kth END,
                     CASE WHEN b.n_kept < {_KMV_K}
                          THEN 4294967296 ELSE b.kth END) AS theta_h
        FROM stats a JOIN stats b ON a.source < b.source
    ),
    common AS (
        SELECT p.src_a, p.src_b, COUNT(*) AS n_common
        FROM pairs p
        JOIN sk sa ON sa.source = p.src_a
        JOIN sk sb ON sb.source = p.src_b AND sb.h = sa.h
        WHERE sa.h <= p.theta_h
        GROUP BY p.src_a, p.src_b
    ),
    uni AS (
        SELECT src_a, src_b, MAX(h) AS kth_u, COUNT(*) AS k_u FROM (
            SELECT src_a, src_b, h,
                   row_number() OVER (
                       PARTITION BY src_a, src_b ORDER BY h
                   ) AS rn
            FROM (
                SELECT DISTINCT p.src_a, p.src_b, m.h
                FROM pairs p
                JOIN sk m
                  ON m.source = p.src_a OR m.source = p.src_b
            )
        ) WHERE rn <= {_KMV_K}
        GROUP BY src_a, src_b
    )
    SELECT p.src_a, p.src_b,
           CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
           CASE WHEN p.k_a < {_KMV_K} THEN CAST(p.k_a AS DOUBLE)
                ELSE round(({_KMV_K} - 1) * 4294967296.0 / p.kth_a, 4)
           END AS est_a,
           CASE WHEN p.k_b < {_KMV_K} THEN CAST(p.k_b AS DOUBLE)
                ELSE round(({_KMV_K} - 1) * 4294967296.0 / p.kth_b, 4)
           END AS est_b,
           round(COALESCE(c.n_common, 0) * 4294967296.0
                 / p.theta_h, 4) AS est_intersection,
           CASE WHEN u.k_u < {_KMV_K} THEN CAST(u.k_u AS DOUBLE)
                ELSE round((u.k_u - 1) * 4294967296.0 / u.kth_u, 4)
           END AS est_union
    FROM pairs p
    LEFT JOIN common c ON c.src_a = p.src_a AND c.src_b = p.src_b
    JOIN uni u ON u.src_a = p.src_a AND u.src_b = p.src_b
    ORDER BY p.src_a, p.src_b
    """,
)
def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET OPERATIONS between source corpora: from each
    source's bottom-k (KMV) sketch alone, estimate per-pair distinct
    counts, |A∩B| (common sketch hashes below theta = min of the two
    kth-minima, scaled by 1/theta), and |A∪B| (merge + re-cut at k) —
    the Datasketches workflow that answers overlap questions across
    100 TB corpora from kilobyte summaries, without ever co-scanning
    the raw sets.

    Scale shape: ONE corpus scan builds all per-source sketches
    (rank-limit window = partition-local bounded top-k, same as
    sketch_kmv_distinct); everything downstream — pair enumeration,
    hash-equi intersection, merge/re-cut — runs on k-row sketches
    (metadata-sized). Deterministic md5 base hash, so the driver
    hash-verifies the estimates bit-for-bit."""
    d = spark.table("documents").where(
        F.col("source").isin(*_THETA_SRCS)
    )
    h = d.select(
        "source",
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = track_persist(
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KMV_K)
        .select("source", "h")
    )
    stats = sk.groupBy("source").agg(
        F.max("h").alias("kth"), F.count("*").alias("n_kept")
    )
    a = stats.select(
        F.col("source").alias("src_a"),
        F.col("kth").alias("kth_a"),
        F.col("n_kept").alias("k_a"),
    )
    b = stats.select(
        F.col("source").alias("src_b"),
        F.col("kth").alias("kth_b"),
        F.col("n_kept").alias("k_b"),
    )
    sat = float(2**32)

    def _theta(kth, k_kept):
        return F.when(k_kept < _KMV_K, F.lit(sat)).otherwise(kth)

    pairs = a.join(b, F.col("src_a") < F.col("src_b")).withColumn(
        "theta_h",
        F.least(
            _theta(F.col("kth_a"), F.col("k_a")),
            _theta(F.col("kth_b"), F.col("k_b")),
        ),
    )
    sa = sk.select(F.col("source").alias("src_a"), "h")
    sb = sk.select(
        F.col("source").alias("sb_src"), F.col("h").alias("hb")
    )
    common = (
        pairs.join(F.broadcast(sa), "src_a")
        .join(
            F.broadcast(sb),
            (F.col("src_b") == F.col("sb_src"))
            & (F.col("h") == F.col("hb")),
        )
        .where(F.col("h") <= F.col("theta_h"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    members = sk.select(F.col("source").alias("m_src"), "h")
    p0 = pairs.select("src_a", "src_b")
    uni = (
        p0.join(
            F.broadcast(members), F.col("m_src") == F.col("src_a")
        )
        .select("src_a", "src_b", "h")
        .unionAll(
            p0.join(
                F.broadcast(members), F.col("m_src") == F.col("src_b")
            ).select("src_a", "src_b", "h")
        )
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("src_a", "src_b").orderBy("h")
            ),
        )
        .where(F.col("rn") <= _KMV_K)
        .groupBy("src_a", "src_b")
        .agg(F.max("h").alias("kth_u"), F.count("*").alias("k_u"))
    )
    scale = float(2**32)

    def est(kth, k_kept):
        # Exhaustive sketch (< k minima kept) IS the exact set.
        return F.when(
            k_kept < _KMV_K, k_kept.cast("double")
        ).otherwise(F.round(F.lit(_KMV_K - 1) * scale / kth, 4))

    return (
        pairs.join(common, ["src_a", "src_b"], "left")
        .join(uni, ["src_a", "src_b"])
        .select(
            "src_a",
            "src_b",
            F.coalesce(F.col("n_common"), F.lit(0))
            .cast("bigint")
            .alias("n_common"),
            est(F.col("kth_a"), F.col("k_a")).alias("est_a"),
            est(F.col("kth_b"), F.col("k_b")).alias("est_b"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0))
                * scale
                / F.col("theta_h"),
                4,
            ).alias("est_intersection"),
            est(F.col("kth_u"), F.col("k_u")).alias("est_union"),
        )
        .orderBy("src_a", "src_b")
    )


_CMW_WIDTHS = (64, 256, 1024)
_CMW_TOPK = 20


def _cm_base(gram: Column, seed: int) -> Column:
    """Top 32 bits of md5(gram#seed) as a long — ONE base hash from
    which every sweep width derives its bucket (base % w)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(gram, F.lit(f"#{seed}")).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")


_CM_BASE_SQL = "('0x' || substr(md5({g} || '#' || {s}), 1, 8))::BIGINT"


@query(
    "sketch_countmin_width_curve",
    oracle=rf"""
    WITH toks AS (
        SELECT string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(t)),
                   i -> list_extract(t, i) || ' '
                        || list_extract(t, i + 1))) AS gram
        FROM toks WHERE len(t) >= 2
    ),
    seeds AS (SELECT unnest(range(0, {_D})) AS s),
    widths AS (SELECT unnest([{", ".join(map(str, _CMW_WIDTHS))}]) AS w),
    sketch AS (
        SELECT w, s, {_CM_BASE_SQL.format(g="gram", s="s")} % w AS b,
               COUNT(*) AS c
        FROM bg CROSS JOIN seeds CROSS JOIN widths
        GROUP BY w, s, b
    ),
    exact AS (
        SELECT gram, COUNT(*) AS n_exact
        FROM bg GROUP BY gram
        ORDER BY n_exact DESC, gram LIMIT {_CMW_TOPK}
    ),
    est AS (
        SELECT wd.w, e.gram, e.n_exact, MIN(sk.c) AS n_est
        FROM exact e
        CROSS JOIN seeds js CROSS JOIN widths wd
        JOIN sketch sk
          ON sk.w = wd.w AND sk.s = js.s
         AND sk.b = {_CM_BASE_SQL.format(g="e.gram", s="js.s")} % wd.w
        GROUP BY wd.w, e.gram, e.n_exact
    )
    SELECT w AS width,
           CAST({_D} * w AS BIGINT) AS n_counters,
           CAST(ROUND(CAST(SUM(CAST(n_est - n_exact AS DECIMAL(18,6)))
                           AS DOUBLE) / COUNT(*), 4) AS DOUBLE)
               AS mean_overestimate,
           CAST(MAX(n_est - n_exact) AS BIGINT) AS max_overestimate,
           CAST(ROUND(COUNT(CASE WHEN n_est = n_exact THEN 1 END)
                      / CAST(COUNT(*) AS DOUBLE), 4) AS DOUBLE)
               AS frac_exact
    FROM est
    GROUP BY w
    ORDER BY width
    """,
)
def sketch_countmin_width_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min accuracy/cost frontier: the SAME bigram stream
    sketched at widths 64/256/1024 (buckets derived from one shared
    32-bit base hash per seed), each width scored against the exact
    top-20 — mean/max overestimate and the fraction answered exactly
    vs the counter budget. The tuning curve that picks a sketch width
    the same way sim_ivf_nprobe_curve picks nprobe and
    dedup_lsh_tuning_curve picks bands.

    Scale shape: one explode produces (gram, seed, base) pairs; the
    width sweep multiplies only those pairs (x3) and
    partial-aggregates to at most d*sum(w) counters per partition —
    constant state at any corpus size. The probe side joins 240
    candidate rows against the finished sketches."""
    d = spark.table("documents")
    n = F.size(F.split(F.trim(F.col("text")), r"\s+"))
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
                        _cm_base(F.col("gram"), s).alias("base"),
                    )
                    for s in range(_D)
                ]
            )
        ).alias("p"),
    ).select("gram", "p.s", "p.base")
    widths = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(w).cast("long") for w in _CMW_WIDTHS])
        ).alias("w")
    )
    sketch = (
        pairs.join(F.broadcast(widths))
        .groupBy("w", "s", (F.col("base") % F.col("w")).alias("b"))
        .agg(F.count("*").alias("c"))
    )
    exact = (
        bg.groupBy("gram")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "gram")
        .limit(_CMW_TOPK)
    )
    cand = (
        exact.select(
            "gram",
            "n_exact",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).cast("long").alias("s"),
                            _cm_base(F.col("gram"), s).alias("base"),
                        )
                        for s in range(_D)
                    ]
                )
            ).alias("p"),
        )
        .select("gram", "n_exact", "p.s", "p.base")
        .join(F.broadcast(widths))
        .select(
            "gram",
            "n_exact",
            "s",
            "w",
            (F.col("base") % F.col("w")).alias("b"),
        )
    )
    est = (
        cand.join(sketch, ["w", "s", "b"])
        .groupBy("w", "gram", "n_exact")
        .agg(F.min("c").alias("n_est"))
    )
    return (
        est.groupBy("w")
        .agg(
            F.round(
                F.sum(
                    (F.col("n_est") - F.col("n_exact")).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count("*"),
                4,
            ).alias("mean_overestimate"),
            F.max(F.col("n_est") - F.col("n_exact"))
            .cast("bigint")
            .alias("max_overestimate"),
            F.round(
                F.count(F.when(F.col("n_est") == F.col("n_exact"), 1))
                / F.count("*").cast("double"),
                4,
            ).alias("frac_exact"),
        )
        .select(
            F.col("w").alias("width"),
            (F.lit(_D) * F.col("w")).cast("bigint").alias("n_counters"),
            "mean_overestimate",
            "max_overestimate",
            "frac_exact",
        )
        .orderBy("width")
    )


# ---------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) F2 sketch — self-join size estimation.
#
# F2 = sum_k c_k^2 is the size of a self-equi-join, the quantity a
# query planner needs before choosing a join strategy; the AMS sketch
# estimates it from 64 random-sign counters S_j = sum_u c_u * sign_j(u)
# (E[S^2] = F2), mean-of-16 within each of 4 groups, lower-median
# across groups. Signs are md5-derived, so the DuckDB oracle replays
# every counter bit-for-bit — integer arithmetic end to end, one final
# division.
# ---------------------------------------------------------------------------

_AMS_GROUPS = 4
_AMS_PER_GROUP = 16


def _ams_sign_sql(j: int) -> str:
    return (
        f"(1 - 2 * (('0x' || substr(md5(CAST(user_id AS VARCHAR)"
        f" || '#ams{j}'), 1, 1))::BIGINT % 2))"
    )


@query(
    "sketch_ams_f2",
    oracle=f"""
    WITH per_key AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(c * c) AS BIGINT) AS f2_exact,
               {", ".join(
                   f"CAST(SUM(c * {_ams_sign_sql(j)}) AS BIGINT) AS s{j}"
                   for j in range(_AMS_GROUPS * _AMS_PER_GROUP))}
        FROM per_key
    ),
    est AS (
        SELECT n_rows, n_keys, f2_exact,
               list_sort([{", ".join(
                   "CAST((" + " + ".join(
                       f"s{g * _AMS_PER_GROUP + i} * s{g * _AMS_PER_GROUP + i}"
                       for i in range(_AMS_PER_GROUP)) +
                   f") AS DOUBLE) / {_AMS_PER_GROUP}"
                   for g in range(_AMS_GROUPS))}])[2] AS f2_estimate
        FROM s
    )
    SELECT n_rows, n_keys, f2_exact, f2_estimate,
           {sql_jround("(f2_estimate - f2_exact) / f2_exact", 4)} AS rel_err,
           f2_estimate > 0.5 * f2_exact
               AND f2_estimate < 2.0 * f2_exact AS within_2x
    FROM est
    """,
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (F2) sketch over the events user_id key:
    estimates the SELF-JOIN SIZE sum(c_u^2) — what a planner wants
    before picking a strategy for events JOIN events ON user_id —
    from 64 md5-derived +/-1 counters, mean-of-16 within each of 4
    groups, LOWER median across groups (no interpolation). Joins the
    mergeable-sketch family (count-min: point frequency; KMV/HLL/
    theta: distinct; Bloom: membership; this: join size).

    Scale shape: the corpus collapses once to the per-key count table
    (one exchange, map-side combinable); the 64 sign counters and the
    exact F2 ride ONE single-row aggregate over that key table, so
    the sketch costs one pass and constant state — and the counters
    are linearly mergeable across partitions/days by construction.
    All integer arithmetic (signs, counters, squares) until the
    /16 group means (exact dyadic rationals) and one final rel_err
    rounding; the estimate replays bit-for-bit in DuckDB."""
    per_key = (
        spark.table("events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("c"))
    )

    def sign(j: int):
        bit = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit(f"#ams{j}"),
                        ).cast("binary")
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        )
        return 1 - 2 * bit

    s = per_key.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"),
        *[
            F.sum(F.col("c") * sign(j)).cast("bigint").alias(f"s{j}")
            for j in range(_AMS_GROUPS * _AMS_PER_GROUP)
        ],
    )
    group_means = [
        (
            sum(
                F.col(f"s{g * _AMS_PER_GROUP + i}")
                * F.col(f"s{g * _AMS_PER_GROUP + i}")
                for i in range(_AMS_PER_GROUP)
            ).cast("double")
            / _AMS_PER_GROUP
        )
        for g in range(_AMS_GROUPS)
    ]
    est = s.select(
        "n_rows",
        "n_keys",
        "f2_exact",
        F.element_at(F.array_sort(F.array(*group_means)), 2).alias(
            "f2_estimate"
        ),
    )
    return est.select(
        "n_rows",
        "n_keys",
        "f2_exact",
        "f2_estimate",
        F.round(
            (F.col("f2_estimate") - F.col("f2_exact"))
            / F.col("f2_exact"),
            4,
        ).alias("rel_err"),
        (
            (F.col("f2_estimate") > 0.5 * F.col("f2_exact"))
            & (F.col("f2_estimate") < 2.0 * F.col("f2_exact"))
        ).alias("within_2x"),
    )


_LC_M = 1024  # linear-counting bitmap width


@query(
    "sketch_linear_counting",
    oracle=f"""
    WITH marked AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#lc'),
                               1, 8))::BIGINT % {_LC_M} AS bkt
        FROM events
    ),
    filled AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT bkt) AS BIGINT) AS n_filled
        FROM marked GROUP BY event_type
    ),
    truth AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
        FROM events GROUP BY event_type
    )
    SELECT f.event_type, f.n_filled, t.true_distinct,
           CASE WHEN f.n_filled >= {_LC_M} THEN NULL
                ELSE CAST(round(-{_LC_M}.0
                     * ln(({_LC_M}.0 - f.n_filled) / {_LC_M}.0), 0)
                     AS BIGINT) END AS lc_estimate,
           CASE WHEN f.n_filled >= {_LC_M} THEN NULL
                ELSE round(abs(-{_LC_M}.0
                      * ln(({_LC_M}.0 - f.n_filled) / {_LC_M}.0)
                      - t.true_distinct)
                      / t.true_distinct, 4) END AS rel_error
    FROM filled f JOIN truth t ON t.event_type = f.event_type
    ORDER BY f.event_type
    """,
)
def sketch_linear_counting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear (probabilistic) counting of distinct users per event
    type: hash each user into an m = 1024 bucket bitmap and estimate
    distinct count as -m ln(V_empty / m) — the low-range-accurate
    distinct sketch (beats HLL below ~m distinct values), completing
    the cardinality family (exact bitmap / KMV / HLL / this). The
    exact count rides alongside so the estimator's relative error is
    itself part of the verified result.

    Scale shape: the bitmap is a distinct-count over hash buckets —
    partial aggregation caps per-partition state at m counters per
    group, and two bitmaps OR-merge (the mergeability a
    1000-executor rollup needs). The md5-derived bucket is the
    repo's portable hash family, so both engines fill identical
    buckets.

    Saturation guard (ADVICE r11): when every bucket fills
    (n_filled == m) the estimator's ln(0) is undefined — Spark log(0)
    yields NULL while DuckDB ln(0) errors, so both engines explicitly
    emit NULL for the estimate and rel_error at saturation instead of
    diverging; the bitmap occupancy itself still reports, which is
    the documented 'switch to HLL past ~m distincts' signal."""
    e = spark.table("events")
    bkt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"), F.lit("#lc")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _LC_M
    )
    filled = e.select("event_type", bkt.alias("bkt")).groupBy(
        "event_type"
    ).agg(F.count_distinct("bkt").cast("bigint").alias("n_filled"))
    truth = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias(
            "true_distinct"
        )
    )
    unsaturated = F.col("n_filled") < _LC_M
    est = -float(_LC_M) * F.log(
        (float(_LC_M) - F.col("n_filled")) / float(_LC_M)
    )
    return (
        filled.join(truth, "event_type")
        .select(
            "event_type",
            "n_filled",
            "true_distinct",
            F.when(unsaturated, F.round(est, 0).cast("bigint")).alias(
                "lc_estimate"
            ),
            F.when(
                unsaturated,
                F.round(
                    F.abs(est - F.col("true_distinct"))
                    / F.col("true_distinct"),
                    4,
                ),
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )
