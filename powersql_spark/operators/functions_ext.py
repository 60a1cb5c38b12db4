"""Extended scalar-function families (beyond operators/functions.py's
reference-parity set; the reference passes all function calls through
opaquely, src/main.rs:117-121, typed Any at src/types.rs:94 — so the
function library is the execution engine's. These keys document the
breadth a warehouse user actually leans on).

All JVM-side built-ins — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.catalog import values_df
from powersql_spark.registry import query


@query(
    "fn_regexp",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
           regexp_matches(text, '\bdata\b') AS mentions_data
    FROM documents WHERE doc_id < 200
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract / extract-all / match. Compiled once per
    task by codegen, not per row."""
    d = spark.table("documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"))).alias(
            "n_numbers"
        ),
        F.col("text").rlike(r"\bdata\b").alias("mentions_data"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer WHERE c_custkey <= 500
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash functions (cross-engine standardized, unlike
    xxhash64/murmur — those are engine-specific and used internally for
    dedup signatures)."""
    c = spark.table("customer").where(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 15 AS low_bits,
           p_size | 16 AS with_flag,
           xor(p_size, 255) AS xored,
           p_size << 2 AS shifted
    FROM part WHERE p_partkey <= 400
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND / OR / XOR / shift — flag fields and bit-packed
    encodings."""
    p = spark.table("part").where(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        F.col("p_size").bitwiseAND(F.lit(15)).alias("low_bits"),
        F.col("p_size").bitwiseOR(F.lit(16)).alias("with_flag"),
        F.col("p_size").bitwiseXOR(F.lit(255)).alias("xored"),
        F.shiftleft(F.col("p_size"), 2).alias("shifted"),
    )


@query(
    "fn_array_ops",
    # Joined to a string: the driver's pandas canonicalizer can't hash
    # list cells (the agg_collect_set round-1 crash).
    oracle="""
    SELECT doc_id,
           array_to_string(
               list_sort(list_distinct(string_split(lower(text), ' ')))[1:5],
               ','
           ) AS first_toks,
           len(string_split(text, ' ')) AS n_toks,
           list_contains(string_split(lower(text), ' '), 'the') AS has_the
    FROM documents WHERE doc_id < 100
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pipeline: split -> distinct -> sort -> slice -> join, plus
    membership — the building blocks of the dedup/text operators, shown
    as user-facing functions."""
    d = spark.table("documents").where(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    ltoks = F.split(F.lower(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(ltoks)), 1, 5), ","
        ).alias("first_toks"),
        F.size(toks).alias("n_toks"),
        F.array_contains(ltoks, "the").alias("has_the"),
    )


@query(
    "fn_sequence",
    oracle="""
    SELECT r_regionkey, unnest(range(0, 3)) AS step
    FROM region
    """,
)
def fn_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence generation + explode — row multiplication without a
    join (the idiom behind sliding-window reconstruction and date
    spines)."""
    r = spark.table("region")
    return r.select(
        "r_regionkey",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("step"),
    )


@query(
    "fn_string_advanced",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_id,
           reverse(c_name) AS rev_name,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           strpos(c_name, '#') AS hash_pos,
           repeat('*', 3) AS stars,
           CAST(translate(c_name, '#', '_') AS VARCHAR) AS underscored
    FROM customer WHERE c_custkey <= 300
    """,
)
def fn_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-tier string ops: pad / reverse / replace / locate /
    repeat / translate."""
    c = spark.table("customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_id"),
        F.reverse("c_name").alias("rev_name"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("short_name"),
        F.locate("#", F.col("c_name")).alias("hash_pos"),
        F.repeat(F.lit("*"), 3).alias("stars"),
        F.translate("c_name", "#", "_").alias("underscored"),
    )


@query(
    "fn_url",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN source = 'web' THEN 'https://example.org/docs/' || doc_id
                ELSE NULL END AS url,
           CASE WHEN source = 'web' THEN 'example.org' END AS host,
           CASE WHEN source = 'web' THEN '/docs/' || doc_id END AS path
    FROM documents WHERE doc_id < 150
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL construction + component extraction (parse_url) — provenance
    tracking in crawl pipelines. The oracle mirrors the parse results
    literally since DuckDB lacks parse_url."""
    d = spark.table("documents").where(F.col("doc_id") < 150)
    url = F.when(
        F.col("source") == "web",
        F.concat(F.lit("https://example.org/docs/"), F.col("doc_id")),
    )
    return d.select(
        "doc_id",
        "source",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
    )


@query(
    "fn_json_typed",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS INTEGER)
                AS DECIMAL(18,6))) AS DOUBLE) AS k_total
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 50
    GROUP BY event_type
    """,
)
def fn_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with from_json + schema (vs per-field
    get_json_object): ONE parse per row materializes every needed field;
    N get_json_object calls parse the document N times. The difference
    compounds at 100 TB — always from_json with an explicit schema for
    multi-field extraction."""
    e = spark.table("events")
    parsed = e.withColumn(
        "p", F.from_json("props", "k INT")
    )
    return (
        parsed.where(F.col("p.k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("p.k").cast("decimal(18,6)"))
            .cast("double")
            .alias("k_total"),
        )
    )


@query(
    "fn_date_spine",
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                      INTERVAL 1 DAY))::DATE AS d
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT spine.d AS day, COALESCE(daily.n, 0) AS n_orders
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def fn_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date spine: a generated calendar left-joined to the data so
    gap days appear as zeros — the prerequisite for any time series
    that must not silently skip empty periods. The spine generates on
    the fly (sequence + explode, no stored calendar table) and
    broadcasts into the aggregate."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    return (
        F.broadcast(spine)
        .join(daily, spine.day == daily.d, "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n_orders"))
    )


@query(
    "fn_math_extended",
    oracle="""
    SELECT p_partkey,
           round(ln(p_retailprice), 6) AS ln_price,
           round(log10(p_retailprice), 6) AS log10_price,
           round(exp(p_size / 25.0), 6) AS exp_sz,
           CAST(sign(p_size - 25) AS DOUBLE) AS sz_sign,
           p_size % 7 AS sz_mod,
           GREATEST(p_size, 25) AS sz_hi,
           LEAST(p_size, 25) AS sz_lo
    FROM part WHERE p_partkey <= 600
    """,
)
def fn_math_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended math: ln / log10 / exp / sign / mod / greatest / least.
    Rounded to 6dp — transcendental libm results differ in the last
    ulps across engines."""
    p = spark.table("part").where(F.col("p_partkey") <= 600)
    return p.select(
        "p_partkey",
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 6).alias("log10_price"),
        F.round(F.exp(F.col("p_size") / 25.0), 6).alias("exp_sz"),
        F.signum(F.col("p_size") - 25).cast("double").alias("sz_sign"),
        (F.col("p_size") % 7).alias("sz_mod"),
        F.greatest("p_size", F.lit(25)).alias("sz_hi"),
        F.least("p_size", F.lit(25)).alias("sz_lo"),
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_totalprice > 400000.0) AS any_over_400k,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOL_AND / BOOL_OR (every/any) — predicate aggregation, the
    set-level form of ASSERT conditions."""
    o = spark.table("orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
        F.count("*").alias("n"),
    )


@query(
    "fn_higher_order",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> length(x) >= 5)) AS INTEGER)
               AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x)))
                AS BIGINT) AS total_chars,
           list_max(list_transform(toks, x -> length(x))) AS max_len,
           CAST(length(toks[1]) = list_max(list_transform(toks,
                x -> length(x))) AS BOOLEAN) AS first_is_longest
    FROM t
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a user surface — TRANSFORM /
    FILTER / AGGREGATE lambdas over an array column (SQL
    `transform(arr, x -> ...)`), mirrored by DuckDB's list_* lambdas.
    These run interpreted (outside whole-stage codegen), which is why
    this repo's hot paths avoid them — fine at dimension scale, and
    the expressiveness is the point here."""
    t = spark.table("documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    lens = F.transform("toks", lambda x: F.length(x))
    max_len = F.array_max(lens)
    return t.select(
        "doc_id",
        F.size(F.filter("toks", lambda x: F.length(x) >= 5)).alias(
            "n_long"
        ),
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total_chars"),
        max_len.alias("max_len"),
        (F.length(F.element_at("toks", 1)) == max_len).alias(
            "first_is_longest"
        ),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           json_extract(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) % 7 = 0
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion of semi-structured JSON (the Spark 4 /
    lakehouse open-schema path): ``parse_json`` once into a binary
    VARIANT column, then typed ``variant_get`` extractions — unlike
    ``from_json`` (fn_json) no schema is declared up front, and unlike
    ``get_json_object`` (fn_json_typed) extraction is from the parsed
    binary form, not re-parsed text per path. At scale the parse
    happens once per row at ingest and every downstream path probe is
    a cheap binary traversal.

    Map-only; the typed extraction filter stays in the scan stage."""
    e = spark.table("events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        e.select(
            "event_id",
            k.alias("k"),
            (k * 2).alias("k_doubled"),
            F.try_variant_get(v, "$.missing", "string")
            .isNotNull()
            .alias("has_missing"),
        )
        .where(F.col("k") % 7 == 0)
    )


@query(
    "fn_collation_lcase",
    oracle="""
    WITH variants AS (
        SELECT upper(n_name) AS v FROM nation
        UNION ALL
        SELECT upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
            AS v FROM nation
    )
    SELECT lower(v) AS name_ci,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           MIN(v) AS first_variant,
           CAST(COUNT(CASE WHEN lower(v) = 'germany' THEN 1 END)
                AS BIGINT) AS n_germany
    FROM variants
    GROUP BY lower(v)
    """,
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): group and
    compare mixed-case name variants under UTF8_LCASE so 'GERMANY' and
    'Germany' are the SAME key to the aggregate and the equality
    predicate — the engine-native answer where pre-collation code
    lowercased every expression by hand. expr_collate keeps the
    reference's passthrough semantics (the reference never inspects
    COLLATE, src/main.rs:112-114); this key exercises the real thing.
    The emitted key is lower()ed only for a deterministic cross-engine
    representation; grouping itself runs on the collated value.

    Plan note: collation-aware grouping hashes the collation key —
    still one partial+final aggregate pair, no extra pass."""
    n = spark.table("nation")
    manual_title = F.concat(
        F.upper(F.substring("n_name", 1, 1)),
        F.lower(F.expr("substr(n_name, 2)")),
    )
    variants = n.select(F.upper("n_name").alias("v")).unionAll(
        n.select(manual_title.alias("v"))
    )
    ci = F.collate("v", "UTF8_LCASE")
    return variants.groupBy(ci.alias("k")).agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.min("v").alias("first_variant"),
        F.count(F.when(ci == F.lit("germany"), 1)).alias("n_germany"),
    ).select(
        F.lower("k").alias("name_ci"),
        "n_variants",
        "first_variant",
        "n_germany",
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE round(l_quantity / (l_linenumber - 1), 4)
           END AS qty_per_prior_line,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_extendedprice / l_discount, 4)
           END AS price_per_discount
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: try_divide yields NULL instead of raising
    on division by zero — the behavior PostgreSQL/ANSI pipelines
    expect from guarded expressions, and what keeps a 100 TB job from
    dying on one bad row when ANSI mode is on. The oracle spells out
    the equivalent CASE guard (DuckDB has no try_divide)."""
    li = spark.table("lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide("l_quantity", F.col("l_linenumber") - 1), 4
        ).alias("qty_per_prior_line"),
        F.round(
            F.try_divide("l_extendedprice", F.col("l_discount")), 4
        ).alias("price_per_discount"),
    )


@query(
    "fn_format_string",
    oracle="""
    SELECT n_nationkey,
           printf('%s (region %d)', n_name, n_regionkey) AS label,
           printf('%05d', n_nationkey) AS padded_key
    FROM nation
    ORDER BY n_nationkey
    """,
)
def fn_format_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style string interpolation — format_string with %s/%d
    and zero-padded width, the report-formatting surface. ASCII format
    specifiers behave identically under Java's Formatter (Spark) and
    DuckDB's printf. Map-only codegen."""
    n = spark.table("nation")
    return n.select(
        "n_nationkey",
        F.format_string(
            "%s (region %d)", F.col("n_name"), F.col("n_regionkey")
        ).alias("label"),
        F.format_string("%05d", F.col("n_nationkey")).alias("padded_key"),
    ).orderBy("n_nationkey")


@query(
    "fn_timezone",
    oracle="""
    SELECT event_id,
           ts AS utc_ts,
           CAST(timezone('America/New_York', ts AT TIME ZONE 'UTC')
                AS TIMESTAMP) AS ny_ts,
           CAST(timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC')
                AS TIMESTAMP) AS tokyo_ts,
           CAST(EXTRACT(hour FROM timezone('America/New_York',
                ts AT TIME ZONE 'UTC')) AS INTEGER) AS ny_hour,
           EXTRACT(hour FROM timezone('America/New_York',
                ts AT TIME ZONE 'UTC')) BETWEEN 9 AND 16
               AS ny_business_hours,
           CAST(timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC') AS DATE)
               <> CAST(ts AS DATE) AS tokyo_next_day
    FROM events
    ORDER BY event_id
    """,
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-timezone conversion (IANA zone database on both engines:
    Java time in Spark, ICU in DuckDB): UTC event times rendered as
    New York / Tokyo wall clocks, business-hour flags, and the
    date-line rollover — the session-localization surface every
    warehouse exposes (AT TIME ZONE / from_utc_timestamp). Zone RULES
    (not fixed offsets) are exercised; DST would shift the NY wall
    clock where a hardcoded -5h breaks. Map-only codegen, one scan."""
    e = spark.table("events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return e.select(
        "event_id",
        F.col("ts").alias("utc_ts"),
        ny.alias("ny_ts"),
        tokyo.alias("tokyo_ts"),
        F.hour(ny).cast("int").alias("ny_hour"),
        F.hour(ny).between(9, 16).alias("ny_business_hours"),
        (tokyo.cast("date") != F.col("ts").cast("date")).alias(
            "tokyo_next_day"
        ),
    ).orderBy("event_id")


@query(
    "fn_data_masking",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 1, 4) || repeat('*', GREATEST(length(c_name) - 4, 0))
               AS name_masked,
           'tok_' || substr(md5('cust:' || CAST(c_custkey AS VARCHAR)), 1, 12)
               AS key_token,
           CAST(FLOOR(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_bucket,
           CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY')
                THEN c_mktsegment ELSE 'OTHER' END AS segment_coarse
    FROM customer
    ORDER BY c_custkey
    """,
)
def fn_data_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking suite — the governance projection a warehouse
    serves to untrusted roles: partial masking (keep a 4-char prefix,
    star the rest), deterministic tokenization (salted md5 token —
    joinable across tables, irreversible without the salt),
    numeric generalization (bucket balances to 1000s), and category
    coarsening (rare segments collapse to OTHER — k-anonymity's
    generalization step). Every transform is deterministic so masked
    datasets stay JOINABLE and reproducible — the property that makes
    tokenization useful and ad-hoc scrambling useless.

    Scale shape: map-only codegen over one scan; masking never
    shuffles. FLOOR (not round) for the bucketing so both engines
    agree bit-for-bit."""
    c = spark.table("customer")
    return c.select(
        "c_custkey",
        F.concat(
            F.substring("c_name", 1, 4),
            F.repeat(
                F.lit("*"), F.greatest(F.length("c_name") - 4, F.lit(0))
            ),
        ).alias("name_masked"),
        F.concat(
            F.lit("tok_"),
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cust:"), F.col("c_custkey").cast("string")
                    ).cast("binary")
                ),
                1,
                12,
            ),
        ).alias("key_token"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("double")
        .alias("acctbal_bucket"),
        F.when(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY"),
            F.col("c_mktsegment"),
        )
        .otherwise("OTHER")
        .alias("segment_coarse"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# IPv4 parse + CIDR longest-prefix-match enrichment.
#
# The log-pipeline classic (IP -> network/geo/ASN lookup). IPs are
# md5-planted per user (the testdata has no IP column — same
# plant-and-verify pattern as text_pii_redact); the CIDR table is a
# VALUES dim with OVERLAPPING blocks so longest-prefix actually
# decides. The match is one broadcast hash equi-join per DISTINCT
# prefix length (here 4) on the truncated network key — never a range
# or nested-loop join — and longest-prefix is a COALESCE down the
# length-sorted match columns: the whole key is map-only on the fact
# side.
# ---------------------------------------------------------------------------

# (name, first-octet base, prefix_len). Net key = ip DIV 2^(32-len).
_CIDR_BLOCKS = (
    ("half-low", 0, 1),  # 0.0.0.0/1
    ("quarter-2", 64, 2),  # 64.0.0.0/2
    ("eighth-5", 160, 3),  # 160.0.0.0/3
    ("corp-10", 10, 8),  # 10.0.0.0/8
    ("corp-192", 192, 8),  # 192.0.0.0/8
)
_CIDR_LENS = sorted({b[2] for b in _CIDR_BLOCKS}, reverse=True)


def _ip_octet_sql(k: int) -> str:
    return (
        f"('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ip'),"
        f" {2 * k - 1}, 2))::BIGINT"
    )


@query(
    "fn_ip_cidr",
    oracle=f"""
    WITH ips AS (
        SELECT event_id,
               {_ip_octet_sql(1)} * 16777216 + {_ip_octet_sql(2)} * 65536
                   + {_ip_octet_sql(3)} * 256 + {_ip_octet_sql(4)} AS ip,
               CAST({_ip_octet_sql(1)} AS VARCHAR) || '.' ||
               CAST({_ip_octet_sql(2)} AS VARCHAR) || '.' ||
               CAST({_ip_octet_sql(3)} AS VARCHAR) || '.' ||
               CAST({_ip_octet_sql(4)} AS VARCHAR) AS ip_str
        FROM events
    ),
    cidr(block, base, len) AS (VALUES {", ".join(
        f"('{n}', {b}, {l})" for n, b, l in _CIDR_BLOCKS)})
    SELECT i.event_id, i.ip_str,
           COALESCE({", ".join(
               f"m{l}.block" for l in _CIDR_LENS)}, 'unrouted') AS block,
           CAST(COALESCE({", ".join(
               f"CASE WHEN m{l}.block IS NOT NULL THEN {l} END"
               for l in _CIDR_LENS)}, 0) AS BIGINT) AS prefix_len
    FROM ips i
    {" ".join(
        f"LEFT JOIN (SELECT block, CAST(base AS BIGINT) * 16777216"
        f" // {2 ** (32 - l)}"
        f" AS net, len FROM cidr WHERE len = {l}) m{l}"
        f" ON i.ip // {2 ** (32 - l)} = m{l}.net"
        for l in _CIDR_LENS)}
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parsing + CIDR longest-prefix-match enrichment: each
    event's (md5-planted) source IP is routed to the most specific of
    5 OVERLAPPING network blocks (/1 /2 /3 /8) — the network/geo/ASN
    lookup every access-log pipeline runs. LPM over a bounded set of
    prefix lengths decomposes into one broadcast hash EQUI-join per
    distinct length on the truncated key ip DIV 2^(32-len) (the
    standard trick — never a BETWEEN range join), then a COALESCE
    down the length-descending match columns.

    Scale shape: the fact side is map-only — 4 chained broadcast
    joins against 1-5-row dims, no exchange, no row multiplication,
    no explode; at 100 TB with a real routing table the same plan
    holds (one dim partition per prefix length, each broadcast).
    All-integer arithmetic; the md5-derived octets replay
    bit-for-bit in DuckDB."""
    o = [
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"), F.lit(":ip")
                    ).cast("binary")
                ),
                2 * k - 1,
                2,
            ),
            16,
            10,
        ).cast("bigint")
        for k in (1, 2, 3, 4)
    ]
    ips = spark.table("events").select(
        "event_id",
        (
            o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3]
        ).alias("ip"),
        F.concat_ws(
            ".", *[x.cast("string") for x in o]
        ).alias("ip_str"),
    )
    cidr = values_df(
        spark, list(_CIDR_BLOCKS), "block string, base long, len int"
    )
    out = ips
    for l in _CIDR_LENS:
        dim = (
            cidr.where(F.col("len") == l)
            .select(
                F.col("block").alias(f"block_{l}"),
                (
                    F.col("base")
                    * 16777216
                    / F.lit(2 ** (32 - l)).cast("long")
                )
                .cast("bigint")
                .alias(f"net_{l}"),
            )
        )
        out = out.join(
            F.broadcast(dim),
            (F.col("ip") / F.lit(2 ** (32 - l)).cast("long")).cast(
                "bigint"
            )
            == F.col(f"net_{l}"),
            "left",
        )
    return out.select(
        "event_id",
        "ip_str",
        F.coalesce(
            *[F.col(f"block_{l}") for l in _CIDR_LENS], F.lit("unrouted")
        ).alias("block"),
        F.coalesce(
            *[
                F.when(F.col(f"block_{l}").isNotNull(), F.lit(l))
                for l in _CIDR_LENS
            ],
            F.lit(0),
        )
        .cast("bigint")
        .alias("prefix_len"),
    )
