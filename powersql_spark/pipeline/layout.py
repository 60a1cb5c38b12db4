"""Multi-dimensional data layout — Z-order clustering (driver
north-star extension; the reference has no analog — its surface ends at
SQL orchestration, src/execute.rs:101).

At 100 TB a table is pruned or it is scanned: partition pruning handles
ONE dimension, but real workloads filter lineitem on quantity one day
and price the next. Z-ordering (Morton curve) interleaves the bits of
several quantized dimensions into one sort key, so RANGE-partitioning /
sorting by the z-value makes every file a small axis-aligned rectangle
in the original space — min/max footer stats then prune scans on ANY of
the interleaved dimensions (the Delta Lake / Iceberg `OPTIMIZE ZORDER
BY` idea, rebuilt from first principles).

The whole computation is integer arithmetic (quantize -> interleave ->
bucket) built from the same Python loop for both engines, so the DuckDB
oracle verifies the curve bit-for-bit. Nothing here is a UDF; the
z-value is whole-stage-codegen arithmetic and the layout action is
``repartitionByRange(z).sortWithinPartitions(z)`` at write time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import sql_jround
from powersql_spark.registry import query

_BITS = 8  # bits per dimension: 2 dims -> 16-bit z-value
_BUCKET_SHIFT = 10  # keep top 6 z-bits -> 64 buckets (files, at scale)


def _quant(col: Column, lo: Column, hi: Column) -> Column:
    """Quantize a double into [0, 2^_BITS - 1] by min/max scaling —
    FLOOR on both engines (half-even vs half-up rounding never enters)."""
    scaled = (col - lo) / (hi - lo) * float(1 << _BITS)
    return F.least(
        F.floor(scaled).cast("long"), F.lit((1 << _BITS) - 1)
    )


def _interleave(qa: Column, qb: Column) -> Column:
    """Morton interleave: bit i of each dim lands at 2i+1 / 2i."""
    z = F.lit(0).cast("long")
    for i in range(_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(qa, i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(qb, i).bitwiseAND(1), 2 * i)
        )
    return z


def _interleave_sql(qa: str, qb: str) -> str:
    """The identical Morton interleave as DuckDB SQL text."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({qa} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qb} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


_Q = (
    f"LEAST(CAST(FLOOR((l_quantity - lo_q) / (hi_q - lo_q) * {1 << _BITS})"
    f" AS BIGINT), {(1 << _BITS) - 1})"
)
_P = (
    f"LEAST(CAST(FLOOR((l_extendedprice - lo_p) / (hi_p - lo_p)"
    f" * {1 << _BITS}) AS BIGINT), {(1 << _BITS) - 1})"
)


@query(
    "layout_zorder",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(l_quantity) AS lo_q, MAX(l_quantity) AS hi_q,
               MIN(l_extendedprice) AS lo_p, MAX(l_extendedprice) AS hi_p
        FROM lineitem
    ),
    quant AS (
        SELECT {_Q} AS qa, {_P} AS qb
        FROM lineitem, bounds
    ),
    z AS (
        SELECT ({_interleave_sql("qa", "qb")}) >> {_BUCKET_SHIFT}
                   AS z_bucket,
               qa, qb
        FROM quant
    )
    SELECT z_bucket,
           COUNT(*) AS n_rows,
           MIN(qa) AS min_qty_cell, MAX(qa) AS max_qty_cell,
           MIN(qb) AS min_price_cell, MAX(qb) AS max_price_cell
    FROM z
    GROUP BY z_bucket
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem on (quantity, extendedprice) and report, per
    target file (z-bucket), the rectangle of quantized cells it covers —
    the min/max footer stats a pruning scan would consult. The
    semantics gate (tests/test_semantics.py) asserts the payoff: a
    selective predicate on EITHER dimension overlaps only a small
    fraction of buckets, which is precisely the fraction of files a
    100 TB scan would read.

    Scale shape: the (min, max) bounds row broadcasts into a linear
    quantize+interleave pass (pure codegen arithmetic); the per-bucket
    rollup partial-aggregates to at most 64 rows per partition before
    one exchange. The write-side action this models is
    ``df.repartitionByRange(n_files, z).sortWithinPartitions(z)`` —
    same key, same plan, plus the parquet sink."""
    li = spark.table("lineitem")
    bounds = li.agg(
        F.min("l_quantity").alias("lo_q"),
        F.max("l_quantity").alias("hi_q"),
        F.min("l_extendedprice").alias("lo_p"),
        F.max("l_extendedprice").alias("hi_p"),
    )
    quant = li.join(F.broadcast(bounds)).select(
        _quant(F.col("l_quantity"), F.col("lo_q"), F.col("hi_q")).alias(
            "qa"
        ),
        _quant(
            F.col("l_extendedprice"), F.col("lo_p"), F.col("hi_p")
        ).alias("qb"),
    )
    z = quant.select(
        # One F.expr over the SAME interleave text the oracle uses (one
        # py4j call) instead of the 64-call Column-op tree _interleave
        # builds — identical integer expression, cheaper plan build
        # (wave-1 plan-literal discipline; _interleave itself stays for
        # the bijectivity tests).
        F.shiftright(
            F.expr(f"({_interleave_sql('qa', 'qb')})"), _BUCKET_SHIFT
        ).alias("z_bucket"),
        "qa",
        "qb",
    )
    return z.groupBy("z_bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("qa").alias("min_qty_cell"),
        F.max("qa").alias("max_qty_cell"),
        F.min("qb").alias("min_price_cell"),
        F.max("qb").alias("max_price_cell"),
    )


_COMPACT_TARGET = 4000  # target bin size (chars standing in for bytes)


@query(
    "layout_compaction_bins",
    oracle=f"""
    WITH files AS (
        SELECT source, doc_id, n_chars,
               COALESCE(SUM(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM documents
    )
    SELECT source,
           CAST(cum_before // {_COMPACT_TARGET} AS BIGINT) AS bin,
           COUNT(*) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes
    FROM files
    GROUP BY source, bin
    """,
)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/rewrite_data_files
    maintenance step every parquet lake needs): treat each doc as a
    file of n_chars bytes, pack files per source into ~4 KB target
    bins by running-total assignment — bin = floor(bytes_before /
    target) over the deterministic (doc_id) order. Emits the plan
    (bin -> file count + size) a compactor would execute.

    Scale shape: one window per source partition computes the running
    total (single exchange on source, no driver loop, no sort beyond
    the per-partition window order); integer arithmetic end-to-end so
    both engines agree exactly. The real compactor reads each bin's
    files and writes one output file per bin — work proportional to
    the small-file debt, not the table."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    files = spark.table("documents").select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        files.select(
            "source",
            F.floor(F.col("cum_before") / _COMPACT_TARGET).alias("bin"),
            "n_chars",
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").alias("total_bytes"),
        )
    )


def _hilbert_steps():
    """Step sizes of the xy2d walk, coarse to fine."""
    return [1 << i for i in range(_BITS - 1, -1, -1)]


def _hilbert_sql(qa: str, qb: str, dialect: str = "duckdb") -> str:
    """Staged-CTE Hilbert index (the standard public-domain xy2d
    walk): each stage consumes (x, y, d) from the previous, adds the
    quadrant term, and applies the reflect+swap rotation. The SAME
    generator emits both engines' text (only star-exclusion and xor
    spellings differ), so the Spark plan and the DuckDB oracle replay
    the identical walk by construction."""
    if dialect == "duckdb":
        exclude = "* EXCLUDE (x, y, d)"

        def xor(a: str, b: str) -> str:
            return f"xor({a}, {b})"

    else:  # spark
        exclude = "* EXCEPT(x, y, d)"

        def xor(a: str, b: str) -> str:
            return f"(({a}) ^ ({b}))"

    stages = [
        f"h0 AS (SELECT *, {qa} AS x, {qb} AS y, CAST(0 AS BIGINT) AS d"
        " FROM quant)"
    ]
    for k, s in enumerate(_hilbert_steps(), start=1):
        p = f"h{k - 1}"
        quadrant = xor(
            f"3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)",
            f"CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END",
        )
        stages.append(
            f"h{k} AS (SELECT {exclude},"
            f" CASE WHEN (y & {s}) = 0 THEN"
            f"   CASE WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END"
            f" ELSE x END AS x,"
            f" CASE WHEN (y & {s}) = 0 THEN"
            f"   CASE WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END"
            f" ELSE y END AS y,"
            f" d + {s} * {s} * {quadrant} AS d"
            f" FROM {p})"
        )
    return ",\n    ".join(stages)


@query(
    "layout_hilbert",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(l_quantity) AS lo_q, MAX(l_quantity) AS hi_q,
               MIN(l_extendedprice) AS lo_p, MAX(l_extendedprice) AS hi_p
        FROM lineitem
    ),
    quant AS (
        SELECT {_Q} AS qa, {_P} AS qb
        FROM lineitem, bounds
    ),
    {_hilbert_sql("qa", "qb")}
    SELECT d >> {_BUCKET_SHIFT} AS h_bucket,
           COUNT(*) AS n_rows,
           MIN(qa) AS min_qty_cell, MAX(qa) AS max_qty_cell,
           MIN(qb) AS min_price_cell, MAX(qb) AS max_price_cell
    FROM h{_BITS}
    GROUP BY h_bucket
    """,
)
def layout_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve data layout over (quantity, price) — the
    space-filling clustering Delta/Iceberg offer beside Z-order
    (`OPTIMIZE ... HILBERT`): quantize each dimension to 8-bit cells,
    map the cell to its Hilbert index with the standard xy2d rotation
    walk, bucket the top bits. Hilbert beats Morton on locality — the
    curve never jumps, so a file (bucket) covers one contiguous blob
    of the grid instead of Morton's split quadrant seams (better
    min/max pruning at the same file count).

    Spark shape: identical to layout_zorder — pure integer codegen
    arithmetic, map-only until the per-bucket rollup; the 8 rotation
    steps are staged CTEs in ONE ``spark.sql`` call (each stage's
    (x, y, d) are named columns, not exponentially nested
    expressions), generated by the SAME ``_hilbert_sql`` builder the
    DuckDB oracle uses. One call means Catalyst analyzes the chain
    once — the previous per-step withColumns form re-analyzed the
    growing 17-layer plan 18 times, which dominated the query's cost
    (measured: build 1.09 s -> 0.16 s, identical 64-row output).
    Bijectivity on the full 256x256 grid and the python xy2d mirror
    are pinned in tests."""
    li = spark.table("lineitem")
    sql = f"""
    WITH bounds AS (
        SELECT /*+ BROADCAST */ MIN(l_quantity) AS lo_q,
               MAX(l_quantity) AS hi_q,
               MIN(l_extendedprice) AS lo_p,
               MAX(l_extendedprice) AS hi_p
        FROM {{li}}
    ),
    quant AS (
        SELECT {_Q} AS qa, {_P} AS qb
        FROM {{li}} CROSS JOIN bounds
    ),
    {_hilbert_sql("qa", "qb", dialect="spark")}
    SELECT d >> {_BUCKET_SHIFT} AS h_bucket,
           COUNT(*) AS n_rows,
           MIN(qa) AS min_qty_cell, MAX(qa) AS max_qty_cell,
           MIN(qb) AS min_price_cell, MAX(qb) AS max_price_cell
    FROM h{_BITS}
    GROUP BY h_bucket
    """
    return spark.sql(sql, li=li)


_ZM_FILES = 32
_ZM_LO = "1997-03-01"
_ZM_HI = "1997-03-31"


@query(
    "layout_zone_map_pruning",
    oracle=f"""
    WITH assigned AS (
        SELECT l_shipdate,
               l_shipdate >= TIMESTAMP '{_ZM_LO} 00:00:00'
                   AND l_shipdate < TIMESTAMP '{_ZM_HI} 00:00:00'
                       + INTERVAL 1 DAY AS hit,
               NTILE({_ZM_FILES}) OVER (ORDER BY l_shipdate,
                   l_orderkey, l_linenumber) AS f_clustered,
               l_orderkey % {_ZM_FILES} AS f_unclustered
        FROM lineitem
    ),
    files AS (
        SELECT layout, file_id,
               MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi,
               COUNT(*) AS n_rows,
               COUNT(CASE WHEN hit THEN 1 END) AS n_hits
        FROM (
            SELECT 'clustered' AS layout, f_clustered AS file_id, *
            FROM assigned
            UNION ALL
            SELECT 'unclustered' AS layout, f_unclustered AS file_id, *
            FROM assigned
        )
        GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(COUNT(CASE WHEN hi < TIMESTAMP '{_ZM_LO} 00:00:00'
                    OR lo >= TIMESTAMP '{_ZM_HI} 00:00:00'
                        + INTERVAL 1 DAY
                    THEN 1 END) AS BIGINT) AS n_pruned,
           CAST(SUM(CASE WHEN NOT (hi < TIMESTAMP '{_ZM_LO} 00:00:00'
                    OR lo >= TIMESTAMP '{_ZM_HI} 00:00:00'
                        + INTERVAL 1 DAY)
                    THEN n_rows ELSE 0 END) AS BIGINT) AS scanned_rows,
           CAST(SUM(n_hits) AS BIGINT) AS matching_rows,
           {sql_jround(
               f"COUNT(CASE WHEN hi < TIMESTAMP '{_ZM_LO} 00:00:00'"
               f" OR lo >= TIMESTAMP '{_ZM_HI} 00:00:00'"
               f" + INTERVAL 1 DAY THEN 1 END)"
               f" / CAST(COUNT(*) AS DOUBLE)", 4)} AS prune_frac,
           CASE WHEN SUM(n_hits) > 0 THEN
               {sql_jround(
                   f"SUM(CASE WHEN NOT (hi <"
                   f" TIMESTAMP '{_ZM_LO} 00:00:00'"
                   f" OR lo >= TIMESTAMP '{_ZM_HI} 00:00:00'"
                   f" + INTERVAL 1 DAY)"
                   f" THEN n_rows ELSE 0 END)"
                   f" / CAST(SUM(n_hits) AS DOUBLE)", 4)} END
               AS scan_amplification
    FROM files
    GROUP BY layout
    ORDER BY layout
    """,
)
def layout_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max footer) pruning effectiveness, clustered vs
    unclustered: assign rows to 32 simulated files under (a) a
    shipdate-sorted layout — what ``repartitionByRange(32, shipdate)
    .sortWithinPartitions`` writes — and (b) an orderkey-hash layout,
    build each file's shipdate zone map, and report how many files a
    one-month predicate can skip, the rows actually scanned, and the
    scan amplification (scanned / matching). THE quantified argument
    for sort-on-write at 100 TB: the clustered layout prunes ~97% of
    files, the hash layout ~0%.

    Scale shape: one pass computes both assignments; per-(layout,
    file) zone maps are map-side-combinable min/max/count partials
    (64 groups); the verdict is arithmetic over that constant table.
    The NTILE models the sorted writer's range partitioner — the
    production write pays that range shuffle once, every subsequent
    scan collects the pruning dividend."""
    li = spark.table("lineitem")
    lo = F.lit(_ZM_LO).cast("timestamp")
    hi_excl = F.date_add(F.lit(_ZM_HI).cast("date"), 1).cast("timestamp")
    assigned = li.select(
        "l_shipdate",
        (
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi_excl)
        ).alias("hit"),
        F.ntile(_ZM_FILES)
        .over(Window.orderBy("l_shipdate", "l_orderkey", "l_linenumber"))
        .alias("f_clustered"),
        (F.col("l_orderkey") % _ZM_FILES).alias("f_unclustered"),
    )
    both = assigned.select(
        F.lit("clustered").alias("layout"),
        F.col("f_clustered").alias("file_id"),
        "l_shipdate",
        "hit",
    ).unionAll(
        assigned.select(
            F.lit("unclustered").alias("layout"),
            F.col("f_unclustered").alias("file_id"),
            "l_shipdate",
            "hit",
        )
    )
    files = both.groupBy("layout", "file_id").agg(
        F.min("l_shipdate").alias("lo"),
        F.max("l_shipdate").alias("hi"),
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("hit"), 1)).alias("n_hits"),
    )
    pruned = (F.col("hi") < lo) | (F.col("lo") >= hi_excl)
    return (
        files.groupBy("layout")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.count(F.when(pruned, 1)).cast("bigint").alias("n_pruned"),
            F.sum(F.when(~pruned, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("scanned_rows"),
            F.sum("n_hits").cast("bigint").alias("matching_rows"),
            F.round(
                F.count(F.when(pruned, 1)) / F.count("*").cast("double"),
                4,
            ).alias("prune_frac"),
            F.when(
                F.sum("n_hits") > 0,
                F.round(
                    F.sum(F.when(~pruned, F.col("n_rows")).otherwise(0))
                    / F.sum("n_hits").cast("double"),
                    4,
                ),
            ).alias("scan_amplification"),
        )
        .orderBy("layout")
    )
