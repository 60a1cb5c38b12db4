"""Record linkage — blocked fuzzy matching on entity names (driver
north-star extension; the reference has no analog — its surface ends at
SQL orchestration, src/execute.rs:101).

Entity resolution ("old rod" vs "red rod": same part family, one typo
apart) is a self-join under an edit-distance predicate. Naively that is
O(n^2) string comparisons; the standard fix is BLOCKING: compare only
within groups that any true match must share (here the head noun of the
name — a Levenshtein-<=2 pair of two-word names can disagree on the
short adjective, not the shared noun, in this domain). The join is then
a plain equi-join on the block key with the edit distance as a cheap
post-filter — Catalyst plans it hash-partitioned, never Cartesian.

At 100 TB the entity table (DISTINCT names) is millions of rows, not
corpus-sized, and block width is bounded by the per-noun name variety;
were a block to degenerate, the ``blocks.sub_bucket`` cap used by the
embedding ops applies unchanged. Corpus-scale fuzzy matching is what
the MinHash/SimHash family is for; THIS op is the dimension-table tail.

Both engines implement classic Levenshtein (full DP, unit costs), so
the DuckDB oracle verifies distances bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.catalog import values_df
from powersql_spark.registry import query

_MAX_DIST = 2


@query(
    "join_fuzzy_names",
    oracle=f"""
    WITH names AS (
        SELECT p_name,
               string_split(p_name, ' ')[-1] AS noun,
               COUNT(*) AS n_parts
        FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    """,
)
def join_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-miss part-name pairs within edit distance 2, blocked by
    head noun: the entity-resolution primitive that feeds a merge/
    canonicalize step. Output carries each name's part count so the
    resolver can keep the majority spelling.

    Scale shape: dedupe to the DISTINCT-name entity table FIRST (the
    only corpus-sized work, one hash aggregate), then a hash equi-join
    on the noun block key; ``levenshtein`` runs only on within-block
    pairs as a post-join filter. No Cartesian anywhere — the plan gate
    asserts it."""
    names = (
        spark.table("part")
        .groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .select(
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("noun"),
            "n_parts",
        )
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= _MAX_DIST
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("int")
            .alias("edit_dist"),
            F.col("a.n_parts").alias("n_a"),
            F.col("b.n_parts").alias("n_b"),
        )
    )


# Geospatial: deterministic synthetic coordinates from the customer key
# (integer-derived, exact doubles on both engines), 1-degree grid cells.
_GEO_R_KM = 6371.0088
_GEO_LAT = "(30.0 + (c_custkey * 7919 % 2000) / 100.0)"
_GEO_LON = "(-100.0 + (c_custkey * 104729 % 4000) / 100.0)"
_GEO_RADIUS_KM = 100.0

_HAVERSINE = (
    f"(2 * {_GEO_R_KM} * asin(sqrt("
    "pow(sin(radians(lat_b - lat_a) / 2), 2)"
    " + cos(radians(lat_a)) * cos(radians(lat_b))"
    " * pow(sin(radians(lon_b - lon_a) / 2), 2))))"
)


@query(
    "join_geo_grid",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               {_GEO_LAT} AS lat, {_GEO_LON} AS lon,
               CAST(FLOOR({_GEO_LAT}) AS BIGINT) AS cy,
               CAST(FLOOR({_GEO_LON}) AS BIGINT) AS cx
        FROM customer
    ),
    probe AS (
        SELECT id, lat, lon, cy + dy AS cy, cx + dx AS cx
        FROM pts,
             unnest([-1, 0, 1]) AS u(dy),
             unnest([-1, 0, 1]) AS v(dx)
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               round({_HAVERSINE.replace("lat_a", "a.lat")
                                .replace("lon_a", "a.lon")
                                .replace("lat_b", "b.lat")
                                .replace("lon_b", "b.lon")}, 3) AS km
        FROM probe a JOIN pts b
          ON a.cy = b.cy AND a.cx = b.cx AND a.id < b.id
    )
    SELECT id_a, id_b, km
    FROM pairs WHERE km < {_GEO_RADIUS_KM}
    ORDER BY id_a, id_b
    """,
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial radius join via grid-cell blocking: all point pairs
    within 100 km by haversine distance, where candidates come from a
    1-degree grid — one side probes its 3x3 cell neighborhood (a
    9-way constant fan-out), the other stays put, and the pairing is
    an EQUI-join on the cell key with the exact distance as a
    post-filter. This is THE scale pattern for spatial joins (the
    same block-then-verify shape as dedup blocking): a naive
    distance join is all-pairs, the grid bounds candidates to
    neighbor cells. Coordinates are integer-derived from the customer
    key, so both engines see identical doubles.

    Scale shape: map-only cell assignment, constant 9x fan-out on the
    probe side, cell-keyed equi-join (never cartesian), distance math
    on candidates only; at 100 TB the cell size trades fan-out
    against per-cell density exactly like LSH band tuning. Distances
    round at 3dp before the radius compare so the kept set is
    engine-identical."""
    c = spark.table("customer")
    lat = F.expr(_GEO_LAT)
    lon = F.expr(_GEO_LON)
    pts = c.select(
        F.col("c_custkey").alias("id"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lat).cast("bigint").alias("cy"),
        F.floor(lon).cast("bigint").alias("cx"),
    )
    from powersql_spark.catalog import track_persist

    pts = track_persist(pts)
    offsets = values_df(
        spark,
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        ["dy", "dx"],
    )
    probe = pts.crossJoin(F.broadcast(offsets)).select(
        "id",
        "lat",
        "lon",
        (F.col("cy") + F.col("dy")).alias("cy"),
        (F.col("cx") + F.col("dx")).alias("cx"),
    )
    a = probe.alias("a")
    b = pts.alias("b")
    hav = F.expr(
        _HAVERSINE.replace("lat_a", "a.lat")
        .replace("lon_a", "a.lon")
        .replace("lat_b", "b.lat")
        .replace("lon_b", "b.lon")
    )
    pairs = a.join(
        b,
        (F.col("a.cy") == F.col("b.cy"))
        & (F.col("a.cx") == F.col("b.cx"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(hav, 3).alias("km"),
    )
    return pairs.where(F.col("km") < _GEO_RADIUS_KM).orderBy(
        "id_a", "id_b"
    )
