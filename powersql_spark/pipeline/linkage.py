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
