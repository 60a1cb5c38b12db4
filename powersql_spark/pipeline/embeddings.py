"""Embedding-column operators over the ``embeddings`` table (driver
north-star extension; NOT in the reference — its surface ends at SQL
orchestration, src/execute.rs:101).

Two primitives every vector pipeline needs before ANN search:

- ``emb_centroids``: per-label mean vector — the k-means/IVF "update"
  step and the coarse quantizer that sim_topk_ivf consumes. Computed as
  the distributed columnar reduce: posexplode to (label, pos, val),
  aggregate per (label, pos). The shuffle carries scalar partial sums
  (ncells × dim groups), never whole vectors — at 100 TB the map-side
  combine reduces each partition to ncells × dim values before the
  exchange, so the reduce is O(cells·dim·partitions) regardless of row
  count.
- ``emb_norm_quantize``: per-vector L2 norm + symmetric int8
  quantization stats (scale = 127/max|x|) — the compression pass before
  shipping vectors to an index. Map-only, no shuffle; output inherits
  the input partitioning.

Cross-engine determinism: float32 → DOUBLE is exact on both engines;
sums that feed the value hash go through DECIMAL(18,6) (order-free) and
quantized values use FLOOR (identical semantics; ``round`` half-up vs
half-even would diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.registry import query

_DIM = 64


@query(
    "emb_centroids",
    oracle=f"""
    SELECT label,
           CAST(i - 1 AS INTEGER) AS pos,
           CAST(SUM(CAST(CAST(list_extract(embedding, i) AS DOUBLE)
                         AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS centroid,
           COUNT(*) AS n_vecs
    FROM embeddings, unnest(range(1, {_DIM + 1})) AS u(i)
    GROUP BY label, i
    """,
)
def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding — the centroid/coarse-quantizer update,
    emitted long-form as (label, pos, centroid) so the result is
    hash-comparable without array canonicalization.

    Scale shape: posexplode is map-side; the groupBy(label, pos) gets a
    partial HashAggregate before the exchange, so each partition ships
    at most ncells × dim partial sums — the canonical distributed
    columnar reduce. Reassembling the array (collect_list over pos) is
    a driver-cheap follow-up left to the consumer."""
    e = spark.table("embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ).alias("centroid"),
            F.count("*").alias("n_vecs"),
        )
    )


@query(
    "emb_norm_quantize",
    oracle="""
    WITH d AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, label, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
               list_max(list_transform(v, x -> abs(x))) AS maxabs
        FROM d
    )
    SELECT vec_id, label,
           round(norm, 4) AS l2_norm,
           CAST(list_min(list_transform(v,
                x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))) AS INTEGER)
               AS q_min,
           CAST(list_max(list_transform(v,
                x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))) AS INTEGER)
               AS q_max,
           CAST(list_sum(list_transform(v,
                x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))) AS BIGINT)
               AS q_sum
    FROM s
    """,
)
def emb_norm_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + symmetric int8 quantization stats: scale =
    127/max|x|, q = floor(x·scale). Emits min/max/sum of the quantized
    codes (the checksum an index-build verifies) rather than the int8
    array itself, keeping the row hashable.

    Map-only over the vector column — no shuffle, no UDF; every lambda
    runs as a codegen'd higher-order function. FLOOR (not round) keeps
    Spark and DuckDB bit-identical; float→double is exact on both."""
    e = spark.table("embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = e.select("vec_id", "label", v.alias("v")).select(
        "vec_id",
        "label",
        "v",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm"),
        F.array_max(F.transform("v", F.abs)).alias("maxabs"),
    )
    q = F.transform(
        "v",
        lambda x: F.floor(x * F.lit(127.0) / F.col("maxabs")),
    )
    return d.select(
        "vec_id",
        "label",
        F.round("norm", 4).alias("l2_norm"),
        F.array_min(q).cast("int").alias("q_min"),
        F.array_max(q).cast("int").alias("q_max"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
    )
