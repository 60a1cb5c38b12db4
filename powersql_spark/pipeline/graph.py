"""Graph analytics over relational edges (driver north-star extension;
NOT in the reference — its surface ends at SQL orchestration,
src/execute.rs:101; iterative graph propagation also appears in
pipeline/dedup.py dedup_connected_components).

``graph_pagerank`` demonstrates the Spark-native shape for
fixed-iteration graph algorithms: build the edge list ONCE from the
fact tables (the expensive, data-sized step), aggregate it to a
weighted adjacency whose size is O(nodes^2) — metadata-sized for a
dimension graph — then run the iterations as unrolled join+aggregate
rounds on that small table. No driver-side loop state, no RDDs; each
iteration is one broadcast join + one aggregation, and with a fixed
iteration count the whole computation is a single Catalyst plan the
DuckDB oracle can mirror CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.registry import query

_DAMPING = 0.85
_N_ITER = 3


@query(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS (
        SELECT cn.n_nationkey AS src, sn.n_nationkey AS dst,
               COUNT(*) AS w
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        GROUP BY cn.n_nationkey, sn.n_nationkey
    ),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    n AS (SELECT COUNT(*) AS cnt FROM nodes),
    trans AS (
        SELECT src, dst,
               CAST(w AS DOUBLE)
                   / SUM(CAST(w AS DOUBLE)) OVER (PARTITION BY src) AS p
        FROM edges
    ),
    pr0 AS (SELECT node, 1.0 / n.cnt AS pr FROM nodes, n),
    pr1 AS (
        SELECT nodes.node,
               (1 - {_DAMPING}) / ANY_VALUE(n.cnt)
               + {_DAMPING} * COALESCE(SUM(pr0.pr * trans.p), 0) AS pr
        FROM nodes CROSS JOIN n
        LEFT JOIN trans ON trans.dst = nodes.node
        LEFT JOIN pr0 ON pr0.node = trans.src
        GROUP BY nodes.node
    ),
    pr2 AS (
        SELECT nodes.node,
               (1 - {_DAMPING}) / ANY_VALUE(n.cnt)
               + {_DAMPING} * COALESCE(SUM(pr1.pr * trans.p), 0) AS pr
        FROM nodes CROSS JOIN n
        LEFT JOIN trans ON trans.dst = nodes.node
        LEFT JOIN pr1 ON pr1.node = trans.src
        GROUP BY nodes.node
    ),
    pr3 AS (
        SELECT nodes.node,
               (1 - {_DAMPING}) / ANY_VALUE(n.cnt)
               + {_DAMPING} * COALESCE(SUM(pr2.pr * trans.p), 0) AS pr
        FROM nodes CROSS JOIN n
        LEFT JOIN trans ON trans.dst = nodes.node
        LEFT JOIN pr2 ON pr2.node = trans.src
        GROUP BY nodes.node
    )
    SELECT node AS n_nationkey, round(pr, 6) AS pagerank
    FROM pr3
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the trade graph (customer nation -> supplier
    nation, edge weight = lineitem count), 3 fixed iterations,
    damping 0.85. The simple variant: dangling mass is not
    redistributed (every nation has out-edges in this graph).

    Scale shape: the edge build is the only fact-sized work — a
    broadcast-dimension join tree and one aggregation to O(nodes^2)
    weighted edges. The iterations run on that aggregate: each is a
    join of the 25-row rank vector (broadcast) against the edge table
    + one grouped sum — constant cost regardless of corpus size, and
    unrolling a FIXED count keeps it one declarative plan (the
    convergence-loop variant is dedup_connected_components' shape).
    Rounded to 6dp: per-node inbound sums are ~25 doubles whose
    addition order differs between engines."""
    li = spark.table("lineitem").select("l_orderkey", "l_suppkey")
    o = spark.table("orders").select("o_orderkey", "o_custkey")
    c = F.broadcast(
        spark.table("customer").select("c_custkey", "c_nationkey")
    )
    s = F.broadcast(
        spark.table("supplier").select("s_suppkey", "s_nationkey")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = spark.table("nation").select(
        F.col("n_nationkey").alias("node")
    )
    # Dimension cardinality: metadata, not data (guarded for the
    # empty-input sweep — zero nodes means zero output rows anyway).
    n_nodes = nodes.count() or 1
    from pyspark.sql import Window

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
    # The unrolled iterations each reference `trans`; without a cache
    # the plan embeds the fact-sized edge build once PER iteration
    # (exchange reuse is best-effort, not guaranteed under AQE
    # replanning). The transition matrix is O(nodes^2) — 625 rows
    # here, tiny at any corpus scale — so persist it: the edge build
    # runs once and the iteration joins read the cached rows.
    from powersql_spark.catalog import track_persist

    trans = track_persist(trans)
    pr = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(_N_ITER):
        contrib = (
            trans.join(
                F.broadcast(pr.withColumnRenamed("node", "src")), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("inbound"))
        )
        pr = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit((1 - _DAMPING) / n_nodes)
                + _DAMPING * F.coalesce("inbound", F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select(
        F.col("node").alias("n_nationkey"),
        F.round("pr", 6).alias("pagerank"),
    )
