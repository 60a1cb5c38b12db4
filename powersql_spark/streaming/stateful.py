"""Custom stateful streaming operator via ``applyInPandasWithState``
(extension; SURVEY.md §2.B.10 — the reference has no streaming).

The pattern this demonstrates is the scale path for any custom
per-key streaming state — running counters, CDC merge, custom session
logic — when built-in window/dedup operators can't express it:
state lives per group in the state store (RocksDB on a real cluster),
updates arrive as Arrow batches, and the grouping shuffle is the only
data movement.

``stateful_user_totals`` is the batch twin (plain groupBy — what the
state converges to over a finite input), DuckDB-verified; the streaming
variant is asserted equal in tests/test_streaming.py.
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from powersql_spark.operators.common import dsum
from powersql_spark.registry import query

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


@query(
    "stateful_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals — batch twin of the stateful streaming
    operator below: over a finite input the converged state IS the
    group aggregate."""
    return (
        spark.table("events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
    )


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per user across micro-batches and emit
    the current totals. State is O(1) per key — the property that lets
    a 1000-executor job hold billions of keys."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def run_streaming_user_totals(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "stream_user_totals",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """True streaming run: readStream -> groupBy(user_id) ->
    applyInPandasWithState -> memory sink (update mode), availableNow
    trigger. Returns the LAST emitted row per user (= converged state).

    ``max_files_per_trigger=1`` over a multi-file input forces multiple
    micro-batches, so the test exercises state persistence across
    batches, not just one pass."""
    from powersql_spark.catalog import read_parquet_stream

    source = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    if max_files_per_trigger is not None:
        # Re-apply the option on the underlying reader path.
        schema = source.schema
        source = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(f"{sf_dir}/events.parquet")
        )
    stream = (
        source
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    checkpoint = tempfile.mkdtemp(prefix="powersql_ckpt_state_")
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Update mode appends one row per (user, micro-batch); keep each
    # user's final emission. The memory sink has no batch column, so
    # the monotone n_events stands in for recency.
    sink = spark.table(table_name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )
