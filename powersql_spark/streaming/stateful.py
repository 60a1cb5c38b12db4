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


_UPSERT_KEY = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 10, '0')"
)


# The sink carries the composite upsert key so cross-batch ties on ts
# alone (same second, different events) still merge deterministically
# by (ts, event_id).
_UPSERT_SINK_SCHEMA = (
    "user_id bigint, last_value double, last_ts timestamp,"
    " n_events bigint, last_key string"
)


def build_upsert_merge(target: str):
    """foreachBatch body: reduce the micro-batch to its latest row per
    user, full-outer merge into the keyed parquet sink preferring the
    newer (ts, event_id) key, accumulate event counts. Shared by the
    registered operator and the multi-batch convergence test.

    Replay safety: ``last_value``/``last_ts`` merge by max-key, so they
    are idempotent under foreachBatch replay; ``n_events`` accumulates,
    so a re-delivered batch_id would double-count. Each applied
    batch_id is therefore recorded in a marker directory beside the
    sink and re-deliveries are skipped. The marker lands *after* the
    sink rewrite, leaving the standard non-transactional-sink window (a
    crash between rewrite and marker replays one batch); a production
    deployment closes it by pointing the same foreachBatch at a
    MERGE-capable table format that commits data + batch watermark
    atomically."""
    import os

    applied_dir = target.rstrip("/") + "_applied"
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(applied_dir, f"{batch_id}.done")
        if os.path.exists(marker):
            return  # replayed micro-batch: already merged into the sink
        sess = batch.sparkSession
        delta = batch.groupBy("user_id").agg(
            F.max_by("value", key).alias("last_value"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(key).alias("last_key"),
        )
        cur = sess.read.schema(_UPSERT_SINK_SCHEMA).parquet(target)
        t_wins = F.col("d.last_key").isNull() | (
            F.col("t.last_key") > F.col("d.last_key")
        )
        merged = (
            cur.alias("t")
            .join(delta.alias("d"), "user_id", "full_outer")
            .select(
                "user_id",
                F.when(t_wins, F.col("t.last_value"))
                .otherwise(F.col("d.last_value"))
                .alias("last_value"),
                F.when(t_wins, F.col("t.last_ts"))
                .otherwise(F.col("d.last_ts"))
                .alias("last_ts"),
                (
                    F.coalesce("t.n_events", F.lit(0))
                    + F.coalesce("d.n_events", F.lit(0))
                ).alias("n_events"),
                F.when(t_wins, F.col("t.last_key"))
                .otherwise(F.col("d.last_key"))
                .alias("last_key"),
            )
            .localCheckpoint(eager=True)  # sever lineage: target is
        )  # both the read source and the overwrite destination
        merged.write.mode("overwrite").parquet(target)
        os.makedirs(applied_dir, exist_ok=True)
        with open(marker, "w"):
            pass

    return _merge


@query(
    "stream_upsert_sink",
    oracle=f"""
    SELECT user_id,
           arg_max(value, {_UPSERT_KEY}) AS last_value,
           max(ts) AS last_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE into a keyed parquet sink via foreachBatch — the
    effectively-once CDC-apply pattern (batch-id markers skip replayed
    micro-batches; see :func:`build_upsert_merge`): each micro-batch
    reduces to its
    latest row per user (max (ts, event_id), zero-padded so ties break
    identically on both engines), then upserts into the target by
    full-outer merge preferring the newer key; event counts accumulate
    across batches. This key runs REAL Structured Streaming
    (readStream + availableNow + foreachBatch), not a batch twin; the
    converged sink state is deterministic regardless of how the input
    splits into micro-batches (merge is associative), which is what
    makes it oracle-checkable.

    Scale shape: per-batch reduction is delta-sized; the merge join is
    keyed (AQE broadcasts the delta side); the sink rewrite is the
    documented COW trade — a real deployment points the same
    foreachBatch at a MERGE-capable table format."""
    import os
    import shutil

    # Per-invocation staging dir: a fixed shared path raced when two
    # sessions ran this key concurrently (one rmtree'd the other's live
    # checkpoint). The target parquet must OUTLIVE this call — the
    # returned frame reads it lazily — so only the checkpoint dir is
    # cleaned up after termination; the stage dir itself is registered
    # for deferred cleanup (ADVICE r12): release_persisted rmtree's it
    # one generation LATE, the same discipline as checkpoint blocks, so
    # a long sweep holds at most two keys' staging on disk instead of
    # accumulating dirs until the OS tmp reaper runs.
    stage = tempfile.mkdtemp(prefix="powersql_stream_upsert_")
    target = os.path.join(stage, "target")
    ckpt = os.path.join(stage, "ckpt")
    os.makedirs(target, exist_ok=True)

    from powersql_spark.catalog import read_parquet_stream, track_tempdir

    track_tempdir(spark, stage)

    empty = spark.createDataFrame([], _UPSERT_SINK_SCHEMA)
    empty.write.mode("overwrite").parquet(target)
    _merge = build_upsert_merge(target)

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.read.schema(_UPSERT_SINK_SCHEMA)
        .parquet(target)
        .select("user_id", "last_value", "last_ts", "n_events")
    )
