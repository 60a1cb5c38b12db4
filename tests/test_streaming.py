"""Structured Streaming tests: the streaming variants must agree with
their batch twins (same functions, same semantics — SURVEY.md §2.B.10).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from powersql_spark.catalog import load_tables, read_parquet
from powersql_spark.streaming.windows import run_streaming_tumbling, window_tumbling


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    load_tables(spark, sf_dir, ("events",))
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in window_tumbling(spark, sf_dir).collect()
    }
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in run_streaming_tumbling(spark, sf_dir, "t_stream_eq").collect()
    }
    assert batch == stream


def test_drop_duplicates_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark on a replayed (duplicated) stream:
    every event arrives twice within the watermark window; the streaming
    dedup must collapse them back to the batch distinct count."""
    load_tables(spark, sf_dir, ("events",))
    events = spark.table("events")
    n_distinct = events.select("event_id").distinct().count()

    # Write the events twice into a staging dir to simulate replay.
    staging = tempfile.mkdtemp(prefix="powersql_replay_")
    events.write.mode("overwrite").parquet(staging + "/a")
    dup = staging + "/in"
    events.write.mode("overwrite").parquet(dup)
    spark.read.parquet(staging + "/a").write.mode("append").parquet(dup)

    schema = spark.read.parquet(dup).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(dup)
        .withWatermark("ts", "48 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy()
        .agg(F.count("*").alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="powersql_ckpt_")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_dedup_wm")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_stream = spark.table("t_dedup_wm").collect()[0]["n"]
    assert n_stream == n_distinct


def test_streaming_session_window_equals_batch(spark, sf_dir):
    """session_window under readStream (watermark, availableNow) must
    produce the same sessions as the batch twin."""
    from powersql_spark.catalog import read_parquet_stream
    from powersql_spark.operators.common import dsum
    from powersql_spark.streaming.windows import window_session

    load_tables(spark, sf_dir, ("events",))
    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in window_session(spark, sf_dir).collect()
    }
    stream_df = (
        read_parquet_stream(spark, f"{sf_dir}/events.parquet")
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "total_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )
    ckpt = tempfile.mkdtemp(prefix="powersql_ckpt_sess_")
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_sess_stream")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in spark.table("t_sess_stream").collect()
    }
    assert batch == stream


def test_stateful_user_totals_multi_batch(spark, sf_dir):
    """applyInPandasWithState across several micro-batches must converge
    to the batch groupBy totals: stage events as 4 files, stream them
    one file per trigger, compare final per-user state to batch."""
    import math

    from powersql_spark.streaming.stateful import (
        run_streaming_user_totals,
        stateful_user_totals,
    )

    load_tables(spark, sf_dir, ("events",))
    staging = tempfile.mkdtemp(prefix="powersql_state_")
    spark.table("events").repartition(4).write.mode("overwrite").parquet(
        staging + "/events.parquet"
    )
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in stateful_user_totals(spark, sf_dir).collect()
    }
    stream = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in run_streaming_user_totals(
            spark, staging, "t_state_multi", max_files_per_trigger=1
        ).collect()
    }
    assert set(batch) == set(stream)
    for uid, (n_b, v_b) in batch.items():
        n_s, v_s = stream[uid]
        assert n_s == n_b, f"user {uid}: count {n_s} != {n_b}"
        assert math.isclose(v_s, v_b, rel_tol=1e-9), f"user {uid} totals differ"


def test_streaming_checkpoint_incremental_restart(spark, sf_dir):
    """Exactly-once incremental processing across restarts: run an
    availableNow aggregation to a parquet sink, append NEW input files,
    restart from the SAME checkpoint — the second run must process only
    the new files (no double counting), and the sink must equal the
    batch aggregate over everything seen."""
    load_tables(spark, sf_dir, ("events",))
    events = spark.table("events")
    half_a = events.where(F.col("event_id") % 2 == 0)
    half_b = events.where(F.col("event_id") % 2 == 1)

    root = tempfile.mkdtemp(prefix="powersql_restart_")
    src, sink, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"
    half_a.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_restart")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q.lastProgress

    p1 = run_once()
    counts1 = {r["event_type"]: r["n"] for r in spark.table("t_restart").collect()}
    expect1 = {
        r["event_type"]: r["n"]
        for r in half_a.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert counts1 == expect1

    # Append the second half as new files; restart from the checkpoint.
    half_b.write.mode("append").parquet(src)
    p2 = run_once()
    counts2 = {r["event_type"]: r["n"] for r in spark.table("t_restart").collect()}
    expect_all = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert counts2 == expect_all
    # The restart read strictly fewer rows than the total — it resumed
    # from state instead of reprocessing run 1's files.
    assert p2["numInputRows"] < sum(expect_all.values())
    assert p1["numInputRows"] == sum(expect1.values())


def test_stream_static_join_equals_batch(spark, sf_dir):
    """Stream-static enrichment join: the registered batch twin
    (stream_static_enrich: events x broadcast customer dim) must match
    the same plan run as a readStream with a per-micro-batch dimension
    lookup."""
    from powersql_spark.catalog import read_parquet_stream
    from powersql_spark.registry import all_specs

    load_tables(spark, sf_dir, ("events", "customer"))
    batch = {
        (r["c_mktsegment"], r["event_type"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in all_specs()["stream_static_enrich"].fn(spark, sf_dir).collect()
    }
    cust = spark.table("customer").select("c_custkey", "c_mktsegment")
    stream = (
        read_parquet_stream(spark, f"{sf_dir}/events.parquet")
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="powersql_ckpt_ssj_")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_ssj")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["c_mktsegment"], r["event_type"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.table("t_ssj").collect()
    }
    assert got == batch


def test_foreach_batch_upsert(spark, sf_dir):
    """foreachBatch upsert: merge each micro-batch's per-user aggregate
    into a versioned parquet state table (read current + combine +
    write next version + advance a pointer — the MERGE-less upsert that
    works on plain parquet). Final state must equal the batch aggregate
    over all input, across multiple micro-batches."""
    import os

    load_tables(spark, sf_dir, ("events",))
    events = spark.table("events")
    root = tempfile.mkdtemp(prefix="powersql_upsert_")
    src = f"{root}/in/events.parquet"
    events.repartition(3).write.mode("overwrite").parquet(src)
    state_root, ptr = f"{root}/state", f"{root}/LATEST"

    def current_state():
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return spark.read.parquet(fh.read().strip())

    def upsert(batch_df, batch_id: int):
        agg = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )
        cur = current_state()
        combined = agg if cur is None else (
            cur.unionByName(agg)
            .groupBy("user_id")
            .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
        )
        nxt = f"{state_root}/v{batch_id}"
        combined.write.mode("overwrite").parquet(nxt)
        with open(ptr + ".tmp", "w") as fh:
            fh.write(nxt)
        os.replace(ptr + ".tmp", ptr)  # atomic pointer swap

    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["user_id"]: (r["n"], float(r["v"]))
        for r in current_state().collect()
    }
    expect = {
        r["user_id"]: (r["n"], float(r["v"]))
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )
        .collect()
    }
    assert got == expect


def test_stream_stream_interval_join(spark, sf_dir):
    """Stream-stream inner join with watermarks + a time-interval
    condition (purchase joined to same-user errors in the preceding
    hour). Both sides buffered in state, bounded by the watermark; the
    finite availableNow run must equal the batch join."""
    from powersql_spark.catalog import read_parquet_stream

    load_tables(spark, sf_dir, ("events",))
    e = spark.table("events")
    purchases_b = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    errors_b = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") <= F.col("p_ts"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    batch = {
        (r["p_id"], r["e_id"])
        for r in purchases_b.join(errors_b, cond).select("p_id", "e_id").collect()
    }

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    purchases_s = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    errors_s = (
        read_parquet_stream(spark, f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "2 hours")
    )
    joined = purchases_s.join(errors_s, cond).select("p_id", "e_id")
    ckpt = tempfile.mkdtemp(prefix="powersql_ckpt_ssj2_")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ss_join")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["p_id"], r["e_id"]) for r in spark.table("t_ss_join").collect()
    }
    assert got == batch
    assert len(got) > 0


def test_read_parquet_nanos_column(spark, sf_dir):
    df = read_parquet(spark, f"{sf_dir}/events.parquet")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert df.count() > 0


def test_streaming_windowed_topk_equals_batch(spark, sf_dir):
    """The windowed leaderboard under readStream: the window aggregate
    runs in complete mode, the rank is applied per micro-batch result
    via foreachBatch (append mode cannot rank) — final state must equal
    the batch twin."""
    from pyspark.sql import Window as W

    from powersql_spark.operators.common import dsum
    from powersql_spark.streaming.windows import window_topk_per_window

    load_tables(spark, sf_dir, ("events",))
    batch = {
        (r["window_start"], r["rnk"]): (r["user_id"], r["total_value"])
        for r in window_topk_per_window(spark, sf_dir).collect()
    }

    staging = tempfile.mkdtemp(prefix="powersql_topk_in_")
    spark.table("events").write.mode("overwrite").parquet(staging)
    schema = read_parquet(spark, staging).schema

    result: dict = {}

    def rank_batch(batch_df, batch_id: int) -> None:
        rnk = F.row_number().over(
            W.partitionBy("window_start").orderBy(
                F.desc("total_value"), "user_id"
            )
        )
        result.clear()
        for r in (
            batch_df.select("window_start", rnk.alias("rnk"), "user_id", "total_value")
            .where(F.col("rnk") <= 3)
            .collect()
        ):
            result[(r["window_start"], r["rnk"])] = (
                r["user_id"],
                r["total_value"],
            )

    agg = (
        spark.readStream.schema(schema)
        .parquet(staging)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"), "user_id", "total_value"
        )
    )
    ckpt = tempfile.mkdtemp(prefix="powersql_topk_ckpt_")
    q = (
        agg.writeStream.foreachBatch(rank_batch)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert result == batch


def test_upsert_sink_converges_across_micro_batches(spark, sf_dir):
    """stream_upsert_sink's merge must be split-invariant: running the
    same events through MULTIPLE micro-batches (maxFilesPerTrigger=1
    over a two-file copy) converges to the same sink state as the
    registered single-batch run — per-user last value/ts and total
    event counts identical."""
    import shutil

    from powersql_spark.registry import all_specs
    from powersql_spark.streaming.stateful import (
        _UPSERT_SINK_SCHEMA,
        build_upsert_merge,
    )

    single = {
        r["user_id"]: (r["last_value"], r["last_ts"], r["n_events"])
        for r in all_specs()["stream_upsert_sink"]
        .fn(spark, sf_dir)
        .collect()
    }

    load_tables(spark, sf_dir, ("events",))
    events = spark.table("events")
    staging = tempfile.mkdtemp(prefix="powersql_upsert_in_")
    # Two disjoint files -> maxFilesPerTrigger=1 forces >= 2 batches.
    events.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging + "/in")
    events.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(staging + "/in")

    target = tempfile.mkdtemp(prefix="powersql_upsert_tgt_")
    spark.createDataFrame([], _UPSERT_SINK_SCHEMA).write.mode(
        "overwrite"
    ).parquet(target)
    merge = build_upsert_merge(target)
    batches = []

    def merge_counting(batch, batch_id):
        batches.append(batch_id)
        merge(batch, batch_id)

    ckpt = tempfile.mkdtemp(prefix="powersql_upsert_ckpt_")
    (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging + "/in")
        .writeStream.foreachBatch(merge_counting)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert len(batches) >= 2, "expected multiple micro-batches"
    multi = {
        r["user_id"]: (r["last_value"], r["last_ts"], r["n_events"])
        for r in spark.read.schema(_UPSERT_SINK_SCHEMA)
        .parquet(target)
        .select("user_id", "last_value", "last_ts", "n_events")
        .collect()
    }
    assert multi == single
    shutil.rmtree(staging, ignore_errors=True)


def test_upsert_sink_replay_is_idempotent(spark, sf_dir):
    """foreachBatch may re-deliver a micro-batch after failure with the
    SAME batch_id; the merge must skip it (ADVICE r2: n_events used to
    double-count on replay). Re-applying an already-applied batch_id
    must leave the sink byte-identical; a NEW batch_id still merges."""
    import shutil

    from powersql_spark.streaming.stateful import (
        _UPSERT_SINK_SCHEMA,
        build_upsert_merge,
    )

    load_tables(spark, sf_dir, ("events",))
    events = spark.table("events").limit(200)

    root = tempfile.mkdtemp(prefix="powersql_upsert_replay_")
    target = root + "/target"
    spark.createDataFrame([], _UPSERT_SINK_SCHEMA).write.mode(
        "overwrite"
    ).parquet(target)
    merge = build_upsert_merge(target)

    def snapshot():
        return sorted(
            (r["user_id"], r["last_value"], r["last_ts"], r["n_events"])
            for r in spark.read.schema(_UPSERT_SINK_SCHEMA)
            .parquet(target)
            .collect()
        )

    merge(events, 0)
    after_first = snapshot()
    merge(events, 0)  # replayed delivery: must be a no-op
    assert snapshot() == after_first
    merge(events, 1)  # genuinely new batch: must still apply
    after_second = snapshot()
    assert after_second != after_first
    n_first = {u: n for u, _, _, n in after_first}
    assert all(n == 2 * n_first[u] for u, _, _, n in after_second)
    shutil.rmtree(root, ignore_errors=True)
