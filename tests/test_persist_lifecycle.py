"""Persisted-intermediate lifecycle (ADVICE r2): operators that persist
multi-consumer intermediates (MinHash shingles, LSH signatures, SemDeDup
scores) must not leak cached blocks across a 252-key sweep — the next
query invocation releases the previous one's frames. Bench sessions opt
out to keep steady-state cache semantics."""

from __future__ import annotations

from powersql_spark.catalog import release_persisted, track_persist
from powersql_spark.registry import all_specs


def _tracked(spark):
    return list(getattr(spark, "_powersql_persisted", []) or [])


def test_track_persist_registers_and_releases(spark, sf_dir):
    from pyspark.sql import functions as F

    df = track_persist(
        spark.range(100).withColumn("x", F.col("id") * 2)
    )
    assert df.storageLevel.useMemory
    assert df in _tracked(spark)
    release_persisted(spark)
    assert not _tracked(spark)
    assert not df.storageLevel.useMemory


def test_sweep_does_not_accumulate_cached_frames(spark, sf_dir):
    """Run two persist-heavy keys back to back: entering the second
    must release the first's frames, so the tracked set only ever holds
    the CURRENT query's intermediates."""
    specs = all_specs()
    spark._powersql_keep_persisted = False
    try:
        specs["dedup_minhash_lsh"].fn(spark, sf_dir).count()
        first = _tracked(spark)
        assert first, "minhash should track its shingle persist"
        specs["dedup_simhash"].fn(spark, sf_dir).count()
        second = _tracked(spark)
        assert second, "simhash should track its signature persist"
        assert not (set(map(id, first)) & set(map(id, second)))
        for df in first:
            assert not df.storageLevel.useMemory, (
                "previous query's cache leaked across invocations"
            )
    finally:
        release_persisted(spark)


def test_checkpoint_release_is_deferred_one_generation(spark, sf_dir):
    """ADVICE r11: freeing a localCheckpoint makes its frame
    unrecoverable (unlike a cache unpersist), so release_persisted
    must free checkpoint blocks one generation LATE — a driver that
    constructs key B before collecting key A's frame stays safe."""
    from pyspark.sql import functions as F

    from powersql_spark.catalog import track_checkpoint

    release_persisted(spark)
    release_persisted(spark)  # drain both generations

    df = track_checkpoint(
        spark.range(10).withColumn("x", F.col("id") * 2)
    )
    rdd = df._jdf.queryExecution().optimizedPlan().rdd()
    rdd_id = rdd.id()

    def live_ids():
        sc = spark.sparkContext._jsc.sc()
        return {info.id() for info in sc.getRDDStorageInfo()}

    assert rdd_id in live_ids()
    release_persisted(spark)  # "query N+1 starts": blocks survive
    assert rdd_id in live_ids()
    assert df.count() == 10  # frame still collectible after release
    release_persisted(spark)  # "query N+2 starts": now freed
    assert rdd_id not in live_ids()
    assert not getattr(spark, "_powersql_checkpointed_prev")


def test_reliable_checkpoint_switch(spark, sf_dir, tmp_path):
    """The cluster-deployment switch documented in
    catalog.track_checkpoint is real: set_checkpoint_mode("reliable")
    reroutes EVERY iterative operator through reliable checkpoint()
    files under setCheckpointDir, and an iterative key produces
    identical results in both modes."""
    import os

    import powersql_spark.catalog as cat
    from powersql_spark.registry import all_specs

    # label propagation routes every round's state through
    # track_checkpoint (pagerank is a declarative unroll and never
    # checkpoints — it would not exercise the switch)
    spec = all_specs()["graph_label_propagation"]
    local_rows = sorted(map(tuple, spec.fn(spark, sf_dir).collect()))

    ckpt_dir = str(tmp_path / "reliable_ckpt")
    cat.set_checkpoint_mode("reliable", spark, ckpt_dir)
    try:
        reliable_rows = sorted(
            map(tuple, spec.fn(spark, sf_dir).collect())
        )
        # reliable checkpoint() materialized files under the dir
        staged = [
            os.path.join(root, f)
            for root, _, files in os.walk(ckpt_dir)
            for f in files
        ]
        assert staged, "reliable mode wrote no checkpoint files"
    finally:
        cat.set_checkpoint_mode("local")
        release_persisted(spark)
        release_persisted(spark)

    assert reliable_rows == local_rows


def test_reliable_checkpoint_files_reclaimed(spark, sf_dir, tmp_path):
    """ADVICE r12: in reliable mode the durable checkpoint FILES must
    be deleted when their generation is released, not just the RDD
    blocks — a long sweep must not accumulate unbounded files under
    the checkpoint dir."""
    import os

    import powersql_spark.catalog as cat
    from pyspark.sql import functions as F
    from powersql_spark.catalog import track_checkpoint

    release_persisted(spark)
    release_persisted(spark)  # drain both generations

    ckpt_dir = str(tmp_path / "reliable_reclaim")
    cat.set_checkpoint_mode("reliable", spark, ckpt_dir)
    try:
        df = track_checkpoint(
            spark.range(10).withColumn("x", F.col("id") * 3)
        )
        rdd = df._jdf.queryExecution().optimizedPlan().rdd()
        ckpt_file = rdd.getCheckpointFile()
        assert ckpt_file.isDefined(), "reliable checkpoint has no file"
        path = ckpt_file.get().replace("file:", "")
        assert os.path.exists(path)
        release_persisted(spark)  # generation N+1: files survive
        assert os.path.exists(path)
        assert df.count() == 10
        release_persisted(spark)  # generation N+2: files reclaimed
        assert not os.path.exists(path), (
            "reliable checkpoint files leaked after release"
        )
    finally:
        cat.set_checkpoint_mode("local")
        release_persisted(spark)
        release_persisted(spark)


def test_tracked_tempdir_deferred_cleanup(spark, sf_dir, tmp_path):
    """ADVICE r12: stream_upsert_sink-style staging dirs registered via
    track_tempdir are rmtree'd one generation late — the returned frame
    (which reads the staged parquet lazily) stays collectible across
    the next key's construction, then the dir is reclaimed."""
    import os

    from powersql_spark.catalog import track_tempdir

    release_persisted(spark)
    release_persisted(spark)  # drain both generations

    stage = str(tmp_path / "stage_a")
    os.makedirs(stage)
    spark.range(5).write.mode("overwrite").parquet(
        os.path.join(stage, "t")
    )
    track_tempdir(spark, stage)
    release_persisted(spark)  # "query N+1 starts": dir survives
    assert os.path.exists(stage)
    assert spark.read.parquet(os.path.join(stage, "t")).count() == 5
    release_persisted(spark)  # "query N+2 starts": now reclaimed
    assert not os.path.exists(stage)
    assert not getattr(spark, "_powersql_tmpdirs_prev")


def test_stream_upsert_sink_registers_stage_dir(spark, sf_dir):
    """The real operator wires its mkdtemp stage through track_tempdir
    and the returned frame still collects before cleanup."""
    import os

    specs = all_specs()
    release_persisted(spark)
    release_persisted(spark)
    df = specs["stream_upsert_sink"].fn(spark, sf_dir)
    reg = list(getattr(spark, "_powersql_tmpdirs", []) or [])
    assert reg, "stream_upsert_sink did not register its stage dir"
    stage = reg[-1]
    assert os.path.exists(stage)
    assert df.count() > 0
    release_persisted(spark)
    release_persisted(spark)
    assert not os.path.exists(stage)


def test_keep_persisted_opt_out(spark, sf_dir):
    """Bench sessions set _powersql_keep_persisted: release becomes a
    no-op so warmup-pass caches survive into the timed pass."""
    from pyspark.sql import functions as F

    df = track_persist(spark.range(50).withColumn("y", F.col("id") + 1))
    spark._powersql_keep_persisted = True
    try:
        release_persisted(spark)
        assert df.storageLevel.useMemory
    finally:
        spark._powersql_keep_persisted = False
        release_persisted(spark)
        assert not df.storageLevel.useMemory
