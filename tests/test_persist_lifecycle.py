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
