"""Physical-plan health gates.

Correctness tests prove the answers; these prove the PLANS are the ones
that survive a 100x scale-up. Each assertion encodes a scale property
claimed in README "Scale design" / the operator docstrings:

- dimension joins broadcast (no shuffle of the small side);
- no accidental cartesian product / nested-loop join anywhere in the
  TPC-H suite (a BNLJ that is tolerable at sf0.01 is a cluster-killer
  at 100 TB);
- ORDER BY + LIMIT plans as TakeOrderedAndProject (top-k), never a
  global sort;
- date/segment filters reach the parquet scan (PushedFilters);
- decorrelated rewrites really do scan the fact table once (q21);
- scans prune columns (lineitem has 11 columns; Q6 needs 4).

If Catalyst's planning changes under us (version bump, config drift),
these fail loudly instead of silently regressing the bench.
"""

from __future__ import annotations

import re

import pytest

from powersql_spark.registry import all_specs

SPECS = all_specs()


def plan_of(spark, sf_dir, key: str) -> str:
    df = SPECS[key].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


TPCH_KEYS = sorted(k for k in SPECS if k.startswith("tpch_"))

# Scalar-subquery pattern: a single-row aggregate (the HAVING threshold /
# the average balance) joined with no key. That plans as a broadcast
# nested-loop of exactly ONE row — constant work per partition, fine at
# any scale. Everything else must be hash-joinable.
SCALAR_BROADCAST_OK = {"tpch_q11", "tpch_q22"}


@pytest.mark.parametrize("key", TPCH_KEYS)
def test_no_cartesian_or_nested_loop(spark, sf_dir, key):
    plan = plan_of(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, f"{key} plans a cartesian product"
    if key not in SCALAR_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{key} plans a BNLJ"
    else:
        assert plan.count("BroadcastNestedLoopJoin") <= 1


@pytest.mark.parametrize(
    "key", ["tpch_q3", "tpch_q5", "tpch_q9", "tpch_q10", "tpch_q19"]
)
def test_dimensions_broadcast(spark, sf_dir, key):
    plan = plan_of(spark, sf_dir, key)
    assert "BroadcastHashJoin" in plan, f"{key}: no broadcast join in plan"


@pytest.mark.parametrize("key", ["tpch_q3", "tpch_q10", "tpch_q18"])
def test_topk_never_global_sort(spark, sf_dir, key):
    plan = plan_of(spark, sf_dir, key)
    assert "TakeOrderedAndProject" in plan, (
        f"{key}: ORDER BY+LIMIT did not plan as top-k"
    )


@pytest.mark.parametrize(
    "key,pushed",
    [
        ("tpch_q6", "l_shipdate"),
        ("tpch_q3", "c_mktsegment"),
        ("tpch_q19", "p_brand"),
    ],
)
def test_filters_pushed_to_scan(spark, sf_dir, key, pushed):
    plan = plan_of(spark, sf_dir, key)
    m = re.search(rf"PushedFilters: \[[^\]]*{pushed}", plan)
    assert m, f"{key}: filter on {pushed} not pushed to the parquet scan"


@pytest.mark.parametrize(
    "key,table,max_scans",
    [
        ("tpch_q21", "lineitem", 1),  # decorrelated EXISTS pair: one pass
        ("tpch_q15", "lineitem", 1),  # revenue CTE reused via window max
        ("tpch_q17", "lineitem", 2),  # fact + per-part threshold build
    ],
)
def test_fact_scan_count(spark, sf_dir, key, table, max_scans):
    plan = plan_of(spark, sf_dir, key)
    n = plan.count(f"{table}.parquet")
    assert 1 <= n <= max_scans, f"{key}: {table} scanned {n}x (max {max_scans})"


def test_column_pruning_q6(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q6")
    scan = next(
        line for line in plan.splitlines() if "FileScan" in line and "lineitem" in line
    )
    m = re.search(r"FileScan parquet \[([^\]]*)\]", scan)
    assert m, "no scan column list"
    cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
    assert len(cols) <= 4, f"Q6 reads {len(cols)} columns: {cols}"


@pytest.mark.parametrize(
    "key",
    [
        # The pairwise pipeline ops: candidate generation must plan as
        # EQUI-joins on blocking/prefix/sub-bucket keys — a cartesian or
        # BNLJ here is the quadratic blowup the round-2 bounding work
        # (prefix filter, guarded width cap) exists to prevent.
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_lsh",
        "sim_join_topk",
        "dedup_containment",
        "dedup_minhash_estimate",
    ],
)
def test_pairwise_ops_equijoin_only(spark, sf_dir, key):
    plan = plan_of(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, f"{key} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{key} plans a BNLJ"


def test_kmv_sketch_shuffles_hashes_only(spark, sf_dir):
    """KMV: the corpus-sized stage is the distinct over (source, hash).
    Text must die at the scan projection (the shuffle carries 8-byte
    hashes), the per-scope cut must run as a PARTIAL WindowGroupLimit
    (partition-local bounded top-k BEFORE the exchange — the classic
    KMV accumulator, planted by Spark's rank-limit pushdown), and the
    global scope as TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "sketch_kmv_distinct")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # Text is pruned to the hash projection directly above the scan.
    scan_proj = next(
        line for line in plan.splitlines()
        if "Project" in line and "md5" in line
    )
    assert "conv(substring(md5" in scan_proj
    assert "WindowGroupLimit" in plan and "Partial" in plan, (
        "per-scope k-minima not cut partition-locally before the shuffle"
    )
    assert "TakeOrderedAndProject(limit=64" in plan


def test_funnel_report_joins_ids_only(spark, sf_dir):
    """The report's joins against the survivor stages are id-keyed
    equi-joins — no cartesian/BNLJ, no row-at-a-time Python."""
    plan = plan_of(spark, sf_dir, "dedup_funnel_report")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_curation_e2e_composes_without_quadratic_stages(spark, sf_dir):
    """The e2e curation funnel's returned plan (packing over the
    survivor anti-join) must be equi-joins + windows only — and the
    LSH stage it consumed upstream is separately gated by
    test_pairwise_ops_equijoin_only. No cartesian, no BNLJ, no
    row-at-a-time Python anywhere in the final plan."""
    plan = plan_of(spark, sf_dir, "pipeline_curation_e2e")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    # Survivor filtering is an anti-join on the bare id, not a rescan.
    assert "LeftAnti" in plan


def test_contamination_benchmark_broadcasts(spark, sf_dir):
    """The benchmark n-gram set is the small side (eval suites are
    fixed-size): it must broadcast so the corpus scan stays linear with
    no corpus-text shuffle."""
    plan = plan_of(spark, sf_dir, "curation_contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_repetition_ratio_is_map_only(spark, sf_dir):
    """Per-doc quality scoring must not shuffle at all."""
    plan = plan_of(spark, sf_dir, "text_repetition_ratio")
    assert "Exchange" not in plan, "repetition ratio plans a shuffle"


def test_epoch_mix_has_no_join(spark, sf_dir):
    """Row multiplication via sequence+explode, never a join against a
    replication table."""
    plan = plan_of(spark, sf_dir, "mix_epochs_weighted")
    assert "Join" not in plan, "epoch upsampling plans a join"


def test_interval_join_is_equijoin(spark, sf_dir):
    """The range predicate must ride the user_id equi-join, not force a
    nested-loop over all (purchase, click) pairs."""
    plan = plan_of(spark, sf_dir, "stream_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q1_partial_aggregation(spark, sf_dir):
    """The shuffle must carry partial aggregate state (a few groups),
    not raw rows: HashAggregate appears below AND above the exchange."""
    plan = plan_of(spark, sf_dir, "tpch_q1")
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[first_exchange:], "no final aggregate"
    assert "HashAggregate" in plan[:first_exchange] or plan.count(
        "HashAggregate"
    ) >= 2, "no partial (map-side) aggregate before the shuffle"


def test_chunk_dedup_shuffles_hashes_only(spark, sf_dir):
    """The window exchange must partition on the 16-byte md5 column —
    never on (or carrying) raw chunk text: the project below the
    exchange reduces each exploded row to (doc_id, s, h)."""
    plan = plan_of(spark, sf_dir, "dedup_chunk_crosscorpus")
    assert re.search(r"hashpartitioning\(h#", plan), "window not keyed on md5"
    first_exchange = plan.index("Exchange")
    # md5/array_join are computed BELOW the exchange (later in the tree
    # string), so the shuffle rows are already hash-sized.
    assert "md5" in plan[first_exchange:]
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_shuffle_no_join(spark, sf_dir):
    """Packing is a window + rollup over (source) — no join, no BNLJ."""
    plan = plan_of(spark, sf_dir, "pack_sequences")
    assert "Join" not in plan


def test_emb_norm_quantize_is_map_only(spark, sf_dir):
    """Per-vector quantization must not shuffle or use Python."""
    plan = plan_of(spark, sf_dir, "emb_norm_quantize")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_emb_centroids_partial_aggregation(spark, sf_dir):
    """The columnar reduce must map-side combine: HashAggregate below
    AND above the exchange, so the shuffle carries (label, pos) partial
    sums, not exploded rows."""
    plan = plan_of(spark, sf_dir, "emb_centroids")
    before, _, after = plan.partition("Exchange")
    assert "HashAggregate" in before and "HashAggregate" in after


def test_ngram_topk_is_topk_with_partial_agg(spark, sf_dir):
    """Heavy hitters must plan TakeOrderedAndProject over a partially
    aggregated count — never a global sort of the full vocabulary."""
    plan = plan_of(spark, sf_dir, "text_ngram_topk")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2, "no map-side combine"


def test_idf_scalar_is_single_row_broadcast(spark, sf_dir):
    """The corpus-count scalar joins as ONE broadcast row (constant work
    per partition) — allowed BNLJ, like the scalar subqueries in
    tpch_q11/q22; anything more is a planning regression."""
    plan = plan_of(spark, sf_dir, "text_idf")
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_countmin_partial_agg_and_broadcast_probe(spark, sf_dir):
    """The sketch build must map-side combine (each partition ships at
    most d*w counters) and the probe must broadcast the finished
    sketch — never shuffle the candidate side against it."""
    plan = plan_of(spark, sf_dir, "sketch_countmin_bigrams")
    assert plan.count("HashAggregate") >= 2, "no partial sketch build"
    assert "BroadcastHashJoin" in plan, "sketch probe not broadcast"
    assert "CartesianProduct" not in plan


def test_funnel_single_user_shuffle_no_join(spark, sf_dir):
    """Three chained window MINs + per-user rollup must reuse ONE
    user_id exchange (plus the final single-partition gather) — and the
    stage conditions are predicates, never self-joins."""
    plan = plan_of(spark, sf_dir, "funnel_conversion")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "user_id" in plan[plan.index("Exchange hashpartitioning"):]


def test_gap_fill_spine_is_broadcast_sized(spark, sf_dir):
    """The spine cross join (types x hours, metadata-sized at any data
    volume) may broadcast-nested-loop; nothing else may, and the raw
    event stream is scanned at most 3x (bounds, types, rollup)."""
    plan = plan_of(spark, sf_dir, "ts_gap_fill_locf")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert 1 <= plan.count("events.parquet") <= 3


def test_pandas_scalar_udf_is_arrow_and_map_only(spark, sf_dir):
    """The inference UDF must run as ONE Arrow-batched stage over the
    scan — no shuffle, no row-at-a-time Python."""
    plan = plan_of(spark, sf_dir, "udf_pandas_score")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan, "fell back to row-at-a-time Python"
    assert "Exchange" not in plan


def test_bucketed_join_needs_no_exchange(spark, sf_dir):
    """The storage-level claim of sink_bucketed: with BOTH sides
    bucketed 8 ways on the join key, the join itself requires NO
    shuffle even when neither side broadcasts (the big-big case the
    bucketing exists for). Disable auto-broadcast to force that case:
    the plan must be a SortMergeJoin fed directly by bucketed scans,
    with the aggregation's exchange as the ONLY exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "sink_bucketed")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    assert plan.count("Exchange hashpartitioning") == 1, (
        "join side got re-shuffled despite bucketing:\n" + plan
    )
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_weighted_reservoir_is_topk(spark, sf_dir):
    """The E-S sample must plan as TakeOrderedAndProject (per-partition
    heaps), never a global sort of the corpus."""
    plan = plan_of(spark, sf_dir, "sample_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_histogram_bounds_are_broadcast(spark, sf_dir):
    """The (min,max) bounds row must broadcast back into the linear
    bucket-assign pass — a 1-row build side, constant work per
    partition."""
    plan = plan_of(spark, sf_dir, "agg_histogram")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_exact_substring_shuffles_hashes_only(spark, sf_dir):
    """Stride-1 window dedup must shuffle 16-byte md5 keys — the token
    array is projected away below the first exchange, and no join of
    any kind appears (it's windows + one aggregate)."""
    plan = plan_of(spark, sf_dir, "dedup_exact_substring")
    assert re.search(r"hashpartitioning\(h#", plan), "window not keyed on md5"
    first_exchange = plan.index("Exchange")
    assert "md5" in plan[first_exchange:]
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan


def test_bpe_apply_segments_via_broadcast_join(spark, sf_dir):
    """Merges run on the vocab table only; the corpus pass must join
    the (word, n_sub) segmentation as a BROADCAST hash join — a shuffle
    join on raw corpus words would move the whole exploded corpus."""
    plan = plan_of(spark, sf_dir, "bpe_apply_tokenize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_zorder_is_arithmetic_with_broadcast_bounds(spark, sf_dir):
    """Quantize+interleave is pure codegen arithmetic over a broadcast
    1-row bounds frame — no UDF (BatchEvalPython/ArrowEvalPython), no
    shuffle besides the final 64-row bucket rollup."""
    plan = plan_of(spark, sf_dir, "layout_zorder")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "SortMergeJoin"):
        assert bad not in plan


def test_fuzzy_join_blocks_on_equijoin(spark, sf_dir):
    """The edit-distance predicate must ride an EQUI-join on the noun
    block key (hash or broadcast), never a Cartesian/BNLJ all-pairs
    comparison — blocking is the whole point."""
    plan = plan_of(spark, sf_dir, "join_fuzzy_names")
    assert "levenshtein" in plan
    assert any(
        j in plan
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_skew_profile_is_partial_aggregated(spark, sf_dir):
    """Each key's count-per-key must partially aggregate map-side (two
    HashAggregates around the exchange) and the three profiles union
    without any join."""
    plan = plan_of(spark, sf_dir, "profile_key_skew")
    assert "Union" in plan
    assert plan.count("HashAggregate") >= 6
    for bad in ("CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan


def test_merge_upsert_single_join_no_bnlj(spark, sf_dir):
    """MERGE = exactly one outer join on the key; never a nested-loop
    or Cartesian comparison of base vs changes."""
    plan = plan_of(spark, sf_dir, "merge_upsert")
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin).*FullOuter", plan
    ), "no full-outer hash/merge join in plan"
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_agg_corr_is_single_pass_moments(spark, sf_dir):
    """Corr/covar/regr must reduce to one partial+final aggregate pair
    (constant moment state per group over the exchange) — no join, no
    second scan of lineitem."""
    plan = plan_of(spark, sf_dir, "agg_corr")
    assert plan.count("HashAggregate") == 2
    for bad in ("Join", "CartesianProduct"):
        assert bad not in plan


def test_ohlc_is_single_aggregation_no_sort(spark, sf_dir):
    """OHLC candles come out of ONE aggregation pass (min_by/max_by
    carry open/close through partial state) — no window sort of raw
    ticks, no join, no global sort."""
    plan = plan_of(spark, sf_dir, "ts_resample_ohlc")
    assert "HashAggregate" in plan or "SortAggregate" in plan
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in plan


def test_domain_cap_is_rank_window_no_sort_or_join(spark, sf_dir):
    """The per-source cap is a rank window over one exchange on
    source — no global sort, no join, no second scan."""
    plan = plan_of(spark, sf_dir, "curation_domain_cap")
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_dsir_lms_are_broadcast_back(spark, sf_dir):
    """The two 128-bucket language models must come back to the token
    stream as a BROADCAST join (the LM table is constant-size at any
    corpus scale); no cartesian anywhere."""
    plan = plan_of(spark, sf_dir, "curation_dsir_weights")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_text_normalize_shuffles_hashes_not_text(spark, sf_dir):
    """Normalization is map-side; the dup-flag window exchanges only
    (md5, doc_id) — the raw text column must not cross the shuffle."""
    plan = plan_of(spark, sf_dir, "text_normalize")
    assert "Window" in plan
    assert "Join" not in plan
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert ex and all("norm_hash" in ln for ln in ex)
    assert not any(" text#" in ln for ln in ex)


def test_semdedup_centroids_broadcast_pairs_equijoin(spark, sf_dir):
    """Centroids (ncells x dim, constant-size) broadcast back to the
    scan; the pairwise stage is an equi-join on (label, sub) — never a
    cartesian/BNLJ."""
    plan = plan_of(spark, sf_dir, "dedup_semdedup")
    # The scored frame is persisted (one materialization feeds three
    # consumers), so the centroid broadcast join lives below the
    # InMemoryTableScan in the executed plan.
    assert "InMemoryTableScan" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan
    from powersql_spark.registry import all_specs

    cached = all_specs()["dedup_semdedup"].fn(spark, sf_dir)
    inner = cached._jdf.queryExecution().analyzed().toString()
    assert "label" in inner  # cached lineage retains the centroid join


def test_pq_codebook_is_broadcast(spark, sf_dir):
    """The 8x16 codebook joins the exploded subvector stream as a
    broadcast hash join; the only exchange is the final per-vector
    groupBy."""
    plan = plan_of(spark, sf_dir, "emb_pq_encode")
    assert "BroadcastHashJoin" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan


def test_compaction_bins_single_window_no_join(spark, sf_dir):
    """The compaction plan is one window exchange on source + one
    aggregate — no join, no global sort, one scan."""
    plan = plan_of(spark, sf_dir, "layout_compaction_bins")
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_bitmap_distinct_is_partial_aggregated(spark, sf_dir):
    """The bitmap OR must partially aggregate map-side (constant state
    per group) — expect the partial/final HashAggregate pair and no
    join."""
    plan = plan_of(spark, sf_dir, "agg_bitmap_distinct")
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_range_search_broadcasts_query_batch(spark, sf_dir):
    """The query batch is constant-size: it must broadcast (BNLJ of a
    4-row side is constant work per row); the big side must never
    shuffle for the comparison."""
    plan = plan_of(spark, sf_dir, "sim_range_search")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_cow_readback_supports_partition_pruning(spark, sf_dir):
    """The COW table is partitioned on the update key: a status filter
    on the read-back must prune to PartitionFilters (metadata, not
    data) — proving the layout the rewrite relies on."""
    from powersql_spark.registry import all_specs

    df = all_specs()["sink_cow_update"].fn(spark, sf_dir)
    pruned = df.where(df.o_orderstatus == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_scd2_single_window_no_self_join(spark, sf_dir):
    """The SCD2 build is LEAD/ROW_NUMBER over one exchange on user_id —
    never the quadratic self-join of the change stream."""
    plan = plan_of(spark, sf_dir, "scd2_intervals")
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_variant_extraction_is_map_only(spark, sf_dir):
    """VARIANT parse + typed path probes stay in the scan stage: no
    shuffle, no join, single scan."""
    plan = plan_of(spark, sf_dir, "fn_variant")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


_N_PAGERANK_JOINS = 5  # 4 edge-build dims + >=1 per-iteration rank join


def test_pagerank_iterations_broadcast_rank_vector(spark, sf_dir):
    """The fact-sized work is the edge build (broadcast dimension
    joins); each unrolled iteration must join the rank vector by
    BROADCAST — no shuffle of the edge table per iteration, no
    cartesian."""
    plan = plan_of(spark, sf_dir, "graph_pagerank")
    assert plan.count("BroadcastHashJoin") >= _N_PAGERANK_JOINS
    assert "CartesianProduct" not in plan
    # r10: the per-iteration rank refresh is broadcast-hinted, so the
    # STATIC plan carries no SMJ for AQE to rescue at runtime.
    assert "SortMergeJoin" not in plan


def test_gap_islands_single_partitioning_no_join(spark, sf_dir):
    """DISTINCT, window, and final aggregate all share the user_id
    partitioning — expect no join and no second scan."""
    plan = plan_of(spark, sf_dir, "window_gap_islands")
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_gopher_rules_map_only(spark, sf_dir):
    """Every Gopher rule is string arithmetic in the scan stage: no
    exchange, no join, single scan."""
    plan = plan_of(spark, sf_dir, "text_gopher_rules")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_token_budget_prefix_sum_is_two_phase(spark, sf_dir):
    """The running total must be the distributed two-phase prefix sum:
    bucket offsets broadcast back (BroadcastHashJoin), per-bucket
    windows in parallel — never one global-sort window over the
    corpus."""
    plan = plan_of(spark, sf_dir, "curation_token_budget")
    assert "BroadcastHashJoin" in plan
    # the corpus-sized window partitions by (tier, bkt), so its sort is
    # within hash partitions — a singlepartition global window would
    # show 'Window' directly above an 'Exchange SinglePartition' over
    # the fact scan; only the 256-row offsets frame may do that.
    assert "CartesianProduct" not in plan


def test_attribution_single_window_no_self_join(spark, sf_dir):
    """Last-touch attribution is one window pass over user_id — never
    the quadratic correlated-subquery shape."""
    plan = plan_of(spark, sf_dir, "attribution_last_touch")
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_bootstrap_explode_aggregates_in_stage(spark, sf_dir):
    """The x16 replicate explode must partially aggregate in its own
    stage: exchanges carry (type, replicate) sums, never the exploded
    stream. Expect partial+final pairs for both aggregations and no
    join."""
    plan = plan_of(spark, sf_dir, "sample_poisson_bootstrap")
    assert plan.count("HashAggregate") >= 4
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_scd2_incremental_scopes_recompute_to_changed_keys(spark, sf_dir):
    """The pass-through side must be an ANTI join and the recompute
    side a SEMI join against the delta's keys — never a full-history
    window rebuild (exactly one Window over the semi-joined slice)."""
    plan = plan_of(spark, sf_dir, "scd2_incremental")
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_cohort_retention_two_fact_scans_broadcast_sizes(spark, sf_dir):
    """Cohorts: the fact table appears at most twice (cohort build +
    activity); cohort sizes come back as a broadcast; no cartesian."""
    plan = plan_of(spark, sf_dir, "cohort_retention")
    assert plan.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # cohort size via window, not a third scan


def test_temperature_mix_rates_broadcast(spark, sf_dir):
    """The per-source rate table is metadata-sized and must broadcast;
    the keep decision is row-local (no extra exchange on the doc
    side beyond the reporting aggregate)."""
    plan = plan_of(spark, sf_dir, "curation_mix_temperature")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_url_canonical_partial_aggregation(spark, sf_dir):
    """Canonical-URL dedup: map-only normalization + one hash
    aggregation whose shuffle carries partial (url, min, count) state —
    never raw rows, never a join."""
    plan = plan_of(spark, sf_dir, "dedup_url_canonical")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[:first_exchange] or plan.count(
        "HashAggregate"
    ) >= 2, "no map-side partial aggregate before the shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lttb_single_shuffle_arrow_batched(spark, sf_dir):
    """LTTB: exactly one exchange (the series-key hash shuffle), a
    partition-local sort, and one Arrow-batched MapInPandas per
    partition — not per series — with no joins and no row-at-a-time
    Python."""
    plan = plan_of(spark, sf_dir, "ts_lttb_downsample")
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan
    assert "Sort" in plan and "global=false" in plan.lower().replace(
        " ", ""
    ) or "Sort [user_id" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan, "row-at-a-time Python in plan"


def test_rolling_median_bounded_frame_single_shuffle(spark, sf_dir):
    """Composed rolling median: one exchange (partition key), a Window
    node, no join, no Python — the collect/sort/index work is all
    expression-level inside the bounded frame."""
    plan = plan_of(spark, sf_dir, "window_rolling_median")
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_rolling_distinct_bounded_frame_single_shuffle(spark, sf_dir):
    """Composed rolling distinct-count: same shape — one exchange, one
    Window, no join, no Python."""
    plan = plan_of(spark, sf_dir, "window_rolling_distinct")
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_ewma_single_shuffle_no_python(spark, sf_dir):
    """EWMA: one exchange (series key), one Window node, the fold is
    expression-level (no Python, no join) — the whole recursion runs
    inside whole-stage-codegen territory."""
    plan = plan_of(spark, sf_dir, "ts_ewma")
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_interpolate_windows_share_partitioning(spark, sf_dir):
    """Linear interpolation: the four bracket columns (prev/next value
    and timestamp) must ride the SAME (event_type) partitioning — no
    cartesian beyond the metadata-sized spine build, no Python."""
    plan = plan_of(spark, sf_dir, "ts_interpolate_linear")
    assert "CartesianProduct" not in plan
    # The only nested-loop is the spine crossJoin: distinct event
    # types x generated hours, both metadata-sized at any SF.
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "EvalPython" not in plan


def test_entropy_touches_corpus_once(spark, sf_dir):
    """Entropy runs on the (source, lang) category table; the corpus
    parquet must appear exactly once in the plan."""
    plan = plan_of(spark, sf_dir, "agg_entropy")
    assert plan.count("documents.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_maxsim_broadcast_query_topk(spark, sf_dir):
    """MaxSim: single-row query joins as a broadcast (the one
    acceptable BNLJ shape), scoring is expression-level, and the cut
    is TakeOrderedAndProject — never a global sort."""
    plan = plan_of(spark, sf_dir, "sim_maxsim_multivector")
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_tfidf_broadcasts_idf_and_pushes_rank_limit(spark, sf_dir):
    """TF-IDF top-k: the vocabulary-sized IDF table broadcasts onto tf
    (no corpus-wide join shuffle), the single-row corpus count is the
    one tolerated BNLJ, and Spark 4's WindowGroupLimit pushes the
    top-3 cut below the final window sort."""
    plan = plan_of(spark, sf_dir, "text_tfidf_topk")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan


def test_anomaly_zscore_single_window_single_shuffle(spark, sf_dir):
    """Rolling z-score: mean/std/count ride ONE bounded-frame Window
    over one (user_id) exchange; no join, no Python."""
    plan = plan_of(spark, sf_dir, "ts_anomaly_zscore")
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_asof_nearest_one_sort_serves_both_directions(spark, sf_dir):
    """Nearest as-of: the union + two-frame window rewrite must stay a
    single exchange with no join (the naive form is a per-row range
    scan)."""
    plan = plan_of(spark, sf_dir, "join_asof_nearest")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_triangle_count_caches_edges_equijoins_only(spark, sf_dir):
    """Triangle enumeration: the fact-sized edge build must be CACHED
    (it feeds three join legs + the membership rollup — uncached, the
    plan embeds the corpus scan once per leg), and the legs are
    equi-joins. The BNLJ/scan substrings repeat only inside the
    printed cached lineage (one per InMemoryTableScan), never as
    additional executed stages."""
    plan = plan_of(spark, sf_dir, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    )


def test_phash_bands_equijoin_one_python_stage(spark, sf_dir):
    """pHash dedup: signatures via ONE Arrow mapInPandas stage (the
    decode slot), band joins strictly equi-keyed."""
    plan = plan_of(spark, sf_dir, "mm_phash_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_mmr_pool_cut_is_topk(spark, sf_dir):
    """MMR: the corpus-sized stage (score + pool cut) shares the
    bruteforce shape — broadcast query + TakeOrderedAndProject; the
    greedy runs on the collected k-bounded head, so the returned frame
    itself is a local relation of <= k rows."""
    plan = plan_of(spark, sf_dir, "sim_topk_bruteforce")
    assert "TakeOrderedAndProject" in plan
    out = SPECS["sim_rerank_mmr"].fn(spark, sf_dir)
    assert out.count() <= 10


def test_profile_summary_single_scan_with_expand(spark, sf_dir):
    """The whole profile is ONE scan of the table; the 5 exact
    DISTINCT aggregates plan via Expand."""
    plan = plan_of(spark, sf_dir, "profile_table_summary")
    assert plan.count("documents.parquet") == 1
    assert "Expand" in plan
    assert "Join" not in plan


def test_incremental_agg_pushes_cutoff_filters(spark, sf_dir):
    """Base and delta branches must push their date filters to the
    scan — at 100 TB the refresh only pays for the delta partition."""
    plan = plan_of(spark, sf_dir, "incr_agg_maintenance")
    assert re.search(r"PushedFilters: \[[^\]]*o_orderdate", plan), (
        "cutoff filter not pushed to the orders scan"
    )


def test_holt_single_shuffle_no_python(spark, sf_dir):
    """Holt: same shape as EWMA — one exchange, one Window, the
    struct-state fold is expression-level."""
    plan = plan_of(spark, sf_dir, "ts_holt_linear")
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_temporal_scd2_join_is_joinless(spark, sf_dir):
    """The temporal join rewrite must contain NO join at all — one
    union, one (user_id) exchange, one window (the oracle's naive
    equi+range join would replicate every fact per dimension
    version)."""
    plan = plan_of(spark, sf_dir, "join_temporal_scd2")
    assert "Join" not in plan
    # One logical shuffle on user_id; Spark may place it per union
    # branch (two Exchange nodes, same key) rather than above the
    # union.
    assert plan.count("Exchange") <= 2
    assert "hashpartitioning(user_id" in plan
    assert "EvalPython" not in plan


def test_cusum_single_shuffle_no_python(spark, sf_dir):
    """CUSUM: per-series stats and the fold ride the SAME (user_id)
    exchange — one shuffle, window-only, no join, no Python."""
    plan = plan_of(spark, sf_dir, "ts_changepoint_cusum")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_whitening_constant_state_partials(spark, sf_dir):
    """Whitening's fact-sized stage is the sufficient-stats pass: one
    Arrow mapInPandas, partial-aggregated (i, j) sums — assert the
    apply stage's plan is map-only over the scan (no shuffle after the
    literals return)."""
    df = SPECS["emb_whitening"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The returned (apply) plan must not shuffle or call Python: the
    # whitening matrix is plan literals.
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_autocorr_single_shuffle_no_join(spark, sf_dir):
    """ACF: the lag window and the grouped CORR share ONE (user_id)
    exchange — no join, no Python."""
    plan = plan_of(spark, sf_dir, "ts_autocorr")
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_seasonal_decompose_single_corpus_scan(spark, sf_dir):
    """Decomposition: the fact scan collapses to the cached
    O(types x days) series table; the seasonal-index join is a
    broadcast. Uncached, the plan would embed the daily aggregation
    once per branch. The fact-scan substring repeats only inside the
    printed cached lineage (one per InMemoryTableScan), never as an
    additional executed stage."""
    plan = plan_of(spark, sf_dir, "ts_seasonal_decompose")
    assert "InMemoryTableScan" in plan, "series table not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_winsorized_mean_broadcast_bounds(spark, sf_dir):
    """Winsorize: exact quantiles force two passes over the corpus;
    the bounds table (group-cardinality rows) must come back as a
    broadcast, never a shuffle join."""
    plan = plan_of(spark, sf_dir, "agg_winsorized_mean")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_jaccard_neighbors_cached_edges_equijoins(spark, sf_dir):
    """Neighbor Jaccard: same contract as triangle counting — the
    fact-sized edge build is cached, the wedge enumeration is an
    equi-join on the shared neighbor (never all-pairs), degrees come
    back broadcast."""
    plan = plan_of(spark, sf_dir, "graph_jaccard_neighbors")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    )


def test_bigram_logprob_broadcast_model_no_python(spark, sf_dir):
    """Bigram LM: the model join is broadcast at this scale (shuffle
    equi-join at web scale — same plan shape); scoring is pure
    expression work, no Python anywhere."""
    plan = plan_of(spark, sf_dir, "text_bigram_logprob")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ngram_novelty_shingle_keyed_shuffles_only(spark, sf_dir):
    """Novelty: the first-seen aggregate and the join back are both
    keyed on the shingle — hash-partitioned equi-joins, no cartesian,
    no Python."""
    plan = plan_of(spark, sf_dir, "text_ngram_novelty")
    assert "hashpartitioning(s" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_theilsen_equijoin_shares_partitioning(spark, sf_dir):
    """Theil-Sen: the pairwise stage is an EQUI-join on the series key
    (never a cartesian), and the lower-median is an AGGREGATE
    (sort_array over collected slopes, r14 wave 9) riding the
    partitioning the join produced — no window pass over the O(L^2)
    pair rows and no exchange between join and aggregate."""
    plan = plan_of(spark, sf_dir, "ts_theilsen_slope")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    # collect_list is the aggregate function; its sort_array wrapper
    # sits past toString()'s expression truncation, so gate on the
    # function name.
    assert "collect_list" in plan
    assert "EvalPython" not in plan
    # One exchange per join input side at most; none added for the
    # median aggregate (it reuses the join's
    # hashpartitioning(user_id...)).
    assert plan.count("Exchange") <= 2


def test_snapshot_diff_single_scan_no_join(spark, sf_dir):
    """Snapshot diff: ONE conditional aggregation, not a full-outer
    join of two snapshot scans — single orders scan, year filter
    pushed, no join."""
    plan = plan_of(spark, sf_dir, "diff_metric_snapshots")
    assert plan.count("orders.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert re.search(r"PushedFilters: \[[^\]]*o_orderdate", plan), (
        "year filter not pushed to the orders scan"
    )


def test_emb_outlier_broadcast_centroids_no_python(spark, sf_dir):
    """Outlier scoring: centroid array cached + broadcast, moments
    broadcast back, distance math codegen'd (no Python), no
    cartesian."""
    plan = plan_of(spark, sf_dir, "emb_outlier_distance")
    assert "InMemoryTableScan" in plan, "centroid table not cached"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_asof_tolerance_joinless_single_exchange(spark, sf_dir):
    """Tolerance as-of: union + window, no join; the tolerance is a
    post-window expression, not a range join."""
    plan = plan_of(spark, sf_dir, "join_asof_tolerance")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2
    assert "Window" in plan
    assert "EvalPython" not in plan


def test_path_trigrams_topk_no_join(spark, sf_dir):
    """Path mining: one (user_id) exchange for the journeys, map-side
    trigram explode, partial-aggregated count, top-20 as
    TakeOrderedAndProject — no join, no global sort, no Python."""
    plan = plan_of(spark, sf_dir, "path_trigram_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_bloom_probe_is_map_only(spark, sf_dir):
    """Bloom prefilter: the probe must test bits against PLAN LITERALS
    — no shuffle of the probe stream on the key (that's the exchange
    the filter exists to prevent); the only join is the broadcast
    members join for the evaluation report."""
    plan = plan_of(spark, sf_dir, "sketch_bloom_prefilter")
    assert "hashpartitioning(c_custkey" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_quality_report_two_scans_max(spark, sf_dir):
    """Quality report: the six column rules share ONE lineitem scan;
    the referential rule adds only the anti-join branch — two scans
    total, pivot on the single result row."""
    plan = plan_of(spark, sf_dir, "assert_quality_report")
    assert plan.count("lineitem.parquet") <= 2
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_label_propagation_cached_adjacency(spark, sf_dir):
    """LPA: fact tables collapse once into the cached adjacency; every
    round joins a broadcast label vector, and the O(nations)-row label
    state localCheckpoints per round (kcore/HITS discipline — each
    round reads `labels` twice, so the analyzed plan doubled per round
    without truncation). The FINAL plan is therefore the last
    checkpointed vector's scan, constant-size."""
    plan = plan_of(spark, sf_dir, "graph_label_propagation")
    assert "ExistingRDD" in plan, "label state not checkpointed"
    # Structural truncation gate (not a line count, which is tied to a
    # Spark version's plan formatting): without the checkpoint every
    # round re-embeds its vote-join + refresh-join subtree, so the
    # final plan carries ~2 joins and a fact-table scan per round.
    # Truncated, it is a pure projection over the last checkpointed
    # vector: zero joins, zero parquet scans.
    assert plan.count("Join") == 0, "round join subtrees not truncated"
    assert ".parquet" not in plan, "fact scan leaked past the checkpoint"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_kcenter_result_is_local_relation(spark, sf_dir):
    """k-center: the returned frame is the k-bounded driver-collected
    selection — a local relation with no distributed stages left (the
    per-round argmax jobs already ran)."""
    plan = plan_of(spark, sf_dir, "sample_coreset_kcenter")
    assert "Exchange" not in plan
    assert "parquet" not in plan


def test_ks_two_phase_prefix_no_global_sort(spark, sf_dir):
    """KS: the ECDF must use the two-phase prefix sum — a metadata
    window over bins plus per-bin local windows — and the argmax is a
    TakeOrderedAndProject; the only single-row broadcasts are the
    range/total scalars."""
    plan = plan_of(spark, sf_dir, "stats_ks_two_sample")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "hashpartitioning(bkt" in plan, "no per-bin local windows"


def test_hilbert_two_scans_integer_pipeline(spark, sf_dir):
    """Hilbert layout: bounds pass + map-only walk + rollup — two
    lineitem scans, no Python, no cartesian blowup (the single-row
    bounds broadcast is the only nested-loop)."""
    plan = plan_of(spark, sf_dir, "layout_hilbert")
    assert plan.count("lineitem.parquet") <= 2
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_chi2_metadata_joins_only(spark, sf_dir):
    """Chi2: one corpus exchange to the cached contingency table;
    marginals/expected/statistic are broadcast joins on that table."""
    plan = plan_of(spark, sf_dir, "stats_chi2_independence")
    assert "InMemoryTableScan" in plan, "contingency table not cached"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_group_holdout_assignment_is_map_only(spark, sf_dir):
    """Group split: the assignment must be a pure hash expression — no
    join, no shuffle by user; only the report aggregate exchanges."""
    plan = plan_of(spark, sf_dir, "split_group_holdout")
    assert "Join" not in plan
    assert "hashpartitioning(user_id" not in plan
    assert "EvalPython" not in plan


def test_twap_window_and_agg_share_exchange(spark, sf_dir):
    """TWAP: the lead() window partitions on (user, day) and the
    aggregate reuses that partitioning — one exchange, no join."""
    plan = plan_of(spark, sf_dir, "ts_time_weighted_avg")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_dpp_filter_reaches_partitioned_scan(spark, sf_dir):
    """The join against the filtered era dim must inject a runtime
    partition filter into the fact scan (dynamicpruning in the plan) —
    the fact side has NO literal year predicate."""
    plan = plan_of(spark, sf_dir, "join_dpp_pruned")
    assert "dynamicpruning" in plan, "DPP did not fire"
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_weighted_median_single_exchange(spark, sf_dir):
    """Weighted median: running/total weight and the threshold filter
    ride one (flag) exchange — no join, no global sort."""
    plan = plan_of(spark, sf_dir, "agg_weighted_median")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_m4_window_and_agg_share_exchange(spark, sf_dir):
    """M4: NTILE and the grouped min/max/first/last share one
    (user_id) exchange."""
    plan = plan_of(spark, sf_dir, "ts_downsample_m4")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_path_regex_single_journey_exchange(spark, sf_dir):
    """Path regex: one journey-build exchange, then the patterns are
    codegen'd rlike counts in a single final aggregate."""
    plan = plan_of(spark, sf_dir, "path_regex_match")
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_matryoshka_single_scan_two_topk(spark, sf_dir):
    """MRL eval: both scores come from ONE cached scoring pass
    (broadcast query), each cut is TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "sim_matryoshka_recall")
    assert "InMemoryTableScan" in plan, "scored frame not cached"
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_incremental_dedup_fingerprint_keyed(spark, sf_dir):
    """Incremental dedup: the wire carries md5 fingerprints (the
    exchange partitions on fp), never raw text; base probe is an
    equi-join."""
    plan = plan_of(spark, sf_dir, "dedup_incremental_delta")
    assert re.search(r"hashpartitioning\(fp#", plan), (
        "shuffle not keyed on the fingerprint"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_window_funnel_single_exchange_array_math(spark, sf_dir):
    """windowFunnel: journey build is the only corpus exchange; the
    chained earliest-step lookups are array expressions, no joins, no
    Python."""
    plan = plan_of(spark, sf_dir, "funnel_window_depth")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 2  # journey build + 4-group rollup


def test_drawdown_single_exchange(spark, sf_dir):
    """Drawdown: running max and the grouped min share one (user_id)
    exchange."""
    plan = plan_of(spark, sf_dir, "ts_max_drawdown")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_gini_ranks_aggregate_not_facts(spark, sf_dir):
    """Gini: the global rank window runs over the per-customer
    aggregate, never the fact table — one orders scan."""
    plan = plan_of(spark, sf_dir, "agg_gini_revenue")
    assert plan.count("orders.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_ols_multi_single_pass_constant_state(spark, sf_dir):
    """OLS: one lineitem scan collapses to ten sufficient statistics
    per group (partial-aggregated); the solve is row-local arithmetic
    — no join, no second scan, no Python."""
    plan = plan_of(spark, sf_dir, "stats_ols_multi")
    assert plan.count("lineitem.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_mad_anomaly_keyed_on_series(spark, sf_dir):
    """MAD anomalies: every stage (ranked medians, joins) is keyed on
    user_id — no cartesian, no global window, no Python."""
    plan = plan_of(spark, sf_dir, "ts_anomaly_mad")
    assert "hashpartitioning(user_id" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_bm25_posting_lists_and_topk(spark, sf_dir):
    """BM25: document frequencies and corpus stats ride as broadcasts
    (1-row stats → a single 1-row BNLJ is the scalar-broadcast
    pattern); the final cut is TakeOrderedAndProject, and nothing is
    quadratic or Python."""
    plan = plan_of(spark, sf_dir, "text_bm25_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row stats
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_hybrid_rrf_pool_bounded_fusion(spark, sf_dir):
    """RRF: the fusion joins two rank-filtered pools; the only BNLJs
    are the 1-row query-vector/stats broadcasts; final cut is top-k."""
    plan = plan_of(spark, sf_dir, "sim_hybrid_rrf")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # 1-row q + stats
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_knn_graph_equijoin_blocked(spark, sf_dir):
    """k-NN graph: candidate pairs come from the cell equi-join — no
    cartesian, no BNLJ at all; norms precomputed before the join (the
    join condition carries label equality)."""
    plan = plan_of(spark, sf_dir, "emb_knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_rag_e2e_probe_is_cell_pruned(spark, sf_dir):
    """RAG e2e: chunk→embedding attach and probe are equi-joins; the
    probed-cell and manifest sides broadcast; only the two 1-row
    (query vector) broadcasts plan as BNLJ; final cut is top-k."""
    plan = plan_of(spark, sf_dir, "pipeline_rag_e2e")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_mann_whitney_ranks_distinct_values(spark, sf_dir):
    """Mann-Whitney: the rank window runs over the DISTINCT-value
    aggregate, not per-row — the corpus collapses in the first
    aggregation and everything after is value-cardinality-sized."""
    plan = plan_of(spark, sf_dir, "stats_mann_whitney")
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_psi_single_scan_windowed_totals(spark, sf_dir):
    """PSI: one events scan collapsing to (event_type, bin) counts;
    segment totals via a window on the per-bin table (no second scan,
    no join)."""
    plan = plan_of(spark, sf_dir, "profile_psi_drift")
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_rfm_windows_over_customer_aggregate(spark, sf_dir):
    """RFM: the three NTILE windows sort the CUSTOMER aggregate, never
    the orders fact table (same discipline as agg_gini_revenue); the
    anchor is a pruned one-column scan + 1-row broadcast."""
    plan = plan_of(spark, sf_dir, "analytics_rfm_segments")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row anchor
    assert "EvalPython" not in plan


def test_cdc_apply_single_key_exchange(spark, sf_dir):
    """CDC apply: last-change pick and change count share ONE user_id
    exchange; no join, no Python."""
    plan = plan_of(spark, sf_dir, "cdc_apply_changelog")
    assert "hashpartitioning(user_id" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_decay_popularity_partial_aggregated(spark, sf_dir):
    """Decayed popularity: per-event weights are map-side arithmetic
    off a 1-row anchor broadcast; the only corpus shuffle carries
    (event_type, decimal) partials."""
    plan = plan_of(spark, sf_dir, "window_decay_popularity")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row anchor
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan


def test_bfs_frontier_broadcasts(spark, sf_dir):
    """BFS: the per-hop distance table localCheckpoints (r10 lineage
    discipline), so the FINAL plan shows only the last nodes-vs-dist
    broadcast join over a checkpointed RDD scan. The per-hop
    broadcast property lives in the source hint (F.broadcast(dist))
    whose relaxation joins execute eagerly inside the checkpoint
    jobs; here we pin what remains observable: checkpointed state,
    truncated lineage, broadcast final join, no cartesian/Python."""
    plan = plan_of(spark, sf_dir, "graph_bfs_hops")
    assert "ExistingRDD" in plan, "distance state not checkpointed"
    # Structural truncation gate: each untruncated hop re-embeds a
    # frontier-expansion join, so the final plan would hold one join
    # (+ an edge scan) PER HOP. Truncated, only the final nodes⋈dist
    # broadcast join remains.
    assert plan.count("Join") <= 2, "hop join subtrees not truncated"
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_mann_kendall_pairs_equijoin_only(spark, sf_dir):
    """Mann-Kendall: the pairwise stage is an equi-join on the series
    key (O(L^2) bounded per entity), and S collapses inside the
    aggregate — nothing pairwise is shuffled onward."""
    plan = plan_of(spark, sf_dir, "ts_mann_kendall")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_binary_quantize_two_stage_topk(spark, sf_dir):
    """Binary quantization: both the Hamming shortlist and the rerank
    cut plan as TakeOrderedAndProject; the only BNLJ is the 1-row
    query broadcast."""
    plan = plan_of(spark, sf_dir, "emb_binary_quantize")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "EvalPython" not in plan


def test_late_audit_bucketed_prefix_max(spark, sf_dir):
    """Late audit: the corpus-sized running max is partitioned by
    arrival bucket — never a single-partition global window over the
    fact table; the cross-bucket max rides the bucket-level table."""
    plan = plan_of(spark, sf_dir, "stream_late_audit")
    assert "hashpartitioning(bkt" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_trigram_backoff_model_broadcast_joins(spark, sf_dir):
    """Stupid Backoff: every model join is a broadcast hash equi-join
    on the n-gram key (vocab-sized sides); the only BNLJ is the 1-row
    token-total; no Python anywhere."""
    plan = plan_of(spark, sf_dir, "text_trigram_backoff")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row N total
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_shard_manifest_bucketed_prefix_sum(spark, sf_dir):
    """Shard packing: the running byte count is bucketed (keyed
    exchange), never a single-partition pass over the corpus."""
    plan = plan_of(spark, sf_dir, "mm_shard_manifest")
    assert "hashpartitioning(bkt" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_timezone_map_only(spark, sf_dir):
    """Timezone conversion is map-only — no join, no Python; the only
    exchange is the presentation sort."""
    plan = plan_of(spark, sf_dir, "fn_timezone")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 1


def test_stats_manifest_constant_state(spark, sf_dir):
    """The manifest aggregation collapses the written files to
    constant per-partition min/max/count state, partial-aggregated."""
    plan = plan_of(spark, sf_dir, "sink_stats_manifest")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert "partial" in plan.lower()


def test_pq_adc_codebook_broadcast_two_topk(spark, sf_dir):
    """PQ-ADC: codebook and LUT ride as broadcasts (integer-keyed
    equi-joins); shortlist and rerank both plan as top-k; the only
    BNLJ is the 1-row query broadcast."""
    plan = plan_of(spark, sf_dir, "sim_pq_adc_search")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "EvalPython" not in plan


def test_proportion_ztest_two_aggregations_no_join(spark, sf_dir):
    """Proportion z-test: corpus → per-user bit → four integers; no
    join anywhere, no Python."""
    plan = plan_of(spark, sf_dir, "stats_proportion_ztest")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_cuped_single_scan_broadcast_moments(spark, sf_dir):
    """CUPED: one events scan collapses to the PERSISTED per-user
    (x, y) table; theta and the mean ride a 1-row broadcast back onto
    it (a single 1-row BNLJ), never a second corpus scan — the final
    plan reads the InMemoryRelation, not the parquet."""
    plan = plan_of(spark, sf_dir, "stats_cuped_adjustment")
    assert "InMemoryTableScan" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "EvalPython" not in plan


def test_rolling_corr_windows_share_frame_on_bucket_table(spark, sf_dir):
    """Rolling correlation: six power-sum windows share ONE frame over
    the time-bucket table; the corpus is scanned once."""
    plan = plan_of(spark, sf_dir, "ts_rolling_corr")
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan
    # one Window operator hosting all six aggregates, not six
    assert plan.count("RunningWindowFunction") <= 1


def test_srm_check_collapses_to_two_ints_per_salt(spark, sf_dir):
    """SRM: distinct users once, fanned by the broadcast salt VALUES,
    straight back to per-salt counts — no corpus-sized state after the
    distinct."""
    plan = plan_of(spark, sf_dir, "stats_srm_check")
    assert plan.count("events.parquet") == 1
    assert "EvalPython" not in plan


def test_freshness_window_on_category_table(spark, sf_dir):
    """Freshness: one scan to (type, max, count); the cross-stream max
    window runs on the CATEGORY table (5 rows)."""
    plan = plan_of(spark, sf_dir, "profile_freshness_lag")
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_balanced_sample_rank_cut_partition_local(spark, sf_dir):
    """Balanced sampling: the per-class rank rides the class-key
    window; the cap is a 1-row broadcast (single 1-row BNLJ)."""
    plan = plan_of(spark, sf_dir, "sample_balanced_classes")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "EvalPython" not in plan


def test_cross_correlation_epoch_equijoin(spark, sf_dir):
    """Lead-lag scan: lag pairing is an INTEGER epoch equi-join on the
    persisted hourly table — no interval/inequality join, corpus
    scanned once."""
    plan = plan_of(spark, sf_dir, "ts_cross_correlation_lag")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_cluster_purity_metadata_sized_windows(spark, sf_dir):
    """Purity: assignment is map-only bit arithmetic; windows run on
    the (cluster, label) histogram; no join, no Python."""
    plan = plan_of(spark, sf_dir, "emb_cluster_purity")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("embeddings.parquet") == 1


def test_power_analysis_collapses_like_ztest(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "stats_power_analysis")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_outage_gaps_single_stream_exchange(spark, sf_dir):
    """Outage scan: one shuffle on the stream key, LAG on that
    partitioning, selective filter — no join, no Python."""
    plan = plan_of(spark, sf_dir, "ts_outage_gaps")
    assert "hashpartitioning(event_type" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_pmi_runs_on_vocab_aggregate(spark, sf_dir):
    """PMI: the corpus collapses once to the persisted bigram vocab;
    marginals join back broadcast; cut is TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "text_cooccurrence_pmi")
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_experiment_e2e_three_collapses_no_fact_joins(spark, sf_dir):
    """Experiment readout: three independent corpus collapses unioned
    at metadata size; the only join is the constant salt dimension."""
    plan = plan_of(spark, sf_dir, "pipeline_experiment_e2e")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Union" in plan


def test_rolling_active_users_on_day_user_table(spark, sf_dir):
    """DAU/WAU: the trailing-week pairing joins the PERSISTED
    (day, user) distinct table, never raw events; one corpus scan."""
    plan = plan_of(spark, sf_dir, "window_rolling_active_users")
    assert "InMemoryTableScan" in plan
    assert "EvalPython" not in plan


def test_hard_negatives_cell_equijoin(spark, sf_dir):
    """Hard negatives: candidates from the cell equi-join — no
    cartesian/BNLJ; per-anchor top-3 on the join's partitioning."""
    plan = plan_of(spark, sf_dir, "sample_hard_negatives")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_holt_winters_single_fold_no_python(spark, sf_dir):
    """Holt-Winters: decimal daily aggregation + ONE array fold — no
    Python, no join; the only exchanges are the daily group-by and
    the global collect."""
    plan = plan_of(spark, sf_dir, "ts_holt_winters")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("events.parquet") == 1


# ---------- round-6 additions ----------


def test_kcore_fact_tables_once_broadcast_dims(spark, sf_dir):
    """k-core: the fact tables feed the shared strong-edge build once;
    peels are semi-joins + aggregations on the metadata-sized edge
    table, each round localCheckpointed (the betweenness discipline —
    without it the analyzed plan quadruples per peel, ~450 nodes and
    12.6 s of Catalyst time at 2 peels, caught by scale_smoke r10).
    The final plan is therefore the checkpointed survivor scan; the
    peel joins run eagerly inside the checkpoint stages — same
    plan-shape accounting as test_betweenness_no_python_no_cartesian."""
    plan = plan_of(spark, sf_dir, "graph_kcore")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed peel state


def test_clustering_coefficient_equijoin_triangles(spark, sf_dir):
    """Local CC reuses the ordered 3-way EQUI-join triangle skeleton on
    the CACHED edge table — no cartesian; the one-row-threshold BNLJ
    repeats only inside printed cached lineage (one per
    InMemoryTableScan, same accounting as the triangle-count gate)."""
    plan = plan_of(spark, sf_dir, "graph_clustering_coefficient")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    )
    assert "EvalPython" not in plan


def test_adamic_adar_wedge_join_topk(spark, sf_dir):
    """Adamic-Adar: candidates via the shared-neighbor equi-join
    (wedge bound) over the cached edge table, non-adjacency as an
    anti-join, top-20 as TakeOrderedAndProject. BNLJ only inside
    printed cached lineage (the one-row threshold)."""
    plan = plan_of(spark, sf_dir, "graph_adamic_adar")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    )
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_degree_distribution_single_row_total_broadcast(spark, sf_dir):
    """Degree histogram: the grand total joins back as a one-row
    broadcast (constant work); the edge build is cached, so the
    threshold BNLJ repeats only inside printed cached lineage, plus
    the one live total-row join."""
    plan = plan_of(spark, sf_dir, "graph_degree_distribution")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    ) + 1
    assert "EvalPython" not in plan


def test_bootstrap_ci_single_fact_scan(spark, sf_dir):
    """Multiplier bootstrap: ALL 32 replicates ride ONE orders scan as
    map-side-combinable sufficient statistics — the scan appears once;
    no Python; the only join pairs two one-row aggregates."""
    plan = plan_of(spark, sf_dir, "stats_bootstrap_ci")
    assert plan.count("orders.parquet") == 1
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bayesian_ab_two_collapses_scalar_tail(spark, sf_dir):
    """Bayesian A/B: per-user collapse then a four-integer global
    aggregate; everything after is scalar arithmetic — no joins of
    fact-sized tables, no Python."""
    plan = plan_of(spark, sf_dir, "stats_bayesian_ab")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_sprt_single_ordered_window(spark, sf_dir):
    """SPRT: one corpus collapse to user grain, ONE global-ordered
    window (the sequential semantics), one conditional aggregate —
    no joins, no Python."""
    plan = plan_of(spark, sf_dir, "stats_sprt_sequential")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_iqr_outliers_fences_broadcast_back(spark, sf_dir):
    """IQR screen: quartiles per segment (pass 1) join back BROADCAST
    onto the re-scan (pass 2) — segment-count-sized build side, no
    shuffle of the fences, no Python."""
    plan = plan_of(spark, sf_dir, "stats_iqr_outliers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_market_basket_order_equijoin_topk(spark, sf_dir):
    """Market basket: pairs via the order-key self-EQUI-join of the
    CACHED basket table (quadratic only in basket size); marginals
    id-keyed; the order total a one-row broadcast; top-20 as
    TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "analytics_market_basket")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "basket table not cached"
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    ) + 1  # + the live one-row n_orders join
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_pareto_single_collapse_one_row_total(spark, sf_dir):
    """Pareto deciles: one fact collapse to customer grain (cached —
    it feeds both the NTILE and the total), one-row total broadcast,
    ten-row tail."""
    plan = plan_of(spark, sf_dir, "analytics_pareto_concentration")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    ) + 1
    assert "EvalPython" not in plan


def test_markov_user_partitioned_window_no_global_sort(spark, sf_dir):
    """Markov transitions: the LAG window partitions by user (local
    sorts only); the marginal joins back BROADCAST onto the
    metadata-sized pair table."""
    plan = plan_of(spark, sf_dir, "analytics_markov_transitions")
    assert "hashpartitioning(user_id" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_streak_user_partitioned_islands_topk(spark, sf_dir):
    """Streaks: gap-islands via user-partitioned windows (no global
    sort until the 20-row cut), distinct-day collapse first, top-20
    as TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "window_streak_longest")
    assert "hashpartitioning(user_id" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_theta_sketch_downstream_on_k_rows(spark, sf_dir):
    """Theta set ops: one corpus scan builds the cached sketches; the
    rank-limit window plans a partial WindowGroupLimit (partition-
    local bounded top-k); intersection/union joins run on broadcast
    k-row sketch sides."""
    plan = plan_of(spark, sf_dir, "sketch_theta_intersection")
    assert "WindowGroupLimit" in plan
    assert "InMemoryTableScan" in plan, "sketch not cached"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_interval_overlap_grid_equijoin(spark, sf_dir):
    """Interval overlap: candidates from the hour-bucket EQUI-join
    (never the naive all-pairs theta join); spike windows broadcast;
    top-20 as TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "join_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_deletion_vectors_broadcast_antijoin(spark, sf_dir):
    """DV merge-on-read: the tombstone side anti-joins BROADCAST; the
    base positions come from a file-partitioned window (local sorts);
    base is cached (it feeds DV derivation, totals, and the visible
    aggregate)."""
    plan = plan_of(spark, sf_dir, "cdc_deletion_vectors")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "InMemoryTableScan" in plan, "base positions not cached"
    assert "hashpartitioning(file_id" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_random_projection_broadcast_signs_decimal_partials(spark, sf_dir):
    """JL projection: the 2048-row sign matrix joins BROADCAST onto
    the exploded vectors; projection components come from a partial
    decimal aggregate; no cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "emb_random_projection")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "partial" in plan.lower()


def test_audio_vad_map_only_single_python_stage(spark, sf_dir):
    """VAD: ONE Arrow mapInPandas stage, map-only — no join, no
    shuffle beyond the final presentation sort."""
    plan = plan_of(spark, sf_dir, "mm_audio_vad")
    assert "MapInPandas" in plan
    assert plan.count("MapInPandas") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_rake_doc_partitioned_windows_topk(spark, sf_dir):
    """RAKE: phrase assembly windows partition by doc (local sorts);
    token/phrase tables cached for their multiple join legs; top-20 as
    TakeOrderedAndProject; no cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "text_rake_keywords")
    assert "hashpartitioning(doc_id" in plan
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_hits_iterations_on_cached_edges(spark, sf_dir):
    """HITS: the fact tables collapse once into the cached directed
    edge list; each half-step's O(nations) score vector is
    localCheckpointed (kcore/Brandes discipline), so the FINAL plan
    truncates at checkpointed RDD scans instead of re-embedding the
    prior half-step's tree geometrically (~900 analyzed nodes, 35 s
    of Catalyst time before; ~20 nodes, 10 s total after)."""
    plan = plan_of(spark, sf_dir, "graph_hits")
    assert "ExistingRDD" in plan, "half-step state not checkpointed"
    # Structural truncation gate: untruncated, every half-step embeds
    # its score join against the edge table (~2 joins per iteration,
    # hundreds of plan nodes). Truncated, only the final
    # hub⋈authority join over checkpointed RDD scans remains.
    assert plan.count("Join") <= 2, "half-step join subtrees not truncated"
    assert ".parquet" not in plan, "fact scan leaked past the checkpoint"
    # Checkpointed RDDs have no size stats, so the final hub⋈authority
    # join must be broadcast-HINTED or it plans as a static SMJ.
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_langid_eval_map_only_matrix(spark, sf_dir):
    """LangID eval: prediction fused into the scan (map-only), one
    aggregation to the cell matrix, marginals broadcast back."""
    plan = plan_of(spark, sf_dir, "text_langid_eval")
    assert "InMemoryTableScan" in plan  # matrix cached for its 2 readers
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # the scan string repeats once inside the printed cached lineage
    assert plan.count("documents.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1


def test_triplet_anchors_broadcast_partial_min(spark, sf_dir):
    """Triplet accuracy: candidate selection joins the 20 broadcast
    anchors with partial MIN aggregation; cosine legs run on the
    cached explode of <= 60 vectors."""
    plan = plan_of(spark, sf_dir, "emb_triplet_accuracy")
    assert "InMemoryTableScan" in plan
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_dominant_period_one_series_collapse(spark, sf_dir):
    """Dominant period: one corpus collapse to the cached hourly
    series; all 24 lags share one shifted-index equi-join against the
    24-row broadcast lag spine; top-3 via TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "ts_dominant_period")
    assert "InMemoryTableScan" in plan, "hourly series not cached"
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_permutation_test_single_fact_scan(spark, sf_dir):
    """Permutation test: all 33 assignments ride ONE events scan as
    paired sufficient statistics (the live scan, plus at most one
    repeat inside printed cached lineage); downstream is a 33-row
    constant table."""
    plan = plan_of(spark, sf_dir, "stats_permutation_test")
    assert plan.count("events.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_cohens_d_one_collapse_no_joins(spark, sf_dir):
    """Cohen's d: one scan to six sufficient statistics per segment,
    scalar arithmetic after — no joins, no Python."""
    plan = plan_of(spark, sf_dir, "stats_cohens_d")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_pk_candidates_partial_distinct_aggregates(spark, sf_dir):
    """PK profiling: each candidate collapses via partial distinct
    aggregation; the total joins back as a one-row broadcast."""
    plan = plan_of(spark, sf_dir, "profile_pk_candidate")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_keyset_page_is_topk_with_pushed_cursor(spark, sf_dir):
    """Keyset pagination: page 2 plans as TakeOrderedAndProject (no
    global sort, no offset discard) under the one-row cursor
    broadcast."""
    plan = plan_of(spark, sf_dir, "window_keyset_pagination")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row cursor
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_modularity_integer_census_on_cached_labels(spark, sf_dir):
    """Modularity: propagation rounds and censuses run on the cached
    edge/label tables; all quantities integer until the final ratio."""
    plan = plan_of(spark, sf_dir, "graph_modularity")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_importance_sampling_windowed_prefix_integer_copies(spark, sf_dir):
    """Systematic resampling: one ordered window cumsum on the cached
    weight table; copy counts are a map-side integer expression under
    a one-row total broadcast; no Python."""
    plan = plan_of(spark, sf_dir, "sample_importance_systematic")
    assert "InMemoryTableScan" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "InMemoryTableScan"
    ) + 1
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_coverage_curve_vocab_grain_windows(spark, sf_dir):
    """Coverage curve: one tokenize collapse to the cached vocab
    table; the k-grid joins broadcast against the ranked cumsum; no
    Python, no cartesian beyond the constant grid pairing."""
    plan = plan_of(spark, sf_dir, "text_ngram_coverage")
    assert "InMemoryTableScan" in plan, "vocab counts not cached"
    assert "EvalPython" not in plan
    assert plan.count("documents.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1


def test_traffic_profile_constant_matrix(spark, sf_dir):
    """Traffic profile: one corpus collapse to the 168-cell matrix;
    ranking and share run on constant-sized rows; single scan."""
    plan = plan_of(spark, sf_dir, "ts_traffic_profile")
    assert "InMemoryTableScan" in plan, "cell matrix not cached"
    assert plan.count("events.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_seasonal_anomaly_profile_broadcast_back(spark, sf_dir):
    """Seasonal anomaly: hourly collapse cached; the 168-cell profile
    joins back BROADCAST; z is scalar per hourly row."""
    plan = plan_of(spark, sf_dir, "ts_seasonal_anomaly")
    assert "InMemoryTableScan" in plan, "hourly series not cached"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_centroid_drift_constant_cell_rollup(spark, sf_dir):
    """Centroid drift: one posexplode pass to (label, half, dim)
    decimal cells with partial aggregation; pairing and rollup on the
    constant-sized cell table."""
    plan = plan_of(spark, sf_dir, "emb_centroid_drift")
    assert "partial" in plan.lower()
    assert "InMemoryTableScan" in plan, "cell table not cached"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("embeddings.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1


def test_dynamic_overwrite_reads_partitioned(spark, sf_dir):
    """Dynamic partition overwrite: the read-back is a partitioned
    scan (partition column recovered from directory layout), the
    report a partial-aggregated group-by; no Python."""
    plan = plan_of(spark, sf_dir, "sink_dynamic_partition_overwrite")
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_month_arithmetic_map_only_pick(spark, sf_dir):
    """Month arithmetic: a rank pick plus map-only date expressions —
    no joins, no Python."""
    plan = plan_of(spark, sf_dir, "fn_month_arithmetic")
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_approx_topk_sketch_then_tiny_join(spark, sf_dir):
    """approx_top_k: one sketch aggregation over the corpus; the
    exact side joins on the 5-row sketch output."""
    plan = plan_of(spark, sf_dir, "agg_approx_topk")
    assert "approx_top_k" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_growth_accounting_id_keyed_probes(spark, sf_dir):
    """Growth accounting: one collapse to the cached (user, week)
    table; prev-week and churn probes are id-keyed equi-joins, never
    full-history windows."""
    plan = plan_of(spark, sf_dir, "window_growth_accounting")
    assert "InMemoryTableScan" in plan, "(user, week) table not cached"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_power_user_curve_histogram_grain(spark, sf_dir):
    """Power-user curve: per-user distinct-day collapse, cached
    day-count histogram, one-row total broadcast."""
    plan = plan_of(spark, sf_dir, "analytics_power_user_curve")
    assert "InMemoryTableScan" in plan
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_spearman_cell_collapse(spark, sf_dir):
    """Spearman: corpus collapses once to the cached cell table;
    midrank windows and joins run on tiny histograms — no cartesian,
    no Python, partial aggregation on the corpus collapse."""
    plan = plan_of(spark, sf_dir, "stats_spearman_corr")
    assert "InMemoryTableScan" in plan, "cell table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_kruskal_wallis_histogram_ranks(spark, sf_dir):
    """Kruskal-Wallis: one corpus collapse to (group, value) cells;
    ranks from the cached value histogram; the only row-free join is
    the one-row ties broadcast."""
    plan = plan_of(spark, sf_dir, "stats_kruskal_wallis")
    assert "InMemoryTableScan" in plan, "cell table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_survival_km_step_table_fold(spark, sf_dir):
    """Kaplan-Meier: corpus collapses to customer grain then to the
    cached month-step table; windows and the factor fold run on that
    constant table. Horizon is a one-row broadcast."""
    plan = plan_of(spark, sf_dir, "analytics_survival_km")
    assert "InMemoryTableScan" in plan, "step table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_abc_xyz_part_dim_windows(spark, sf_dir):
    """ABC-XYZ: two map-side-combinable fact collapses; the ranking
    window runs over the cached part-grain table; month count and
    total revenue are one-row broadcasts."""
    plan = plan_of(spark, sf_dir, "analytics_abc_xyz")
    assert "InMemoryTableScan" in plan, "part table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_hubness_cell_join_bounded(spark, sf_dir):
    """Hubness: candidates from the cell equi-join (no cartesian, no
    BNLJ beyond the one-row N broadcast), k-bounded rank window,
    map-side-combinable in-degree count."""
    plan = plan_of(spark, sf_dir, "emb_hubness")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row N
    assert "partial" in plan.lower()


def test_nprobe_curve_one_candidate_scan(spark, sf_dir):
    """nprobe sweep: the scored candidate table is cached and feeds
    truth, every sweep point, and the cost axis; the sweep join
    multiplies candidates only. No cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "sim_ivf_nprobe_curve")
    assert "InMemoryTableScan" in plan, "candidate table not cached"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_zone_map_pruning_partial_rollup(spark, sf_dir):
    """Zone-map report: per-(layout, file) min/max/count partials
    before one exchange; no cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "layout_zone_map_pruning")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_fk_orphan_report_anti_joins(spark, sf_dir):
    """FK sweep: every edge is a broadcast/shuffled LEFT ANTI join on
    the key — no cartesian beyond the 1-row count pairings, no
    Python."""
    plan = plan_of(spark, sf_dir, "profile_fk_orphan_report")
    assert "LeftAnti" in plan or "left_anti" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_feature_store_one_window_shuffle(spark, sf_dir):
    """Feature assembly: all four PIT features share one custkey
    window family (single sort order); customer dim broadcasts; no
    cartesian, no Python, no self-join of the fact table."""
    plan = plan_of(spark, sf_dir, "pipeline_feature_store_e2e")
    assert "BroadcastHashJoin" in plan, "customer dim not broadcast"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("orders.parquet") == 1, "fact scanned once"


def test_rolling_regression_single_window(spark, sf_dir):
    """Rolling OLS: sufficient statistics ride one ROWS frame — no
    joins at all, no Python."""
    plan = plan_of(spark, sf_dir, "window_rolling_regression")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Window") >= 1


def test_spc_rules_daily_collapse(spark, sf_dir):
    """SPC rules: one map-combinable daily collapse; stats are a
    one-row broadcast; rule frames ride the tiny daily table."""
    plan = plan_of(spark, sf_dir, "ts_spc_western_electric")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") <= 2  # daily + stats reuse


def test_neyman_stratum_table_only(spark, sf_dir):
    """Neyman allocation: one stratum-stats pass; allocation windows
    and totals run on the cached 5-row stratum table."""
    plan = plan_of(spark, sf_dir, "sample_stratified_neyman")
    assert "InMemoryTableScan" in plan, "stratum table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_textrank_edge_table_iterations(spark, sf_dir):
    """TextRank: one corpus tokenize + LEAD pass builds the cached
    edge table; all three iterations join vocabulary-sized tables.
    No cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "text_textrank_keywords")
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # every remaining corpus-scan reference sits inside a cached
    # (InMemoryTableScan) subtree reprint, not a live re-scan
    assert plan.count("documents.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1


def test_snapshot_recon_single_join(spark, sf_dir):
    """Snapshot recon: one co-partitioned full-outer join; every
    category folds into conditional counts of a single aggregation —
    no per-column joins."""
    plan = plan_of(spark, sf_dir, "profile_snapshot_recon")
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("orders.parquet") <= 2  # two snapshot scans


def test_cramers_v_contingency_collapse(spark, sf_dir):
    """Cramér's V sweep: per pair one collapse to cached contingency
    cells; marginals/statistic on the tiny cell table; no cartesian
    beyond one-row broadcasts, no Python."""
    plan = plan_of(spark, sf_dir, "stats_cramers_v")
    assert "InMemoryTableScan" in plan, "contingency cells not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_levene_two_pass_broadcast_means(spark, sf_dir):
    """Levene: group means broadcast back into one deviation
    aggregation — two corpus passes, no cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "stats_levene")
    assert "BroadcastHashJoin" in plan, "group means not broadcast"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_nrr_shifted_equi_join(spark, sf_dir):
    """NRR: one collapse to the cached (customer, month) grain;
    month-over-month pairing is an id-keyed equi-join (never BNLJ /
    cartesian); decomposition map-side-combinable."""
    plan = plan_of(spark, sf_dir, "analytics_net_revenue_retention")
    assert "InMemoryTableScan" in plan, "(cust, month) grain not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_negative_sampling_vocab_table(spark, sf_dir):
    """Negative sampling: one explode + vocabulary count; rank and
    cumulative windows on the cached vocab table; one-row total
    broadcast."""
    plan = plan_of(spark, sf_dir, "text_negative_sampling_table")
    assert "InMemoryTableScan" in plan, "vocab weights not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_soft_weights_fingerprint_join(spark, sf_dir):
    """Soft dedup: one fingerprint shuffle to count clusters, one
    equi-join to attach sizes back to the cached fingerprint table —
    document text never moves twice."""
    plan = plan_of(spark, sf_dir, "dedup_soft_weights")
    assert "InMemoryTableScan" in plan, "fingerprint table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_katz_edge_table_iterations(spark, sf_dir):
    """Katz: fact-sized work is the one edge build; the three
    unrolled iterations join the 25-row score vector against the
    cached binary edge table. No cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "graph_katz_centrality")
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # r10: both the contribution join (score vector vs edge table)
    # and the refresh join are broadcast-hinted — no static SMJ.
    assert "SortMergeJoin" not in plan


def test_alert_episodes_daily_collapse(spark, sf_dir):
    """Alert episodes: one daily collapse, one-row stats broadcast,
    islands grouping on the tiny alert subset."""
    plan = plan_of(spark, sf_dir, "ts_alert_episodes")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_source_report_single_corpus_pass(spark, sf_dir):
    """Source report: tokens + fingerprint derived map-side in one
    pass; rollups key-bounded; entropy on (source, lang) cells."""
    plan = plan_of(spark, sf_dir, "curation_source_report")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("documents.parquet") <= 2


def test_intrinsic_dim_cell_join(spark, sf_dir):
    """TwoNN: candidates from the cell equi-join, rank-2 cut on the
    join's partitioning, per-cell decimal term sums. No cartesian,
    no Python."""
    plan = plan_of(spark, sf_dir, "emb_intrinsic_dimension")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "partial" in plan.lower()


def test_jackknife_day_table_only(spark, sf_dir):
    """Jackknife: one day-grain collapse cached; every leave-one-out
    estimate is arithmetic against the broadcast totals row — no
    resampling passes."""
    plan = plan_of(spark, sf_dir, "stats_jackknife_ratio")
    assert "InMemoryTableScan" in plan, "day table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_feature_hashing_vocab_rollup(spark, sf_dir):
    """Hashing trick: one explode + vocab count; bucket rollup and
    dominant-token window on the cached vocab table."""
    plan = plan_of(spark, sf_dir, "text_feature_hashing")
    assert "InMemoryTableScan" in plan, "bucketed vocab not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_sink_merge_schema_readback(spark, sf_dir):
    """Schema-merge sink: the read-back plan scans the staged parquet
    (both batches) with a partial-aggregated report."""
    plan = plan_of(spark, sf_dir, "sink_merge_schema")
    assert "orders_merge_schema" in plan, "not reading staged files"
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan


def test_benford_map_side_digits(spark, sf_dir):
    """Benford: digit extraction map-side; one 9-group aggregation
    with a window total — no joins, no Python."""
    plan = plan_of(spark, sf_dir, "profile_benford_law")
    assert "Join" not in plan
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan


def test_halflife_cohort_fit(spark, sf_dir):
    """Half-life: cached first-order table, key-bounded activity
    collapse, closed-form fit on decimal sufficient statistics."""
    plan = plan_of(spark, sf_dir, "ts_retention_halflife")
    assert "InMemoryTableScan" in plan, "firsts table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_interpurchase_single_lag_window(spark, sf_dir):
    """Interpurchase gaps: one LAG window on the custkey shuffle;
    histogram + cumulative on the cached bucket table."""
    plan = plan_of(spark, sf_dir, "analytics_interpurchase_time")
    assert "InMemoryTableScan" in plan, "bucket histogram not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_segment_migration_customer_grain(spark, sf_dir):
    """Segment migration: both halves collapse to customer grain
    before the quintile windows; matrix from one full-outer key
    join."""
    plan = plan_of(spark, sf_dir, "analytics_segment_migration")
    assert "partial" in plan.lower()
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_cross_source_matrix_collapsed_join(spark, sf_dir):
    """Cross-source matrix: the fingerprint equi-join runs on the
    cached (source, fingerprint) collapsed table, never on raw
    documents; no cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "dedup_cross_source_matrix")
    assert "InMemoryTableScan" in plan, "collapsed grain not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_reciprocity_transpose_equi_join(spark, sf_dir):
    """Reciprocity: distinct-edge build cached; the probe is an
    equi-join of the edge table against its transpose."""
    plan = plan_of(spark, sf_dir, "graph_reciprocity")
    assert "InMemoryTableScan" in plan, "edge table not cached"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_strength_measures_daily_table(spark, sf_dir):
    """Strength measures: one daily collapse; MA window, DOW means,
    and variance stats on the cached valid-day table."""
    plan = plan_of(spark, sf_dir, "ts_strength_measures")
    assert "InMemoryTableScan" in plan, "valid-day table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_alignment_uniformity_bounded_pairs(spark, sf_dir):
    """Alignment from the cell equi-join; uniformity from the bounded
    50x50 sampled panel (broadcast product of two 1/10 subsets) —
    no unbounded cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "emb_alignment_uniformity")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "InMemoryTableScan" in plan, "normalized corpus not cached"


def test_pacf_one_row_recursion(spark, sf_dir):
    """PACF: one daily collapse, demeaned lag products decimal-summed
    to a one-row ACF table; the recursion is scalar arithmetic (no
    joins beyond the stats broadcast)."""
    plan = plan_of(spark, sf_dir, "ts_pacf_durbin")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_theil_segment_decomposition_shape(spark, sf_dir):
    """Theil: one (segment, customer) collapse cached; segment means
    broadcast back; rollups on the 5-row segment table."""
    plan = plan_of(spark, sf_dir, "agg_theil_inequality")
    assert "InMemoryTableScan" in plan, "spend grain not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_revenue_bridge_one_fact_pass(spark, sf_dir):
    """Revenue bridge: both period sums as conditional aggregates in
    ONE fact pass (no period self-join); waterfall window on the
    cached 5-row segment table."""
    plan = plan_of(spark, sf_dir, "analytics_revenue_bridge")
    assert "InMemoryTableScan" in plan, "segment table not cached"
    assert "partial" in plan.lower()
    assert plan.count("orders.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_burstiness_vocab_rollup(spark, sf_dir):
    """Burstiness: (doc, word) collapse then vocabulary rollup;
    doc count is a one-row broadcast; top-k via
    TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "text_word_burstiness")
    assert "partial" in plan.lower()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_countmin_width_curve_shared_stream(spark, sf_dir):
    """Width curve: one cached gram stream feeds the sketch build,
    exact truth, and candidates; the width sweep multiplies only
    (gram, seed) pairs; no cartesian beyond 1-row/3-row broadcasts."""
    plan = plan_of(spark, sf_dir, "sketch_countmin_width_curve")
    assert "InMemoryTableScan" in plan, "gram stream not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_concurrency_sweep_on_session_grain(spark, sf_dir):
    """Sweep-line: sessionization on the per-user window; the prefix
    sum runs over cached SESSION endpoints, not events."""
    plan = plan_of(spark, sf_dir, "ts_concurrency_sweepline")
    assert "InMemoryTableScan" in plan, "session table not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_yoy_monthly_window(spark, sf_dir):
    """YoY: one month-grain collapse; lag-12 and the gap guard ride
    one window on the tiny monthly table — no joins."""
    plan = plan_of(spark, sf_dir, "ts_year_over_year")
    assert "Join" not in plan
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan


def test_basket_size_order_grain(spark, sf_dir):
    """Basket curve: one order-grain collapse (count + revenue in the
    same aggregate), size-bounded histogram, one-row totals
    broadcast."""
    plan = plan_of(spark, sf_dir, "analytics_basket_size_curve")
    assert "InMemoryTableScan" in plan, "histogram not cached"
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("lineitem.parquet") <= plan.count(
        "InMemoryTableScan"
    ) + 1


def test_lexical_diversity_vocab_rollup(spark, sf_dir):
    """Lexical diversity: one explode to (source, word) counts, then
    a per-source rollup — no joins, no Python."""
    plan = plan_of(spark, sf_dir, "text_lexical_diversity")
    assert "Join" not in plan
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan


def test_separation_histogram_bounded_pairs(spark, sf_dir):
    """Separation histogram: within pairs from the cell equi-join,
    cross pairs from the bounded sampled panel; bucket rollup with
    per-type window totals. No unbounded cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "emb_separation_histogram")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "InMemoryTableScan" in plan, "normalized corpus not cached"


def test_seed_independence_single_scan(spark, sf_dir):
    """Seed audit: pure map-side hashing into one conditional
    aggregate — no joins, no Python, one corpus scan."""
    plan = plan_of(spark, sf_dir, "sample_seed_independence")
    assert "Join" not in plan
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan
    assert plan.count("documents.parquet") == 1


def test_ljung_box_one_row_acf(spark, sf_dir):
    """Ljung-Box: one daily collapse, decimal ACF sufficient
    statistics on one row, closed-form Q."""
    plan = plan_of(spark, sf_dir, "stats_ljung_box")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_kalman_filter_single_window_fold(spark, sf_dir):
    """Kalman: one (user_id) window fold, no joins, pure JVM."""
    plan = plan_of(spark, sf_dir, "ts_kalman_filter")
    assert "Window" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_delta_method_two_aggregations_no_join(spark, sf_dir):
    """Delta-method ratio: user collapse then six sufficient sums per
    arm — two chained aggregates, no join, one corpus scan."""
    plan = plan_of(spark, sf_dir, "stats_delta_method_ratio")
    assert "Join" not in plan
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_ams_f2_one_key_collapse_no_join(spark, sf_dir):
    """AMS F2: corpus -> per-key counts -> one single-row aggregate
    carrying all 64 counters; no join, no Python, one scan."""
    plan = plan_of(spark, sf_dir, "sketch_ams_f2")
    assert "Join" not in plan
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_ip_cidr_broadcast_equi_joins_only(spark, sf_dir):
    """CIDR LPM: one broadcast hash equi-join per prefix length —
    no range/nested-loop join, no exchange of the fact side."""
    plan = plan_of(spark, sf_dir, "fn_ip_cidr")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    assert plan.count("events.parquet") == 1


def test_sax_one_exchange_no_python(spark, sf_dir):
    """SAX: NTILE window + both aggregates share the (user_id)
    exchange; no Python, one corpus scan."""
    plan = plan_of(spark, sf_dir, "ts_sax_symbolic")
    assert "Window" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_silhouette_one_row_broadcast_scoring(spark, sf_dir):
    """Silhouette: the 16 centroid arrays collapse to ONE broadcast
    row; the scoring pass is a map-only fold (the only nested-loop
    join is that 1-row broadcast), no vector shuffle."""
    plan = plan_of(spark, sf_dir, "emb_silhouette_simplified")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_fisher_exact_one_scan_metadata_spine(spark, sf_dir):
    """Fisher: one documents scan collapses to four integers; the
    support spine is metadata-sized; no Python."""
    plan = plan_of(spark, sf_dir, "stats_fisher_exact")
    assert plan.count("documents.parquet") == 1
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_runs_test_shared_exchange(spark, sf_dir):
    """Runs test: rank/count/lag windows all ride the event_type
    exchange over the daily table; integers until the final z."""
    plan = plan_of(spark, sf_dir, "stats_runs_test")
    assert "Window" in plan
    assert "EvalPython" not in plan
    # The daily table is cached; the raw scan appears only inside
    # printed cached lineage (one per InMemoryTableScan), never as an
    # extra physical read.
    assert "InMemoryTableScan" in plan, "daily table not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")


def test_dtw_profile_cached_no_python(spark, sf_dir):
    """DTW: the O(types) profile table is cached (one corpus
    collapse) and the DP is a pure JVM fold — no UDF, no cartesian
    beyond the tiny pair self-join."""
    plan = plan_of(spark, sf_dir, "ts_dtw_distance")
    assert "EvalPython" not in plan
    assert "InMemoryTableScan" in plan, "profile table not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")


def test_js_divergence_one_explode_broadcast_vocab(spark, sf_dir):
    """JS divergence: one persisted corpus explode; vocabulary and
    totals join back as broadcasts; no Python."""
    plan = plan_of(spark, sf_dir, "text_js_divergence")
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan
    assert plan.count("documents.parquet") <= plan.count("InMemoryTableScan")


def test_holm_bonferroni_broadcast_crit_window(spark, sf_dir):
    """Holm: the five welch t-stats collapse to constant state; the
    rank-vs-critical join is a broadcast of the 5-row crit literal;
    the step-down is one window; no Python."""
    plan = plan_of(spark, sf_dir, "stats_holm_bonferroni")
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan
    assert plan.count("events.parquet") == 1


def test_anderson_darling_cached_daily_no_python(spark, sf_dir):
    """A-D: one (event_type, day) collapse cached; moments from
    decimal sums; the rank window and term aggregate ride the tiny
    daily table; the Phi polynomial is a pure JVM expression."""
    plan = plan_of(spark, sf_dir, "stats_anderson_darling")
    assert "EvalPython" not in plan
    assert "Window" in plan
    assert "InMemoryTableScan" in plan, "daily table not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")


def test_eval_auc_single_scan_rank_window(spark, sf_dir):
    """AUC: one documents scan, tie-averaged ranks via windows over
    the per-source sort, constant per-source state after; no
    Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "eval_auc_roc")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("documents.parquet") == 1


def test_eval_calibration_single_scan_partial_agg(spark, sf_dir):
    """ECE: one scan collapsing to <=10 bins with map-side partial
    aggregation; the ECE window rides the bin rows; no Python."""
    plan = plan_of(spark, sf_dir, "eval_calibration_ece")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_(sum|count)", plan), "no partial agg"


def test_eval_pass_at_k_single_agg_no_window(spark, sf_dir):
    """pass@k: one events scan, one groupBy with map-side partials,
    per-row arithmetic on the (n, c) aggregate — no windows, no
    joins, no Python."""
    plan = plan_of(spark, sf_dir, "eval_pass_at_k")
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("events.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_eval_ndcg_rank_windows_single_scan(spark, sf_dir):
    """NDCG: one documents scan feeding both rank windows; constant
    per-source state after; no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "eval_ndcg_at_k")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("documents.parquet") == 1


def test_bradley_terry_broadcast_iterations_cached_pairs(spark, sf_dir):
    """BT: the rating vector localCheckpoints per MM round (r10
    lineage discipline), so the FINAL plan is the wintot-join-ratings
    readout: cached win totals (InMemoryTableScan — wintot/directed
    caching still guards the one events collapse), the checkpointed
    rating RDD, no cartesian, no Python. The per-round broadcast
    hints execute eagerly inside the checkpoint jobs; the
    registry-based cache guard below covers the persisted bases."""
    plan = plan_of(spark, sf_dir, "eval_bradley_terry")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "pair/wintot tables not cached"
    assert "ExistingRDD" in plan, "rating state not checkpointed"


def test_mcnemar_single_scan_partial_agg(spark, sf_dir):
    """McNemar: map-only gate evaluation, four conditional counts per
    source with map-side partials; no windows, joins, or Python."""
    plan = plan_of(spark, sf_dir, "eval_mcnemar_paired")
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_classification_report_cells_cached_broadcast(spark, sf_dir):
    """Classification report: the corpus collapses once to the
    (gold, pred) cell table (cached); per-class tp/fp/fn ride the
    tiny class x cell frame via a broadcast — the corpus is never
    cross-joined; no Python."""
    plan = plan_of(spark, sf_dir, "eval_classification_report")
    assert "EvalPython" not in plan
    assert "InMemoryTableScan" in plan, "confusion cells not cached"
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    # The only allowed product is cells x classes — both class-count
    # sized. The raw documents scan appears once per cached lineage
    # print, never as an extra physical read.
    assert plan.count("documents.parquet") <= plan.count(
        "InMemoryTableScan"
    )


def test_cohens_kappa_single_scan_partial_agg(spark, sf_dir):
    """Kappa: one scan, map-only gates, five conditional counts per
    source with map-side partials; no windows, joins, or Python."""
    plan = plan_of(spark, sf_dir, "eval_cohens_kappa")
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_mrr_collapses_at_rank_window(spark, sf_dir):
    """MRR: one documents scan, the per-source rank window, an
    immediate MIN collapse to one row per source; the global-mean
    window rides the tiny result; no Python."""
    plan = plan_of(spark, sf_dir, "eval_mrr_at_k")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("documents.parquet") == 1


def test_brier_bins_cached_constant_joins(spark, sf_dir):
    """Brier: one scan to 10 cached bin rows; the totals/resolution
    passes are constant-size cross joins of 1- and 10-row frames;
    no Python."""
    plan = plan_of(spark, sf_dir, "eval_brier_decomposition")
    assert "EvalPython" not in plan
    assert "InMemoryTableScan" in plan, "bin table not cached"
    assert re.search(r"partial_(sum|count)", plan), "no partial agg"


def test_eval_e2e_union_no_python(spark, sf_dir):
    """The eval dashboard is the union of its components' plans —
    no Python anywhere, no row-level cartesian (the only products
    are the components' constant-size stat frames)."""
    plan = plan_of(spark, sf_dir, "pipeline_eval_e2e")
    assert "EvalPython" not in plan
    assert "Union" in plan


def test_average_precision_shared_sort_exchange(spark, sf_dir):
    """AP: the rank and running-positive windows share one
    per-source sort; constant state after the collapse; no Python,
    no cartesian."""
    plan = plan_of(spark, sf_dir, "eval_average_precision")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("documents.parquet") == 1
    # One sort feeds both window functions (same partition/order
    # spec) — two Sort operators over documents would mean the
    # windows didn't fuse.
    assert plan.count("Sort [source") <= 1


def test_threshold_sweep_broadcast_constant_fanout(spark, sf_dir):
    """Sweep: the 9-row threshold frame joins as a broadcast
    (constant fan-out), then one (source, threshold) collapse with
    map-side partials; no Python."""
    plan = plan_of(spark, sf_dir, "eval_threshold_sweep")
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_lift_gains_single_sort_constant_tail(spark, sf_dir):
    """Gains/lift: one per-source sort exchange feeds NTILE; after the
    (source, decile) collapse every window runs on a 10-rows-per-source
    frame. No Python, no cartesian, one scan."""
    plan = plan_of(spark, sf_dir, "eval_lift_gains")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count|partial_sum", plan), "no partial agg"


def test_split_kfold_maponly_assignment(spark, sf_dir):
    """k-fold: the fold column is pure row-local hashing (codegen), the
    only shuffle is the 5-row report collapse with map-side partials;
    the share window runs on the constant 5-row frame."""
    plan = plan_of(spark, sf_dir, "split_kfold")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_keyness_windows_on_cell_frame(spark, sf_dir):
    """Keyness: one corpus scan explodes to tokens, collapses to the
    vocabulary-sized cell table, and the b/c/d margins are windows on
    that frame; no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "text_keyness_gtest")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_graph_scc_no_python_no_cartesian(spark, sf_dir):
    """SCC: after the per-round checkpoints the final plan is the
    mutual equi-join + min-agg + size window over the constant-size
    closure — no Python, no cartesian. (The fact-table scans live
    behind the checkpoints, so scan counts are asserted in the
    semantics replay instead.)"""
    plan = plan_of(spark, sf_dir, "graph_scc")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_fd_profile_partial_aggs_union(spark, sf_dir):
    """FD discovery: each candidate collapses to (det, dep) cells with
    map-side partials, unioned at the 6-row report; no Python, no
    cartesian, column-pruned scans."""
    plan = plan_of(spark, sf_dir, "profile_functional_dependency")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Union" in plan
    assert re.search(r"partial_count", plan), "no partial agg"


def test_wilcoxon_rank_on_collapsed_values(spark, sf_dir):
    """Wilcoxon: one events scan collapses to (event_type, user)
    pairs, ranks run on the (event_type, |d|) distinct collapse with
    one window; no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "stats_wilcoxon_signed_rank")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("events.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_friedman_ranks_within_user_blocks(spark, sf_dir):
    """Friedman: one events scan collapses to (user, type) means,
    ranks run inside constant 5-row per-user blocks, and the
    treatment rollup is 5 rows; no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "stats_friedman_test")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("events.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_delong_shares_source_sort(spark, sf_dir):
    """DeLong CI: all four rank/tie windows ride per-source sorts of
    the same scored frame; constant state after the collapse; no
    Python, no cartesian, one scan."""
    plan = plan_of(spark, sf_dir, "eval_auc_delong_ci")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("documents.parquet") == 1


def test_dunn_pairs_on_constant_group_table(spark, sf_dir):
    """Dunn: the corpus collapses to (group, value) cells; the only
    non-equi join is the k-row group-table self-pairing (constant
    fan-out). No Python; the cell/group frames are cached, so the
    events scan executes once — the scan substring repeats only
    inside printed cached lineage (one per InMemoryTableScan)."""
    plan = plan_of(spark, sf_dir, "stats_dunn_posthoc")
    assert "EvalPython" not in plan
    assert "InMemoryTableScan" in plan, "cell table not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")
    assert re.search(r"partial_count|partial_sum", plan), "no partial agg"


def test_rejection_sampling_maponly_coin(spark, sf_dir):
    """Rejection sampling: score and coin flip are map-side codegen on
    the scan; the only shuffle is the per-source report collapse. No
    Python, no join, one scan."""
    plan = plan_of(spark, sf_dir, "curation_rejection_sampling")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_shapley_constant_lattice_join(spark, sf_dir):
    """Shapley: one events scan collapses users to (mask, converted);
    the Shapley stage is a 32-row literal joined against the cached
    <=16-row coalition table (broadcast), so the corpus scan executes
    once — the scan substring repeats only inside printed cached
    lineage. No Python."""
    plan = plan_of(spark, sf_dir, "attribution_shapley")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "coalition table not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")
    assert "BroadcastHashJoin" in plan


def test_parity_audit_maponly_gate(spark, sf_dir):
    """Parity audit: score + gate are map-side; the only corpus
    shuffle is the per-source collapse, and the parity window runs on
    the source-sized frame. No Python, no join, one scan."""
    plan = plan_of(spark, sf_dir, "curation_gate_parity_audit")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_betweenness_no_python_no_cartesian(spark, sf_dir):
    """Betweenness: after the per-round checkpoints the final plan is
    the three-way equi-join of the constant-size path table + the
    pinned dependency sum — no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "graph_betweenness")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_granger_one_scan_pinned_moments(spark, sf_dir):
    """Granger: one events scan collapses to the hourly grid; the lag
    window runs on that bounded frame and both directions read the
    same cached 1-row moment table. No Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "ts_granger_causality")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "moment row not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")


def test_hurst_bounded_frames_no_python(spark, sf_dir):
    """Hurst: one scan collapses to the hourly grid; block passes run
    on the cached bounded frame; the fit is a literal linear
    combination of four broadcast 1-row frames. No Python."""
    plan = plan_of(spark, sf_dir, "ts_hurst_exponent")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "hour grid not cached"
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan")


def test_burrows_delta_metadata_sized_pair_join(spark, sf_dir):
    """Burrows' Delta: corpus collapses to (source, word) cells; the
    dense grid, moments, and pair join run on the cached
    (sources x top-K) frame. No Python; token explode scans the
    corpus once (substring repeats only in cached lineage)."""
    plan = plan_of(spark, sf_dir, "text_burrows_delta")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "cell frame not cached"
    assert plan.count("documents.parquet") <= plan.count("InMemoryTableScan")


def test_cochran_armitage_five_cell_collapse(spark, sf_dir):
    """CA trend: binning is map-side; the corpus collapses to at most
    5 dose cells with map-side partials; the statistic is a 1-row
    expression. No Python, one scan. The only join is the r12
    absent-cell fix: the constant 5-row dose spine LEFT-joins the
    observed cells (broadcast, constant side) so empty buckets reach
    the expected-count guard as zeros."""
    plan = plan_of(spark, sf_dir, "stats_cochran_armitage")
    assert "EvalPython" not in plan
    assert plan.count("Join") <= 2, "more than the dose-spine join"
    assert "CartesianProduct" not in plan
    assert plan.count("documents.parquet") == 1
    assert re.search(r"partial_count", plan), "no partial agg"


def test_iterative_bases_stay_persisted(spark, sf_dir):
    """r10 regression guard (code-review finding): the per-round
    localCheckpoints made the fact-sized base caches INVISIBLE in the
    final plans (lineage truncates at the checkpointed RDDs), so the
    old InMemoryTableScan asserts could no longer catch a dropped
    track_persist. Guard at the session registry instead: running
    each iterative key must leave a persisted frame whose analyzed
    plan reaches the fact table — if a refactor drops the
    track_persist, every eager per-round checkpoint job re-runs the
    full fact build and this registry entry disappears."""
    cases = [
        ("graph_label_propagation", "lineitem"),  # cached strong edges
        ("graph_hits", "lineitem"),  # cached directed edge list
        ("graph_bfs_hops", "lineitem"),  # shared _strong_edges cache
        ("graph_modularity", "lineitem"),  # shared _strong_edges cache
        ("eval_bradley_terry", "events"),  # cached pair/win tables
    ]
    for key, fact in cases:
        SPECS[key].fn(spark, sf_dir).collect()
        reg = getattr(spark, "_powersql_persisted", [])
        plans = [
            df._jdf.queryExecution().analyzed().toString() for df in reg
        ]
        assert any(fact in p for p in plans), (
            f"{key}: no persisted frame reads {fact} — fact-sized "
            "base cache dropped; every checkpoint round would re-run "
            "the fact build"
        )


# ---------------------------------------------------------------------------
# Round-11 tranche plan gates.
# ---------------------------------------------------------------------------


def test_apsp_centralities_read_checkpointed_state(spark, sf_dir):
    """Closeness (and the APSP family behind it): the multi-source
    min-plus rounds execute eagerly into checkpointed O(nations^2)
    state, so the FINAL plan is a pure aggregation over the last
    checkpoint — zero joins, zero fact scans (the LPA/BFS/HITS
    truncation discipline applied to the distance table)."""
    plan = plan_of(spark, sf_dir, "graph_closeness_centrality")
    assert "ExistingRDD" in plan, "APSP state not checkpointed"
    assert plan.count("Join") == 0, "round join subtrees not truncated"
    assert ".parquet" not in plan, "fact scan leaked past the checkpoint"
    assert "EvalPython" not in plan


def test_hhi_broadcasts_cell_totals(spark, sf_dir):
    """HHI: brand totals and the part dimension join back broadcast;
    no cartesian anywhere; the only corpus exchange is the (brand,
    supplier) cell collapse."""
    plan = plan_of(spark, sf_dir, "agg_hhi_concentration")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_rbo_rankings_are_topk_cuts(spark, sf_dir):
    """RBO: both rankings must plan as top-k cuts (rank-limit
    windows), and the depth curve's non-equi join is a broadcast
    nested loop of the CONSTANT 20-row prefix table — bounded work,
    explicitly allowed; a cartesian of anything data-sized is not."""
    plan = plan_of(spark, sf_dir, "eval_rbo_overlap")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "EvalPython" not in plan


def test_elasticity_single_corpus_collapse(spark, sf_dir):
    """Price elasticity: the regression needs five sufficient sums
    per brand — ONE lineitem scan with the part dimension broadcast;
    a second corpus scan means the sufficient-statistic form was
    lost."""
    plan = plan_of(spark, sf_dir, "analytics_price_elasticity")
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_mahalanobis_topk_and_broadcast_moments(spark, sf_dir):
    """Mahalanobis outliers: the (label x dim) moment grid joins back
    BROADCAST onto the exploded vectors, and the top-10 is a
    TakeOrderedAndProject — never a global sort."""
    plan = plan_of(spark, sf_dir, "emb_mahalanobis_outlier")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_linear_counting_partial_aggregates(spark, sf_dir):
    """Linear counting: the bucket distinct-count must partial-
    aggregate before the exchange (per-partition state capped at m
    counters per group — the mergeability the estimator exists
    for)."""
    plan = plan_of(spark, sf_dir, "sketch_linear_counting")
    assert "partial" in plan.lower(), "no map-side partial aggregation"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_mood_median_single_corpus_collapse(spark, sf_dir):
    """Mood's median: the (segment, value) grid is the ONLY corpus
    collapse — the global median histogram and the per-segment
    above/below counts both derive from the cached grid, so the
    fact tables are scanned once, not once per readout."""
    plan = plan_of(spark, sf_dir, "stats_mood_median")
    # Every consumer (median histogram, per-segment counts, margin
    # totals) must read the cached grid — the InMemoryRelation's
    # printed subtree repeats the file scan TEXT per consumer, but the
    # build runs once; the gate is that no consumer bypasses the
    # cache, i.e. at least three InMemoryTableScans appear.
    assert plan.count("InMemoryTableScan") >= 3, "cell grid not cached"
    assert "EvalPython" not in plan


def test_time_decay_attribution_broadcast_normalization(spark, sf_dir):
    """Time-decay attribution: no cartesian, no Python; the per-user
    normalization rides a window on the same user_id partitioning as
    the conversion join (the position_based skeleton)."""
    plan = plan_of(spark, sf_dir, "attribution_time_decay")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "hashpartitioning(user_id" in plan


# ---------------------------------------------------------------------------
# Round-12 tranche plan gates.
# ---------------------------------------------------------------------------


def test_daily_indicator_family_single_scan_no_joins(spark, sf_dir):
    """The r12 daily-series indicators collapse the corpus ONCE to
    the per-type daily table (or daily OHLC candles) and do all
    window math on that one (event_type) exchange — one events scan,
    zero joins, zero Python."""
    for key in (
        "ts_dickey_fuller",
        "ts_stochastic_oscillator",
        "ts_garman_klass",
    ):
        plan = plan_of(spark, sf_dir, key)
        assert plan.count("events.parquet") == 1, key
        assert "Join" not in plan, key
        assert "EvalPython" not in plan, key


def test_anchored_window_indicators_persist_daily_frame(spark, sf_dir):
    """Aroon / CCI reference the anchor row's own window aggregate
    (days-since-extreme, MAD around the current SMA), so they plan as
    self-joins of the PERSISTED daily frame — every consumer must
    read the cache (the stats_mood_median discipline applied at
    authoring time), and the join stays broadcast-hash, never a
    cartesian."""
    for key, min_imts in (("ts_aroon", 2), ("ts_cci", 3)):
        plan = plan_of(spark, sf_dir, key)
        assert plan.count("InMemoryTableScan") >= min_imts, key
        assert "CartesianProduct" not in plan, key
        assert "EvalPython" not in plan, key


def test_brown_forsythe_single_corpus_collapse(spark, sf_dir):
    """Brown-Forsythe's (group, value) grid feeds both the median
    window and the deviation sums — it must be cached so the corpus
    collapses exactly once."""
    plan = plan_of(spark, sf_dir, "stats_brown_forsythe")
    assert plan.count("InMemoryTableScan") >= 2, "cell grid not cached"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_cliffs_delta_never_materializes_pairs(spark, sf_dir):
    """Cliff's delta uses the midrank Mann-Whitney identity: one
    (event_type, value) collapse, one rank window — NO join of any
    kind (a pair join would be quadratic in rows)."""
    plan = plan_of(spark, sf_dir, "stats_cliffs_delta")
    assert "Join" not in plan
    assert plan.count("events.parquet") == 1
    assert "EvalPython" not in plan


def test_wiener_reads_checkpointed_apsp_state(spark, sf_dir):
    """Wiener index aggregates the checkpointed APSP distance table:
    final plan over ExistingRDD, zero fact scans (the closeness-
    centrality truncation discipline); the node-count attach is the
    one allowed 1-row broadcast."""
    plan = plan_of(spark, sf_dir, "graph_wiener_index")
    assert "ExistingRDD" in plan
    assert ".parquet" not in plan.replace("nation.parquet", "", 1)
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "EvalPython" not in plan


def test_anisotropy_no_pair_join(spark, sf_dir):
    """Anisotropy's mean pairwise cosine must come from the
    sum-vector identity: one posexplode + per-dim sums — the only
    join is the broadcast 1-row count attach; a vector-vector join
    means the identity was lost."""
    plan = plan_of(spark, sf_dir, "emb_anisotropy")
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_cka_moment_passes_share_centered_cache(spark, sf_dir):
    """Linear CKA's three Frobenius moment grids must all read the
    persisted centered-coordinate frame (three vec_id equi-join
    passes over one cache — never a recomputed explode per pass, and
    never a row-level Gram)."""
    plan = plan_of(spark, sf_dir, "emb_cka_halves")
    assert plan.count("InMemoryTableScan") >= 3, "centered frame not cached"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_fuzzy_levenshtein_blocked_and_name_deduped(spark, sf_dir):
    """The fuzzy join must pair at DISTINCT-name granularity from the
    persisted name table (cache read by both the pair stage and the
    per-brand counts) with a brand-equi hash join — a cartesian or a
    row-granularity pair stage is the quadratic failure mode."""
    plan = plan_of(spark, sf_dir, "join_fuzzy_levenshtein")
    assert plan.count("InMemoryTableScan") >= 2, "name table not cached"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_precision_recall_k_spine_is_constant_side(spark, sf_dir):
    """P/R@k's only non-equi join is the 3-row k-spine broadcast
    against the rank window — bounded fan-out, explicitly allowed; a
    cartesian of anything data-sized is not."""
    plan = plan_of(spark, sf_dir, "eval_precision_recall_at_k")
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# Round-13 broadcast-gate widening (ADVICE r12 #3): tools/plan_audit.py
# swept ALL 591 plans for dimension-table scans riding shuffle joins.
# 13 keys flagged; triage: join_full is structural (Spark cannot
# broadcast either side of a FULL OUTER join), the graph-family SMJs
# are edge<->edge joins of the checkpointed frontier/edge state (both
# sides NODE/EDGE-sized — the graph IS the data; the dim scans feed
# union'd self-loops or the one-time broadcast edge build), and the
# two genuinely-fixable flags (agg_theil_inequality's 5-row
# seg-within join, ts_gap_fill_locf's metadata-sized rollup side)
# now carry explicit broadcast hints, asserted here.
# ---------------------------------------------------------------------------


def test_theil_segment_joins_broadcast(spark, sf_dir):
    """Theil decomposition: every join above the (segment, customer)
    collapse is segment-cardinality — all of them must broadcast."""
    plan = plan_of(spark, sf_dir, "agg_theil_inequality")
    assert "SortMergeJoin" not in plan, (
        "segment-cardinality join rides a shuffle exchange"
    )
    assert "BroadcastHashJoin" in plan


def test_gap_fill_rollup_broadcasts(spark, sf_dir):
    """LOCF gap fill: the hourly rollup side of the spine join is
    (types x hours) — metadata-sized — and must broadcast."""
    plan = plan_of(spark, sf_dir, "ts_gap_fill_locf")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_full_outer_join_smj_is_structural(spark, sf_dir):
    """Spark cannot broadcast either side of a FULL OUTER equi-join:
    the SMJ in join_full is the correct (and only) plan. Pin that
    understanding so a future 'fix' doesn't silently change join
    semantics to make a broadcast appear."""
    plan = plan_of(spark, sf_dir, "join_full")
    assert "SortMergeJoin" in plan
    assert "FullOuter" in plan


# ---------------------------------------------------------------------------
# Round-13 tranche plan gates: the new keys' scale shapes, pinned.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "key,max_bnlj",
    [
        # Bounded cell-pair non-equi joins: the <=250-row side is
        # broadcast, so every nested-loop is a bounded BNLJ and never
        # a cartesian. JT additionally crossJoins its two one-row
        # moment aggregates (broadcast), hence the 3-BNLJ budget.
        ("stats_jonckheere_terpstra", 3),
        ("stats_somers_d", 1),
        ("stats_gk_gamma", 1),
    ],
)
def test_r13_cell_pair_joins_are_bounded_bnlj(
    spark, sf_dir, key, max_bnlj
):
    plan = plan_of(spark, sf_dir, key)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj
    assert "EvalPython" not in plan


@pytest.mark.parametrize(
    "key",
    [
        # Daily-series keys: the corpus collapses once; everything
        # downstream is metadata-sized — no shuffle join of fact data
        # and no Python anywhere.
        "stats_huber_irls",
        "stats_siegel_slopes",
        "stats_cox_stuart",
        "ts_changepoint_binseg",
        "ts_kaufman_er",
        "ts_sample_entropy",
        "ts_higuchi_fd",
        # Rank/score-cell keys: cells first, windows on cells.
        "stats_cucconi_test",
        "stats_rank_biserial",
        "eval_youden_j",
        "eval_expected_cost",
        "eval_brier_skill",
        # One-scan scalar keys.
        "stats_odds_ratio",
        "stats_risk_ratio",
        "stats_poisson_two_rate",
        "stats_capture_recapture",
        "ts_vwap_daily",
        "ts_parkinson_volatility",
        "ts_rogers_satchell",
        "ts_yang_zhang",
    ],
)
def test_r13_keys_no_cartesian_no_python(spark, sf_dir, key):
    plan = plan_of(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, f"{key} plans a cartesian"
    assert "EvalPython" not in plan, f"{key} drops to Python"


def test_huber_rounds_reuse_persisted_daily(spark, sf_dir):
    """The IRLS rounds re-read the SAME persisted daily table (the
    corpus collapses once — InMemoryTableScan, not a re-derived
    corpus chain per round) and each round's <=5-row fit state is an
    eager localCheckpoint (graph-op lineage discipline), so the final
    plan's fit inputs are checkpointed ExistingRDD scans."""
    plan = plan_of(spark, sf_dir, "stats_huber_irls")
    assert plan.count("InMemoryTableScan") >= 2
    assert plan.count("ExistingRDD") >= 2
    assert "CartesianProduct" not in plan


def test_prefixspan_no_sequence_materialization(spark, sf_dir):
    """PrefixSpan rides (user, type) min/max key tables and one
    bounded-fanout projection join — equi-joins only; the single
    1-row broadcast (the user-count denominator) is the only BNLJ."""
    plan = plan_of(spark, sf_dir, "analytics_prefixspan")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "EvalPython" not in plan


def test_rnn_mutual_blocked_equi_join(spark, sf_dir):
    """Mutual-NN candidates come from the label-cell EQUI-join (the
    emb_knn_graph discipline) — a cartesian here is the quadratic
    blowup the cell blocking exists to prevent."""
    plan = plan_of(spark, sf_dir, "dedup_rnn_mutual")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_degree_gini_edge_build_broadcasts_dims(spark, sf_dir):
    """The strong-edge build joins its dimensions broadcast (shared
    helper); the Gini rank window then runs on node-cardinality
    rows."""
    plan = plan_of(spark, sf_dir, "graph_degree_gini")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Round-13 second-wave plan gates.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "key,max_bnlj",
    [
        # One-row / k-row scalar frames broadcast into the next
        # stage: each crossJoin(broadcast(...)) is a bounded BNLJ,
        # never a cartesian (the tpch_q11/q22 SCALAR_BROADCAST_OK
        # pattern). The branch re-embeds read the PERSISTED bounded
        # histogram (asserted below), so the budget counts constant-
        # work joins, not corpus re-scans.
        ("stats_median_test", 11),
        ("stats_welch_anova", 1),
        # Cronbach: the 5-row item grid fans the user list (bounded
        # BNLJ), plus the one-row numerator join.
        ("stats_cronbach_alpha", 3),
    ],
)
def test_r13b_scalar_broadcasts_are_bounded_bnlj(
    spark, sf_dir, key, max_bnlj
):
    plan = plan_of(spark, sf_dir, key)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj
    assert "EvalPython" not in plan
    # The shared bounded frame (value histogram / score grid) is
    # persisted, so every branch re-embed reads cache — the corpus
    # parquet is scanned once, at cache build.
    assert "InMemoryTableScan" in plan


@pytest.mark.parametrize(
    "key",
    [
        # Daily-candle indicator keys: one corpus collapse, folds and
        # windows on the metadata-sized grid.
        "ts_keltner_channels",
        "ts_chaikin_money_flow",
        "ts_mass_index",
        "ts_trix",
        "ts_choppiness_index",
        "ts_ultimate_oscillator",
        "ts_market_beta",
        # Histogram/cell keys and map-only scores.
        "stats_bowker_symmetry",
        "stats_kuiper_uniform",
        "stats_dixon_q",
        "text_yule_k",
        "text_coleman_liau",
        "graph_avg_neighbor_degree",
    ],
)
def test_r13b_keys_no_cartesian_no_python(spark, sf_dir, key):
    plan = plan_of(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, f"{key} plans a cartesian"
    assert "EvalPython" not in plan, f"{key} drops to Python"


def test_market_beta_day_join_broadcasts(spark, sf_dir):
    """The per-type returns join the 29-row market-return spine via
    the explicit broadcast hint (VERDICT r12 ask #3 — dimension-sized
    join sides must broadcast in the STATIC plan)."""
    plan = plan_of(spark, sf_dir, "ts_market_beta")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_avg_neighbor_degree_degree_joins_broadcast(spark, sf_dir):
    """Both degree-table legs onto the edge list are broadcast — the
    O(nations) side never shuffles the join."""
    plan = plan_of(spark, sf_dir, "graph_avg_neighbor_degree")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# r13 OPTIMIZATION-round gates: pin the plan shapes the optimization
# waves introduced (OPTIMIZATION_r13.md waves 17-22). Each assertion
# encodes the property the wave's before/after plan files evidence; if
# a refactor or Catalyst change silently undoes one, these fail.
# ---------------------------------------------------------------------------


def test_theilsen_pairs_copartitioned_shuffle_join(spark, sf_dir):
    """Wave 19: the O(L^2) pair stage rides a SHUFFLE_HASH self-join
    over a cores-derived repartition of the INPUT rows, so the median
    window reuses the join partitioning. A broadcast here would silently
    re-shuffle every pair row into the window (the 37.9 MB regression
    this gate exists to prevent)."""
    plan = plan_of(spark, sf_dir, "ts_theilsen_slope")
    assert "ShuffledHashJoin" in plan
    assert "REPARTITION_BY_NUM" in plan
    assert "BroadcastHashJoin" not in plan


def test_interval_overlap_single_hourly_subtree(spark, sf_dir):
    """Wave 17 (r13): the spike threshold is a window over the hourly
    aggregate, not a groupBy + broadcast-join-back. Gate on the
    STRUCTURAL count of FileScan nodes over events (ADVICE r13: a bare
    substring count of the path was hostage to toString formatting):
    exactly 2 — one for the session-window side, one feeding the
    hourly-spike subtree (which the window rewrite executes once; the
    pre-wave-17 form re-scanned it per broadcast consumer, 3 scans)."""
    plan = plan_of(spark, sf_dir, "join_interval_overlap")
    scans = len(re.findall(r"FileScan parquet[^\n]*events", plan))
    assert scans == 2, plan


def test_countmin_sketch_rides_distinct_counts(spark, sf_dir):
    """Wave 18: both the sketch build and the exact top-30 read the
    persisted distinct-gram count table (bucket hashes computed per
    VOCABULARY entry, not per occurrence)."""
    plan = plan_of(spark, sf_dir, "sketch_countmin_bigrams")
    assert plan.count("InMemoryTableScan") >= 2


def test_minhash_signatures_computed_once(spark, sf_dir):
    """Wave 20: both sides of the banded self-join read the persisted
    signature frame (plus the shingle cache) instead of re-running the
    16-min aggregation per side."""
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert plan.count("InMemoryTableScan") >= 3


def test_bm25_tokenize_cached_across_consumers(spark, sf_dir):
    """Wave 20: corpus stats, tf rows and docfreq all read the cached
    tokenized corpus / tf table — the tokenize ran three times before."""
    for key in ("text_bm25_topk", "sim_hybrid_rrf"):
        plan = plan_of(spark, sf_dir, key)
        assert plan.count("InMemoryTableScan") >= 3, key


def test_compute_dense_stages_keep_width(spark, sf_dir):
    """Waves 20/22: stages whose work is quadratic (pair generation)
    or per-group (pandas) in a byte-light input carry an explicit
    cores-derived repartition so AQE's byte-based coalescing cannot
    serialize them."""
    for key in ("analytics_market_basket", "dedup_semdedup", "grouped_zscore"):
        plan = plan_of(spark, sf_dir, key)
        assert "REPARTITION_BY_NUM" in plan, key


def test_textrank_edge_cache_single_partition(spark, sf_dir):
    """Wave 20: the vocabulary-sized edge table is cached as ONE
    partition, which is what lets AQE resolve every iteration exchange
    to a trivial single-partition read at runtime (measured: 17 jobs /
    50 stages -> 7 / 17). The static plan still PRINTS the exchanges
    (their elision is a runtime AQE decision), so the stable property
    to pin is the Coalesce(1) under the cached relation."""
    df = SPECS["text_textrank_keywords"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce 1" in plan
