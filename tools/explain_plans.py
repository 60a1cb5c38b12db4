"""Regenerate PLANS.md: formatted physical plans for representative
queries, with the properties each plan is expected to exhibit.

Run: python tools/explain_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOW = {
    "tpch_q1": "Filter + ALL partial aggregation fused into the scan stage "
    "(WholeStageCodegen); the exchange moves 4 groups of partial state.",
    "tpch_q3": "Filtered customer broadcasts; filters sit on every FileScan "
    "(DataFilters/PushedFilters); ORDER BY+LIMIT is TakeOrderedAndProject.",
    "tpch_q5": "Six-way join with every dimension broadcast; only the "
    "fact-fact edge could shuffle, and AQE decides at runtime.",
    "sink_bucketed": "Join over two bucketed tables: no Exchange between "
    "the scans and the join — the only exchange is the final regroup.",
    "sink_partitioned": "Partition-pruned read: the l_returnflag predicate "
    "lands in PartitionFilters, so non-matching directories are never opened.",
    "dedup_exact": "Shuffles (16-byte hash, id), never document text; "
    "partial count/min before the exchange.",
    "window_qualify": "Single shuffle on the partition key; rank filter "
    "applied inside the window stage.",
    "dedup_minhash_lsh": "Shingles hash once in codegen; 16 partial MIN "
    "aggregates collapse the shuffle to (doc_id, 16 longs); the candidate "
    "join runs on banded signatures, never raw text.",
    "skyline_pareto": "Sort-scan rewrite: min-size-per-price aggregate, "
    "prefix-min window, broadcast semi-join back — no O(n^2) nested loop.",
    "pipeline_training_data": "Filters fused into the scan; the dedup "
    "window is the only shuffle; chunk explode sits after dedup so "
    "dropped docs never pay chunking cost.",
    "tpch_q17": "Correlated AVG decorrelated: per-part thresholds built "
    "once and broadcast; the fact table is scanned twice at most (fact + "
    "threshold build), never per-part.",
    "tpch_q21": "EXISTS/NOT EXISTS pair decorrelated into one grouped "
    "pass + window counts: lineitem appears in exactly ONE FileScan.",
    "tpch_q2": "Correlated MIN subquery as a window MIN over the part "
    "key; the part-supplier bridge is a map-side DISTINCT before any "
    "join; all dimensions broadcast.",
    "dedup_chunk_crosscorpus": "Span dedup: the window exchange "
    "partitions on the 16-byte md5 of each chunk — chunk text is "
    "projected away below the exchange, so only (doc_id, offset, hash) "
    "ever shuffles.",
    "curation_contamination_check": "Decontamination: the fixed-size "
    "benchmark n-gram set broadcasts; the corpus side is one linear "
    "exploded scan — corpus text never shuffles.",
    "emb_centroids": "Columnar reduce: posexplode is map-side; partial "
    "HashAggregate below the exchange means each partition ships at "
    "most labels×dims partial sums, independent of row count.",
    "text_ngram_topk": "Heavy hitters: partial count before the "
    "(gram)-shuffle, TakeOrderedAndProject for the top-30 — never a "
    "global sort of the vocabulary.",
    "dedup_exact_substring": "Stride-1 span dedup: token arrays are "
    "projected away below the first exchange — both shuffles carry "
    "narrow keys (16-byte md5, then doc_id); no join anywhere.",
    "layout_zorder": "Z-order: 1-row bounds frame broadcast into a "
    "pure-codegen quantize+interleave pass; 64-row partial aggregate "
    "before the only exchange; no UDF in the plan.",
    "join_fuzzy_names": "Blocked fuzzy match: hash equi-join on the "
    "noun block key with levenshtein as a post-join filter — never "
    "Cartesian; the corpus-sized work is one DISTINCT-name aggregate.",
    "dedup_semdedup": "SemDeDup: constant-size centroid table broadcast "
    "back to the scan; the pairwise stage is an equi-join on "
    "(label, sub-bucket) with the block cap bounding any cell's pairs.",
    "curation_dsir_weights": "DSIR: both 128-bucket language models "
    "reduce to constant-size tables; the per-token log-ratio lookup is "
    "a BroadcastHashJoin; the only fact-sized exchange is the per-doc "
    "sum.",
    "emb_pq_encode": "PQ encode: the 8x16 codebook broadcasts; the "
    "subvector explode is map-side; the only exchange is the final "
    "per-vector groupBy of (m, k, dist) triples.",
    "ts_resample_ohlc": "OHLC: one aggregation pass — min_by/max_by "
    "carry open/close through partial state; only candle state crosses "
    "the exchange, never raw ticks.",
    "agg_bitmap_distinct": "Bitmap distinct: the one-hot OR partially "
    "aggregates map-side to 8 bytes per group — constant state "
    "regardless of row count.",
    "layout_compaction_bins": "Compaction planner: one window exchange "
    "on source computes the running total; integer bin arithmetic in "
    "codegen; no join, no global sort.",
    "scd2_intervals": "SCD2: LEAD/ROW_NUMBER over one exchange on "
    "user_id — the linear alternative to the quadratic self-join "
    "history build.",
    "stream_upsert_sink": "Streaming MERGE sink: per-batch delta "
    "reduces before the keyed full-outer merge; AQE broadcasts the "
    "delta side against the accumulated target.",
    "curation_token_budget": "Token budget: two-phase distributed "
    "prefix sum — 256-row bucket offsets broadcast back, per-bucket "
    "running sums in parallel; no global-sort window.",
    "sample_poisson_bootstrap": "Poisson bootstrap: the x16 replicate "
    "explode partially aggregates in its own stage — exchanges carry "
    "(type, replicate) sums, never the exploded stream.",
    "window_session_dynamic": "Dynamic-gap sessions: native "
    "session_window with a per-row gap expression; one exchange on "
    "user_id, stateful-ready.",
    "attribution_last_touch": "Attribution: one trailing-frame window "
    "pass on user_id — never the quadratic correlated latest-earlier "
    "subquery.",
    "ts_ewma": "EWMA: one (user_id) exchange, one Window node; the "
    "recursion is an expression-level left-fold — no Python, no join.",
    "ts_anomaly_zscore": "Rolling z-score: mean/std/count share ONE "
    "bounded-frame Window over one exchange; constant per-row state.",
    "text_tfidf_topk": "TF-IDF top-k: one persisted corpus explode "
    "feeds tf AND df; vocabulary-sized IDF broadcasts back; "
    "WindowGroupLimit pushes the top-3 cut below the final sort.",
    "mm_phash_dedup": "pHash dedup: ONE Arrow mapInPandas stage (the "
    "decode slot) emits 64-bit signatures; band joins are 16-bit "
    "equi-joins; shuffles carry (doc_id, shorts, long), never bytes.",
    "incr_agg_maintenance": "Incremental MV refresh: disjoint cutoff "
    "filters pushed to both scans; mergeable COUNT/decimal-SUM state; "
    "the equals-full gate joins group-cardinality-sized frames.",
    "sim_maxsim_multivector": "MaxSim: broadcast single-row query; the "
    "4x4 dot-product lattice is one nested HOF expression (no "
    "explode); TakeOrderedAndProject cuts the top-k.",
    "graph_triangle_count": "Triangles: fact-sized edge build cached "
    "once; ordered a<b<c equi-join legs read the in-memory edge "
    "table.",
    "diff_metric_snapshots": "Snapshot diff: the full-outer snapshot "
    "join collapsed to ONE conditional aggregation — single pushed-"
    "filter scan, no Join node anywhere.",
    "sketch_bloom_prefilter": "Bloom prefilter: probe tests bits "
    "against plan literals — no key shuffle of the probe stream; the "
    "only join is the broadcast evaluation join.",
    "ts_theilsen_slope": "Theil-Sen: pairwise equi-join on the series "
    "key; the ranking window reuses the join's partitioning (no "
    "exchange between them).",
    "text_bigram_logprob": "Bigram LM: token arrays build bigrams "
    "map-side (no positional self-join); the vocabulary model joins "
    "back broadcast.",
    "pipeline_curation_e2e": "Curation funnel cost ladder: map-only "
    "URL canonicalization, hash-only exact-dedup windows, LSH only "
    "over survivors (persisted), id-keyed anti-join, packing window "
    "over final survivors.",
    "sketch_kmv_distinct": "KMV sketch: text dies at the scan "
    "projection; the per-scope k-minima cut is a PARTIAL "
    "WindowGroupLimit (partition-local bounded top-k before the "
    "exchange); global scope is TakeOrderedAndProject.",
    "dedup_minhash_estimate": "Sketch-served Jaccard: the estimate "
    "joins 16-long signature rows on bare ids where exact "
    "verification re-joins shingle arrays — the cheap path a 100 TB "
    "run serves.",
    "emb_knn_graph": "k-NN graph: candidate pairs from the cell "
    "equi-join (norms precomputed before the join); per-source top-5 "
    "is a rank filter on the join's own partitioning — no cartesian.",
    "sim_pq_adc_search": "PQ-ADC: codebook + query LUT broadcast; the "
    "corpus-side work is integer-keyed joins and a decimal sum per "
    "vector; both the Hamming-free shortlist and rerank plan as "
    "TakeOrderedAndProject.",
    "stream_late_audit": "Watermark audit: two-phase distributed "
    "prefix max — within-bucket window on hashpartitioning(bkt), "
    "bucket maxima broadcast back; no single-partition corpus pass.",
    "stats_mann_whitney": "Rank-sum test: corpus collapses to "
    "(event_type, value) distinct counts before any window; the rank "
    "prefix sum and final statistic run on the collapsed table.",
    "eval_auc_roc": "Rank-sum AUC (bench q61): one per-source sort "
    "exchange feeds tie-averaged rank windows; the statistic "
    "collapses to one row per source with decimal-summed rank sums.",
    "eval_auc_delong_ci": "DeLong AUC CI: all four rank windows "
    "(overall + within-class, tie counts) ride ONE per-source sort "
    "exchange — the within-class partitioning is a sub-partitioning "
    "of the same sort order; placements are decimal-pinned before "
    "the variance sums collapse to one row per source.",
    "pipeline_eval_e2e": "Evaluation dashboard composite: the "
    "registered component keys are INVOKED (not re-implemented) and "
    "unioned in long format at metadata size — each component is "
    "individually shuffle-light and nothing joins across them, so "
    "the plan is a union of the audited component plans.",
    "ts_pacf_durbin": "Durbin-Levinson PACF: one daily collapse, "
    "demeaned lag products decimal-summed into a ONE-ROW ACF table; "
    "the recursion is scalar arithmetic on that row (unrolled, no "
    "iteration over data), reshaped to 4 (lag, acf, pacf) rows.",
    "ts_sax_symbolic": "SAX words: one (user_id) exchange shared by "
    "the NTILE window and both aggregates; z-scores are compared "
    "against Gaussian breakpoints, never emitted, so no rounding "
    "guard is needed; constant state per series.",
    "stats_ols_multi": "Multivariate OLS via normal equations: ONE "
    "partial-aggregated pass collapses the corpus to ten decimal "
    "sufficient statistics per group; Cramer's rule on the 3x3 Gram "
    "matrix is post-aggregation arithmetic — the fixed-dimension "
    "linear-model pattern at 100 TB.",
    "window_rolling_regression": "Rolling OLS slope: the four "
    "sufficient statistics ride ONE ROWS frame on one shuffle of "
    "(custkey, day, orderkey); slope is closed-form per row — no "
    "self-join, no per-entity fitting loop.",
    "stats_sprt_sequential": "SPRT: map-side aggregation to a bit "
    "per user, one window cumsum over INTEGER counts (LLR "
    "reconstructed as count * ln-constant, so floats never "
    "accumulate); the global ORDER BY is the operator's semantics "
    "and costs one sort of user-grain rows.",
    "analytics_survival_km": "Kaplan-Meier: corpus collapses to "
    "customer grain then to the bounded month-duration step table; "
    "the cumulative product is an explicit ordered left fold on that "
    "tiny frame — deterministic IEEE sequence on both engines.",
    "graph_katz_centrality": "Katz: the fact-sized work is one "
    "edge-build join tree + aggregation; each unrolled iteration "
    "joins the 25-row score vector against the binary edge table — "
    "bounded depth, metadata-sized frames.",
    "graph_hits": "HITS: one-pass fact collapse to the persisted "
    "edge list; each half-iteration is a broadcast join + one "
    "decimal aggregation, the normalizer a one-row broadcast — no "
    "driver-side state. Each half-step's O(nations) score vector is "
    "localCheckpointed (the kcore/Brandes discipline): without it "
    "the analyzed plan re-embedded the full prior half-step's tree "
    "each step (~900 nodes, 35 s of mostly Catalyst time for a "
    "25-row result; 10 s after), so the plan below shows the final "
    "half-step over checkpointed RDD scans.",
    "sketch_ams_f2": "AMS F2: one exchange collapses the corpus to "
    "the per-key count table; the 64 sign counters and exact F2 ride "
    "ONE single-row aggregate — constant, linearly mergeable state.",
    "stats_anderson_darling": "Anderson-Darling: one (event_type, "
    "day) collapse; the rank window and 8dp-decimal-summed term "
    "aggregate ride the metadata-sized daily table.",
    "text_keyness_gtest": "G-test keyness: token explode collapses to "
    "the vocabulary-sized (source, word) cell table; the b/c/d "
    "margins are windows over that frame — tokens never shuffle "
    "twice.",
    "graph_scc": "Exact SCC: the final plan is the mutual equi-join + "
    "min-agg + size window over the checkpointed closure (constant "
    "O(nations^2) rows); the 3^k lineage blowup is cut by per-round "
    "localCheckpoint.",
    "profile_functional_dependency": "FD discovery: each candidate "
    "collapses to (det, dep) cells with map-side partials; the "
    "exchange carries distinct pairs, and candidates union at the "
    "6-row report.",
    "graph_betweenness": "Exact Brandes betweenness: the only "
    "data-sized step is the distinct-edge aggregation (dimensions "
    "broadcast); BFS rounds and the three-way dependency join run on "
    "the checkpointed O(nations^2) table, so the final plan is "
    "joins+aggregates over localCheckpoint scans, not fact scans.",
    "pipeline_experiment_e2e": "Experiment readout composite: three "
    "independent map-side-combinable collapses of one corpus (SRM, "
    "Welch, proportion-z) unioned at metadata size — no cross-check "
    "joins, no corpus re-shuffle between checks.",
    "sketch_histogram_quantiles": "Mergeable-histogram quantiles: the "
    "corpus collapses to (type, bin) integer counts — the exchange "
    "carries 60-bin state, the CDF walk is a window over that "
    "constant table.",
    "attribution_shapley": "Exact Shapley over 4 channels: users "
    "collapse to (mask, converted) with map-side partials; the "
    "32-term coalition computation is a literal join on the "
    "<=16-row v(S) table — constant past the first aggregate.",
    "ts_dtw_distance": "DTW as nested higher-order aggregates: the "
    "corpus collapses to per-type 24-point hourly profiles; the "
    "O(24^2) DP runs inside one JVM projection over the persisted "
    "profile self-join — no UDF, no per-pair shuffle.",
    "join_interval_overlap": "Interval x interval via grid bucketing: "
    "sessions explode to the hour buckets they span, spike windows "
    "occupy one bucket, candidates come from an hour EQUI-join (no "
    "theta-join node anywhere); the overlap predicate filters only "
    "grid-collocated pairs.",
    "sim_hybrid_rrf": "RRF fusion: BM25 posting lists and one map-only "
    "cosine pass against a broadcast query vector; both rank windows "
    "cut to top-50 BEFORE the fusion join, so the full-outer join is "
    "50x50-row, and the final cut is TakeOrderedAndProject.",
    "dedup_embedding_lsh": "Hyperplane-LSH near-dup: signatures from "
    "one Arrow-batched matmul (map-only); the band equi-join moves "
    "(vec_id, band, value) scalars only — arrays are fetched by id "
    "AFTER the candidate dedup, and no all-pairs stage exists in the "
    "plan.",
    "pipeline_feature_store_e2e": "Point-in-time feature backfill: "
    "ONE custkey shuffle serves all four leakage-safe RANGE frames "
    "(shared partitioning + sort); the customer dimension joins "
    "broadcast — no self-join, no per-entity loop.",
    "curation_gate_parity_audit": "Disparate-impact audit: scoring "
    "and gating fuse into the scan stage (map-side codegen); the "
    "only corpus exchange is the per-source collapse, and the "
    "four-fifths window runs on the source-count-sized frame.",
    "analytics_market_basket": "Market basket: DISTINCT (order, part) "
    "once; the pair stage self-equi-joins on orderkey so cost is "
    "bounded by basket size squared, never corpus squared; n_ab >= 2 "
    "filters before lift; top-20 is TakeOrderedAndProject.",
    # graph_kcore is deliberately NOT dumped: its two unrolled peels
    # print as a ~450-node tree (every peel re-references the prior
    # edge set), which is analysis-time verbosity only — every branch
    # bottoms out in the ONE persisted strong-edge InMemoryTableScan,
    # and all peel state is <= 25-node dimension-graph tables.
    "ts_concurrency_sweepline": "Sweep-line concurrency: "
    "sessionization rides ONE per-user window exchange; the +1/-1 "
    "sweep runs on session endpoints (two rows per session, far "
    "below event grain), ends-before-starts tie order pinned in the "
    "sort keys.",
    "dedup_cross_source_matrix": "Cross-source dup matrix: one "
    "collapse to (source, fingerprint) grain, then the collapsed "
    "table equi-joins itself on fingerprint — candidate volume "
    "bounded by source counts per fingerprint, never corpus "
    "all-pairs; a.source < b.source halves the matrix.",
    # --- r10: the remaining bench headline queries, so every one of
    # the 63 carries a pinned plan audit. ---
    "join_inner": "Fact-dim-dim star join: both dimensions broadcast "
    "(BuildRight), the fact table is scanned once with its filter "
    "pushed; no shuffle anywhere in the join tree.",
    "agg_sum": "Grouped SUM: partial HashAggregate below the single "
    "exchange — only (group, partial-sum) state shuffles, map-side "
    "combine does the data-sized work.",
    "window_fns": "Rank/lag window: exactly ONE hash exchange on the "
    "partition key feeds the in-partition sort; the rank filter "
    "applies inside the window stage, before any further movement.",
    "subq_exists": "EXISTS decorrelates to a LeftSemi "
    "BroadcastHashJoin — the filtered subquery side broadcasts; the "
    "probe side streams with no exchange.",
    "window_session": "Sessionization lowers to native "
    "MergingSessions over one exchange on the session key: "
    "per-partition partial session state merges at the exchange, so "
    "gap-stitching never needs a second shuffle.",
    "sim_topk_bruteforce": "Exact cosine top-k: the 1-row query "
    "vector broadcasts (BroadcastNestedLoopJoin of a 1-row build "
    "side = map-only attach); scoring fuses into the corpus scan and "
    "the cut is TakeOrderedAndProject — no global sort, no shuffle "
    "of the corpus.",
    "text_quality_score": "Gopher-style quality components: pure "
    "map-only codegen — tokenize/ratio/score all fuse into the "
    "document scan; the plan has zero exchanges.",
    "tpch_q6": "Forecast-revenue filter+agg: all three predicates "
    "push to the scan (PushedFilters), partial aggregate below the "
    "single exchange, which carries ONE row of partial state.",
    "tpch_q10": "Returned-items report: lineitem scanned once with "
    "the returnflag filter pushed; customer/orders/nation all "
    "broadcast; the top-20-by-revenue cut is TakeOrderedAndProject.",
    "text_chunk": "64/48 sliding-window chunking: Generate (the "
    "stride explode) fuses into the scan stage inside WholeStageCodegen "
    "— map-only, zero exchanges; chunk count scales the OUTPUT, not "
    "any shuffle.",
    "tpch_q13": "Customer order-count distribution: the orders-side "
    "aggregate collapses to per-customer counts BEFORE the LeftOuter "
    "join, and that count table broadcasts — customer never "
    "shuffles; the histogram regroup runs on count-sized state.",
    "tpch_q8": "Market-share: an eight-way join tree where every "
    "dimension (part/supplier/customer/nation x2/region/orders-side "
    "filters) broadcasts — lineitem is the only fact-sized scan and "
    "it never exchanges before the final two-level aggregate.",
    "funnel_conversion": "Step funnel: per-user ordered step "
    "timestamps derive from THREE windows sharing ONE exchange+sort "
    "(same partition key, Catalyst reuses the sort order); the "
    "conversion rollup then runs on per-user step flags.",
    "sketch_countmin_bigrams": "Count-min over bigrams: the exploded "
    "bigram relation is cached once (InMemoryRelation reused by both "
    "the sketch and the truth side); the sketch is a (depth x width) "
    "constant-state aggregate; heavy-hitter verification joins "
    "TakeOrderedAndProject output against the broadcast truth.",
    "graph_pagerank": "PageRank, 3 unrolled iterations: the "
    "fact-sized edge build runs ONCE into a persisted O(nations^2) "
    "transition table (every iteration branch bottoms out in the "
    "same InMemoryRelation); each iteration is a broadcast join of "
    "the 25-row rank vector + one grouped sum, and the rank-vector "
    "refresh joins broadcast too — no fact-sized exchange after the "
    "edge aggregate.",
    "dedup_url_canonical": "URL canonicalization dedup: normalize "
    "fuses into the scan (map-only), then ONE exchange on the "
    "canonical key with partial count/min below it — raw URLs never "
    "shuffle twice.",
    "ts_lttb_downsample": "LTTB: one hash exchange on the series key "
    "+ partition-local sort feed a single MapInPandas — each "
    "partition's series walk in one Arrow round-trip (NOT "
    "per-series applyInPandas, which paid one Python call per key).",
    "join_temporal_scd2": "SCD2 temporal join: change rows get "
    "valid-to via LEAD over one per-key window exchange; the union "
    "with the open tail re-windows on the SAME key so the second "
    "exchange is the only addition — no range join, no cross "
    "product.",
    "path_trigram_topk": "Clickstream trigrams: per-user paths "
    "collapse via ObjectHashAggregate (collect_list) on one "
    "exchange; trigram Generate runs on the collapsed per-user rows; "
    "partial counts precede the gram exchange and the top-k is "
    "TakeOrderedAndProject.",
    "stats_ks_two_sample": "Two-sample KS: each side collapses to "
    "its value-grain ECDF (partial aggs + one exchange per side, "
    "both value-distinct-sized); the 1-row count frames broadcast "
    "(BroadcastNestedLoopJoin of a 1-row build side); the sup-gap "
    "scan is a window over the merged ECDF, and the statistic exits "
    "via TakeOrderedAndProject(1).",
    "layout_hilbert": "Hilbert layout: the 1-row min/max bounds "
    "frame broadcasts; all 8 xy2d rotation steps are CHAINED "
    "PROJECTIONS fused map-side (named columns, not exponentially "
    "nested expressions); the only exchange is the final per-bucket "
    "rollup.",
    "ts_downsample_m4": "M4 downsample: ONE exchange on the series "
    "key; min/max/first/last per pixel bucket via SortAggregate "
    "reusing the window's sort order — the four extremes shuffle as "
    "partial state, never raw points twice.",
    "funnel_window_depth": "windowFunnel-style depth: per-user event "
    "sequences collapse through ObjectHashAggregate on one exchange; "
    "the in-order step walk is an array fold over each user's "
    "collected (ts, step) pairs — corpus touches one shuffle total.",
    "pipeline_rag_e2e": "RAG index+retrieve end-to-end: chunking "
    "explodes map-side and broadcasts into the embedding attach; "
    "centroids collapse to a constant cells-x-dims table that "
    "broadcasts into the probe; probed-cell candidates only reach "
    "the scorer and the top-5 is TakeOrderedAndProject — the corpus "
    "pays one scan + one manifest aggregate, nothing quadratic.",
    "text_rake_keywords": "RAKE: the tokenized corpus caches ONCE "
    "(every branch bottoms out in the same InMemoryRelation); "
    "word-degree and phrase-score sides are vocabulary-sized "
    "aggregates; the one SortMergeJoin joins two vocabulary-grain "
    "tables (both far below corpus grain); top-k is "
    "TakeOrderedAndProject.",
    "text_textrank_keywords": "TextRank: the corpus pays ONE "
    "posexplode + per-doc LEAD window into a cached vocabulary-sized "
    "edge table; all 3 PageRank iterations join rank vectors "
    "broadcast against that InMemoryRelation; the top-20 cut runs "
    "before the final co-occurrence annotate.",
    "sim_ivf_nprobe_curve": "IVF nprobe sweep: the corpus is scored "
    "ONCE against the 5-query broadcast batch into a persisted "
    "candidate table; truth, every nprobe point, and the cost axis "
    "all read that InMemoryRelation; sweep-point joins run on "
    "cell-pruned candidate rows (SortMergeJoin of sub-corpus "
    "derived tables), never re-scanning the corpus.",
}


def main() -> None:
    from powersql_spark.registry import all_specs
    from powersql_spark.session import build_session

    spark = build_session(app_name="explain_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    sf = "/root/testdata/sf0.01"

    out = [
        "# PLANS — physical plans of representative queries",
        "",
        "Generated by `python tools/explain_plans.py` at sf0.01 "
        "(plan shape, not timings — AQE may re-plan at runtime on real "
        "data volumes). Each section states the property the plan must "
        "exhibit; regenerate after touching an operator to confirm the "
        "plan you want is still the plan you get.",
        "",
    ]
    for key, claim in SHOW.items():
        df = specs[key].fn(spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # Keep the operator tree; drop the verbose per-node footnotes.
        tree = plan.split("\n\n")[0]
        out += [f"## {key}", "", claim, "", "```", tree, "```", ""]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"),
        "w",
    ) as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
