"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <scale factor>}

Query set: the engine's headline shapes — wide aggregation (TPC-H Q1),
broadcast star join, window functions, decorrelated EXISTS, exact +
MinHash dedup, sessionization, embedding top-k. Results land in a noop
sink (compute measured, driver transfer excluded) except tiny results,
which are collected.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from powersql_spark.registry import all_specs  # noqa: E402
from powersql_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# bench name -> registry key
HEADLINE = {
    "q1_pricing_summary": "agg_group_by",
    "q2_star_join": "join_inner",
    "q3_rev_per_product": "agg_sum",
    "q4_window_topn": "window_fns",
    "q5_exists_decorrelate": "subq_exists",
    "q6_dedup_exact": "dedup_exact",
    "q7_sessionize": "window_session",
    "q8_sim_topk": "sim_topk_bruteforce",
    "q9_dedup_minhash": "dedup_minhash_lsh",
    "q10_text_quality": "text_quality_score",
}


def main() -> None:
    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else -1.0
    spark = build_session(app_name="powersql_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # Warm up the JVM/parquet reader once so q1 doesn't absorb session
    # startup; real clusters amortize this across the job lifetime.
    from powersql_spark.catalog import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for bench_name, key in HEADLINE.items():
        fn = specs[key].fn
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        timings[bench_name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
