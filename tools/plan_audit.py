"""Plan-audit sweep (ADVICE r12): for every registered key, render the
executed physical plan and flag joins where a DIMENSION-sized side
(nation/region/supplier/part/customer scans, at any SF tiny relative to
the facts) rides a shuffle join (SortMergeJoin / ShuffledHashJoin)
instead of a broadcast. The flag is a coarse per-plan heuristic — a
plan can contain both a legitimate fact-fact SMJ and a broadcast dim
join — so flagged keys are triage INPUT, not failures; the curated
verdicts live in tests/test_plans.py::test_dim_join_keys_broadcast.

Run: python tools/plan_audit.py [key ...]   (default: all keys)
Prints one line per flagged key plus a summary.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")

DIM_SCANS = (
    "nation.parquet",
    "region.parquet",
    "supplier.parquet",
    "part.parquet",
    "customer.parquet",
)
SHUFFLE_JOINS = ("SortMergeJoin", "ShuffledHashJoin")


def main() -> int:
    from pyspark.sql import SparkSession

    from powersql_spark.catalog import release_persisted
    from powersql_spark.registry import all_specs

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    keys = sys.argv[1:] or list(specs)
    flagged, errs, t0 = [], [], time.time()
    for i, key in enumerate(keys):
        release_persisted(spark)
        try:
            df = specs[key].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must keep going
            errs.append(key)
            print(f"[{i}] {key}: PLAN ERROR {type(e).__name__}: {e}")
            continue
        has_dim = any(d in plan for d in DIM_SCANS)
        has_shuffle_join = any(j in plan for j in SHUFFLE_JOINS)
        if has_dim and has_shuffle_join:
            dims = [d.split(".")[0] for d in DIM_SCANS if d in plan]
            joins = {j: plan.count(j) for j in SHUFFLE_JOINS if j in plan}
            flagged.append(key)
            print(f"[{i}] {key}: dims={dims} shuffle_joins={joins}")
    release_persisted(spark)
    release_persisted(spark)
    dt = time.time() - t0
    print(
        f"\n{len(keys)} keys in {dt:.0f}s; {len(flagged)} flagged, "
        f"{len(errs)} errors: {flagged + errs}"
    )
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
