"""Per-key wall-clock sweep under the VANILLA driver session.

Times every `queries()` key (fn build + toPandas) on a bare
local[8] session at sf0.01 — the exact geometry the external driver
pays — and prints the slowest keys. This is a PLAN-PATHOLOGY
detector, not a benchmark: the tuned bench (bench.py) hides
Catalyst analysis blowups behind low shuffle-partition counts and
warm caches, while this sweep surfaced the r10 class of
geometric-lineage iterative keys (HITS 35 s for a 25-row result;
modularity/Bradley-Terry/BFS/LPA likewise — all since fixed with
per-round localCheckpoints, SURVEY.md "decision 8").

Triage guide for a slow key:
  - re-time it with shuffle.partitions=16: if the time collapses,
    it is vanilla 200-partition stage overhead, not a defect;
  - if it stays slow, explain() it — a plan re-embedding its own
    lineage per unrolled round (node count growing with rounds) is
    the geometric signature; apply the SURVEY decision-8 discipline.

Usage:
    cd /tmp && python /root/repo/tools/timing_sweep.py [top_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    for key, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).toPandas()
            times[key] = time.perf_counter() - t0
        except Exception as exc:  # surface, keep sweeping
            times[key] = -1.0
            print(f"{key}: ERROR {exc}")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v:7.2f}  {k}")
    print(
        "total",
        round(sum(v for v in times.values() if v > 0), 1),
        "s over",
        len(times),
        "keys",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
