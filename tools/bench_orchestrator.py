"""Serial vs parallel orchestrator run on the wide example DAG
(examples/wide: 8 independent branch models + 1 fan-in summary).

The reference executes models strictly serially (src/main.rs:400-413);
``run(parallel=True)`` submits ready models concurrently from a thread
pool, which overlaps independent Spark jobs. This script times both
modes back to back on the same session (one warmup run first so JIT /
file-listing costs don't bias either side) and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from powersql_spark.orchestrator.runner import run  # noqa: E402
from powersql_spark.session import build_session  # noqa: E402

PROJECT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "wide",
)


def main() -> int:
    spark = build_session(
        app_name="orchestrator_bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    run(spark, PROJECT)  # warmup (codegen, file listing)
    times = {}
    for mode, par in (("serial", False), ("parallel", True)):
        t0 = time.time()
        order = run(spark, PROJECT, parallel=par)
        times[mode] = round(time.time() - t0, 3)
        assert len(order) == 9, order
    times["speedup"] = round(times["serial"] / times["parallel"], 2)
    print(json.dumps(times))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
