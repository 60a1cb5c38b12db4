"""Scale smoke: execute EVERY registered key at a larger scale factor
(default sf0.1 — 10x the oracle SF) and report errors and slow
outliers. No oracle comparison (that's sf0.01's job / tools/
drive_contract.py); this sweep catches what small-SF parity cannot:
operators whose plans or caps degrade with volume.

Run: python tools/scale_smoke.py [sf_dir] [slow_threshold_sec]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    slow_s = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0

    from powersql_spark.registry import all_specs
    from powersql_spark.session import build_session

    spark = build_session(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    bad, slow = [], []
    t00 = time.time()
    specs = all_specs()
    for key, spec in specs.items():
        t0 = time.time()
        try:
            n = spec.fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 - report, don't abort
            bad.append((key, str(e)[:160]))
            continue
        dt = time.time() - t0
        if dt > slow_s:
            slow.append((key, round(dt, 1), n))
    print(
        f"{len(specs)} keys in {time.time() - t00:.0f}s at {sf_dir}"
    )
    print("errors:", bad or "none")
    print(f"slow (>{slow_s:.0f}s):", slow or "none")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
