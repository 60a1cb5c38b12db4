"""Same-host bench comparison: run ANOTHER commit's bench.py and this
tree's bench.py back to back on the current machine, then diff
per-query.

Cross-boot BENCH_r{N}.json files are not comparable (host speed varies
~1.6x between driver boots — see README "Bench methodology"); this is
the honest way to call a regression.

Usage:
    python tools/bench_compare.py <old-ref> [--threshold 1.15]

Creates a temporary worktree for <old-ref>, runs its bench.py, runs the
current tree's bench.py, prints a per-query table of shared queries and
exits nonzero if any shared query regressed past the threshold.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True,
        text=True,
        check=True,
        cwd=tree,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_ref")
    ap.add_argument("--threshold", type=float, default=1.15)
    args = ap.parse_args()

    wt = "/tmp/powersql_bench_oldref"
    subprocess.run(
        ["git", "worktree", "remove", "--force", wt],
        cwd=ROOT,
        capture_output=True,
    )
    subprocess.run(
        ["git", "worktree", "add", wt, args.old_ref],
        cwd=ROOT,
        check=True,
        capture_output=True,
    )
    try:
        old = run_bench(wt)["queries"]
        new = run_bench(ROOT)["queries"]
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=ROOT,
            capture_output=True,
        )
    shared = sorted(set(old) & set(new))
    regressions = []
    print(f"{'query':28s} {'old':>7s} {'new':>7s} ratio")
    for q in shared:
        ratio = new[q] / old[q] if old[q] else float("inf")
        flag = ""
        if ratio > args.threshold:
            regressions.append(q)
            flag = "  <-- REGRESSION"
        print(f"{q:28s} {old[q]:7.3f} {new[q]:7.3f} {ratio:5.2f}{flag}")
    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(
        f"\nshared total: {t_old:.2f}s -> {t_new:.2f}s "
        f"({t_new / t_old:.2f}x); {len(regressions)} regression(s)"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
