"""Regenerate INVENTORY.md from the query registry.

Usage: python tools/gen_inventory.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powersql_spark.registry import all_specs  # noqa: E402

HEADER = """# INVENTORY — registered operator keys (generated from the registry)

One row per `queries()` key in `__spark_entry__.py`. Oracle = has a
DuckDB SQL twin in `oracle_sql()` (driver hash-compares values). As of
round 4 EVERY key has one: engine-specific semantics (learned models,
iterative merges, sequential selections) are verified either exactly
(unrolled bounded loops, portable hash families) or via in-query
boolean gates (recall/accuracy/identity claims the oracle replays).

Total: {n} keys.

| Key | Module | Check | Summary |
|---|---|---|---|
"""


def summary(doc: str, width: int = 64) -> str:
    line = doc.splitlines()[0].strip() if doc else ""
    if len(line) <= width:
        return line
    cut = line[:width]
    return cut[: cut.rfind(" ")] if " " in cut else cut


def main() -> None:
    specs = all_specs()
    rows = []
    for key in sorted(specs):
        s = specs[key]
        check = "oracle" if s.oracle is not None else "rows-only"
        rows.append(f"| `{key}` | {s.module} | {check} | {summary(s.doc)} |")
    out = HEADER.format(n=len(specs)) + "\n".join(rows) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "INVENTORY.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {len(specs)} keys")


if __name__ == "__main__":
    main()
