"""Adversarial-partitioning drive: the drive_contract hash check under
a deliberately hostile partition shape — local[32] executor threads,
spark.sql.shuffle.partitions=7, spark.default.parallelism=13 — i.e. a
different executor/partition geometry from BOTH the vanilla local[8]
driver contract and the tuned bench session.

A key that hash-matches its DuckDB oracle here AND under the vanilla
drive is partition-count independent, which is the property that lets
the same code run unchanged on a 1000-executor cluster: no result may
depend on how many partitions a sum was folded across or which rows
shared a task.

Usage:
    python tools/adversarial_drive.py              # all 501 keys
    python tools/adversarial_drive.py key1 key2    # subset

Run from a cwd OUTSIDE the repo so workers import powersql_spark via
the shipped zip, mirroring the external harness.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
from pyspark.sql import SparkSession

import drive_contract as dc


def main() -> int:
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.default.parallelism", "13")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if len(sys.argv) > 1:
        unknown = [k for k in sys.argv[1:] if k not in queries]
        if unknown:
            print(f"unknown keys: {unknown}")
            return 2
        dupes = sorted(
            {k for k in sys.argv[1:] if sys.argv[1:].count(k) > 1}
        )
        if dupes:
            print(f"duplicate keys on argv: {dupes}")
            return 2
        queries = {k: queries[k] for k in sys.argv[1:]}

    con = duckdb.connect()
    for t in dc.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dc.SF_DIR}/{t}.parquet'"
        )

    bad, t0 = [], time.time()
    for i, (key, fn) in enumerate(queries.items()):
        try:
            sdf = fn(spark, dc.SF_DIR).toPandas()
        except Exception:
            print(f"[{i}] {key}: SPARK ERROR")
            traceback.print_exc(limit=3)
            bad.append(key)
            continue
        if key not in oracles:
            print(f"[{i}] {key}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[key]).df()
        except Exception:
            print(f"[{i}] {key}: ORACLE ERROR")
            traceback.print_exc(limit=3)
            bad.append(key)
            continue
        ok = len(sdf) == len(odf) and sorted(
            map(str.lower, sdf.columns)
        ) == sorted(map(str.lower, odf.columns))
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        ok = ok and dc._hash(sdf) == dc._hash(odf)
        if not ok:
            print(f"[{i}] {key}: MISMATCH under adversarial partitioning")
            bad.append(key)
    print(
        f"\n{len(queries)} keys in {time.time() - t0:.0f}s under "
        f"local[32]/shuffle=7/parallelism=13; {len(bad)} bad: {bad}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
