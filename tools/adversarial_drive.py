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
    python tools/adversarial_drive.py              # all registered keys
    python tools/adversarial_drive.py key1 key2    # subset

Run from a cwd OUTSIDE the repo so workers import powersql_spark via
the shipped zip, mirroring the external harness.
"""

from __future__ import annotations

import os
import sys

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
        queries = dc.select_keys(queries, sys.argv[1:])
        if queries is None:
            return 2

    con = duckdb.connect()
    for t in dc.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dc.SF_DIR}/{t}.parquet'"
        )

    # The compare loop IS drive_contract's (ADVICE r8: one hash
    # contract, two session geometries) — only the session differs.
    bad = dc.compare_keys(
        spark, con, queries, oracles,
        label=" under local[32]/shuffle=7/parallelism=13",
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
