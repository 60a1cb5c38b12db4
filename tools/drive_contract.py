"""Driver-contract simulation: vanilla SparkSession, entry() smoke,
every queries() key at sf0.01 hash-compared to its oracle_sql() twin
in DuckDB (round 6dp, sort columns by name, sort rows). Mirrors the
external harness; exit nonzero on any mismatch."""
import os, sys, time, traceback

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

# Default mirrors the external harness (sf0.01); override via env for
# larger-SF parity pre-clears (the r11/r12 tranche bar).
SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime

    for c in df.columns:
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                # SQL NULL spells differently per engine in object
                # columns (Spark toPandas -> None, DuckDB .df() ->
                # NaN, e.g. a withheld BOOLEAN verdict); astype(str)
                # would hash 'None' vs 'nan' apart. Canonicalize both
                # to one sentinel first — the same normalization
                # already applied to datetime resolutions above.
                df[c] = (
                    df[c]
                    .where(pd.notna(df[c]), "<NULL>")
                    .astype(str)
                )
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind == "M":
            # Spark's arrow path yields ns, DuckDB us — same instants;
            # normalize resolution so the value hash sees equal int64s.
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(_canon(df), index=False).sum())


def select_keys(queries: dict, argv_keys: list[str]) -> dict | None:
    """Validate an argv key subset against the registry: unknown keys
    and duplicates (which the dict comprehension would silently
    deduplicate, shrinking the drive — ADVICE r7) are both rejected.
    Returns the ordered subset, or None on a bad argv."""
    unknown = [k for k in argv_keys if k not in queries]
    if unknown:
        print(f"unknown keys: {unknown}")
        return None
    dupes = sorted({k for k in argv_keys if argv_keys.count(k) > 1})
    if dupes:
        print(f"duplicate keys on argv: {dupes}")
        return None
    return {k: queries[k] for k in argv_keys}


def compare_keys(spark, con, queries: dict, oracles: dict,
                 label: str = "") -> list:
    """The per-key Spark-vs-DuckDB hash-contract loop (rows, schema,
    order-insensitive value hash), shared by the vanilla drive below
    and tools/adversarial_drive.py (ADVICE r8: previously copy-pasted
    there, so contract changes could silently drift). Returns the
    failing keys."""
    bad, t0 = [], time.time()
    for i, (key, fn) in enumerate(queries.items()):
        try:
            sdf = fn(spark, SF_DIR).toPandas()
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
        rows = len(sdf) == len(odf)
        schema = sorted(map(str.lower, sdf.columns)) == sorted(
            map(str.lower, odf.columns))
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        try:
            h = _hash(sdf) == _hash(odf) if rows and schema else False
        except Exception:
            print(f"[{i}] {key}: HASH ERROR")
            traceback.print_exc(limit=3)
            bad.append(key)
            continue
        ok = rows and schema and h
        if not ok:
            bad.append(key)
            print(f"[{i}] {key}: MISMATCH rows={rows} schema={schema} "
                  f"hash={h} ({len(sdf)} vs {len(odf)})")
            if rows and schema and not h:
                a, b = _canon(sdf), _canon(odf)
                neq = (a != b).any(axis=1)
                print(a[neq].head(3))
                print(b[neq].head(3))
    dt = time.time() - t0
    print(f"\n{len(queries)} keys in {dt:.0f}s{label}; "
          f"{len(bad)} bad: {bad}")
    return bad


def main() -> int:
    import __spark_entry__ as entrymod

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    res = entrymod.entry(spark)
    n = len(res.collect())
    print(f"entry(): {n} rows, schema={res.schema.simpleString()[:90]}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Subset drive: `python tools/drive_contract.py key1 key2 ...`
    # runs only those keys (after the entry() smoke) — the cheap way
    # to re-verify a changed operator under the exact driver contract.
    if len(sys.argv) > 1:
        queries = select_keys(queries, sys.argv[1:])
        if queries is None:
            return 2
    bad = compare_keys(spark, con, queries, oracles)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
