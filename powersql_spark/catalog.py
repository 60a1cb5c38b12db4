"""Register the driver-generated testdata parquet tables as temp views.

Mirrors the reference's "external source" behavior: tables not defined by
any model are readable by name (reference src/main.rs:221 filters unknown
refs out of the DAG instead of erroring; src/types.rs:121-123 types them
open). In Spark, unknown names are hard errors, so all sources are
registered up front (SURVEY.md §7 decision 2).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS: tuple[str, ...] = ("region", "nation", "supplier", "part")


def ship_package(spark: SparkSession) -> None:
    """Make ``powersql_spark`` importable on executors.

    Python workers deserialize UDFs (e.g. the multimodal mapInPandas
    stages) by reference to this package, so it must be on every
    executor's PYTHONPATH. Zipping the package and ``addPyFile``-ing it
    is the same mechanism used to deploy to a real cluster; here it also
    makes the driver contract robust to whatever cwd the harness runs
    from. Idempotent per session.
    """
    sc = spark.sparkContext
    if getattr(sc, "_powersql_shipped", False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="powersql_pkg_")
    zip_base = os.path.join(staging, "powersql_spark_pkg")
    shutil.make_archive(
        zip_base,
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    sc.addPyFile(zip_base + ".zip")
    sc._powersql_shipped = True


_NANOS_CACHE: dict[str, tuple[str, ...]] = {}


def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark rejects these
    outright (PARQUET_TYPE_ILLEGAL), so they need the nanosAsLong escape
    hatch + an explicit conversion. Footer-only metadata probe, cached."""
    cached = _NANOS_CACHE.get(path)
    if cached is not None:
        return cached
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        inner = glob.glob(os.path.join(path, "*.parquet"))
        probe = inner[0] if inner else path
    try:
        pf = pq.ParquetFile(probe)
        schema = pf.schema_arrow
        # INT96 timestamps (Spark's legacy physical type) also surface as
        # timestamp[ns] in arrow, but Spark reads them natively — only
        # true INT64 TIMESTAMP(NANOS) columns need the compat path.
        int96 = {
            pf.schema.column(i).name
            for i in range(len(pf.schema))
            if pf.schema.column(i).physical_type == "INT96"
        }
        cols = tuple(
            f.name
            for f in schema
            if str(f.type) == "timestamp[ns]" and f.name not in int96
        )
    except Exception:
        cols = ()
    _NANOS_CACHE[path] = cols
    return cols


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to session-time TIMESTAMP (LTZ).

    Parquet written with isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ
    under Spark 4's default NTZ inference, but NTZ is rejected by the
    time-instant function family (unix_micros, unix_timestamp,
    to_utc_timestamp, ...), and which type a table scans as must not
    depend on the writer's flag or the harness session's conf. The
    session timezone is pinned to UTC here (not assumed from the
    harness: an external driver session carries the host zone, which
    would shift epoch-derived keys and let DST folds reorder
    equal-wall-clock ties), so the cast is a pure re-tag: identical
    wall-clock values, DuckDB-oracle agreement unchanged."""
    from pyspark.sql.types import TimestampNTZType

    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet reader that tolerates TIMESTAMP(NANOS) columns by reading
    them as int64 nanos and truncating to microsecond timestamps (the
    same truncation DuckDB applies, so oracle comparisons agree)."""
    nanos = _nanos_timestamp_cols(path)
    if not nanos:
        return _ntz_to_ltz(spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _ntz_to_ltz(df)


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` with session-scoped lifecycle tracking.

    Operators persist intermediates that feed multiple downstream
    branches (shingle sets, scored frames) and return a *lazy* result,
    so they cannot unpersist before returning — the cache would be
    dropped before first use. Instead the persisted handle is recorded
    on the session and released by :func:`release_persisted` at the
    next query invocation, by which point the driver has materialized
    the previous result. This keeps 252-key sweeps (scale_smoke,
    drive_contract) from accumulating cached blocks for the life of
    the session."""
    spark = df.sparkSession
    reg = getattr(spark, "_powersql_persisted", None)
    if reg is None:
        reg = []
        spark._powersql_persisted = reg
    out = df.persist()
    reg.append(out)
    return out


# Cluster-deployment switch (see track_checkpoint): "local" uses
# executor-local localCheckpoint (right for single-JVM local mode);
# "reliable" routes every iterative operator's round-state through
# reliable checkpoint() files under SparkContext.setCheckpointDir —
# required on multi-executor deployments with dynamic allocation,
# where an executor loss would otherwise lose un-recomputable blocks.
_CHECKPOINT_MODE = "local"


def set_checkpoint_mode(
    mode: str, spark: SparkSession | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Flip every iterative operator between localCheckpoint and
    reliable checkpoint() in one place. ``mode="reliable"`` requires a
    ``checkpoint_dir`` (passed to ``setCheckpointDir``) — on a real
    cluster, an HDFS/object-store path."""
    global _CHECKPOINT_MODE
    if mode not in ("local", "reliable"):
        raise ValueError(f"unknown checkpoint mode: {mode!r}")
    if mode == "reliable":
        if spark is None or checkpoint_dir is None:
            raise ValueError(
                "reliable mode needs spark + checkpoint_dir"
            )
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    _CHECKPOINT_MODE = mode


def track_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint()`` with session-scoped lifecycle tracking.

    ``eager=False`` defers materialization to the caller's NEXT action
    (an iterative round's convergence count / frontier probe), halving
    the per-round driver job count — each local-mode job round trip
    measured ~50-120 ms, and the iterative graph keys are job-count
    bound. Only callers that IMMEDIATELY run a full action over the
    frame may pass it: local checkpoints tolerate a partial first
    action (LocalRDDCheckpointData caches computed partitions and runs
    a fill-in job for any missing ones), but deferring with no action
    at all would silently push the materialization into whichever
    consumer touches the frame first. Reliable mode ignores the flag —
    a lazy reliable ``checkpoint()`` RECOMPUTES the whole frame when
    finalized, which is strictly worse than eager there.

    Iterative operators (PageRank/HITS/BFS/LPA/k-core/Brandes,
    Bradley-Terry) truncate their per-round lineage by
    localCheckpointing the O(nations)-row state vector each round.
    Two properties of that pattern are centralized here instead of
    being re-documented at every call site:

    - **Lifecycle.** Checkpointed blocks live in the RDD storage
      layer, NOT the CacheManager, so ``DataFrame.unpersist()`` is a
      no-op on them and they would otherwise only be freed when the
      ContextCleaner GCs the last reference. Each checkpointed frame
      is therefore recorded on the session and explicitly freed by
      :func:`release_persisted` via the underlying ``LogicalRDD``'s
      JVM RDD handle — one generation LATE (query N's blocks are freed
      when query N+2 is constructed), because a freed checkpoint is
      unrecoverable and a driver may construct the next key's frame
      before collecting the previous one's. Blocks are tiny
      (coalesce(1), tens of rows) but per-round × per-key unbounded
      over a 500-key sweep without this.
    - **Local-mode assumption.** ``localCheckpoint`` is deliberately
      the NON-reliable variant: lineage is truncated and the blocks
      are executor-local, so on a real cluster an executor loss makes
      recomputation impossible and fails the query. That is the right
      trade for this repo's driver geometry (single-JVM local mode —
      no executor can be lost independently of the whole session). On
      a multi-executor deployment with dynamic allocation, call
      :func:`set_checkpoint_mode` (``"reliable"`` + a durable
      checkpoint dir) — one central switch that reroutes every
      iterative operator through reliable ``checkpoint()``, exercised
      both ways by tests/test_persist_lifecycle.py.

    Note for driver-contract callers: because checkpointing is eager,
    building an iterative key's frame via ``queries()[key](...)``
    executes real Spark jobs at construction time (see README,
    "Driver contract").
    """
    out = (
        df.checkpoint()
        if _CHECKPOINT_MODE == "reliable"
        else df.localCheckpoint(eager=eager)
    )
    spark = out.sparkSession
    reg = getattr(spark, "_powersql_checkpointed", None)
    if reg is None:
        reg = []
        spark._powersql_checkpointed = reg
    reg.append(out)
    return out


def _free_checkpoint_blocks(df: DataFrame) -> None:
    """Unpersist the checkpointed RDD behind a localCheckpoint frame.

    ``DataFrame.unpersist()`` only talks to the CacheManager, and
    ``df.rdd.unpersist()`` targets a derived (Python-conversion) RDD —
    neither frees localCheckpoint storage. The checkpointed RDD itself
    is the ``LogicalRDD`` leaf's ``rdd`` field (verified: storage-info
    count drops to zero when it is unpersisted).

    In ``"reliable"`` mode the durable side must ALSO be reclaimed
    (ADVICE r12): unpersisting only frees the block-manager copy, while
    the ``checkpoint()`` FILES under the checkpoint dir would otherwise
    accumulate without bound over a long sweep. The file path comes
    from the checkpointed RDD's own ``getCheckpointFile`` and is
    deleted through the Hadoop FileSystem API, so the same code path
    reclaims an HDFS/object-store dir on a real cluster. Deletion
    happens at the same one-generation-late point as the block free —
    by then no live frame can recompute from those files."""
    try:
        rdd = df._jdf.queryExecution().optimizedPlan().rdd()
        rdd.unpersist(False)
        ckpt_file = rdd.getCheckpointFile()
        if ckpt_file.isDefined():
            spark = df.sparkSession
            jpath = spark._jvm.org.apache.hadoop.fs.Path(ckpt_file.get())
            fs = jpath.getFileSystem(
                spark.sparkContext._jsc.hadoopConfiguration()
            )
            fs.delete(jpath, True)
    except Exception:
        pass  # non-LogicalRDD plan or teardown race: GC will reclaim


def release_persisted(spark: SparkSession) -> None:
    """Unpersist every frame recorded by :func:`track_persist`.

    Sessions may opt out by setting ``_powersql_keep_persisted``:
    bench.py does, because its steady-state methodology measures the
    timed pass against the warmup pass's materialized intermediates
    (Spark's CacheManager substitutes a cached plan into any later
    identical subplan), mirroring a production pipeline that
    materializes shingle/signature stages once per corpus rather than
    once per query."""
    if getattr(spark, "_powersql_keep_persisted", False):
        return
    reg = getattr(spark, "_powersql_persisted", None)
    if reg:
        for df in reg:
            try:
                df.unpersist()
            except Exception:
                pass  # session teardown races are benign
        reg.clear()
    # Checkpoint blocks are freed ONE GENERATION LATE (ADVICE r11):
    # unlike cached frames (recomputable after unpersist), a freed
    # localCheckpoint makes its frame unrecoverable, so freeing the
    # immediately-previous query's blocks here would hard-fail a driver
    # that constructs key B before collecting key A's frame. Deferring
    # by one generation (free N-2's blocks when N starts) keeps the
    # build-then-build-then-collect pattern safe while still bounding
    # live checkpoint storage at two queries' worth of tiny
    # (coalesce(1), tens-of-rows) round-state.
    prev = getattr(spark, "_powersql_checkpointed_prev", None)
    if prev:
        for df in prev:
            _free_checkpoint_blocks(df)
    creg = getattr(spark, "_powersql_checkpointed", None)
    spark._powersql_checkpointed_prev = list(creg) if creg else []
    if creg:
        creg.clear()
    # Staged temp dirs (ADVICE r12): operators that materialize a
    # small parquet a returned frame then reads LAZILY (e.g.
    # stream_upsert_sink's merge target) register the dir via
    # :func:`track_tempdir`. The same one-generation deferral applies —
    # deleting the parquet under the immediately-previous key's frame
    # would fail a driver that builds key B before collecting key A.
    import shutil

    tprev = getattr(spark, "_powersql_tmpdirs_prev", None)
    if tprev:
        for path in tprev:
            shutil.rmtree(path, ignore_errors=True)
    treg = getattr(spark, "_powersql_tmpdirs", None)
    spark._powersql_tmpdirs_prev = list(treg) if treg else []
    if treg:
        treg.clear()


def track_tempdir(spark: SparkSession, path: str) -> None:
    """Register a per-invocation staging dir for deferred cleanup.

    For operators whose RETURNED frame lazily reads a small parquet
    they staged under mkdtemp: the dir must outlive the call, so it is
    rmtree'd by :func:`release_persisted` one generation late (the
    checkpoint-release discipline), bounding tmp accumulation over a
    long sweep at two keys' worth instead of leaning on the OS reaper."""
    reg = getattr(spark, "_powersql_tmpdirs", None)
    if reg is None:
        reg = []
        spark._powersql_tmpdirs = reg
    reg.append(path)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the scan is under-parallel.

    The explode-heavy pipeline ops want their map stage spread across
    all cores, but an unconditional ``repartition()`` is a full shuffle
    of document text — the most expensive possible move at 100 TB,
    where a parquet table always arrives with far more splits than
    cores and the repartition buys nothing. The driver's toy layout is
    the opposite: one single-row-group file, which parquet cannot
    split, so the whole corpus lands in one task. Checking the plan's
    actual partition count keeps the shuffle strictly a small-input
    concession: at scale this is the identity function."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def _sql_literal(v) -> str:
    """Render one Python value as an EXACT Spark SQL literal.

    Floats go through ``repr``: Python's shortest-roundtrip repr
    parses back to the identical IEEE-754 bits in Spark's SQL parser
    (the :func:`operators.common.sql_double_array` exactness
    argument), with explicit spellings for the non-finite values.
    Strings are single-quote escaped. Only the types config tables
    actually use are accepted — anything else raises rather than
    silently coercing."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"values_df literal: unsupported type {type(v)}")


def values_df(spark: SparkSession, data, schema) -> DataFrame:
    """Small constant/config table as a VALUES **LocalRelation** —
    the zero-Python-boundary replacement for ``createDataFrame(list)``.

    PySpark's ``createDataFrame(list)`` always routes local rows
    through a parallelized Python RDD: every scan of the frame then
    pays Python-worker round trips (defaultParallelism near-empty
    slices on local[32]), a broadcast build of such a frame launches
    a Python stage, and two of them cross-joined unhinted plan an RDD
    CartesianProduct. A ``VALUES`` table parsed by the SQL parser is
    a LocalRelation: rows live in the plan, scans are codegen'd
    LocalTableScans, zero Python workers, zero jobs. Measured on the
    54-row LSH tuning grid: 6.3 s (createDataFrame + crossJoin) vs
    0.4 s (VALUES), identical rows.

    ``schema`` is either a DDL string ("bands int, s double") — each
    column is CAST to exactly that type — or a list of column names,
    in which case each column is CAST to the type
    ``createDataFrame``'s inference would have produced (Python int
    -> BIGINT, float -> DOUBLE, str -> STRING, bool -> BOOLEAN):
    same column names and dataTypes as the inferring call, with one
    deliberate difference — all-non-null columns analyze as
    nullable=false (see the nullability note below). Config tables
    are metadata-sized at ANY scale factor, so an in-plan literal
    table is the right shape everywhere."""
    rows = [tuple(r) if not isinstance(r, tuple) else r for r in data]
    if not rows:
        raise ValueError(
            "values_df needs at least one row; use "
            "createDataFrame([], ddl) for empty frames"
        )
    if isinstance(schema, str):
        parts = [p.strip() for p in schema.split(",")]
        names = [p.split()[0] for p in parts]
        types = [" ".join(p.split()[1:]) for p in parts]
    else:
        names = list(schema)
        types = []
        for i in range(len(names)):
            t = None
            for r in rows:
                v = r[i]
                if v is None:
                    continue
                if isinstance(v, bool):
                    t = "boolean"
                elif isinstance(v, int):
                    t = "bigint"
                elif isinstance(v, float):
                    t = "double"
                elif isinstance(v, str):
                    t = "string"
                else:
                    raise TypeError(
                        f"values_df: cannot infer SQL type of {v!r}"
                    )
                break
            if t is None:
                raise TypeError(
                    f"values_df: all-NULL column {names[i]!r} needs a "
                    "DDL schema"
                )
            types.append(t)
    body = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in r) + ")" for r in rows
    )
    src = ", ".join(names)
    cols = ", ".join(
        f"CAST({n} AS {t}) AS {n}" for n, t in zip(names, types)
    )
    # Nullability note: a column whose literals are all non-null
    # analyzes as nullable=false here, where createDataFrame declares
    # nullable=true unconditionally (Spark 4's analyzer propagates
    # foldable non-nullness through CAST and CASE alike, so the
    # stricter flag is not suppressible at the SQL layer). That is
    # the ONE schema difference vs the call this replaces — strictly
    # more precise, invisible to the driver contract (which compares
    # column names + value hashes), and pinned by
    # tests/test_values_df.py.
    return spark.sql(
        f"SELECT {cols} FROM (VALUES {body}) AS v({src})"
    )


def read_parquet_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_parquet`: readStream with the same
    TIMESTAMP(NANOS) tolerance (int64 nanos -> microsecond timestamps)."""
    nanos = _nanos_timestamp_cols(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        # File-stream sources need a directory; glob-filter to the file.
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _ntz_to_ltz(df)


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read each parquet table and register it as a temp view.

    Keeps every query callable self-contained on ``(spark, sf_dir)`` as
    the driver contract requires. Registration is memoized per
    (session, view, path): schema inference reads parquet footers, and
    re-running it for all 10 tables on every query call costs more than
    many of the queries themselves (~0.7 s/call measured at sf0.1). A
    view is re-registered only when it should point at a different path
    (e.g. tests at sf0.001 vs the driver at sf0.01 in one session).
    """
    ship_package(spark)
    cache: dict[str, tuple[str, DataFrame]] = getattr(spark, "_powersql_views", None)
    if cache is None:
        cache = {}
        spark._powersql_views = cache
    dfs: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        hit = cache.get(name)
        if hit is not None and hit[0] == path and spark.catalog.tableExists(name):
            dfs[name] = hit[1]
            continue
        df = read_parquet(spark, path)
        df.createOrReplaceTempView(name)
        cache[name] = (path, df)
        dfs[name] = df
    return dfs
