"""Python-worker daemon with the heavy imports preloaded.

Spark's ``PythonWorkerFactory`` reaps idle Python workers after a
hard-coded one minute (``IDLE_WORKER_TIMEOUT_NS``, not configurable).
Any Arrow/pandas query that runs more than a minute after the previous
one therefore pays a full worker cold start — and the dominant cost of
that start is importing numpy/pandas/pyarrow in every worker (measured
here: ~2-5 s for a 32-worker wave on a warm JVM, vs ~1 s warm).

Workers are forked from this daemon process, so anything imported
HERE is inherited by every worker through copy-on-write for free.
Importing the scientific stack once in the daemon cuts the post-reap
restart to fork + handshake (measured ~0.1 s extra vs warm workers).
The same trick is standard on real clusters (one daemon per executor,
thousands of forked workers over a job's lifetime).

Wired up by :func:`powersql_spark.session.build_session` via
``spark.python.daemon.module`` + a worker-side PYTHONPATH entry for
the repo root. Everything used is public Spark API; the module
degrades to exactly stock behavior apart from the imports below
(``pyspark.daemon.manager`` is the stock entry point).
"""

# The pandas-UDF deserialization chain pulls these lazily per worker;
# pull them eagerly in the daemon instead so forked workers inherit
# the loaded modules.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401
import pyspark.sql.pandas.types  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
