"""Time-series downsampling (driver north-star extension; NOT in the
reference — its surface ends at SQL orchestration, src/execute.rs:101).

``ts_lttb_downsample`` implements Largest-Triangle-Three-Buckets
(Steinarsson, "Downsampling Time Series for Visual Representation",
2013) — the standard shape-preserving downsampler (Grafana, InfluxDB,
Timescale all ship it). LTTB is inherently sequential within one
series, so the Spark shape is: shuffle once by series key, then run
the per-series algorithm as a vectorized ``applyInPandas`` — the same
blueprint as any per-entity sequential algorithm at scale (the series
for one key must fit one task, which holds whenever a single entity's
history is bounded; a 100 TB corpus distributes across keys, not
within one).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.registry import query

_LTTB_OUT = 24  # points kept per series


def _lttb(ts: np.ndarray, val: np.ndarray, n_out: int) -> np.ndarray:
    """Indices kept by LTTB. Deterministic: np.argmax takes the FIRST
    maximal triangle area, so ties cannot reorder across runs or
    engines."""
    n = len(ts)
    if n_out >= n:
        return np.arange(n)
    # Bucket boundaries over the n-2 interior points.
    edges = np.linspace(0, n - 2, n_out - 1, dtype=np.int64) + 1
    edges[-1] = n - 1
    keep = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nxt_lo, nxt_hi = edges[b + 1], (
            edges[b + 2] if b + 2 < len(edges) else n
        )
        # Average of the NEXT bucket (the third triangle vertex).
        avg_t = ts[nxt_lo:nxt_hi].mean()
        avg_v = val[nxt_lo:nxt_hi].mean()
        t0, v0 = ts[prev], val[prev]
        area = np.abs(
            (t0 - avg_t) * (val[lo:hi] - v0)
            - (t0 - ts[lo:hi]) * (avg_v - v0)
        )
        prev = lo + int(np.argmax(area))
        keep.append(prev)
    keep.append(n - 1)
    return np.asarray(keep)


@query("ts_lttb_downsample")  # rows-only: the bucketed argmax recursion
# has no SQL form (each kept point depends on the previous kept point)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-preserving downsample of each user's event-value series to
    24 points via Largest-Triangle-Three-Buckets. Endpoints are always
    kept; each interior bucket keeps the point forming the largest
    triangle with the previously kept point and the next bucket's
    centroid — preserving peaks and troughs that uniform striding or
    per-bucket averaging would flatten.

    Scale shape: one shuffle on the series key, then an Arrow-batched
    per-group pass (state = one group's points); series shorter than
    the target pass through unchanged. Semantic gates live in
    tests/test_timeseries.py (endpoint retention, monotone output,
    bucket-count, pass-through, peak retention vs uniform stride)."""
    # event_id rides along purely as the tie-break key: equal
    # timestamps need a total order or the kept indices would depend
    # on shuffle arrival order.
    events = spark.table("events").select(
        "user_id", "ts", "value", "event_id"
    )

    def _downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts = pdf["ts"].astype("int64").to_numpy(dtype=np.float64)
        val = pdf["value"].to_numpy(dtype=np.float64)
        idx = _lttb(ts, val, _LTTB_OUT)
        out = pdf.iloc[idx][["user_id", "ts", "value"]].copy()
        out["pt_rank"] = np.arange(len(idx), dtype=np.int64)
        return out

    return (
        events.groupBy("user_id")
        .applyInPandas(
            _downsample,
            schema="user_id bigint, ts timestamp, value double, pt_rank bigint",
        )
    )
