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

    Scale shape: one hash shuffle on the series key + a partition-local
    sort, then ``mapInPandas`` walks each partition's contiguous groups
    in ONE Arrow exchange per partition — per-group ``applyInPandas``
    paid one Python round-trip per series (measured 4.4s vs sub-second
    at sf0.1's 1500 series, and series count is exactly what grows at
    100 TB). Series shorter than the target pass through unchanged.
    Semantic gates live in tests/test_timeseries.py (endpoint
    retention, monotone output, bucket-count, pass-through, peak
    retention vs uniform stride)."""
    # event_id rides along purely as the tie-break key: equal
    # timestamps need a total order or the kept points would depend
    # on shuffle arrival order.
    events = spark.table("events").select(
        "user_id", "ts", "value", "event_id"
    )
    n_parts = spark.sparkContext.defaultParallelism
    arranged = events.repartition(n_parts, "user_id").sortWithinPartitions(
        "user_id", "ts", "event_id"
    )

    def _downsample(batches):
        # Arrow batches can split a series; stitch the partition first.
        # Memory = one partition of (key, ts, value) rows — the same
        # bound any per-key sequential algorithm needs.
        pdfs = [b for b in batches if len(b)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        uid = pdf["user_id"].to_numpy()
        ts_i = pdf["ts"].astype("int64").to_numpy()
        val = pdf["value"].to_numpy(dtype=np.float64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        bounds = np.append(starts, len(uid))
        keep_parts = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            keep_parts.append(
                lo
                + _lttb(
                    ts_i[lo:hi].astype(np.float64), val[lo:hi], _LTTB_OUT
                )
            )
        keep = np.concatenate(keep_parts)
        out = pdf.iloc[keep][["user_id", "ts", "value"]].copy()
        out["pt_rank"] = np.concatenate(
            [np.arange(len(k), dtype=np.int64) for k in keep_parts]
        )
        yield out

    return arranged.mapInPandas(
        _downsample,
        schema="user_id bigint, ts timestamp, value double, pt_rank bigint",
    )
