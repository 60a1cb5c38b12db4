"""Semantic gates for ts_lttb_downsample (rows-only key: the bucketed
argmax recursion has no SQL oracle, so correctness is pinned here) and
the dedup_url_canonical parity op's local invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from powersql_spark.catalog import load_tables
from powersql_spark.pipeline.timeseries import _LTTB_OUT, _lttb
from powersql_spark.registry import all_specs

SPECS = all_specs()


def _series(spark, sf_dir):
    load_tables(spark, sf_dir, ("events",))
    rows = (
        spark.table("events")
        .select("user_id", "ts", "value", "event_id")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    for v in by_user.values():
        v.sort()
    return by_user


def test_lttb_counts_endpoints_and_membership(spark, sf_dir):
    by_user = _series(spark, sf_dir)
    out = SPECS["ts_lttb_downsample"].fn(spark, sf_dir).collect()
    got: dict = {}
    for r in out:
        got.setdefault(r["user_id"], []).append(
            (r["pt_rank"], r["ts"], r["value"])
        )
    assert set(got) == set(by_user)
    for uid, pts in got.items():
        pts.sort()
        src = by_user[uid]
        n_expected = min(_LTTB_OUT, len(src))
        assert len(pts) == n_expected, (uid, len(pts), len(src))
        # pt_rank is dense 0..n-1 and ts non-decreasing along it.
        assert [p[0] for p in pts] == list(range(n_expected))
        ts_seq = [p[1] for p in pts]
        assert ts_seq == sorted(ts_seq)
        # Endpoints always kept; every output point exists in the input.
        assert pts[0][1] == src[0][0] and pts[0][2] == src[0][2]
        assert pts[-1][1] == src[-1][0] and pts[-1][2] == src[-1][2]
        src_pts = {(t, v) for (t, _e, v) in src}
        assert all((t, v) in src_pts for (_rk, t, v) in pts)


def test_lttb_short_series_pass_through():
    ts = np.arange(5, dtype=np.float64)
    val = np.array([1.0, 5.0, 2.0, 8.0, 3.0])
    idx = _lttb(ts, val, 24)
    assert list(idx) == [0, 1, 2, 3, 4]


def test_lttb_keeps_spike_uniform_stride_would_miss():
    """A single extreme spike between stride points must survive:
    shape preservation is LTTB's entire reason to exist over
    ``WHERE i % k = 0`` downsampling."""
    n, n_out = 1000, 10
    ts = np.arange(n, dtype=np.float64)
    val = np.zeros(n)
    spike_at = 537  # not on any uniform stride multiple of 100
    val[spike_at] = 1000.0
    keep = _lttb(ts, val, n_out)
    assert spike_at in keep
    assert len(keep) == n_out
    assert keep[0] == 0 and keep[-1] == n - 1
    # Kept indices strictly increase (one point per bucket).
    assert np.all(np.diff(keep) > 0)


def test_lttb_deterministic_under_ties():
    """All-equal values: argmax ties everywhere; the FIRST-max rule
    must give the same indices on every run."""
    ts = np.arange(100, dtype=np.float64)
    val = np.ones(100)
    a = _lttb(ts, val, 12)
    b = _lttb(ts, val, 12)
    assert list(a) == list(b)


def test_url_canonical_collapses_variants(spark, sf_dir):
    """Each canonical URL must absorb every host-case/www/port/tracking
    variant: n_dupes_dropped sums to n_docs - n_canonical, keep_doc_id
    is the minimum of its group, and no canonical URL retains scheme
    noise (uppercase, www., :443, ?utm, #fragment)."""
    load_tables(spark, sf_dir, ("documents",))
    n_docs = spark.table("documents").count()
    rows = SPECS["dedup_url_canonical"].fn(spark, sf_dir).collect()
    assert sum(r["n_dupes_dropped"] for r in rows) == n_docs - len(rows)
    for r in rows:
        u = r["canonical_url"]
        assert u.startswith("https://example.org/articles/")
        assert "www." not in u and ":443" not in u
        assert "?" not in u and "#" not in u
        assert u == u.lower()


# ---------------------------------------------------------------------------
# Property tests: the LTTB kernel must hold its invariants on ANY
# series, not just the fixtures above.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=2,
        max_size=400,
    ),
    n_out=st.integers(min_value=3, max_value=50),
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_lttb_invariants_hold_on_any_series(vals, n_out):
    ts = np.arange(len(vals), dtype=np.float64)
    val = np.asarray(vals, dtype=np.float64)
    keep = _lttb(ts, val, n_out)
    n_expected = min(n_out, len(vals))
    assert len(keep) == n_expected
    assert keep[0] == 0 and keep[-1] == len(vals) - 1
    assert np.all(np.diff(keep) > 0), "kept indices must strictly increase"
    # Idempotence of the kernel on its own output when sizes allow:
    # downsampling an already-small series is the identity.
    if len(vals) <= n_out:
        assert list(keep) == list(range(len(vals)))


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
        ),
        min_size=30,
        max_size=300,
    )
)
@settings(max_examples=100, deadline=None, derandomize=True)
def test_lttb_isolated_spike_always_kept(vals):
    """Structurally guaranteed shape preservation: plant a spike that
    dwarfs every other value in the middle of an otherwise arbitrary
    series — within its bucket the spike maximizes the triangle area
    against ANY previous point and next-bucket average, so LTTB must
    keep it. (A blanket 'kept range >= x% of true range' claim is NOT
    a theorem — two opposite extremes falling into one bucket can only
    keep one — so the test pins the per-bucket argmax guarantee
    instead.)"""
    ts = np.arange(len(vals), dtype=np.float64)
    val = np.asarray(vals, dtype=np.float64)
    spike_at = len(val) // 2
    val[spike_at] = np.abs(val).max() * 10 + 1e5
    keep = _lttb(ts, val, 12)
    assert spike_at in keep


def test_ewma_matches_pandas_recursion(spark, sf_dir):
    """Independent check: the JVM fold must equal pandas
    ewm(adjust=False).mean() — the exact y_t = (1-a)y_{t-1} + a*x_t
    recursion — per series, bit-for-bit before the guard rounding."""
    import pandas as pd

    from powersql_spark.pipeline.timeseries import _EWMA_ALPHA

    out = SPECS["ts_ewma"].fn(spark, sf_dir).toPandas()
    assert len(out) and out["ewma"].notna().all()
    out = out.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )
    expected = (
        out.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=_EWMA_ALPHA, adjust=False).mean())
        .round(6)
    )
    pd.testing.assert_series_equal(
        out["ewma"], expected, check_names=False
    )


def test_interpolate_brackets_and_endpoints(spark, sf_dir):
    """Observed hours pass through untouched; interior gaps get a value
    strictly between (or equal to) the bracketing observations; gaps
    before the first / after the last observation of a type stay NULL;
    interpolation is monotone along a straight-line segment."""
    rows = (
        SPECS["ts_interpolate_linear"].fn(spark, sf_dir).collect()
    )
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour_ts"])
        obs_idx = [i for i, r in enumerate(rs) if not r["is_gap"]]
        assert obs_idx, f"{et}: no observed hours"
        first, last = obs_idx[0], obs_idx[-1]
        for i, r in enumerate(rs):
            if not r["is_gap"]:
                assert r["total_interp"] == round(r["total"], 6)
            elif i < first or i > last:
                assert r["total_interp"] is None, (et, i)
            else:
                prev = max(j for j in obs_idx if j < i)
                nxt = min(j for j in obs_idx if j > i)
                lo = min(rs[prev]["total"], rs[nxt]["total"])
                hi = max(rs[prev]["total"], rs[nxt]["total"])
                assert lo - 1e-9 <= r["total_interp"] <= hi + 1e-9, (
                    et, i, r["total_interp"], lo, hi,
                )


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_ewma_fold_equals_direct_recursion(xs):
    """The closed-form the JVM fold implements must equal the textbook
    recursion for arbitrary series (same floating-point op order, so
    exact equality — not approximate)."""
    from powersql_spark.pipeline.timeseries import _EWMA_ALPHA

    a = _EWMA_ALPHA
    # The fold: init = x0, then acc*(1-a) + a*x for each later x.
    acc = xs[0]
    folded = [acc]
    for x in xs[1:]:
        acc = acc * (1.0 - a) + a * x
        folded.append(acc)
    # Textbook y_t = (1-a)*y_{t-1} + a*x_t with y_0 = x_0.
    y = xs[0]
    direct = [y]
    for x in xs[1:]:
        y = (1.0 - a) * y + a * x
        direct.append(y)
    assert folded == direct


@given(st.binary(min_size=0, max_size=2000), st.data())
@settings(max_examples=150, deadline=None)
def test_phash_edit_locality_bound(payload, data):
    """dHash locality: a single byte edit touches exactly one of the 65
    blocks, which participates in exactly two adjacent-mean
    comparisons — so hamming distance moves by at most 2 per edited
    byte."""
    import pandas as pd

    from powersql_spark.pipeline.multimodal import _phash_batches

    if not payload:
        return
    n_edits = data.draw(st.integers(min_value=1, max_value=3))
    edited = bytearray(payload)
    for _ in range(n_edits):
        i = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        edited[i] = data.draw(st.integers(min_value=0, max_value=255))
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [payload, bytes(edited)]}
    )
    s1, s2 = next(_phash_batches(iter([pdf])))["sig"]
    ham = bin((s1 ^ s2) & (2**64 - 1)).count("1")
    assert ham <= 2 * n_edits


def test_holt_matches_independent_recursion(spark, sf_dir):
    """Recompute Holt's recursion independently in Python per series
    and compare (floor-guarded at 4dp like the operator); and on any
    exactly-linear stretch the method must track the line (level ==
    value, trend == slope) — the property EWMA lacks."""
    import math

    from powersql_spark.pipeline.timeseries import (
        _HOLT_ALPHA,
        _HOLT_BETA,
    )

    out = (
        SPECS["ts_holt_linear"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(out)
    a, b = _HOLT_ALPHA, _HOLT_BETA

    def g(x):
        return math.floor(x * 10000) / 10000

    for _uid, grp in out.groupby("user_id"):
        xs = list(grp["value"])
        l, tr = xs[0], None
        exp = [(l, 0.0)]
        for x in xs[1:]:
            if tr is None:
                b0 = x - l
                l1 = a * x + (1 - a) * (l + b0)
                tr = b * (l1 - l) + (1 - b) * b0
                l = l1
            else:
                l1 = a * x + (1 - a) * (l + tr)
                tr = b * (l1 - l) + (1 - b) * tr
                l = l1
            exp.append((l, tr))
        got = list(zip(grp["level"], grp["trend"]))
        for (gl, gt), (el, et) in zip(got, exp):
            assert gl == g(el) and gt == g(et)

    # Exact-linear tracking property on the kernel itself.
    xs = [10.0 + 2.5 * t for t in range(30)]
    l, tr = xs[0], None
    for x in xs[1:]:
        if tr is None:
            b0 = x - l
            l1 = a * x + (1 - a) * (l + b0)
            tr = b * (l1 - l) + (1 - b) * b0
            l = l1
        else:
            l1 = a * x + (1 - a) * (l + tr)
            tr = b * (l1 - l) + (1 - b) * tr
            l = l1
    assert abs(l - xs[-1]) < 1e-9 and abs(tr - 2.5) < 1e-9


def test_autocorr_matches_numpy(spark, sf_dir):
    """Per-user lag-1/lag-2 ACF must equal numpy's Pearson correlation
    of the (value, shifted value) pairs on the independently sorted
    series."""
    by_user = _series(spark, sf_dir)
    out = {
        r["user_id"]: r
        for r in SPECS["ts_autocorr"].fn(spark, sf_dir).collect()
    }
    for uid, pts in by_user.items():
        vals = np.array(
            [v for (_t, _e, v) in pts if v is not None], dtype=float
        )
        if len(vals) < 5:  # < 3 complete lag-2 pairs
            assert uid not in out
            continue
        r = out[uid]
        for lag, col in ((1, "acf1"), (2, "acf2")):
            exp = np.corrcoef(vals[:-lag], vals[lag:])[0, 1]
            assert abs(r[col] - round(exp, 4)) <= 1e-4, (uid, col)
        assert r["n_obs"] == len(vals)


def test_seasonal_decompose_matches_pandas(spark, sf_dir):
    """trend == pandas centered rolling(7) mean of the daily series;
    seasonal == mean detrended value per ISO weekday; remainder closes
    the additive identity."""
    import pandas as pd

    load_tables(spark, sf_dir, ("events",))
    daily = (
        spark.table("events")
        .where("value is not null")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("daily"))
        .toPandas()
    )
    out = SPECS["ts_seasonal_decompose"].fn(spark, sf_dir).toPandas()
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        trend = g["daily"].rolling(7, center=True).mean().round(6)
        g["trend"] = trend
        got = (
            out[out["event_type"] == et]
            .sort_values("day")
            .reset_index(drop=True)
        )
        exp_tr = g.dropna(subset=["trend"]).reset_index(drop=True)
        assert len(got) == len(exp_tr)
        assert np.allclose(got["trend"], exp_tr["trend"], atol=1e-6)
        dow = pd.to_datetime(exp_tr["day"]).dt.dayofweek + 1
        detr = exp_tr["daily"] - exp_tr["trend"]
        seas = detr.groupby(dow.values).mean().round(6)
        got_dow = pd.to_datetime(got["day"]).dt.dayofweek + 1
        assert np.allclose(
            got["seasonal"], seas.loc[got_dow.values], atol=2e-6
        )
        assert np.allclose(
            got["remainder"],
            (got["daily"] - got["trend"] - got["seasonal"]).round(6),
            atol=1e-6,
        )
