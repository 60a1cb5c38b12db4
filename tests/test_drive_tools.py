"""Unit pins for the drive-contract comparator itself (tools/
drive_contract.py): the hash gate every key passes through locally
must canonicalize engine-representation differences — if it drifts,
green keys start failing (or worse, failing keys start passing) for
reasons that have nothing to do with the operators."""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pandas as pd

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)


def _load():
    spec = importlib.util.spec_from_file_location(
        "drive_contract", os.path.join(_TOOLS, "drive_contract.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_canon_null_spellings_hash_equal():
    """SQL NULL arrives as None from Spark toPandas but NaN from
    DuckDB .df() in object columns (seen live with withheld BOOLEAN
    verdicts); the comparator must hash the two spellings equal,
    both all-NULL and mixed with real values."""
    dc = _load()
    spark_side = pd.DataFrame(
        {"v": pd.Series([None, True, None], dtype=object),
         "k": ["a", "b", "c"]}
    )
    duck_side = pd.DataFrame(
        {"v": pd.Series([np.nan, True, np.nan], dtype=object),
         "k": ["a", "b", "c"]}
    )
    assert dc._hash(spark_side) == dc._hash(duck_side)
    all_null_a = pd.DataFrame({"v": pd.Series([None], dtype=object)})
    all_null_b = pd.DataFrame({"v": pd.Series([np.nan], dtype=object)})
    assert dc._hash(all_null_a) == dc._hash(all_null_b)


def test_canon_still_distinguishes_real_values():
    """The NULL sentinel must not blur actual values: True vs False,
    NULL vs False, and NULL vs the string 'nan' all hash apart."""
    dc = _load()

    def h(vals):
        return dc._hash(
            pd.DataFrame({"v": pd.Series(vals, dtype=object)})
        )

    assert h([True]) != h([False])
    assert h([None]) != h([False])
    assert h([None]) != h(["nan"])
    assert h([None]) != h(["None"])


def test_canon_float_and_datetime_normalization_unchanged():
    """The pre-existing normalizations stay pinned: floats round to
    6dp; datetime64[ns] (Spark) and datetime64[us] (DuckDB) hash
    equal."""
    dc = _load()
    a = pd.DataFrame({"x": [1.0000004]})
    b = pd.DataFrame({"x": [1.0000001]})
    assert dc._hash(a) == dc._hash(b)  # both 1.0 at 6dp
    ts = pd.Timestamp("2024-01-15 12:00:00")
    ns = pd.DataFrame({"t": pd.Series([ts]).astype("datetime64[ns]")})
    us = pd.DataFrame({"t": pd.Series([ts]).astype("datetime64[us]")})
    assert dc._hash(ns) == dc._hash(us)
