"""The driver verifies only a bounded prefix of queries() per round, so
registration order IS the coverage strategy: never-verified keys must
front-load, and keys with a banked green row in any CORRECTNESS_r*.json
must rotate to the back automatically when a new round's file lands."""

from __future__ import annotations

import json
import os

from powersql_spark.registry import _driver_green, all_specs


def test_current_window_holds_unverified_core():
    """Slots 1-50 today: the SURVEY-2.B core + round-1 fixes + TPC-H,
    none of which have a green row yet."""
    keys = list(all_specs())
    window = keys[:50]
    assert "join_inner" in window and "tpch_q10" in window
    banked = _driver_green()
    assert not (set(window) & banked), (
        "banked-green keys occupy driver window slots"
    )


def test_green_keys_rotate_to_back(tmp_path):
    """Simulate the driver landing a new round's file: its green keys
    must leave the front of the order on next computation."""
    r = {
        "join_inner": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
        "join_left": {  # harness error: NOT green, must re-run
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "err": "boom",
        },
        "dedup_minhash_lsh": {  # rows-only key, clean run: banked
            "rows_match": True,
            "schema_match": False,
            "hash_match": False,
            "err": None,
        },
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(r))
    green = _driver_green(root=str(tmp_path))
    assert "join_inner" in green
    assert "join_left" not in green
    assert "dedup_minhash_lsh" in green


def test_real_round1_file_is_parsed():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(root, "CORRECTNESS_r01.json")):
        return
    green = _driver_green()
    assert "agg_group_by" in green  # hash-green in round 1
    assert "agg_collect_set" not in green  # harness TypeError in round 1
