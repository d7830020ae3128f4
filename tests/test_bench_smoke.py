"""Pre-snapshot bench smoke (round 9): run `python bench.py --smoke` as a
subprocess — the exact invocation shape the driver uses — and assert it
exits 0 and prints one valid JSON line with the contract fields.

Round 7 shipped a NameError in a bench-only code path (translator
`_shared_json_map` import typo) that crashed BENCH_r07 outright; this
gate makes a syntactically broken bench fail pytest instead of reaching
the driver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SMOKE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(_SMOKE_SF_DIR),
    reason=f"bench smoke fixture dir {_SMOKE_SF_DIR} not present",
)
def test_bench_smoke_subprocess():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"bench --smoke rc={proc.returncode}\n{proc.stderr[-3000:]}"
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in bench output:\n{proc.stdout[-2000:]}"
    payload = json.loads(lines[-1])
    assert payload["metric"] == "bench_total_median_sec"
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert payload["queries"], "no per-query timings"
