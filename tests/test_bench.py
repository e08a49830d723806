"""bench.py contract: the driver parses exactly one JSON line from
stdout — rounds 1 and 2 were lost to an unparseable/crashing bench, so
this is pinned as a test (run at sf0.001 to keep it fast)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_parseable_json_line():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    # two JSON lines: diagnostics (method/spread) then the result —
    # the RESULT must be last, since the driver parses the final line
    assert len(lines) == 2, out.stdout[-2000:]
    diag = json.loads(lines[0])
    assert "spread_max_minus_min" in diag
    assert "minmax" in diag  # per-query [min, max] of the 3 timed runs
    doc = json.loads(lines[1])
    assert doc["metric"] == "headline_queries_total_wall"
    assert doc["unit"] == "sec" and doc["value"] > 0
    assert doc["sf"] == 0.001
    # drift sidecar on the RESULT line (r10 verdict #6): loadavg +
    # aggregate spread travel with the number the judge reads
    assert "load" in doc and "spr" in doc
    # every headline query produced a timing (no silent drops)
    assert "errors" not in doc, doc.get("errors")
    assert len(doc["queries"]) >= 20
    # driver-tail contract: the driver keeps only the LAST 2000 chars of
    # stdout and parses the final line within it — round 5's bench went
    # unparsed because the result line outgrew that window. Re-enact the
    # driver's capture to pin the fix.
    tail = out.stdout[-2000:]
    last = [l for l in tail.splitlines() if l.strip()][-1]
    assert json.loads(last)["metric"] == "headline_queries_total_wall"
