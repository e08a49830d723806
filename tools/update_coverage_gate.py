"""Regenerate COVERAGE.md's gate line from the ACTUAL check output —
never hand-carry verification claims (they went stale in round 2).

Usage:
    python tools/check_oracle.py /root/testdata/sf0.01 | tee /tmp/gate.txt
    python -m pytest tests/ -q | tail -1 >> /tmp/gate.txt
    python tools/update_coverage_gate.py /tmp/gate.txt

Parses the "== N pass, R rows-only, F fail" summary (and, if present, a
pytest "N passed" tail line) and rewrites the gate paragraph in
COVERAGE.md with the parsed numbers, the current short commit, and
today's date.
"""

from __future__ import annotations

import datetime
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else None
    text = open(src).read() if src else sys.stdin.read()
    m = re.search(r"==\s*(\d+) pass, (\d+) rows-only, (\d+) fail", text)
    if not m:
        print("no '== N pass, R rows-only, F fail' summary found", file=sys.stderr)
        return 1
    n_pass, n_rows, n_fail = map(int, m.groups())
    pytest_m = re.search(r"(\d+) passed", text)
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    today = datetime.date.today().isoformat()

    line = (
        f"Gate (checked {today} at commit {commit} — this paragraph is "
        f"written by tools/update_coverage_gate.py from the actual check "
        f"output, never by hand):\n"
        f"`python tools/check_oracle.py /root/testdata/sf0.01` → "
        f"{n_pass} pass, {n_rows} rows-only, {n_fail} fail."
    )
    if pytest_m:
        line += f" `pytest tests/` → {pytest_m.group(1)} passed."

    path = os.path.join(REPO, "COVERAGE.md")
    doc = open(path).read()
    new_doc, n_sub = re.subn(
        r"Gate \(checked .*?→\s*\d+ pass.*?(?:passed\.|fail\.)",
        line,
        doc,
        flags=re.DOTALL,
    )
    if not n_sub:
        print("gate paragraph not found in COVERAGE.md", file=sys.stderr)
        return 1
    open(path, "w").write(new_doc)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
