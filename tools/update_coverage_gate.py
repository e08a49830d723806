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
    summaries = list(
        re.finditer(r"==\s*(\d+) pass, (\d+) rows-only, (\d+) fail", text)
    )
    if not summaries:
        print("no '== N pass, R rows-only, F fail' summary found", file=sys.stderr)
        return 1
    # Optional seeded-subsample run (check_oracle --sample N --seed S):
    # its "sample: n=.. seed=.." header precedes its own summary line;
    # the FULL run is whichever summary has no sample header before it.
    sample_hdr = re.search(r"sample: n=(\d+) seed=(\d+)", text)
    sample_sum = None
    m = summaries[0]
    if sample_hdr:
        after = [s for s in summaries if s.start() > sample_hdr.end()]
        before = [s for s in summaries if s.start() < sample_hdr.start()]
        if after:
            sample_sum = after[0]
        if before:
            m = before[0]
        elif len(after) > 1:
            m = after[1]
        else:
            # the only summary present belongs to the subsample — do NOT
            # stamp it as the full-corpus result (misrepresents provenance)
            print(
                "refusing: the only summary found follows the 'sample:' "
                "header — run the FULL check too (its summary must appear "
                "without a sample header, before or after the sampled one)",
                file=sys.stderr,
            )
            return 1
    n_pass, n_rows, n_fail = map(int, m.groups())
    pytest_m = re.search(r"(\d+) passed", text)
    # The "checked at commit X" claim is only trustworthy if X's tree is
    # the tree the check ran on: refuse when anything besides COVERAGE.md
    # is dirty. Workflow: commit the code, run the checks, run this tool,
    # commit the COVERAGE.md-only change — the cited hash then names the
    # exact code the judge checks out.
    dirty = [
        ln[3:]
        for ln in subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.splitlines()
        if ln.strip() and not ln[3:].startswith("COVERAGE.md")
    ]
    if dirty:
        print(
            f"refusing: working tree dirty beyond COVERAGE.md ({dirty[:5]}) — "
            "commit first so the gate hash names the checked tree",
            file=sys.stderr,
        )
        return 1
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
    if sample_hdr and sample_sum:
        sn, ss = sample_hdr.groups()
        sp, sr, sf = sample_sum.groups()
        line += (
            f" Seeded subsample (n={sn}, seed={ss}): "
            f"{sp} pass, {sr} rows-only, {sf} fail."
        )
    if pytest_m:
        line += f" `pytest tests/` → {pytest_m.group(1)} passed."

    path = os.path.join(REPO, "COVERAGE.md")
    doc = open(path).read()
    # Stamp the Totals line from the LIVE corpus in the same pass — it
    # drifted by hand-editing in round 9 (read 299/297 while the corpus
    # was 312/310). Import inside main: the registry import starts no
    # Spark session, it just registers query callables.
    sys.path.insert(0, REPO)
    from financial_data_lakehouse_pipeline__spark import corpus

    n_q = len(corpus.queries())
    n_oracle = len(corpus.oracle_sql())
    totals = (
        f"**Totals: {n_q} corpus queries, {n_oracle} oracle-paired, "
        f"{n_q - n_oracle} rows-only (HLL, approx-percentile).**"
    )
    doc, n_tot = re.subn(
        r"\*\*Totals: \d+ corpus queries, \d+ oracle-paired, "
        r"\d+ rows-only \(HLL, approx-percentile\)\.\*\*",
        totals,
        doc,
    )
    if not n_tot:
        print("Totals line not found in COVERAGE.md", file=sys.stderr)
        return 1
    # Consume ALL trailing pytest sentences, not just the first — a
    # non-greedy stop at the first "passed." left earlier rounds' tails
    # accumulating as stale "`pytest tests/` → N passed." sentences.
    new_doc, n_sub = re.subn(
        r"Gate \(checked .*?→\s*\d+ pass.*?fail\."
        r"(?:\s*Seeded subsample \(n=\d+, seed=\d+\): \d+ pass, "
        r"\d+ rows-only, \d+ fail\.)?"
        r"(?:\s*`pytest tests/` → \d+ passed\.)*",
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
