"""Compare two bench JSON lines (or files containing one) and flag
per-query deltas — the regression lens for BENCH_r{N} across rounds.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold_pct]

Prints per-query old/new/delta sorted by regression severity; exits 1
when any shared query regressed by more than threshold_pct (default 50%
— round-to-round noise on a shared VM is real, so the default is loose;
tighten when comparing runs from the same session).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    text = open(path).read()
    m = re.search(r'\{"metric".*\}', text)
    doc = json.loads(m.group(0) if m else text)
    return doc.get("parsed", doc) if "parsed" in doc or "metric" in doc else doc


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    rows = []
    for name in shared:
        a, b = oq[name], nq[name]
        pct = (b - a) / a * 100 if a else 0.0
        rows.append((pct, name, a, b))
    rows.sort(reverse=True)
    worst = 0.0
    for pct, name, a, b in rows:
        flag = " <-- REGRESSED" if pct > thresh else ""
        print(f"{name:32s} {a:7.2f}s -> {b:7.2f}s  {pct:+6.1f}%{flag}")
        worst = max(worst, pct)
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    print(
        f"total {old['value']:.1f}s -> {new['value']:.1f}s over "
        f"{len(shared)} shared queries (threshold {thresh:.0f}%)"
    )
    return 1 if worst > thresh else 0


if __name__ == "__main__":
    sys.exit(main())
