"""Isolation timings: run named corpus queries EACH IN A FRESH
SparkSession (warmup + median-of-3, same methodology as bench.py) so a
per-query number carries no shared-session state — the adjudication
tool for round-over-round drift on the shared box (r7/r8 phantom
regressions).

Usage:
    python tools/bench_isolate.py [sf_dir] name1 name2 ...

Prints one JSON line: {"sf_dir": ..., "loadavg": [...],
"queries": {name: {"median": s, "spread": s}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from financial_data_lakehouse_pipeline__spark import corpus  # noqa: E402
from financial_data_lakehouse_pipeline__spark.session import build_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if not args:
        print("usage: bench_isolate.py [sf_dir] name...", file=sys.stderr)
        raise SystemExit(1)
    qs = corpus.queries()
    out: dict[str, dict] = {}
    for name in args:
        spark = build_session(
            f"isolate-{name}",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        fn = qs[name]

        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warmup: codegen + IO caches, untimed
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            run()
            times.append(time.monotonic() - t0)
        out[name] = {
            "median": round(statistics.median(times), 3),
            "spread": round(max(times) - min(times), 3),
        }
        spark.stop()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
