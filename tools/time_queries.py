"""Time every declared query at a given sf dir: one warm-up-free pass,
per-query wall seconds to stdout as JSON. Measurement aid for the
optimization rounds (guide §1: measure first) — NOT the bench contract
(bench.py is); timings here are single-run and include first-run JIT,
so use them to RANK queries, not as before/after evidence.

Usage: python tools/time_queries.py [sf_dir] [runs] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    only = set(sys.argv[3:])

    import __spark_entry__ as entry
    from hindex_spark.session import get_spark

    spark = get_spark("time_queries")
    qs = entry.queries()
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.collect()
                samples.append(round(time.perf_counter() - t0, 4))
            out[name] = min(samples)
            print(f"{name}\t{samples}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            out[name] = None
            print(f"{name}\tERROR {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
