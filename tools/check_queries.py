#!/usr/bin/env python
"""Spot-check named registry queries against their DuckDB oracles.

Usage: python tools/check_queries.py q1 q2 ...   [env SF_DIR overrides]
Runs the same compare as tools/local_correctness.py but only for the
named queries — the fast inner loop while adding operators.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from data_ingestors_spark.session import get_spark  # noqa: E402
from data_ingestors_spark.queries import all_oracles, all_queries  # noqa: E402
from oracle_harness import compare  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    q = all_queries()
    o = all_oracles()
    unknown = [n for n in names if n not in q]
    if unknown:
        print("unknown queries:", unknown)
        return 2
    spark = get_spark("check_queries")
    bad = 0
    for n in names:
        t0 = time.time()
        if n not in o:
            rows = q[n](spark, sf_dir).count()
            print(f"{n}: rows-only, {rows} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            problems = compare(spark, sf_dir, n, q[n], o[n])
        except Exception as exc:  # surface, keep sweeping
            problems = [f"{n}: EXception {type(exc).__name__}: {exc}"]
        if problems:
            bad += 1
            for p in problems:
                print("FAIL", p[:500])
        else:
            print(f"{n}: ok ({time.time()-t0:.1f}s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
