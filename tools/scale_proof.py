#!/usr/bin/env python
"""Scale-proof: run a query set at sf0.1 and at the synthetic sf1
(tools/make_sf_scale.py, 10× rows) and report wall-time scaling.

The brief grades 100 TB design; the largest shipped data point is
sf0.1. This measures the next decade: a query whose time grows ≈10×
on 10× data is behaving linearly (shuffle- and partition-healthy); a
superlinear offender (>15× per VERDICT r8 task 3) gets diagnosed.

Usage: python tools/scale_proof.py [--queries n1,n2,...] [--reps 2]
Writes a markdown table to stdout; caller pastes into BASELINE.md §r9.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestors_spark.queries import all_queries  # noqa: E402
from data_ingestors_spark.session import get_spark  # noqa: E402

# the original-17 headline set (bench.py HEADLINE[:17]) + the most
# expensive r8 headline queries by BENCH_full_latest median
DEFAULT = [
    # original-17 (bench.py HEADLINE[:17])
    "pricing_summary", "revenue_by_nation", "customer_order_counts",
    "range_join", "topk_per_group", "running_sum", "range_frame",
    "asof_join", "cube", "tumbling_window", "session_window",
    "dedup_exact", "minhash_neardup", "simhash_neardup",
    "embedding_topk", "text_stats", "validation_agg",
    # top-expensive r8 headliners (BENCH_full_latest medians)
    "embedding_dim_corr", "blocking_audit", "item_cosine",
    "dup_ngram_chars", "cluster_canonical", "dedup_clusters",
    "triangle_count", "semantic_dedup_cells", "snm_linkage",
    "prefix_filter_join",
]


def run(names: list[str], reps: int) -> None:
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown:", unknown)
        sys.exit(2)
    spark = get_spark("scale_proof")
    dirs = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/sf1"}
    if not os.path.exists(dirs["sf1"] + "/lineitem.parquet"):
        print("run tools/make_sf_scale.py first", file=sys.stderr)
        sys.exit(2)
    # one untimed warmup at sf0.001 pays the JVM JIT once
    for n in names:
        try:
            qs[n](spark, "/root/testdata/sf0.001").count()
        except Exception as e:
            print(f"warmup {n}: {type(e).__name__}: {e}", file=sys.stderr)
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf, d in dirs.items():
        for n in names:
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                qs[n](spark, d).count()
                best = min(best, time.time() - t0)
            times[n][sf] = best
            # drop frames the query persisted — accumulated cache
            # inflates later rows (see tools/scale_sweep.py)
            spark.catalog.clearCache()
            print(f"# {n} @ {sf}: {best:.2f}s", file=sys.stderr)
    print("| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    flagged = []
    for n in names:
        a, b = times[n]["sf0.1"], times[n]["sf1"]
        r = b / a if a > 0 else float("inf")
        mark = " ⚠" if r > 15 and a > 0.2 else ""
        if mark:
            flagged.append(n)
        print(f"| {n} | {a:.2f} | {b:.2f} | {r:.1f}×{mark} |")
    ta = sum(t["sf0.1"] for t in times.values())
    tb = sum(t["sf1"] for t in times.values())
    print(f"| **total** | **{ta:.1f}** | **{tb:.1f}** | **{tb / ta:.1f}×** |")
    if flagged:
        print(f"\nSuperlinear (>15× on base >0.2 s): {', '.join(flagged)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--all-bench", action="store_true",
        help="prove EVERY bench.py query (HEADLINE + TPCH) at sf1",
    )
    args = ap.parse_args()
    if args.all_bench:
        import bench

        names = list(dict.fromkeys(bench.HEADLINE + bench.TPCH_SUITE + bench.TPCH_EXTRA))
    else:
        names = args.queries.split(",") if args.queries else DEFAULT
    run(names, args.reps)
