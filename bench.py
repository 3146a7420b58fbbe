#!/usr/bin/env python
"""Headline benchmark: run the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count + a bounded collect of the
result) so the timing covers the full plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestors_spark.session import get_spark
from data_ingestors_spark.queries import all_queries

# Headline set: one per operator family, weighted toward the
# shuffle/join/window-heavy plans that dominate at scale.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "customer_order_counts",
    "range_join",
    "topk_per_group",
    "running_sum",
    "range_frame",
    "asof_join",
    "cube",
    "tumbling_window",
    "session_window",
    "dedup_exact",
    "minhash_neardup",
    "simhash_neardup",
    "embedding_topk",
    "text_stats",
    "validation_agg",
    # r3 additions: the new heavy analytics/LLM-pipeline plans
    "dedup_clusters",
    "contamination_check",
    "tfidf_topk",
    "gap_fill",
    "attribution_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    queries = all_queries()

    # warm the JVM + parquet footers with one trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
