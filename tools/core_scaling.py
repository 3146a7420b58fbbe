#!/usr/bin/env python
"""r13 core-scaling probe (VERDICT r12 item 2): time the heaviest
scan/shuffle-bound registry names at sf1 on local[N]; run once with
SPARK_GRAFT_CPUS=32 and once with 8, compare mins."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
from data_ingestors_spark.session import get_spark
from data_ingestors_spark.queries import all_queries
NAMES = ["pricing_summary", "revenue_by_nation", "product_profit",
         "market_share", "large_orders", "supplier_price_outliers",
         "item_cosine", "char_ngram_profile", "minhash_neardup",
         "dedup_exact"]
SF = "/tmp/sf1"
spark = get_spark("core_scaling")
Q = all_queries()
for n in NAMES:  # JIT warm at sf0.001
    try: Q[n](spark, "/root/testdata/sf0.001").count()
    except Exception as e: print("warm skip", n, e, file=sys.stderr)
    spark.catalog.clearCache()
out = {"cpus": spark.sparkContext.defaultParallelism, "queries": {}}
for rep in range(2):
    for n in NAMES:
        t0 = time.perf_counter(); Q[n](spark, SF).count()
        dt = time.perf_counter() - t0
        out["queries"].setdefault(n, []).append(round(dt, 3))
        spark.catalog.clearCache()
print(json.dumps(out))
