#!/usr/bin/env python
"""Full-registry scale sweep: time EVERY registered query at sf0.1 and
at the synthetic sf1 (tools/make_sf_scale.py, 10x rows), one rep each,
and append a JSONL row per query so the run is resumable and
monitorable. tools/scale_proof.py proves the 27 headline queries with
2 reps; this sweeps the whole 325-query registry for superlinear
offenders the headline set can't see.

A query is flagged when sf1/sf0.1 > 15x with sf0.1 > 0.2 s (same
thresholds as scale_proof.py / VERDICT r8 task 3). Single-rep noise is
acceptable at that margin; flagged queries get a 2-rep confirm in
scale_proof.py before any fix.

Usage:
  python tools/scale_sweep.py [--out /tmp/scale_sweep.jsonl]
                              [--sf1 /tmp/sf1] [--only n1,n2]
Resumes: names already present in --out are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestors_spark.queries import all_queries  # noqa: E402
from data_ingestors_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_sweep.jsonl")
    ap.add_argument("--base", default="/root/testdata/sf0.1",
                    help="baseline sf dir (e.g. /tmp/sf1 for the second decade)")
    ap.add_argument("--sf1", default="/tmp/sf1",
                    help="scaled sf dir (e.g. /tmp/sf10)")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    qs = all_queries()
    names = args.only.split(",") if args.only else sorted(qs)
    done: set[str] = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass
    todo = [n for n in names if n not in done]
    print(f"{len(todo)} to run ({len(done)} already done)", flush=True)

    spark = get_spark("scale_sweep")
    with open(args.out, "a") as out:
        for i, n in enumerate(todo):
            row: dict = {"name": n}
            try:
                qs[n](spark, "/root/testdata/sf0.001").count()  # JIT warmup
                t0 = time.time()
                rows_a = qs[n](spark, args.base).count()
                row["sf01_s"] = round(time.time() - t0, 3)
                row["sf01_rows"] = rows_a
                t0 = time.time()
                rows_b = qs[n](spark, args.sf1).count()
                row["sf1_s"] = round(time.time() - t0, 3)
                row["sf1_rows"] = rows_b
                row["ratio"] = round(row["sf1_s"] / max(row["sf01_s"], 1e-9), 2)
                flag = row["ratio"] > 15 and row["sf01_s"] > 0.2
                row["flag"] = flag
            except Exception as e:
                row["err"] = f"{type(e).__name__}: {e}"[:400]
            # queries persist intermediate frames (_materialize) and
            # never unpersist — across hundreds of sweep rows the
            # accumulated cache evicts/GC-thrashes and inflates later
            # timings (r9: semantic_dedup_cells read 26× mid-sweep,
            # 3.9× in a fresh JVM). Drop it between rows.
            spark.catalog.clearCache()
            out.write(json.dumps(row) + "\n")
            out.flush()
            tag = " ⚠" if row.get("flag") else (" ERR" if "err" in row else "")
            print(
                f"[{i + 1}/{len(todo)}] {n}: "
                f"{row.get('sf01_s', '-')}s -> {row.get('sf1_s', '-')}s "
                f"({row.get('ratio', '-')}x){tag}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
