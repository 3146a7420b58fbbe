#!/usr/bin/env python
"""Measure the pruning paths on a corpus tier (r11, VERDICT r10 task 3).

Runs the same four measurements on any sf-style dir (needs
documents.parquet + embeddings.parquet) so the NATURAL tier
(tools/make_natural_corpus.py) and the shipped worst case print side
by side:

1. **ANN recall per tier** — brute-force exact top-k as truth vs
   lsh / ivf / pq / ivfpq over ``--n-queries`` query vectors.
2. **Cell-prune fraction** — replicate _cell_pruned_cosine_pairs's
   provable bound (k-means cells via the operator's own _kmeans, full
   -corpus radii, spherical triangle inequality): the fraction of cell
   PAIRS the bound eliminates, and the fraction of candidate vector
   pairs that dies with them.
3. **Hyperplane-LSH keep-rate** — the analytic planner value
   (_lsh_pair_params f = random-pair candidate fraction) next to the
   MEASURED fraction of all vector pairs colliding in >= 1 of the
   planner's (k, L) tables.
4. **Prefix-filter reduction** — candidate pairs from the Bayardo
   prefix-token equi-join vs the unpruned share-any-token inverted
   index (both deduped), at the operator's default t=0.8.

Usage:
  python tools/natural_corpus_report.py --dir /tmp/natural [--label natural]
                                        [--threshold 0.8] [--n-queries 50]
Emits one JSON line per measurement (paste-ready for BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_vectors(sf_dir: str) -> np.ndarray:
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def ann_recall(spark, sf_dir: str, n_queries: int, k: int = 10) -> dict:
    from pyspark.sql import functions as F

    from data_ingestors_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_ann_topk,
        ivfpq_ann_topk,
        lsh_ann_topk,
        pq_ann_topk,
    )
    from data_ingestors_spark.queries.base import tables

    import time

    emb = tables(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.filter(F.col("vec_id") < n_queries)
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    # index parameters scale with corpus size so the 20k+ tiers (r12,
    # VERDICT r11 task 7) measure the same LOCAL selectivity as the
    # r11 2k point: cells ~ sqrt(n)/2.8 (16 at 2k, 51 at 20k), LSH planes
    # keep ~30 members/bucket. At n = 2000 these reduce to the exact
    # r11 values (n_cells=16 via the floor, n_planes=6).
    n_cells = max(16, int(round(math.sqrt(n) / 2.8)))
    n_planes = max(6, int(math.log2(max(n, 64) / 30)))
    t0 = time.time()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, q, k=k).collect()
    }
    brute_s = round(time.time() - t0, 2)
    tiers = {
        "lsh": lambda: lsh_ann_topk(emb, q, k=k, n_tables=8, n_planes=n_planes, dim=dim),
        "ivf": lambda: ivf_ann_topk(emb, q, k=k, n_cells=n_cells, n_probe=4),
        "pq": lambda: pq_ann_topk(emb, q, k=k, refine=2 * k),
        "ivfpq": lambda: ivfpq_ann_topk(emb, q, k=k, n_cells=n_cells, n_probe=4, refine=2 * k),
    }
    out: dict = {"n_vectors": n, "n_cells": n_cells, "n_planes": n_planes,
                 "brute_s": brute_s}
    for name, fn in tiers.items():
        t0 = time.time()
        got = {(r.query_id, r.neighbor_id) for r in fn().collect()}
        out[name] = round(len(exact & got) / len(exact), 3)
        out[f"{name}_s"] = round(time.time() - t0, 2)
    return out


def cell_prune_fraction(X: np.ndarray, threshold: float, n_cells: int = 32) -> dict:
    from data_ingestors_spark.operators.similarity import _kmeans

    cents = _kmeans(X, n_cells, seed=42)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = np.argmax(X @ cents.T, axis=1)
    radii = np.zeros(n_cells)
    sizes = np.zeros(n_cells, dtype=np.int64)
    for c in range(n_cells):
        members = X[assign == c]
        sizes[c] = len(members)
        if len(members):
            radii[c] = float(np.arccos(np.clip(members @ cents[c], -1, 1)).max())
    theta_t = math.acos(threshold - 1e-5)
    pruned_blocks = kept_blocks = 0
    pruned_pairs = total_pairs = 0
    for i in range(n_cells):
        for j in range(i, n_cells):
            npairs = (
                sizes[i] * (sizes[i] - 1) // 2 if i == j else sizes[i] * sizes[j]
            )
            total_pairs += npairs
            if i == j:
                kept_blocks += 1
                continue
            ang = float(np.arccos(np.clip(cents[i] @ cents[j], -1, 1)))
            if ang - radii[i] - radii[j] > theta_t:
                pruned_blocks += 1
                pruned_pairs += npairs
            else:
                kept_blocks += 1
    return {
        "n_cells": n_cells,
        "cell_blocks_pruned": pruned_blocks,
        "cell_blocks_kept": kept_blocks,
        "pair_fraction_pruned": round(pruned_pairs / max(total_pairs, 1), 3),
    }


def lsh_keep_rate(X: np.ndarray, threshold: float, seed: int = 42) -> dict:
    from data_ingestors_spark.operators.similarity import _lsh_pair_params

    params = _lsh_pair_params(threshold)
    if params is None:
        return {"planner": None, "measured": None}
    k, L, f = params
    n, dim = X.shape
    rng = np.random.RandomState(seed)
    colliding: set[tuple[int, int]] = set()
    for _t in range(L):
        planes = rng.randn(k, dim)
        sketches = (X @ planes.T > 0).astype(np.int8)
        keys = sketches @ (1 << np.arange(k))
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        start = 0
        for end in range(1, n + 1):
            if end == n or ks[end] != ks[start]:
                ids = order[start:end]
                if 1 < len(ids) <= 4000:
                    ids = np.sort(ids)
                    for a in range(len(ids)):
                        for b in range(a + 1, len(ids)):
                            colliding.add((int(ids[a]), int(ids[b])))
                elif len(ids) > 4000:  # bucket so big pairs ~ all-pairs
                    return {"planner_k": k, "planner_L": L,
                            "planner_f": round(f, 4), "measured": 1.0}
                start = end
    total = n * (n - 1) // 2
    return {
        "planner_k": k,
        "planner_L": L,
        "planner_f": round(f, 4),
        "measured": round(len(colliding) / total, 4),
    }


def prefix_filter_reduction(sf_dir: str, threshold: float) -> dict:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""
        CREATE TEMP TABLE sets AS
        SELECT doc_id,
               list_distinct(string_split(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), ' ')) AS words
        FROM '{sf_dir}/documents.parquet'
        """
    )
    con.execute(
        """
        CREATE TEMP TABLE tok AS
        SELECT doc_id, len(words) AS sz, unnest(words) AS w FROM sets
        """
    )
    # canonical prefix order: df asc, token asc; prefix length s - ceil(t*s) + 1
    full = con.execute(
        """
        WITH pairs AS (
          SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
          FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        ) SELECT count(*) FROM pairs
        """
    ).fetchone()[0]
    pref = con.execute(
        f"""
        WITH df AS (SELECT w, count(*) AS d FROM tok GROUP BY w),
        ranked AS (
          SELECT t.doc_id, t.sz, t.w,
                 row_number() OVER (PARTITION BY t.doc_id
                                    ORDER BY df.d, t.w) AS pos
          FROM tok t JOIN df ON t.w = df.w
        ),
        prefix AS (
          SELECT doc_id, sz, w FROM ranked
          WHERE pos <= sz - ceil({threshold} * sz) + 1
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
          FROM prefix a JOIN prefix b ON a.w = b.w AND a.doc_id < b.doc_id
          WHERE least(a.sz, b.sz) >= ceil({threshold} * greatest(a.sz, b.sz))
        ) SELECT count(*) FROM pairs
        """
    ).fetchone()[0]
    return {
        "any_token_candidates": int(full),
        "prefix_candidates": int(pref),
        "reduction_x": round(full / max(pref, 1), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--label", default=None)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--cos-threshold", type=float, default=0.9)
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument("--skip-ann", action="store_true")
    ap.add_argument("--skip-static", action="store_true",
                    help="skip the three non-Spark measurements (their "
                         "all-pairs ground truths are O(n^2) memory — at "
                         "20k+ vectors run only the ANN recall)")
    args = ap.parse_args()
    label = args.label or os.path.basename(args.dir.rstrip("/"))

    if not args.skip_static:
        X = _load_vectors(args.dir)
        print(json.dumps({"corpus": label, "metric": "cell_prune",
                          "cos_threshold": args.cos_threshold,
                          **cell_prune_fraction(X, args.cos_threshold)}), flush=True)
        print(json.dumps({"corpus": label, "metric": "lsh_keep_rate",
                          "cos_threshold": args.cos_threshold,
                          **lsh_keep_rate(X, args.cos_threshold)}), flush=True)
        print(json.dumps({"corpus": label, "metric": "prefix_filter",
                          "jaccard_threshold": args.threshold,
                          **prefix_filter_reduction(args.dir, args.threshold)}),
              flush=True)
    if not args.skip_ann:
        from data_ingestors_spark.session import get_spark

        spark = get_spark("natural-report")
        print(json.dumps({"corpus": label, "metric": "ann_recall_at_10",
                          **ann_recall(spark, args.dir, args.n_queries)}),
              flush=True)


if __name__ == "__main__":
    main()
