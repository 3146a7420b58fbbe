#!/usr/bin/env python
"""Generate a synthetic sf1 (or any multiple) from the sf0.1 testdata
by replicating fact tables K times with per-replica key offsets —
seed-free and fully deterministic, so repeated runs produce identical
parquet. The driver ships no sf1; this gives the scale-proof runs
(BASELINE.md §r9) a measured 10× point beyond sf0.1.

Semantics of the replication (chosen so per-query work scales the way
a real corpus grows, not degenerately):

- region/nation: dimension tables, copied as-is.
- customer/supplier/part/orders/lineitem/events: keys shifted by
  ``replica * offset`` with offsets = max(key)+1 of the base table, so
  referential integrity holds within each replica and key spaces never
  collide. Dates/timestamps stay as-is — date-grouped aggregates grow
  K× per group, which is exactly what a K× corpus does.
- documents: doc_id shifted; replica > 0 gets a per-WORD replica tag
  (``word`` → ``r<i>word``), so every shingle/n-gram differs from the
  base corpus while each replica keeps the base corpus's full
  duplicate-family structure internally → dup/near-dup pair counts
  scale ~linearly, the shape of real corpus growth. (First cut used a
  2-token document PREFIX — measured: MinHash Jaccard between a doc
  and its replica stayed ≈0.94 > threshold, so near-dup families grew
  10× and cluster edge sets 100×, a data artifact no plan can fix.)
- embeddings: vec_id shifted; replica i is the base vector ROTATED by
  i positions — within a replica all pairwise dot products equal the
  base corpus's exactly (structure preserved), across replicas the
  rotated directions decorrelate (no artificial cross-replica
  near-dup mass). A dimension-1 nudge (first cut) kept cosine ≈0.999
  and had the same quadratic-family artifact.

Usage: python tools/make_sf_scale.py [out_dir] [k] [base_dir]
Defaults: /tmp/sf1 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES_AS_IS = ["region", "nation"]
# table -> [(key_col, offset_source_table, offset_source_col)]
SHIFTS: dict[str, list[tuple[str, str, str]]] = {
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [
        ("event_id", "events", "event_id"),
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")  # leave CPUs for a concurrent Spark JVM

    offsets: dict[tuple[str, str], int] = {}
    for shifts in SHIFTS.values():
        for _, src_t, src_c in shifts:
            if (src_t, src_c) not in offsets:
                offsets[(src_t, src_c)] = con.execute(
                    f"SELECT max({src_c}) + 1 FROM '{base}/{src_t}.parquet'"
                ).fetchone()[0]

    for t in TABLES_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{base}/{t}.parquet') TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{base}/{t}.parquet'").fetchall()
        ]
        shifted = {c: f"{c} + r.i * {offsets[(st, sc)]}" for c, st, sc in shifts}
        if t == "customer":
            # c_name embeds the key ('Customer#%09d') — regenerate it
            # from the SHIFTED key, like real TPC-H at a larger SF.
            # Copying it verbatim would put 10 exact copies of every
            # name in the corpus, which turns any name self-join
            # (FastSS fuzzy_match, SNM linkage) quadratic as a pure
            # data artifact no plan could avoid.
            off = offsets[("customer", "c_custkey")]
            shifted["c_name"] = (
                f"'Customer#' || lpad(CAST(c_custkey + r.i * {off} AS VARCHAR), 9, '0')"
            )
        if t == "supplier":
            off = offsets[("supplier", "s_suppkey")]
            shifted["s_name"] = (
                f"'Supplier#' || lpad(CAST(s_suppkey + r.i * {off} AS VARCHAR), 9, '0')"
            )
        if t == "documents":
            shifted["text"] = (
                "CASE WHEN r.i = 0 THEN text ELSE "
                "array_to_string([('r' || r.i || w) for w in string_split(text, ' ')], ' ') END"
            )
            shifted["n_chars"] = (
                "CASE WHEN r.i = 0 THEN n_chars ELSE CAST(length("
                "array_to_string([('r' || r.i || w) for w in string_split(text, ' ')], ' ')"
                ") AS BIGINT) END"
            )
        if t == "embeddings":
            shifted["embedding"] = (
                "CASE WHEN r.i = 0 THEN embedding ELSE "
                "list_concat(embedding[(r.i % 64) + 1:], embedding[1:(r.i % 64)]) END"
            )
        sel = ", ".join(f"{shifted.get(c, c)} AS {c}" for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{base}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range({k})) AS i) r) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
