#!/usr/bin/env python
"""Emit CORRECTNESS_local_r{N}.json: the local oracle-parity report for
EVERY registered query (the driver's file caps at 50 entries; this
makes the other half auditable — VERDICT r3 'what's missing' #4).

Row shape mirrors the driver's CORRECTNESS file: per query
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err};
queries without an oracle (hash-seeded ops whose values no SQL engine
reproduces) are recorded as rows-only with the sibling/test that
verifies their math.

Usage: python tools/local_correctness.py [sf_dir] [round_tag]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

# rows-only queries: where their correctness evidence actually lives
ROWS_ONLY_EVIDENCE = {
    "grouped_quantiles": "per-group digest is approximate by construction (rank error <= ~2/B per group); exact sibling math oracle-checked via winsorized_stats (exact interpolated per-source percentiles); bound asserted in tests/test_operators.py::test_grouped_digest_quantiles",
    "quantile_digest": "mergeable centroid digest is approximate by construction (rank error <= ~2/B); sweep records measured max-rank-error accuracy vs the exact CDF; bound asserted in tests/test_operators.py::test_quantile_digest_rank_error",
    "minhash_neardup": "jaccard math oracle-paired via ngram_jaccard; recall in tests/test_operators.py::test_minhash_finds_neardups",
    "simhash_neardup": "hamming verify in tests/test_operators.py::test_simhash_stable_and_neardup",
    "embedding_ann": "recall vs exact asserted in tests/test_operators.py::test_lsh_ann_recall",
    "embedding_ann_ivf": "recall vs exact asserted in tests/test_operators.py::test_ivf_ann_recall (+ sorted-corpus adversarial); r6 adaptive probe depth (mass-based, <=2*n_probe cells) lifts the random-corpus worst case from 0.6 to >=0.8 measured",
    "embedding_ann_pq": "recall vs exact asserted in tests/test_operators.py::test_pq_ann_recall; ADC candidates exactly re-ranked, so reported sims are true cosines",
    "embedding_ann_ivfpq": "recall vs exact asserted in tests/test_operators.py::test_ivfpq_ann_recall; r6 adaptive probing + refine=20/n_codes=64 defaults reach the IVF probing ceiling (>=0.8 measured) on the random-corpus worst case",
}


# --- measured recall probes (VERDICT r4 next-round #6) ------------------
# For each hash-seeded rows-only query, compute NUMERIC recall at the
# sweep's sf_dir against the exact ground truth its oracle-checked
# sibling defines — so the driver's `no_oracle` rows carry quantitative
# evidence, not just a pointer to a test.


def _recall_minhash(spark, sf_dir: str) -> float | None:
    """Recall of minhash_neardup's (exact-verified) pairs vs brute-force
    exact shingle-Jaccard >= 0.7 over ALL pairs (ground truth includes
    pairs the band join may have missed)."""
    from pyspark.sql import functions as F

    from data_ingestors_spark.operators.dedup import _materialize, shingle_docs
    from data_ingestors_spark.queries import all_queries
    from data_ingestors_spark.queries.base import tables

    docs = tables(spark, sf_dir, "documents")["documents"]
    sh = _materialize(shingle_docs(docs, "text", "doc_id", 3))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(inter / union >= 0.7)
        .select("id_a", "id_b")
    )
    n_truth = truth.count()
    if n_truth == 0:
        return None
    found = all_queries()["minhash_neardup"](spark, sf_dir).select("id_a", "id_b")
    return truth.join(found, ["id_a", "id_b"]).count() / n_truth


def _recall_simhash(spark, sf_dir: str) -> float | None:
    """Recall vs brute-force Hamming <= 3 over all sketch pairs. The
    4x16-bit pigeonhole bands are exhaustive for <= 3 bit flips, so
    this measures 1.0 by construction — recorded so the artifact shows
    the measurement, not the argument."""
    import numpy as np

    from data_ingestors_spark.operators.dedup import simhash
    from data_ingestors_spark.queries import all_queries
    from data_ingestors_spark.queries.base import tables

    docs = tables(spark, sf_dir, "documents")["documents"]
    rows = simhash(docs, "text", "doc_id").collect()
    ids = np.array([r.doc_id for r in rows], dtype=np.int64)
    h = np.array([r.simhash for r in rows], dtype=np.int64).view(np.uint64)
    x = h[:, None] ^ h[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2).sum(axis=2)
    iu = np.triu_indices(len(ids), 1)
    mask = ham[iu] <= 3
    truth = {
        (min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
        for i, j in zip(iu[0][mask], iu[1][mask])
    }
    if not truth:
        return None
    found = {
        (r.id_a, r.id_b)
        for r in all_queries()["simhash_neardup"](spark, sf_dir).collect()
    }
    return len(truth & found) / len(truth)


def _recall_ann(query_name: str):
    """recall@5 of an ANN query vs the oracle-checked exact top-k."""

    def probe(spark, sf_dir: str) -> float | None:
        from data_ingestors_spark.queries import all_queries

        q = all_queries()
        exact = {
            (r.query_id, r.neighbor_id) for r in q["embedding_topk"](spark, sf_dir).collect()
        }
        if not exact:
            return None
        got = {(r.query_id, r.neighbor_id) for r in q[query_name](spark, sf_dir).collect()}
        return len(exact & got) / len(exact)

    return probe




def _rank_accuracy_digest(spark, sf_dir: str) -> float | None:
    """1 - max |true_rank(est) - q| over the digest's quantile
    estimates: 1.0 would be exact; the digest bound says >= 1 - ~2/B."""
    from pyspark.sql import functions as F

    from data_ingestors_spark.queries import all_queries
    from data_ingestors_spark.queries.base import tables

    li = tables(spark, sf_dir, "lineitem")["lineitem"].select("l_extendedprice")
    li = li.persist()
    n = li.count()
    ests = all_queries()["quantile_digest"](spark, sf_dir).collect()
    if not ests or n == 0:
        return None
    worst = 0.0
    for r in ests:
        rank = li.filter(F.col("l_extendedprice") <= r.est).count() / n
        worst = max(worst, abs(rank - r.q))
    li.unpersist()
    return 1.0 - worst


RECALL_PROBES = {
    "quantile_digest": _rank_accuracy_digest,
    "minhash_neardup": _recall_minhash,
    "simhash_neardup": _recall_simhash,
    "embedding_ann": _recall_ann("embedding_ann"),
    "embedding_ann_ivf": _recall_ann("embedding_ann_ivf"),
    "embedding_ann_pq": _recall_ann("embedding_ann_pq"),
    "embedding_ann_ivfpq": _recall_ann("embedding_ann_ivfpq"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r4"

    from data_ingestors_spark.queries import all_oracles, all_queries
    from data_ingestors_spark.session import get_spark
    from tests.oracle_harness import compare

    spark = get_spark("local-correctness")
    queries, oracles = all_queries(), all_oracles()

    report: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(queries):
        entry: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            if name in oracles:
                problems = compare(spark, sf_dir, name, queries[name], oracles[name])
                n = queries[name](spark, sf_dir).count()
                entry.update(
                    rows_match=not any("rows" in p for p in problems),
                    schema_match=not any("columns" in p for p in problems),
                    hash_match=not problems,
                    spark_rows=n,
                    oracle_rows=n if not problems else None,
                    err="; ".join(problems) or None,
                )
                if problems:
                    n_fail += 1
                else:
                    n_pass += 1
            else:
                n = queries[name](spark, sf_dir).count()
                entry.update(
                    rows_match=None, schema_match=None, hash_match=None,
                    spark_rows=n,
                    err=None,
                )
                entry["rows_only"] = True
                entry["verified_by"] = ROWS_ONLY_EVIDENCE.get(
                    name, "in-repo unit tests (tests/)"
                )
                probe = RECALL_PROBES.get(name)
                if probe is not None:
                    try:
                        r = probe(spark, sf_dir)
                        entry["recall"] = round(r, 4) if r is not None else None
                    except Exception as e:  # noqa: BLE001
                        entry["recall_err"] = f"{type(e).__name__}: {e}"
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            entry["err"] = f"{type(e).__name__}: {e}"
            n_fail += 1
        report[name] = entry
        status = "ok" if not entry["err"] else "FAIL"
        print(f"# {name}: {status}", file=sys.stderr)

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(queries),
        "n_oracle_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": n_rows_only,
        "queries": report,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"CORRECTNESS_local_{tag}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
