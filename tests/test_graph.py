"""Unit tests for operators/graph.py (triangle counting, PageRank)
and the heavy-hitter candidate guarantee in operators/sketches.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestors_spark.operators.graph import pagerank, triangle_count
from data_ingestors_spark.operators.sketches import heavy_hitter_candidates


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")


def test_triangle_count_known_graphs(spark):
    # K4: 4 triangles, 6 edges, 4 nodes
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = triangle_count(_edges(spark, k4)).collect()[0]
    assert (row.n_triangles, row.n_edges, row.n_nodes) == (4, 6, 4)

    # triangle + pendant edge + isolated edge: exactly 1 triangle
    g = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]
    row = triangle_count(_edges(spark, g)).collect()[0]
    assert (row.n_triangles, row.n_edges, row.n_nodes) == (1, 5, 6)


def test_triangle_count_dedupes_and_orients(spark):
    # duplicate edges, reversed duplicates, and self-loops must not
    # change the count
    g = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (1, 2)]
    row = triangle_count(_edges(spark, g)).collect()[0]
    assert (row.n_triangles, row.n_edges, row.n_nodes) == (1, 3, 3)


def test_pagerank_symmetric_cycle(spark):
    # 2-cycle: perfectly symmetric, ranks must stay at 1/2 each
    pr = {r.v: r.rank for r in pagerank(_edges(spark, [(1, 2), (2, 1)]), iterations=3).collect()}
    assert math.isclose(pr[1], 0.5, abs_tol=1e-12)
    assert math.isclose(pr[2], 0.5, abs_tol=1e-12)


def test_pagerank_dangling_mass_conserved(spark):
    # 1 -> 2, 2 dangling: total rank must remain 1 every iteration
    pr = pagerank(_edges(spark, [(1, 2)]), iterations=4).collect()
    total = sum(r.rank for r in pr)
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    ranks = {r.v: r.rank for r in pr}
    assert ranks[2] > ranks[1]  # sink accumulates authority


def test_pagerank_weighted_outflow_split(spark):
    # u splits 3:1 between a and b — after one iteration from uniform,
    # a's inflow from u must be 3x b's
    e = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, wt double",
    )
    pr = {r.v: r.rank for r in pagerank(e, weight="wt", iterations=1).collect()}
    base = (1 - 0.85) / 3
    inflow_a = pr[1] - base
    inflow_b = pr[2] - base
    assert math.isclose(inflow_a / inflow_b, 3.0, rel_tol=1e-9)


def test_heavy_hitter_candidates_no_false_negatives(spark):
    # adversarial layout: the frequent value is spread across many
    # partitions so no partition-local count dominates, yet the
    # pigeonhole guarantee must still surface it
    rows = [("hot",)] * 120 + [(f"cold{i}",) for i in range(880)]
    df = spark.createDataFrame(rows, "w string").repartition(8)
    cands = {
        r.w
        for r in heavy_hitter_candidates(df, "w", 1, 10).collect()
    }  # support 10%: only "hot" (12%) qualifies globally
    assert "hot" in cands

    # verify pass keeps exactly the true frequent set
    total = df.count()
    exact = (
        df.groupBy("w").count().filter(F.col("count") * 10 >= total).select("w")
    )
    true_set = {r.w for r in exact.collect()}
    assert true_set == {"hot"}
    assert true_set <= cands


def test_triangle_count_matches_bruteforce_random(spark):
    """Degree-oriented counting must equal the brute-force triangle
    count on random graphs (several seeds, incl. dense ones where
    orientation matters)."""
    import itertools
    import random

    for seed, n, p in [(1, 12, 0.3), (2, 10, 0.6), (3, 14, 0.15)]:
        rng = random.Random(seed)
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        adj = {frozenset(e) for e in edges}
        expected = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if frozenset((a, b)) in adj
            and frozenset((b, c)) in adj
            and frozenset((a, c)) in adj
        )
        row = triangle_count(_edges(spark, edges)).collect()[0]
        assert row.n_triangles == expected, (seed, expected, row.n_triangles)
