"""Distributed graph analytics over edge DataFrames.

Complements the connected-components resolver in
``operators/dedup.py`` with the other two graph primitives a data
pipeline actually reaches for: triangle counting (graph clustering /
spam detection on co-occurrence graphs) and PageRank (authority
weighting of sources / documents by link structure).

Both operate on a plain ``(src, dst)`` edge DataFrame, so they compose
with any graph the queries construct (co-purchase part graphs,
nation-level trade flows, near-dup similarity graphs, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Count triangles with the degree-oriented wedge-closing algorithm.

    The naive 3-way edge self-join enumerates every triangle 6 times
    and — much worse — builds wedges at HIGH-degree vertices, which is
    quadratic in the hottest degree. The standard fix (Suri & Vassilvitskii's
    MR triangle counting) orients every undirected edge from the
    lower-(degree, id) endpoint to the higher one: the oriented
    out-degree is bounded by O(sqrt(|E|)) for any graph, wedge
    generation is the self-join of the ORIENTED adjacency (so the hot
    vertex never fans out), and each triangle is produced exactly once.

    Plan: dedupe to canonical undirected edges, one groupBy for
    degrees, two broadcast-or-shuffle joins to orient, one self-join on
    the oriented middle vertex, one semi-join to close wedges. Every
    shuffle carries (int, int) pairs only.

    Returns a 1-row DataFrame: n_triangles, n_edges, n_nodes.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e.persist()
    nodes = e.select(F.col("a").alias("v")).union(e.select(F.col("b").alias("v")))
    deg = nodes.groupBy("v").agg(F.count("*").alias("deg"))
    # orient: u -> w iff (deg_u, u) < (deg_w, w)
    oriented = (
        e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select("e.u", "e.w")
    )
    oriented = oriented.persist()
    # wedges at the low-degree center: u -> w1, u -> w2  (w1 < w2 not
    # required — orientation already makes each triangle close once)
    o1 = oriented.select(F.col("u").alias("c"), F.col("w").alias("x"))
    o2 = oriented.select(F.col("u").alias("c"), F.col("w").alias("y"))
    # x < y keeps one wedge per unordered out-neighbor pair, which is
    # already the canonical undirected-edge form — each triangle's
    # lowest-(deg,id) vertex is its unique wedge center, so each
    # triangle is generated exactly once.
    wedges = o1.join(o2, "c").filter(F.col("x") < F.col("y"))
    closed = wedges.select(F.col("x").alias("a"), F.col("y").alias("b")).join(
        e, ["a", "b"], "left_semi"
    )
    tri = closed.agg(F.count("*").cast("long").alias("n_triangles"))
    stats = e.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        deg.agg(F.count("*").cast("long").alias("n_nodes"))
    )
    return tri.crossJoin(F.broadcast(stats))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank, fixed iteration count, uniform init.

    rank_0(v) = 1/N;
    rank_{i+1}(v) = (1-d)/N + d * sum_{u->v} rank_i(u) * w(u,v)/W(u)
    (dangling mass, if any, is redistributed uniformly so ranks keep
    summing to 1).

    Plan per iteration: one join of the rank frame to the edge frame on
    src + one groupBy dst — the canonical iterative-join PageRank. The
    edge frame is reused across iterations (persist it when calling at
    scale); on a real cluster you would also pre-partition edges and
    ranks by vertex so the per-iteration join is shuffle-free, and
    checkpoint every ~10 iterations to cut the lineage. Ranks are
    accumulated in DECIMAL so the per-vertex sums are
    reduction-order-free (which also makes the fixed-iteration result
    bit-comparable to a SQL oracle).

    Returns (v, rank) with rank as an exact-path double.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), w_col.alias("wt")
    ).filter(F.col("u") != F.col("v"))
    out_w = e.groupBy("u").agg(F.sum(F.col("wt").cast("decimal(30,10)")).cast("double").alias("wsum"))
    e = e.join(out_w, "u").withColumn("frac", F.col("wt") / F.col("wsum")).select("u", "v", "frac")
    e = e.persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    n_total = nodes.count()  # 1-value driver read: sizes the teleport term
    # the dangling-node SET is pure topology — compute it once; when it
    # is empty (typical for aggregated flow graphs) the per-iteration
    # dangling-mass job disappears entirely, and adding the exact 0.0
    # keeps the arithmetic bit-identical to the general form.
    danglers = nodes.join(
        e.select("u").distinct(), nodes.node == F.col("u"), "left_anti"
    ).persist()
    has_danglers = danglers.count() > 0
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.u == ranks.node)
            .select(F.col("v").alias("node"), (F.col("rank") * F.col("frac")).alias("c"))
            .groupBy("node")
            .agg(F.sum(F.col("c").cast("decimal(30,10)")).cast("double").alias("inflow"))
        )
        new_rank = F.lit((1.0 - damping) / n_total) + F.lit(damping) * (
            F.col("inflow") + F.col("dm") / F.lit(float(n_total))
        )
        base = (
            nodes.join(contribs, "node", "left")
            .withColumn("inflow", F.coalesce("inflow", F.lit(0.0)))
        )
        if has_danglers:
            dangling = (
                ranks.join(danglers.select("node"), "node", "left_semi")
                .agg(
                    F.coalesce(F.sum(F.col("rank").cast("decimal(30,10)")), F.lit(0))
                    .cast("double").alias("dm")
                )
            )
            base = base.crossJoin(F.broadcast(dangling))
        else:
            base = base.withColumn("dm", F.lit(0.0))
        # persist each iteration — the rank frame is one row per vertex
        # and is referenced by the next iteration's contribution join
        # (and dangling sum); unpersisted lineage would recompute the
        # prefix exponentially. At cluster scale, checkpoint every ~10
        # iterations as well to truncate the logical plan itself.
        ranks = base.withColumn("rank", new_rank).select("node", "rank").persist()
    return ranks.select(F.col("node").alias("v"), F.col("rank"))
