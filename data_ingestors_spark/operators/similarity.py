"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_topk_bruteforce`` — exact top-k for a *small* query set:
  broadcast the queries, scan the corpus once, per-partition top-k via
  window. Corpus-size-linear; the right baseline and the correctness
  oracle for the ANN path.
- ``lsh_ann_topk`` — random-hyperplane LSH: bucket the corpus by
  sign-bit sketch, probe only colliding buckets (+ optional multiprobe
  neighbors at Hamming distance 1). At 100 TB the corpus never
  all-pairs joins; the bucket join is an equi-join Catalyst shuffles on
  the sketch key.

All vector math is JVM-side (``zip_with`` + ``aggregate`` fold —
sequential order, deterministic); hyperplanes are seeded NumPy
literals, not runtime randomness.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> "F.Column":
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a, b) -> "F.Column":
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    Output: (query_id, neighbor_id, cos_sim, rnk). Ties broken by
    neighbor id for determinism; self-matches excluded. Similarity is
    rounded *before* ranking so rank order is reproducible across
    engines with different float reduction order.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity_col(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def lsh_sketch_col(vec_col, planes: list[list[float]]) -> "F.Column":
    """Sign-bit sketch: bit i = (vec · plane_i) > 0, packed to a long."""
    sketch = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sketch = sketch + bit * F.lit(1 << i).cast("long")
    return sketch


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: equi-join queries to corpus on the LSH
    bucket (with Hamming-1 multiprobe buckets for recall), then exact
    re-rank within candidates. Same output shape as the brute-force op."""
    planes = _hyperplanes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_sketch_col(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_sketch_col(F.col(vec_col), planes).alias("q_bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("q_bucket"),
            *[F.col("q_bucket").bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(n_planes)],
        )
        q = q.select("query_id", "q_vec", F.explode(probes).alias("q_bucket"))
    q = F.broadcast(q)
    scored = (
        c.join(q, F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity_col(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )
