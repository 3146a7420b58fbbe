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

from data_ingestors_spark.functions.rounding import fround


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
            fround(cosine_similarity_col(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
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
    n_tables: int = 8,
    n_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via **multi-table** hyperplane LSH.

    Standard (L tables × k planes) construction: a neighbor is a
    candidate if it collides with the query in ≥1 table; multiprobe
    additionally probes every Hamming-1 bucket per table. Candidate
    pairs are deduplicated BEFORE scoring, then exactly re-ranked.

    Collision probability per plane is 1−θ/π, so per-table p^k and
    overall 1−(1−p^k)^L — tune L up / k down for recall, the reverse
    for selectivity. Near-orthogonal corpora (random embeddings) need
    generous L; clustered real-world embeddings prune far harder.

    Plan shape at scale: corpus is hashed once per table (a projection,
    no shuffle), candidates come from an equi-join on (table, bucket),
    and only candidates pay the exact-cosine cost.
    """
    c_base = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q_base = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))

    def sketches(df: DataFrame, vcol: str, out: str, probe: bool) -> DataFrame:
        rows = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed=1000 + t)
            b = lsh_sketch_col(F.col(vcol), planes)
            buckets = [b]
            if probe:
                buckets += [b.bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(n_planes)]
            rows.append(
                F.struct(F.lit(t).alias("tbl"), F.array(*buckets).alias("buckets"))
            )
        return df.select(
            df.columns[0],
            F.explode(F.array(*rows)).alias("tb"),
        ).select(df.columns[0], F.col("tb.tbl").alias("tbl"), F.explode("tb.buckets").alias(out))

    c_hashed = sketches(c_base.select("neighbor_id", "c_vec"), "c_vec", "bucket", probe=False)
    q_hashed = sketches(q_base.select("query_id", "q_vec"), "q_vec", "bucket", probe=multiprobe)

    cand = (
        c_hashed.join(F.broadcast(q_hashed), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.join(c_base, "neighbor_id")
        .join(F.broadcast(q_base), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            fround(cosine_similarity_col(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )
