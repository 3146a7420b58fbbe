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
from pyspark.sql import types as T

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


def _pround(x: "np.ndarray", nd: int) -> "np.ndarray":
    """numpy twin of functions.rounding.fround — identical IEEE ops
    (floor(x*10^n + 0.5)/10^n) so scores hash-match the JVM/DuckDB path."""
    p = float(10**nd)
    return np.floor(x * p + 0.5) / p


def cosine_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k, Arrow-batched numpy scorer — the throughput
    path for the same contract as ``cosine_topk_bruteforce``.

    The query set is collected to the driver (small by contract — this
    operator is the "few queries × huge corpus" shape) and closed over
    as a normalized float64 matrix; each corpus Arrow batch computes
    one GEMM ``C @ Q.T`` instead of interpreted per-element HOF folds,
    then keeps only the batch-local top-k per query, so the shuffle
    into the global top-k window carries ≤ k·n_batches·n_queries rows
    — never the corpus.

    Scores are rounded with the same portable floor-rounding as the
    JVM path before ranking, and results are bit-identical to
    ``cosine_topk_bruteforce`` (asserted in tests): float64 dot-product
    reassociation differences vanish at 6 dp.
    """
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).collect()
    if not q_rows:
        raise ValueError("cosine_topk_numpy: empty query set")
    q_ids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    Q = np.array([r.q_vec for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array(list(pdf[vec_col]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = _pround(Cn @ Qn.T, 6)  # (batch, n_queries)
            frames = []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid
                cand_ids, cand = ids[mask], col[mask]
                if cand.size == 0:
                    continue
                # batch-local top-k with the global tie-break
                order = np.lexsort((cand_ids, -cand))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[order],
                            "cos_sim": cand[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )


def _kmeans(X: "np.ndarray", n_cells: int, *, iters: int = 10, seed: int = 42) -> "np.ndarray":
    """Small deterministic Lloyd's k-means on a driver-side sample —
    the coarse quantizer for the IVF index. Empty cells re-seed to the
    farthest points so every centroid stays live."""
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:
                cents[c] = X[d.min(axis=1).argmax()]
    return cents


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_rows: int = 2048,
    seed: int = 42,
    corpus_size: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    → corpus partitioned into cells → queries probe only the
    ``n_probe`` nearest cells → exact re-rank of the candidates.

    The scale path complementing ``lsh_ann_topk``: train on a bounded
    driver-side sample (deterministic), broadcast the centroid matrix
    in the Arrow UDF closure, assign each corpus vector ONCE (a
    projection, no shuffle), then candidates come from an equi-join on
    ``cell`` — cost scales with n_probe/n_cells of the corpus, never
    all-pairs. Recall vs the exact path is asserted in tests.

    The quantizer sample is a deterministic xxhash64 filter spread over
    the WHOLE corpus — ``limit(n)`` takes the *first* rows in scan
    order, so a corpus sorted/clustered on disk (by source, label,
    time) would train centroids on one region of the space and recall
    would collapse everywhere else. The count is parquet-metadata-cheap
    for a plain scan; pass ``corpus_size`` (exact or approximate) when
    the corpus sits behind a filter/join/UDF lineage or the operator is
    called repeatedly, and the sizing job is skipped entirely. The hash
    filter is a projection-level scan, no shuffle.

    CEILING division picks the modulus: with floor, any corpus in
    [sample_rows, 2·sample_rows) got m=1 — every row passed the filter
    and ``limit()`` reintroduced the exact scan-order bias the hash
    stripe exists to remove.
    """
    n = corpus_size if corpus_size is not None else corpus.count()
    m = max(1, -(-n // sample_rows))
    sample = (
        corpus.select(vec_col, F.col(id_col).alias("__sid"))
        .filter(F.pmod(F.xxhash64(F.col("__sid")), F.lit(m)) == 0)
        .select(vec_col)
        .limit(sample_rows)  # hard bound on driver memory
        .collect()
    )
    if not sample:  # degenerate tiny/empty-hash-stripe corpus
        sample = corpus.select(vec_col).limit(sample_rows).collect()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cents = _kmeans(Xn, n_cells, seed=seed)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def assign_cell(s):
        import pandas as pd

        V = np.array(list(s), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        return pd.Series((Vn @ cents.T).argmax(axis=1).astype(np.int32))

    def probe_cells(s):
        import pandas as pd

        V = np.array(list(s), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ cents.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    assign_udf = F.pandas_udf(assign_cell, "int")
    probe_udf = F.pandas_udf(probe_cells, "array<int>")

    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        assign_udf(F.col(vec_col)).alias("cell"),
    )
    q_probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_udf(F.col(vec_col))).alias("cell"),
    )
    cand = (
        c_assigned.join(F.broadcast(q_probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            fround(cosine_similarity_col(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return cand.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )
