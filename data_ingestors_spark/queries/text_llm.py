"""LLM training-data pipeline queries over documents/embeddings:
dedup family, similarity search, text analysis (SURVEY.md §2.5
"LLM-pipeline" row + the north-star operator list).

Oracle-checked wherever DuckDB can express the same math; the
hash-seeded ops (MinHash-LSH, SimHash, hyperplane ANN) use Spark's
Murmur3/xxhash64 and are rows-only checked by the driver — their
*verification* math (exact Jaccard / Hamming / cosine re-rank) is
covered by the oracle-checked siblings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.operators import dedup as D
from data_ingestors_spark.operators import similarity as S
from data_ingestors_spark.operators import text as X
from data_ingestors_spark.functions.rounding import fround, o_fround
from data_ingestors_spark.queries.base import DEC, tables

# Loud scale bound for audit queries that broadcast a sampled stratum
# (binary_embedding_audit): 50k x 64-dim doubles ~ 26 MB broadcast.
# Module-level so tests can patch it to prove the guard fires.
MAX_BROADCAST_STRATUM = 50_000


def _spread(df: DataFrame) -> DataFrame:
    """Spread compute-heavy per-row work across all cores when the
    input arrives under-partitioned (one tiny parquet file → one
    partition → one task). At cluster scale inputs already have
    thousands of splits and this is a no-op — the repartition only
    fires when partitions < defaultParallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --- dedup -------------------------------------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "documents")
    return D.exact_dedup(t["documents"], "text", "doc_id")


O_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "documents")
    return D.normalized_dedup(t["documents"], "text", "doc_id")


O_DEDUP_NORMALIZED = """
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard near-dup pairs, blocked by source."""
    t = tables(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(t["documents"], "text", "doc_id", "source", threshold=0.5)


O_NGRAM_JACCARD = f"""
WITH w AS (
  SELECT doc_id, source,
         list_distinct(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS words
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {o_fround('''CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
             / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))''', 6)} AS jaccard
FROM w a JOIN w b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
      / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) >= 0.5
"""


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup (rows-only: Murmur3 seeds not in DuckDB).
    Jaccard verification math is oracle-covered by q_ngram_jaccard."""
    t = tables(spark, sf_dir, "documents")
    return D.minhash_near_duplicates(
        _spread(t["documents"]), "text", "doc_id",
        num_hashes=32, bands=8, shingle_n=3, threshold=0.7,
    )


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (rows-only: xxhash64 not in DuckDB)."""
    t = tables(spark, sf_dir, "documents")
    return D.simhash_near_duplicates(_spread(t["documents"]), "text", "doc_id", max_hamming=3)


# --- similarity search --------------------------------------------------
def _queries_subset(df: DataFrame) -> DataFrame:
    return df.filter(F.col("vec_id") < 5)


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for a fixed query set."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.cosine_topk_bruteforce(emb, _queries_subset(emb), k=5)


O_EMBEDDING_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {o_fround("list_cosine_similarity(CAST(q.q_vec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))", 6)} AS cos_sim
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


def q_embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (rows-only; recall vs the exact
    brute-force path is asserted in tests/test_similarity.py)."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.lsh_ann_topk(emb, _queries_subset(emb), k=5, n_tables=8, n_planes=6, dim=64)


def q_embedding_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched numpy GEMM scorer — same exact contract (and the
    same oracle) as embedding_topk; this is the throughput path."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.cosine_topk_numpy(emb, _queries_subset(emb), k=5)


def q_embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: k-means coarse cells + n_probe search
    (rows-only; recall vs brute force asserted in tests)."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.ivf_ann_topk(emb, _queries_subset(emb), k=5, n_cells=16, n_probe=4)


def q_embedding_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-5: 8x 8-dim codebooks, ADC
    lookup-table scoring over byte codes, exact re-rank of survivors
    (rows-only; recall vs brute force asserted in tests — the
    memory-bound tier of the ANN stack, m bytes scanned per vector
    instead of the float vector)."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.pq_ann_topk(emb, _queries_subset(emb), k=5, m_subspaces=8, n_codes=32, refine=10)


def q_embedding_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed index (FAISS IVFx,PQy recipe): coarse cells
    route the probe, residual PQ codes bound the bytes scanned, exact
    re-rank of survivors (rows-only; recall vs brute force asserted in
    tests — the billion-scale configuration of the ANN stack)."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.ivfpq_ann_topk(emb, _queries_subset(emb), k=5, n_cells=16, n_probe=4)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within a label block.

    At t=0.9 the analytic gate picks LSH-bucketed candidates + exact
    verify (8 planes × 27 tables → per-pair miss ≤ 1e-4, ~10× pruning
    on random pairs); the pair join is keyed on (block, tbl, bucket),
    so its per-task input is bounded by bucket occupancy, not label
    block size (the r4 all-pairs block join this replaces)."""
    t = tables(spark, sf_dir, "embeddings")
    return S.blocked_cosine_pairs(
        t["embeddings"], id_col="vec_id", vec_col="embedding",
        threshold=0.9, block_col="label",
    )


O_EMBEDDING_NEARDUP = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {o_fround("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))", 6)} AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {o_fround("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))", 6)} >= 0.9
"""


# --- text analysis ------------------------------------------------------
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "documents")
    return X.text_stats(t["documents"], "text", "doc_id")


_O_NWORDS = (
    "CASE WHEN trim(text) = '' THEN 0"
    " ELSE len(string_split_regex(trim(text), '\\s+')) END"
)
_O_NPUNCT = "length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))"
_O_NDIGIT = "length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))"
_O_CPW = o_fround(f"CAST(length(text) AS DOUBLE) / greatest({_O_NWORDS}, 1)", 4)
_O_PUNCT_R = o_fround(f"CAST({_O_NPUNCT} AS DOUBLE) / greatest(length(text), 1)", 6)
_O_DIGIT_R = o_fround(f"CAST({_O_NDIGIT} AS DOUBLE) / greatest(length(text), 1)", 6)

O_TEXT_STATS = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST({_O_NWORDS} AS BIGINT) AS n_words,
       {_O_CPW} AS chars_per_word,
       CAST({_O_NPUNCT} AS BIGINT) AS n_punct,
       {_O_PUNCT_R} AS punct_ratio,
       {_O_DIGIT_R} AS digit_ratio
FROM documents
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "documents")
    return X.language_id(t["documents"], "text", "doc_id")


def _o_hits(lang: str, markers: list[str]) -> str:
    pat = r"\b(" + "|".join(markers) + r")\b"
    return f"CAST(len(regexp_extract_all(lower(text), '{pat}')) AS BIGINT)"


_H_EN = _o_hits("en", X.LANG_MARKERS["en"])
_H_DE = _o_hits("de", X.LANG_MARKERS["de"])
_H_FR = _o_hits("fr", X.LANG_MARKERS["fr"])
_H_ES = _o_hits("es", X.LANG_MARKERS["es"])

O_LANGUAGE_ID = f"""
SELECT doc_id,
       {_H_EN} AS hits_en, {_H_DE} AS hits_de, {_H_FR} AS hits_fr, {_H_ES} AS hits_es,
       CASE WHEN {_H_EN} = 0 AND {_H_DE} = 0 AND {_H_FR} = 0 AND {_H_ES} = 0 THEN 'und'
            WHEN {_H_EN} >= {_H_DE} AND {_H_EN} >= {_H_FR} AND {_H_EN} >= {_H_ES} THEN 'en'
            WHEN {_H_DE} >= {_H_FR} AND {_H_DE} >= {_H_ES} THEN 'de'
            WHEN {_H_FR} >= {_H_ES} THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM documents
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "documents")
    return X.token_count(t["documents"], "text", "doc_id")


O_TOKEN_COUNT = """
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 canonical fingerprint is oracle-checked; the xxhash64 compact
    key is Spark-only, so it is excluded here and covered by unit tests."""
    t = tables(spark, sf_dir, "documents")
    return X.fingerprint(t["documents"], "text", "doc_id").select("doc_id", "fp_md5")


O_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5
FROM documents
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs resolved to cluster keep/drop decisions:
    connected components (min-label propagation) over the oracle-
    checked n-gram Jaccard edges, singletons kept. The oracle computes
    the same components with a recursive-CTE transitive closure."""
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", "source", threshold=0.5)
    return D.neardup_clusters(docs.select("doc_id"), pairs.select("id_a", "id_b"))


O_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({O_NGRAM_JACCARD})),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(node, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id, doc_id = cluster_id AS keep FROM comp
UNION ALL
SELECT doc_id, doc_id AS cluster_id, TRUE AS keep
FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM comp)
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: per-doc email/URL/phone match counts
    plus the redacted text (operators/text.py pii_redact)."""
    from data_ingestors_spark.operators import text as X

    t = tables(spark, sf_dir, "documents")
    return X.pii_redact(t["documents"], "text", "doc_id")


O_PII_REDACT = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_url,
       CAST(len(regexp_extract_all(text, '\+?[0-9][0-9() .-]{7,}[0-9]')) AS BIGINT) AS n_phone,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^\s]+', '<URL>', 'g'),
         '\+?[0-9][0-9() .-]{7,}[0-9]', '<PHONE>', 'g') AS redacted
FROM documents
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: label-blocked embedding
    cosine pairs (>= 0.35 at this corpus's similarity scale) resolved
    into cluster keep/drop decisions with the same connected-components
    operator as the textual dedup path. Oracle: recursive-CTE closure
    over the identical pair SQL.

    At t=0.35 a qualifying pair sits at ~69.5° — close enough to the
    ~90° of a random pair that NO recall-safe bucketing prunes
    (measured: LSH and multi-probe IVF both leave ≥ 95% of all pairs
    as candidates). The gate in blocked_cosine_pairs therefore runs
    the exact chunked-grid join: semantics stay exact (the closure
    oracle below is the proof) and the pair scan's per-task input is
    bounded by chunk_rows, not label block size — the scale fix for
    the r4 all-pairs block join. Past GRID_PAIRS_CELLS_CUTOVER
    within-block pairs, auto swaps in the equally-exact cell-pruned
    grid (r9: 60.8 s → 13.7 s at the 10× synthetic sf1, same rows,
    same oracle)."""
    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    pairs = S.blocked_cosine_pairs(
        e, id_col="vec_id", vec_col="embedding",
        threshold=0.35, block_col="label",
    ).select("id_a", "id_b")
    return D.neardup_clusters(
        e.select(F.col("vec_id").alias("doc_id")), pairs
    ).select(F.col("doc_id").alias("vec_id"), "cluster_id", "keep")


def q_semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup through the SemDeDup cell-pruning strategy
    (operators/similarity.py _cell_pruned_cosine_pairs): k-means cells
    whose pairwise angular gap provably exceeds arccos(threshold) are
    skipped; surviving cell pairs run the same bounded chunk grid.
    EXACT by the spherical triangle inequality — it shares this
    closure oracle with semantic_dedup, so the hash match is the
    proof. On this corpus (random vectors, radii near 90°) nothing
    prunes and the run degenerates to grid + one assignment pass; on
    clustered embeddings the quadratic shrinks to near-diagonal cell
    blocks."""
    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    pairs = S.blocked_cosine_pairs(
        e, id_col="vec_id", vec_col="embedding",
        threshold=0.35, block_col="label", strategy="cells", n_cells=8,
    ).select("id_a", "id_b")
    return D.neardup_clusters(
        e.select(F.col("vec_id").alias("doc_id")), pairs
    ).select(F.col("doc_id").alias("vec_id"), "cluster_id", "keep")


_O_SEM_PAIRS = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {o_fround("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))", 6)} >= 0.35
"""

O_SEMANTIC_DEDUP = f"""
WITH RECURSIVE
pairs AS ({_O_SEM_PAIRS}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(node, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT vec_id, cluster_id, vec_id = cluster_id AS keep FROM comp
UNION ALL
SELECT vec_id, vec_id AS cluster_id, TRUE AS keep
FROM embeddings WHERE vec_id NOT IN (SELECT vec_id FROM comp)
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "semantic_dedup": q_semantic_dedup,
    "semantic_dedup_cells": q_semantic_dedup_cells,
    "pii_redact": q_pii_redact,
    "dedup_normalized": q_dedup_normalized,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_neardup": q_minhash_neardup,
    "simhash_neardup": q_simhash_neardup,
    "embedding_topk": q_embedding_topk,
    "embedding_topk_fast": q_embedding_topk_fast,
    "embedding_ann": q_embedding_ann,
    "embedding_ann_ivf": q_embedding_ann_ivf,
    "embedding_ann_pq": q_embedding_ann_pq,
    "embedding_ann_ivfpq": q_embedding_ann_ivfpq,
    "embedding_neardup": q_embedding_neardup,
    "text_stats": q_text_stats,
    "language_id": q_language_id,
    "token_count": q_token_count,
    "fingerprint": q_fingerprint,
}

ORACLES = {
    "dedup_exact": O_DEDUP_EXACT,
    "dedup_clusters": O_DEDUP_CLUSTERS,
    "semantic_dedup": O_SEMANTIC_DEDUP,
    "semantic_dedup_cells": O_SEMANTIC_DEDUP,
    "pii_redact": O_PII_REDACT,
    "dedup_normalized": O_DEDUP_NORMALIZED,
    "ngram_jaccard": O_NGRAM_JACCARD,
    "embedding_topk": O_EMBEDDING_TOPK,
    # same exact semantics, same oracle — the fast path must match it
    "embedding_topk_fast": O_EMBEDDING_TOPK,
    "embedding_neardup": O_EMBEDDING_NEARDUP,
    "text_stats": O_TEXT_STATS,
    "language_id": O_LANGUAGE_ID,
    "token_count": O_TOKEN_COUNT,
    "fingerprint": O_FINGERPRINT,
}


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality tier + corpus histogram (see
    operators/text.py quality_score)."""
    t = tables(spark, sf_dir, "documents")
    return (
        X.quality_score(t["documents"], "text", "doc_id")
        .groupBy("quality")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


O_QUALITY_SCORE = f"""
WITH s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST({_O_NWORDS} AS BIGINT) AS n_words,
         {_O_CPW} AS chars_per_word,
         {_O_PUNCT_R} AS punct_ratio,
         {_O_DIGIT_R} AS digit_ratio
  FROM documents
)
SELECT CAST((CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END
      + CASE WHEN n_words >= 20 THEN 1 ELSE 0 END
      + CASE WHEN punct_ratio <= 0.10 THEN 1 ELSE 0 END
      + CASE WHEN digit_ratio <= 0.20 THEN 1 ELSE 0 END
      + CASE WHEN chars_per_word BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END) AS BIGINT) AS quality,
       CAST(count(*) AS BIGINT) AS n_docs
FROM s GROUP BY 1
"""

QUERIES["quality_score"] = q_quality_score
ORACLES["quality_score"] = O_QUALITY_SCORE


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (64-word chunks, 16-word overlap) —
    zero-shuffle row-local array expressions (operators/text.py
    chunk_documents)."""
    from data_ingestors_spark.operators.text import chunk_documents

    t = tables(spark, sf_dir, "documents")
    return chunk_documents(t["documents"], "text", "doc_id", chunk_size=64, overlap=16)


O_CHUNK_DOCUMENTS = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), n AS (
  SELECT doc_id, w, len(w) AS nw,
         1 + CAST(ceil(greatest(len(w) - 64, 0) / 48.0) AS BIGINT) AS n_chunks
  FROM ws
)
SELECT doc_id,
       k AS chunk_id,
       least(nw - k * 48, 64) AS n_words,
       array_to_string(w[k * 48 + 1 : k * 48 + 64], ' ') AS chunk_text
FROM n, LATERAL unnest(generate_series(0, n_chunks - 1)) AS t(k)
"""

QUERIES["chunk_documents"] = q_chunk_documents
ORACLES["chunk_documents"] = O_CHUNK_DOCUMENTS


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-hash fingerprints: per-doc distinct
    window-minimum k-gram hashes (operators/text.py
    winnowing_fingerprints), reduced to a per-doc fingerprint count +
    the numerically smallest fingerprint so the oracle row is
    compact but pins the actual selected hashes."""
    from data_ingestors_spark.operators.text import winnowing_fingerprints

    t = tables(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(t["documents"], "text", "doc_id", k=5, window=4)
    return fps.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fps"),
        F.min("fp").alias("min_fp"),
    )


O_WINNOWING = """
WITH g AS (
  SELECT doc_id,
         [CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)) AS BIGINT)
          for i in generate_series(1, greatest(len(ws) - 4, 1))] AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
), f AS (
  SELECT doc_id,
         list_distinct([list_min(grams[i:i+3])
                        for i in generate_series(1, greatest(len(grams) - 3, 1))]) AS fps
  FROM g
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fps,
       list_min(fps) AS min_fp
FROM f
"""

QUERIES["winnowing"] = q_winnowing
ORACLES["winnowing"] = O_WINNOWING


def q_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document overlap via winnowing fingerprints: docs sharing
    >= 3 selected fingerprints, with the shared count as the overlap
    score. The fingerprint inverted-index join is the MOSS match step:
    candidates are only pairs sharing a sampled hash — never all
    pairs. Restricted to same-source pairs (the blocked shape every
    plagiarism/contamination scan runs per shard).

    MOSS noise filter: fingerprints appearing in more than ``max_df``
    documents are dropped BEFORE the self-join. Without it one
    boilerplate n-gram shared by d documents costs O(d²) join rows —
    the same density trap documented for the Jaccard index path
    (operators/dedup.py) — and its matches are noise, not copied
    passages. The hot set is tiny by definition, so it anti-joins as a
    broadcast."""
    from data_ingestors_spark.operators.text import winnowing_fingerprints

    max_df = 10
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    # both the hot-df filter branch and the pair join read the
    # fingerprint frame — persist it so the window-min expression tree
    # (the expensive part) evaluates once, not twice; the broadcast
    # subjob materializes the cache before the main join reads it
    fps = winnowing_fingerprints(docs, "text", "doc_id", k=5, window=4).persist()
    hot = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("fp")
    )
    fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    src = docs.select("doc_id", "source")
    fps = fps.join(src, "doc_id")
    right = fps.select(
        F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_r"), F.col("source").alias("src_r")
    )
    return (
        fps.join(
            right,
            (F.col("fp") == F.col("fp_r"))
            & (F.col("source") == F.col("src_r"))
            & (F.col("doc_id") < F.col("id_b")),
        )
        .groupBy(F.col("doc_id").alias("id_a"), "id_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 3)
    )


O_WINNOWING_OVERLAP = """
WITH g AS (
  SELECT doc_id, source,
         [CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)) AS BIGINT)
          for i in generate_series(1, greatest(len(ws) - 4, 1))] AS grams
  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents)
), f AS (
  SELECT doc_id, source,
         unnest(list_distinct([list_min(grams[i:i+3])
                 for i in generate_series(1, greatest(len(grams) - 3, 1))])) AS fp
  FROM g
), ff AS (
  -- MOSS noise filter: drop fingerprints shared by > 10 documents
  SELECT * FROM f
  WHERE fp NOT IN (SELECT fp FROM f GROUP BY fp HAVING count(*) > 10)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared_fps
FROM ff a JOIN ff b ON a.fp = b.fp AND a.source = b.source AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
"""

QUERIES["winnowing_overlap"] = q_winnowing_overlap
ORACLES["winnowing_overlap"] = O_WINNOWING_OVERLAP


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM fluency score (bits/word, Laplace-smoothed) — the
    cheap perplexity proxy for corpus quality ranking
    (operators/text.py unigram_logprob). fround(4) on the float for
    engine-stable comparison."""
    from data_ingestors_spark.operators.text import unigram_logprob

    t = tables(spark, sf_dir, "documents")
    out = unigram_logprob(t["documents"], "text", "doc_id")
    return out.select(
        "doc_id", "n_words", fround(F.col("bits_per_word"), 4).alias("bits_per_word")
    )


O_UNIGRAM_LOGPROB = f"""
WITH base AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), base_f AS (
  SELECT doc_id, w FROM base WHERE w <> ''
), stats AS (
  SELECT w, count(*) AS cnt FROM base_f GROUP BY w
), totals AS (
  SELECT sum(cnt) AS n_tokens, count(*) AS n_vocab FROM stats
), model AS (
  SELECT w, -log2((cnt + 0.5) / (n_tokens + 0.5 * n_vocab)) AS bits
  FROM stats, totals
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       {o_fround("avg(bits)", 4)} AS bits_per_word
FROM base_f JOIN model USING (w)
GROUP BY doc_id
"""

QUERIES["unigram_logprob"] = q_unigram_logprob
ORACLES["unigram_logprob"] = O_UNIGRAM_LOGPROB


def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring windows per document (Lee et al.,
    ACL 2022 substring-dedup primitive; operators/text.py
    dup_span_stats). All shuffles are combiner-friendly groupBys —
    unique-window attribution via max(doc_id) replaces any join or
    window keyed on the span string, so a corpus-hot span cannot skew
    a reducer."""
    from data_ingestors_spark.operators.text import dup_span_stats

    t = tables(spark, sf_dir, "documents")
    return dup_span_stats(_spread(t["documents"]), "text", "doc_id", span=30)


O_DUP_SPAN_STATS = f"""
WITH spans AS (
  SELECT doc_id, substr(text, i, 30) AS w
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 29, 0) + 1)) AS i
        FROM documents)
), freq AS (
  SELECT w, count(*) AS n_occ FROM spans GROUP BY w
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       {o_fround("sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)", 6)} AS dup_frac
FROM spans JOIN freq USING (w)
GROUP BY doc_id
"""

QUERIES["dup_span_stats"] = q_dup_span_stats
ORACLES["dup_span_stats"] = O_DUP_SPAN_STATS


def q_dup_span_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans: fixed-span duplicated windows merged
    into variable-length contiguous regions per document (the Lee et
    al. maximal-substring primitive via seeds + interval merge;
    operators/text.py dup_span_merge). The global frequency groupBy is
    hot-span-safe; duplicated positions come from an anti-join on the
    uniform (doc_id, pos) key, never a join on the span string."""
    from data_ingestors_spark.operators.text import dup_span_merge

    t = tables(spark, sf_dir, "documents")
    return dup_span_merge(_spread(t["documents"]), "text", "doc_id", span=30)


O_DUP_SPAN_MERGE = """
WITH spans AS (
  SELECT doc_id, i AS pos, substr(text, i, 30) AS w
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 29, 0) + 1)) AS i
        FROM documents)
), freq AS (
  SELECT w, count(*) AS n_occ FROM spans GROUP BY w
), dup AS (
  SELECT doc_id, pos FROM spans JOIN freq USING (w) WHERE n_occ > 1
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 30
              THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM isl
), sp AS (
  SELECT doc_id, g, max(pos) - min(pos) + 30 AS chars
  FROM grp GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(chars) AS BIGINT) AS dup_chars,
       CAST(max(chars) AS BIGINT) AS max_span_chars
FROM sp GROUP BY doc_id
"""

QUERIES["dup_span_merge"] = q_dup_span_merge
ORACLES["dup_span_merge"] = O_DUP_SPAN_MERGE


def q_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate scrub: every document rewritten with its maximal
    duplicated regions (>= 30 chars) cut out (operators/text.py
    strip_dup_spans) — the action step after dup_span_merge. Region
    computation shares the hot-span-safe plan; the rewrite itself is
    one codegen aggregate fold over the per-doc sorted region array,
    no UDF."""
    from data_ingestors_spark.operators.text import strip_dup_spans

    t = tables(spark, sf_dir, "documents")
    return strip_dup_spans(_spread(t["documents"]), "text", "doc_id", span=30)


O_STRIP_DUP_SPANS = """
WITH spans AS (
  SELECT doc_id, i AS pos, substr(text, i, 30) AS w
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 29, 0) + 1)) AS i
        FROM documents)
), freq AS (
  SELECT w, count(*) AS n_occ FROM spans GROUP BY w
), dup AS (
  SELECT doc_id, pos FROM spans JOIN freq USING (w) WHERE n_occ > 1
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 30
              THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM isl
), regf AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 29 AS e
  FROM grp GROUP BY doc_id, g
  HAVING max(pos) + 29 - min(pos) + 1 >= 30
), gaps AS (
  SELECT doc_id,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS gs,
         s - 1 AS ge
  FROM regf
), kept AS (
  SELECT g.doc_id,
         string_agg(substr(d.text, gs, greatest(ge - gs + 1, 0)), '' ORDER BY gs) AS head
  FROM gaps g JOIN documents d USING (doc_id)
  GROUP BY g.doc_id
), tails AS (
  SELECT r.doc_id, substr(d.text, max(r.e) + 1) AS tail
  FROM regf r JOIN documents d USING (doc_id)
  GROUP BY r.doc_id, d.text
), stats AS (
  SELECT doc_id, count(*) AS n_regions FROM regf GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN s.n_regions IS NULL THEN d.text
            ELSE coalesce(k.head, '') || t.tail END AS cleaned_text,
       CAST(coalesce(s.n_regions, 0) AS BIGINT) AS n_regions,
       CAST(length(d.text) -
            length(CASE WHEN s.n_regions IS NULL THEN d.text
                        ELSE coalesce(k.head, '') || t.tail END) AS BIGINT)
         AS removed_chars
FROM documents d
LEFT JOIN stats s USING (doc_id)
LEFT JOIN kept k ON k.doc_id = d.doc_id
LEFT JOIN tails t ON t.doc_id = d.doc_id
"""

QUERIES["strip_dup_spans"] = q_strip_dup_spans
ORACLES["strip_dup_spans"] = O_STRIP_DUP_SPANS


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality rules (Rae et al. 2021 A1.1) as
    per-rule audit flags + the conjunction (operators/text.py
    gopher_quality_flags). One let-bound word array + one line array,
    all row-local codegen — no shuffle, no UDF."""
    from data_ingestors_spark.operators.text import gopher_quality_flags

    t = tables(spark, sf_dir, "documents")
    return gopher_quality_flags(t["documents"], "text", "doc_id")


_O_STOP_SUM = " + ".join(
    f"CASE WHEN regexp_matches(' ' || lower(text) || ' ', '[^a-z]{s}[^a-z]') THEN 1 ELSE 0 END"
    for s in ["the", "be", "to", "of", "and", "that", "have", "with"]
)

O_GOPHER_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ws,
         list_transform(string_split(text, chr(10)), l -> trim(l)) AS lines
  FROM documents
), m AS (
  SELECT doc_id, text, ws, lines,
         len(ws) AS n_words,
         greatest(len(ws), 1)::DOUBLE AS nw,
         coalesce(list_aggregate(list_transform(ws, w -> length(w)), 'sum'), 0)::DOUBLE AS total_wl,
         len(regexp_extract_all(text, '#|\\.\\.\\.|…'))::DOUBLE AS n_sym,
         greatest(len(lines), 1)::DOUBLE AS nl,
         len(list_filter(lines, l -> regexp_matches(l, '^[•‣▪◦*-]')))::DOUBLE AS n_bullet,
         len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)$')))::DOUBLE AS n_ell,
         len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE AS n_alpha,
         ({_O_STOP_SUM}) AS n_stop
  FROM base
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       {o_fround("total_wl / nw", 4)} AS mean_word_len,
       n_words BETWEEN 50 AND 100000 AS f_word_count,
       total_wl / nw BETWEEN 3.0 AND 10.0 AS f_mean_word_len,
       n_sym / nw <= 0.1 AS f_symbol_ratio,
       n_bullet / nl < 0.9 AS f_bullet_lines,
       n_ell / nl < 0.3 AS f_ellipsis_lines,
       n_alpha / nw >= 0.8 AS f_alpha_words,
       n_stop >= 2 AS f_stopwords,
       (n_words BETWEEN 50 AND 100000) AND (total_wl / nw BETWEEN 3.0 AND 10.0)
         AND (n_sym / nw <= 0.1) AND (n_bullet / nl < 0.9)
         AND (n_ell / nl < 0.3) AND (n_alpha / nw >= 0.8) AND (n_stop >= 2)
         AS passes_gopher
FROM m
"""

QUERIES["gopher_quality"] = q_gopher_quality
ORACLES["gopher_quality"] = O_GOPHER_QUALITY


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2;
    operators/text.py c4_line_filter): terminal-punctuation /
    5-word / javascript line rules as a rewrite, lorem-ipsum +
    curly-brace + >=3-kept-lines doc rules as flags. One let-bound
    line array, row-local codegen."""
    from data_ingestors_spark.operators.text import c4_line_filter

    t = tables(spark, sf_dir, "documents")
    return c4_line_filter(t["documents"], "text", "doc_id")


O_C4_FILTER = """
WITH base AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS lines
  FROM documents
), m AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
           regexp_matches(l, '[.!?"]$')
           AND len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kept
  FROM base
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       contains(text, '{') AS has_brace,
       NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
         AND len(kept) >= 3 AS passes_c4
FROM m
"""

QUERIES["c4_filter"] = q_c4_filter
ORACLES["c4_filter"] = O_C4_FILTER


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: per customer name, the
    count of other names at edit distance exactly 1 (operators/
    fuzzy.py FastSS deletion-neighborhood blocking — candidates come
    from an equi-join on 1-deletion keys, never an all-pairs compare;
    the DuckDB oracle IS the all-pairs compare, so a hash match proves
    the blocking is lossless on this corpus). Runs with the default
    hot-key density cap (DEFAULT_MAX_KEY_DF) — no c_name key comes
    near it, so the oracle match also proves the cap is a no-op on
    natural identifiers."""
    from data_ingestors_spark.operators.fuzzy import fuzzy_match_stats

    t = tables(spark, sf_dir, "customer")
    return fuzzy_match_stats(_spread(t["customer"]), "c_name", "c_custkey")


O_FUZZY_MATCH = """
WITH pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND levenshtein(a.c_name, b.c_name) = 1
), sides AS (
  SELECT id_a AS id, id_b AS match_id FROM pairs
  UNION ALL
  SELECT id_b AS id, id_a AS match_id FROM pairs
)
SELECT id, CAST(count(*) AS BIGINT) AS n_matches, min(match_id) AS min_match_id
FROM sides GROUP BY id
"""

QUERIES["fuzzy_match"] = q_fuzzy_match
ORACLES["fuzzy_match"] = O_FUZZY_MATCH


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency (bits per adjacent word pair, Laplace
    smoothed) — the n-gram step up from unigram_logprob; template spam
    with common words but unlikely transitions scores high
    (operators/text.py bigram_logprob)."""
    from data_ingestors_spark.operators.text import bigram_logprob

    t = tables(spark, sf_dir, "documents")
    out = bigram_logprob(t["documents"], "text", "doc_id")
    return out.select(
        "doc_id",
        "n_bigrams",
        fround(F.col("bits_per_bigram"), 4).alias("bits_per_bigram"),
    )


O_BIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     x -> x <> '') AS ws
  FROM documents
), base AS (
  SELECT doc_id, ws[i] AS prev, ws[i + 1] AS w
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)
), bg AS (
  SELECT prev, w, count(*) AS c_bg FROM base GROUP BY 1, 2
), ctx AS (
  SELECT prev, count(*) AS c_ctx FROM base GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT w) AS v FROM base
), model AS (
  SELECT prev, w, -log2((c_bg + 0.5) / (c_ctx + 0.5 * v)) AS bits
  FROM bg JOIN ctx USING (prev) CROSS JOIN vocab
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       {o_fround("avg(bits)", 4)} AS bits_per_bigram
FROM base JOIN model USING (prev, w)
GROUP BY doc_id
"""

QUERIES["bigram_logprob"] = q_bigram_logprob
ORACLES["bigram_logprob"] = O_BIGRAM_LOGPROB


# ------------------------------------------------- canonical selection

def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups resolved to one CANONICAL survivor each:
    group by the normalized-text fingerprint (same canonicalization as
    [fingerprint]) and keep the best document per group — longest raw
    text, ties to the smallest doc_id. The "which copy do we train on"
    step that follows duplicate detection.

    Plan: one groupBy on the md5 fingerprint with max_by over a
    (n_chars, -doc_id) ordering struct — fully partial-aggregable
    (max_by combines map-side), so unlike a row_number window there is
    no per-group row accumulation and hot fingerprints (a document
    duplicated millions of times at 100 TB) reduce on the map side.
    """
    t = tables(spark, sf_dir, "documents")
    fp = t["documents"].select(
        "doc_id",
        "n_chars",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
        ).alias("fp_md5"),
    )
    return fp.groupBy("fp_md5").agg(
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid"))
        ).cast("long").alias("keep_doc_id"),
        F.count("*").cast("long").alias("group_size"),
    )


O_DEDUP_CANONICAL = """
WITH fp AS (
  SELECT doc_id, n_chars,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5
  FROM documents
), ranked AS (
  SELECT fp_md5, doc_id,
         row_number() OVER (PARTITION BY fp_md5
                            ORDER BY n_chars DESC, doc_id) AS rnk,
         count(*) OVER (PARTITION BY fp_md5) AS group_size
  FROM fp
)
SELECT fp_md5, CAST(doc_id AS BIGINT) AS keep_doc_id,
       CAST(group_size AS BIGINT) AS group_size
FROM ranked WHERE rnk = 1
"""

QUERIES["dedup_canonical"] = q_dedup_canonical
ORACLES["dedup_canonical"] = O_DEDUP_CANONICAL


def q_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup clusters resolved to one canonical survivor each: the
    connected components from [dedup_clusters] joined back to document
    quality, keeping the longest document per cluster (ties to the
    smallest doc_id) — the end-to-end "detect, cluster, pick what to
    train on" chain in one query.

    Plan: reuses the cluster assignment (pointer-jumped min-label
    components over oracle-checked Jaccard edges) plus ONE
    partial-aggregable max_by groupBy over (cluster, quality) — the
    canonical pick adds no window and no extra pass over text.
    """
    clusters = q_dedup_clusters(spark, sf_dir)
    t = tables(spark, sf_dir, "documents")
    quality = t["documents"].select("doc_id", "n_chars")
    return (
        clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid"))
            ).cast("long").alias("keep_doc_id"),
            F.count("*").cast("long").alias("cluster_size"),
        )
    )


O_CLUSTER_CANONICAL = f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({O_NGRAM_JACCARD})),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(node, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
allc AS (
  SELECT doc_id, cluster_id FROM comp
  UNION ALL
  SELECT doc_id, doc_id AS cluster_id
  FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM comp)
),
ranked AS (
  SELECT allc.cluster_id, allc.doc_id,
         row_number() OVER (PARTITION BY allc.cluster_id
                            ORDER BY d.n_chars DESC, allc.doc_id) AS rnk,
         count(*) OVER (PARTITION BY allc.cluster_id) AS cluster_size
  FROM allc JOIN documents d USING (doc_id)
)
SELECT cluster_id, CAST(doc_id AS BIGINT) AS keep_doc_id,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked WHERE rnk = 1
"""

QUERIES["cluster_canonical"] = q_cluster_canonical
ORACLES["cluster_canonical"] = O_CLUSTER_CANONICAL


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi-Sunter-style weighted
    field agreement): candidate customer pairs from FastSS
    edit-distance-1 name blocking, scored by name similarity +
    nation/segment agreement — the entity-resolution step after fuzzy
    candidate generation.

    Plan: candidates come from the deletion-key equi-join (never an
    all-pairs scan — the oracle's O(n²) levenshtein join is exactly
    what this avoids); attribute joins are two hash joins on the
    customer key; scoring is pure column arithmetic. The oracle proves
    the blocking lossless at this distance AND the score arithmetic
    identical.
    """
    from data_ingestors_spark.operators.fuzzy import fastss_pairs

    t = tables(spark, sf_dir, "customer")
    cust = t["customer"].select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    pairs = fastss_pairs(cust, "c_name", "c_custkey")
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_mktsegment").alias("seg_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    name_sim = F.lit(1.0) - F.levenshtein("name_a", "name_b").cast("double") / F.greatest(
        F.length("name_a"), F.length("name_b")
    ).cast("double")
    score = (
        F.lit(0.5) * name_sim
        + F.lit(0.3) * (F.col("nat_a") == F.col("nat_b")).cast("double")
        + F.lit(0.2) * (F.col("seg_a") == F.col("seg_b")).cast("double")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            fround(score, 6).alias("score"),
            (F.col("nat_a") == F.col("nat_b")).alias("same_nation"),
            (F.col("seg_a") == F.col("seg_b")).alias("same_segment"),
        )
    )


O_RECORD_LINKAGE = f"""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       {o_fround(
           "0.5 * (1.0 - CAST(levenshtein(a.c_name, b.c_name) AS DOUBLE)"
           "       / CAST(greatest(length(a.c_name), length(b.c_name)) AS DOUBLE))"
           " + 0.3 * CAST(a.c_nationkey = b.c_nationkey AS DOUBLE)"
           " + 0.2 * CAST(a.c_mktsegment = b.c_mktsegment AS DOUBLE)", 6)} AS score,
       a.c_nationkey = b.c_nationkey AS same_nation,
       a.c_mktsegment = b.c_mktsegment AS same_segment
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) = 1
"""

QUERIES["record_linkage"] = q_record_linkage
ORACLES["record_linkage"] = O_RECORD_LINKAGE


_COLL_MIN_COUNT = 5
_COLL_TOP = 20


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the corpus's strongest adjacent word pairs
    with their pointwise mutual information — the phrase-discovery
    pass (tokenizer vocab candidates, stop-phrase lists).

    Plan: bigrams come from a zero-shuffle row-local zip of each doc's
    word array with its tail; ONE groupBy each for bigram and unigram
    counts (both partial-aggregated); scalar totals ride 1-row
    broadcast frames. Selection is top-20 by COUNT (integer ordering,
    ties by words) so the chosen row set is engine-exact; PMI is
    reported, not sorted on — float order would be ulp-fragile across
    engines. ln() runs on identical integer-derived doubles on both
    sides.
    """
    t = tables(spark, sf_dir, "documents")
    words_arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")), " "
    )
    docs = t["documents"].select(words_arr.alias("ws"))
    docs = docs.select(F.filter("ws", lambda x: x != "").alias("ws"))
    bigrams = docs.select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                F.slice("ws", 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("wa"), b.alias("wb")),
            )
        ).alias("bg")
    ).select("bg.wa", "bg.wb")
    bigrams = bigrams.persist()
    uni = (
        docs.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cu"))
    )
    bg = bigrams.groupBy("wa", "wb").agg(F.count("*").cast("long").alias("cb"))
    n_bg = bg.agg(F.sum("cb").alias("nb"))
    n_w = uni.agg(F.sum("cu").alias("nw"))
    top = (
        bg.filter(F.col("cb") >= _COLL_MIN_COUNT)
        .orderBy(F.desc("cb"), F.asc("wa"), F.asc("wb"))
        .limit(_COLL_TOP)
    )
    ua = uni.select(F.col("w").alias("wa"), F.col("cu").alias("ca"))
    ub = uni.select(F.col("w").alias("wb"), F.col("cu").alias("cb_u"))
    pmi = (
        F.col("cb").cast("double")
        * F.col("nw").cast("double")
        * F.col("nw").cast("double")
        / (
            F.col("nb").cast("double")
            * F.col("ca").cast("double")
            * F.col("cb_u").cast("double")
        )
    )
    return (
        top.join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(n_bg))
        .crossJoin(F.broadcast(n_w))
        .select(
            "wa",
            "wb",
            F.col("cb").alias("n_pair"),
            fround(F.log(pmi), 6).alias("pmi"),
        )
    )


O_COLLOCATIONS = f"""
WITH docs AS (
  SELECT list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     x -> x <> '') AS ws
  FROM documents
), bigrams AS (
  SELECT ws[i] AS wa, ws[i+1] AS wb
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM docs)
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cu
  FROM (SELECT unnest(ws) AS w FROM docs) GROUP BY w
), bg AS (
  SELECT wa, wb, CAST(count(*) AS BIGINT) AS cb FROM bigrams GROUP BY wa, wb
), nb AS (SELECT sum(cb) AS nb FROM bg),
   nw AS (SELECT sum(cu) AS nw FROM uni),
   top AS (
  SELECT * FROM bg WHERE cb >= {_COLL_MIN_COUNT}
  ORDER BY cb DESC, wa, wb LIMIT {_COLL_TOP}
)
SELECT top.wa, top.wb, top.cb AS n_pair,
       {o_fround(
           "ln(CAST(top.cb AS DOUBLE) * CAST(nw.nw AS DOUBLE) * CAST(nw.nw AS DOUBLE)"
           " / (CAST(nb.nb AS DOUBLE) * CAST(ua.cu AS DOUBLE) * CAST(ub.cu AS DOUBLE)))", 6)} AS pmi
FROM top
JOIN uni ua ON ua.w = top.wa
JOIN uni ub ON ub.w = top.wb
CROSS JOIN nb CROSS JOIN nw
"""

QUERIES["collocations"] = q_collocations
ORACLES["collocations"] = O_COLLOCATIONS


def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and hapax
    fraction (words occurring exactly once in the doc) — cheap
    machine-generated-text indicators next to [repetition_stats].

    Plan: explode + groupBy(doc, word) reduces tokens with map-side
    combine; one groupBy(doc) folds to the three counts. No windows,
    no joins."""
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
                " ",
            )
        ).alias("w"),
    ).filter(F.col("w") != "")
    per_word = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    return per_word.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
        fround(F.count("*").cast("double") / F.sum("c"), 6).alias("ttr"),
        fround(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("hapax_frac"),
    )


O_LEXICAL_DIVERSITY = f"""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), per_word AS (
  SELECT doc_id, w, count(*) AS c FROM words WHERE w <> '' GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       {o_fround("CAST(count(*) AS DOUBLE) / sum(c)", 6)} AS ttr,
       {o_fround("CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS hapax_frac
FROM per_word GROUP BY doc_id
"""

QUERIES["lexical_diversity"] = q_lexical_diversity
ORACLES["lexical_diversity"] = O_LEXICAL_DIVERSITY


_CONTAIN_QUERIES = {
    1: ("data", "scan"),
    2: ("hash", "join", "merge"),
    3: ("stream", "batch", "filter", "row"),
}


def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-containment join: which documents contain ALL terms of each
    query term-set — the multi-term filter behind boolean retrieval
    and tag-subset matching.

    Plan: the inverted-index form — explode each doc's DISTINCT words
    once, broadcast-join the (tiny) term table, and a doc matches a
    query iff its per-query hit count equals the query's term count.
    The naive form (array_contains AND array_contains ...) re-scans
    every doc's array per query; this form touches each (doc, word)
    pair once regardless of query count and partial-aggregates the
    hit counts.
    """
    t = tables(spark, sf_dir, "documents")
    terms = spark.createDataFrame(
        [(qid, w) for qid, ws in _CONTAIN_QUERIES.items() for w in ws],
        "qid int, w string",
    )
    qlen = spark.createDataFrame(
        [(qid, len(ws)) for qid, ws in _CONTAIN_QUERIES.items()], "qid int, n_terms int"
    )
    words = (
        t["documents"]
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.split(
                        F.trim(
                            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
                        ),
                        " ",
                    )
                )
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    hits = (
        words.join(F.broadcast(terms), "w")
        .groupBy("doc_id", "qid")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        hits.join(F.broadcast(qlen), "qid")
        .filter(F.col("n_hit") == F.col("n_terms"))
        .select(F.col("qid").cast("long").alias("qid"), "doc_id")
    )


def _o_containment_sql() -> str:
    term_rows = ", ".join(
        f"({qid}, '{w}')" for qid, ws in _CONTAIN_QUERIES.items() for w in ws
    )
    len_rows = ", ".join(f"({qid}, {len(ws)})" for qid, ws in _CONTAIN_QUERIES.items())
    return f"""
WITH terms(qid, w) AS (VALUES {term_rows}),
qlen(qid, n_terms) AS (VALUES {len_rows}),
words AS (
  SELECT DISTINCT doc_id, w
  FROM (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE w <> ''
), hits AS (
  SELECT doc_id, qid, count(*) AS n_hit
  FROM words JOIN terms USING (w) GROUP BY doc_id, qid
)
SELECT CAST(hits.qid AS BIGINT) AS qid, doc_id
FROM hits JOIN qlen ON hits.qid = qlen.qid
WHERE n_hit = n_terms
"""


QUERIES["containment_join"] = q_containment_join
ORACLES["containment_join"] = _o_containment_sql()


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    within each source, rank documents by LM score (bits per bigram,
    [bigram_logprob]) and split into head/middle/tail terciles — the
    published recipe for stratifying a crawl by language-model fit
    before choosing what to train on.

    Plan: the LM scoring reuses the bigram model (groupBys + broadcast
    scalars); the tercile is ONE ntile window per source over the
    scored frame (doc-count rows, ordered by the rounded score with a
    doc_id tiebreak so the split is engine-deterministic)."""
    scored = q_bigram_logprob(spark, sf_dir)
    t = tables(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("bits_per_bigram", "doc_id")
    return (
        scored.join(t["documents"].select("doc_id", "source"), "doc_id")
        .withColumn("ppl_bucket", F.ntile(3).over(w).cast("long"))
        .select("doc_id", "source", "bits_per_bigram", "ppl_bucket")
    )


O_CCNET_BUCKETS = f"""
WITH scored AS ({O_BIGRAM_LOGPROB})
SELECT scored.doc_id, d.source, scored.bits_per_bigram,
       CAST(ntile(3) OVER (PARTITION BY d.source
                           ORDER BY scored.bits_per_bigram, scored.doc_id) AS BIGINT)
         AS ppl_bucket
FROM scored JOIN documents d ON scored.doc_id = d.doc_id
"""

QUERIES["ccnet_buckets"] = q_ccnet_buckets
ORACLES["ccnet_buckets"] = O_CCNET_BUCKETS


# ------------------------------------------ DSIR importance weights

_DSIR_B = 512  # hashed-feature buckets


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    public paper): per-document importance log-weight for steering a
    multilingual pool toward an English target, using hashed unigram
    features — log p_target(doc) - log p_pool(doc) under two
    bag-of-buckets unigram models with add-one smoothing. High weight
    = doc looks like the target distribution; sampling ∝ exp(weight)
    is the DSIR recipe. Target model: docs with lang='en'; pool: all.

    Plan (100 TB): the two bucket models are map-side-combined
    groupBys over a bounded key space (B=512 buckets — the POINT of
    hashed features is that model size is corpus-independent); the
    per-word bucket lookup table (B rows, with both log-probs folded
    in) broadcasts onto the token stream, and the per-doc weight is
    one more combiner-friendly groupBy. Document text shuffles only
    doc_id + bucket ints. md5-bucket hashing is bit-identical in both
    engines (conv(substr(md5,1,4),16,10) == CAST('0x'||hex AS BIGINT)).
    """
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
                    ),
                    " ",
                ),
                lambda w: w != "",
            )
        ).alias("w"),
    ).withColumn(
        "b",
        F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
        % F.lit(_DSIR_B),
    )
    tc = (
        words.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count("*").alias("tc"))
    )
    pc = words.groupBy("b").agg(F.count("*").alias("pc"))
    tot = words.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tt"),
        F.count("*").alias("pt"),
    )
    lut = (
        pc.join(tc, "b", "left")
        .na.fill({"tc": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log((F.col("tc") + 1) / (F.col("tt") + _DSIR_B))
                - F.log((F.col("pc") + 1) / (F.col("pt") + _DSIR_B))
            ).alias("term"),
        )
    )
    return (
        words.join(F.broadcast(lut), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            fround(F.sum(F.col("term").cast(DEC)).cast("double"), 4).alias(
                "dsir_logw"
            ),
        )
    )


O_DSIR_WEIGHTS = f"""
WITH words AS (
  SELECT doc_id, lang,
         unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), toks AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_DSIR_B} AS b
  FROM words WHERE w <> ''
), tc AS (
  SELECT b, count(*) AS tc FROM toks WHERE lang = 'en' GROUP BY 1
), pc AS (
  SELECT b, count(*) AS pc FROM toks GROUP BY 1
), tot AS (
  SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt, count(*) AS pt FROM toks
), lut AS (
  SELECT pc.b,
         ln((coalesce(tc.tc, 0) + 1) / (tt + {_DSIR_B}.0))
           - ln((pc.pc + 1) / (pt + {_DSIR_B}.0)) AS term
  FROM pc LEFT JOIN tc ON pc.b = tc.b CROSS JOIN tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {o_fround("CAST(sum(CAST(term AS DECIMAL(30,10))) AS DOUBLE)", 4)} AS dsir_logw
FROM toks JOIN lut USING (b)
GROUP BY doc_id
"""

QUERIES["dsir_weights"] = q_dsir_weights
ORACLES["dsir_weights"] = O_DSIR_WEIGHTS


# ------------------------------------------ cross-document novelty

def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's DISTINCT word
    5-gram shingles that appear in no other document. Low novelty =
    boilerplate assembled from shared spans (the doc-level view of
    what [dup_span_stats] measures span-level); high novelty = unique
    content worth keeping through dedup.

    Plan (100 TB): shingles are hashed to 60-bit ints BEFORE the
    distinct/groupBy (winnowing's trick), so every shuffle carries
    (doc_id, long) — never the 5-word strings. Document frequency per
    shingle is a map-side-combined count over the deduped
    (doc_id, shingle) frame; the join back is shingle-keyed, ids-only.
    md5-hashing is bit-identical across engines, so a collision (if
    one ever happens) is the SAME collision on both sides.
    """
    t = tables(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
            " ",
        ),
        lambda w: w != "",
    )
    from data_ingestors_spark.operators.dedup import let_bound

    # ws is let-bound (split once per row, not once per shingle) and
    # per-doc duplicates drop ROW-LOCALLY via array_distinct — no
    # corpus-wide .distinct() shuffle, since (doc_id, sh) dedup only
    # needs within-row uniqueness here (14.6 s -> ~4 s at sf0.1)
    shingles = t["documents"].select(
        "doc_id",
        F.explode(
            let_bound(
                ws,
                # sequence(1, 0) DESCENDS in Spark, so short docs must
                # short-circuit to an empty array, not a 0-stop sequence
                lambda wv: F.when(
                    F.size(wv) < 5, F.array().cast("array<bigint>")
                ).otherwise(
                    F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(1), F.size(wv) - 4),
                            lambda i: F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(" ", F.slice(wv, i, 5))
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("long"),
                        )
                    )
                ),
            )
        ).alias("sh"),
    )
    # (doc_id, sh) rows are unique by construction (array_distinct
    # upstream), so plain count == distinct-doc count without the
    # per-key hashset a countDistinct would carry through the shuffle
    df_counts = shingles.groupBy("sh").agg(F.count("*").alias("df"))
    return (
        shingles.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            fround(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
    )


O_DOC_NOVELTY = f"""
WITH ws AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS ws
  FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, sh
  FROM (
    SELECT doc_id,
           unnest([CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)) AS BIGINT)
                   FOR i IN range(1, greatest(len(ws) - 4, 0) + 1)]) AS sh
    FROM ws
  )
), dfreq AS (
  SELECT sh, count(DISTINCT doc_id) AS df FROM shingles GROUP BY 1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       {o_fround("CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS novelty
FROM shingles JOIN dfreq USING (sh)
GROUP BY doc_id
"""

QUERIES["doc_novelty"] = q_doc_novelty
ORACLES["doc_novelty"] = O_DOC_NOVELTY


# ------------------------------------------ embedding outlier audit

def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 embedding outliers by diagonal Mahalanobis distance
    (per-dimension z-scores, summed squared): the cheap corpus-health
    scan that surfaces corrupt / out-of-distribution vectors before
    they poison ANN index training or dedup thresholds.

    Plan (100 TB): per-dimension mean/variance come from ONE
    posexplode + map-side-combined groupBy over a 64-key space (the
    dimension count — data-size-independent); the 64-row stats frame
    broadcasts back onto a second posexplode pass and the per-vector
    score is a combiner-friendly groupBy. Top-20 is TakeOrdered — no
    global sort. All sums fold in decimal (float inputs widen to
    double exactly, so both engines fold identical values).
    """
    t = tables(spark, sf_dir, "embeddings")
    dims = t["embeddings"].select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    stats = (
        dims.groupBy("pos")
        .agg(
            F.sum(F.col("val").cast(DEC)).alias("_s"),
            F.sum((F.col("val") * F.col("val")).cast(DEC)).alias("_s2"),
            F.count("*").alias("_n"),
        )
        .select(
            "pos",
            (F.col("_s").cast("double") / F.col("_n")).alias("mu"),
            F.sqrt(
                F.col("_s2").cast("double") / F.col("_n")
                - F.pow(F.col("_s").cast("double") / F.col("_n"), 2)
            ).alias("sigma"),
        )
    )
    scored = (
        dims.join(F.broadcast(stats), "pos")
        .groupBy("vec_id")
        .agg(
            fround(
                F.sum(
                    F.pow((F.col("val") - F.col("mu")) / F.col("sigma"), 2).cast(
                        DEC
                    )
                ).cast("double"),
                4,
            ).alias("mahal_sq")
        )
    )
    return scored.orderBy(F.desc("mahal_sq"), F.asc("vec_id")).limit(20)


O_EMBEDDING_OUTLIERS = f"""
WITH dims AS (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(range(1, array_length(embedding) + 1)) AS t(i)
), stats AS (
  SELECT pos,
         CAST(sum(CAST(val AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mu,
         sqrt(CAST(sum(CAST(val * val AS DECIMAL(30,10))) AS DOUBLE) / count(*)
              - pow(CAST(sum(CAST(val AS DECIMAL(30,10))) AS DOUBLE) / count(*), 2)) AS sigma
  FROM dims GROUP BY 1
), scored AS (
  SELECT vec_id,
         {o_fround("CAST(sum(CAST(pow((val - mu) / sigma, 2) AS DECIMAL(30,10))) AS DOUBLE)", 4)} AS mahal_sq
  FROM dims JOIN stats USING (pos)
  GROUP BY vec_id
)
SELECT vec_id, mahal_sq FROM scored
ORDER BY mahal_sq DESC, vec_id ASC
LIMIT 20
"""

QUERIES["embedding_outliers"] = q_embedding_outliers
ORACLES["embedding_outliers"] = O_EMBEDDING_OUTLIERS


# ------------------------------------------ hard-negative mining

def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: for each query vector, the
    top-5 most cosine-similar vectors carrying a DIFFERENT label —
    near-duplicates in embedding space that the label says are not the
    same thing. These pairs are exactly what a contrastive / reranker
    fine-tune needs (highest-loss negatives), and what a labeling
    audit flags as probable mislabels.

    Plan (100 TB): same shape as [embedding_topk] — the fixed query
    set (with labels) broadcasts, the corpus streams through one
    scan; the label inequality prunes before scoring. Top-5 is a
    per-query window over rounded sims with id tiebreak.
    """
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    q = F.broadcast(
        _queries_subset(emb).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            F.col("label").alias("q_label"),
        )
    )
    scored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
            F.col("label").alias("c_label"),
        )
        .crossJoin(q)
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("c_label") != F.col("q_label"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("c_label").cast("int").alias("neg_label"),
            fround(
                S.cosine_similarity_col(F.col("q_vec"), F.col("c_vec")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= 5
    )


O_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, label AS q_label
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, CAST(c.label AS INT) AS neg_label,
         {o_fround("list_cosine_similarity(CAST(q.q_vec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))", 6)} AS cos_sim
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id AND c.label <> q.q_label
)
SELECT query_id, neighbor_id, neg_label, cos_sim, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= 5
"""

QUERIES["hard_negatives"] = q_hard_negatives
ORACLES["hard_negatives"] = O_HARD_NEGATIVES


# ------------------------------------------ dimension correlation audit

def q_embedding_dim_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-correlated embedding dimension pairs (Pearson, by
    |corr|): strongly coupled dimensions mean the embedding wastes
    capacity and PQ/IVF subspace splits should not separate them —
    the audit that informs product-quantization codebook layout.

    Plan (100 TB): NO self-join — Σx and Σx² per dimension come from
    one posexplode + 64-key groupBy, and the cross terms Σx_iy_j come
    from a ROW-LOCAL pair emission (each vector emits its C(64,2)
    products, already keyed) feeding a map-side-combined groupBy over
    the 2016-pair key space. The earlier dims⋈dims-on-vec_id form
    shuffled the exploded frame twice and materialized rows×4096 join
    output (measured 48 s at sf0.1); r9: the products come from an
    Arrow-batched numpy fancy-indexed multiply (float64 x·y is the
    identical IEEE op the interpreted lambda ran, so the decimal
    sums and the oracle hash are unchanged) and the input is
    _spread — together 6.4 s → 2.3 s at sf0.1. Per-dim stats
    broadcast onto the 2016-row pair frame. (A full XᵀX GEMM would
    shave more but loses the per-pair decimal-fold exactness the
    oracle hash needs.) Corr derives from the sums in identical
    double math on both engines.
    """
    t = tables(spark, sf_dir, "embeddings")
    # _spread: the single-parquet-file table otherwise runs the whole
    # 2016-products-per-row stage in ONE task (the stage trace showed
    # (0 + 1) / 1 — parallelism, not per-row cost, was the 6 s)
    emb = _spread(t["embeddings"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = emb.select(F.posexplode("v").alias("pos", "val"))
    dstats = dims.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum(F.col("val").cast(DEC)).cast("double").alias("s"),
        F.sum((F.col("val") * F.col("val")).cast(DEC))
        .cast("double")
        .alias("ss"),
    )
    # row-local upper-triangle products as a FLAT double array +
    # posexplode: the flat index is decoded to (pos_a, pos_b) via a
    # broadcast 2016-row literal frame AFTER aggregation — emitting
    # per-pair structs inside the interpreted lambda measured 4x
    # slower (struct allocation per element), 15.6 s vs ~4 s at sf0.1.
    # The products come from an Arrow-batched numpy outer-triangle
    # (one fancy-indexed multiply per batch) instead of a nested
    # interpreted transform lambda — float64 x*y is the identical
    # IEEE multiply either way, so the decimal-folded sums (and the
    # oracle hash) are unchanged; with _spread above, 6.4 → 2.3 s
    # at sf0.1
    probe = emb.select("v").head()  # 1-row driver probe
    if probe is None:
        raise ValueError(
            "embedding_dim_corr: embeddings table is empty — no vector to "
            "probe the dimensionality from"
        )
    dim = len(probe["v"])
    iu_a, iu_b = np.triu_indices(dim, k=1)  # row-major — matches decode

    @F.pandas_udf("array<double>")
    def _upper_products(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        V = np.array(list(vs), dtype=np.float64)
        P = V[:, iu_a] * V[:, iu_b]
        return pd.Series(list(P))

    pair_terms = emb.select(
        F.posexplode(_upper_products("v")).alias("pidx", "xy")
    )
    decode = spark.createDataFrame(
        [
            (p, i, j)
            for p, (i, j) in enumerate(
                (i, j) for i in range(dim) for j in range(i + 1, dim)
            )
        ],
        "pidx int, pos_a int, pos_b int",
    )
    sxy = (
        pair_terms.groupBy("pidx")
        .agg(F.sum(F.col("xy").cast(DEC)).cast("double").alias("sxy"))
        .join(F.broadcast(decode), "pidx")
        .drop("pidx")
    )
    sa = dstats.select(
        F.col("pos").alias("pos_a"),
        F.col("n"),
        F.col("s").alias("sx"),
        F.col("ss").alias("sxx"),
    )
    sb = dstats.select(
        F.col("pos").alias("pos_b"),
        F.col("s").alias("sy"),
        F.col("ss").alias("syy"),
    )
    sums = sxy.join(F.broadcast(sa), "pos_a").join(F.broadcast(sb), "pos_b")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        sums.select(
            "pos_a",
            "pos_b",
            fround(corr, 6).alias("corr"),
            fround(F.abs(corr), 6).alias("abs_corr"),
        )
        .orderBy(F.desc("abs_corr"), F.asc("pos_a"), F.asc("pos_b"))
        .limit(20)
    )


O_EMBEDDING_DIM_CORR = f"""
WITH dims AS (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(range(1, array_length(embedding) + 1)) AS t(i)
), sums AS (
  SELECT a.pos AS pos_a, b.pos AS pos_b,
         count(*) AS n,
         CAST(sum(CAST(a.val AS DECIMAL(30,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(b.val AS DECIMAL(30,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(a.val * a.val AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(b.val * b.val AS DECIMAL(30,10))) AS DOUBLE) AS syy,
         CAST(sum(CAST(a.val * b.val AS DECIMAL(30,10))) AS DOUBLE) AS sxy
  FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.pos < b.pos
  GROUP BY 1, 2
)
SELECT pos_a, pos_b,
       {o_fround("(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))", 6)} AS corr,
       {o_fround("abs((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))", 6)} AS abs_corr
FROM sums
ORDER BY abs_corr DESC, pos_a ASC, pos_b ASC
LIMIT 20
"""

QUERIES["embedding_dim_corr"] = q_embedding_dim_corr
ORACLES["embedding_dim_corr"] = O_EMBEDDING_DIM_CORR


# ------------------------------------------ language-ID evaluation

def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-based language classifier
    ([language_id]) against the labeled lang column, with per-cell
    share of the true language's documents — the evaluation harness
    that turns the heuristic into a measured component (which langs
    it confuses, how often 'und' happens).

    Plan (100 TB): classification is a row-local expression; the
    matrix is one map-side-combined groupBy over a |langs|² key space;
    row shares divide exact counts via a broadcast margin join.
    """
    t = tables(spark, sf_dir, "documents")
    pred = X.language_id(t["documents"], "text", "doc_id").select(
        "doc_id", "lang_pred"
    )
    truth = t["documents"].select("doc_id", "lang")
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("long").alias("n"))
    )
    margins = cells.groupBy("lang").agg(F.sum("n").alias("row_total"))
    return cells.join(F.broadcast(margins), "lang").select(
        "lang",
        "lang_pred",
        "n",
        fround(F.col("n") / F.col("row_total"), 6).alias("row_share"),
    )


O_LANGID_CONFUSION = f"""
WITH pred AS (
  SELECT doc_id, lang,
       CASE WHEN {_H_EN} = 0 AND {_H_DE} = 0 AND {_H_FR} = 0 AND {_H_ES} = 0 THEN 'und'
            WHEN {_H_EN} >= {_H_DE} AND {_H_EN} >= {_H_FR} AND {_H_EN} >= {_H_ES} THEN 'en'
            WHEN {_H_DE} >= {_H_FR} AND {_H_DE} >= {_H_ES} THEN 'de'
            WHEN {_H_FR} >= {_H_ES} THEN 'fr'
            ELSE 'es' END AS lang_pred
  FROM documents
), cells AS (
  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
), margins AS (
  SELECT lang, sum(n) AS row_total FROM cells GROUP BY 1
)
SELECT lang, lang_pred, n,
       {o_fround("CAST(n AS DOUBLE) / row_total", 6)} AS row_share
FROM cells JOIN margins USING (lang)
"""

QUERIES["langid_confusion"] = q_langid_confusion
ORACLES["langid_confusion"] = O_LANGID_CONFUSION


# ------------------------------------------ character n-gram profiles

def q_char_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 character trigrams per language over normalized text —
    the classic language-fingerprint features (Cavnar & Trenkle 1994):
    the profile that a trainable language identifier would learn, and
    a drift check for mislabeled-language slices (a 'fr' slice whose
    top trigrams look English is mislabeled).

    Plan (100 TB): trigrams explode from a row-local transform (no
    string self-joins); the normalized text is LET-BOUND so the
    regexp normalization runs once per row, not once per character
    position (the measured O(chars²) lambda trap — 60 s -> ~3 s at
    sf0.1). The (lang, trigram) groupBy map-side combines the
    per-position explode down to a vocabulary-bounded frame before
    the shuffle; top-5 per lang is a window over that SMALL frame —
    per-lang distinct-trigram counts are alphabet-bounded, not
    data-bounded.
    """
    from data_ingestors_spark.operators.dedup import let_bound

    t = tables(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    tris = t["documents"].select(
        "lang",
        F.explode(
            let_bound(
                norm,
                # sequence(1, 0) DESCENDS in Spark — empty-out short rows
                lambda tv: F.when(
                    F.length(tv) < 3, F.array().cast("array<string>")
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.length(tv) - 2),
                        lambda i: tv.substr(i, F.lit(3)),
                    )
                ),
            )
        ).alias("tri"),
    )
    counts = tris.groupBy("lang", "tri").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tri"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("lang", "tri", "n", "rnk")
    )


O_CHAR_NGRAM_PROFILE = """
WITH norm AS (
  SELECT lang, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
  FROM documents
), tris AS (
  SELECT lang,
         unnest([substr(t, i, 3) FOR i IN range(1, greatest(length(t) - 2, 0) + 1)]) AS tri
  FROM norm
), counts AS (
  SELECT lang, tri, CAST(count(*) AS BIGINT) AS n FROM tris GROUP BY 1, 2
)
SELECT lang, tri, n, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tri ASC) AS BIGINT) AS rnk
  FROM counts
) WHERE rnk <= 5
"""

QUERIES["char_ngram_profile"] = q_char_ngram_profile
ORACLES["char_ngram_profile"] = O_CHAR_NGRAM_PROFILE


# ------------------------------------------ Matryoshka truncation audit

def q_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit (Kusupati et al. 2022): how
    much of the exact full-dimension cosine top-10 survives when the
    index stores only the FIRST 16 of 64 dimensions — the measurement
    behind the 'truncate the embedding, keep 4x the vectors in memory'
    trade every large retrieval deployment now makes. Output: per
    query, the overlap count and fraction between the d=64 and d=16
    top-10 sets.

    Plan (100 TB): two brute-force exact top-k passes (the corpus
    scan is shared work a real deployment replaces with its index —
    here exactness is what makes the overlap oracle-checkable), both
    the broadcast-queries shape of [embedding_topk]; the overlap is a
    (query_id, neighbor_id) equi-join of two k-row-per-query frames.
    Ranking ties break on rounded similarity + neighbor id in BOTH
    engines, so the compared sets are deterministic.
    """
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"), "label")
    full = S.cosine_topk_bruteforce(emb, _queries_subset(emb), k=10).select(
        "query_id", "neighbor_id"
    )
    trunc = S.cosine_topk_bruteforce(emb16, _queries_subset(emb16), k=10).select(
        "query_id", "neighbor_id"
    )
    hits = full.join(trunc, ["query_id", "neighbor_id"], "left_semi").groupBy(
        "query_id"
    ).agg(F.count("*").cast("long").alias("n_overlap"))
    base = full.groupBy("query_id").agg(F.count("*").cast("long").alias("k"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        "k",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        fround(F.coalesce("n_overlap", F.lit(0)) / F.col("k"), 4).alias("overlap_frac"),
    )


O_MATRYOSHKA_AUDIT = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
fscore AS (
  SELECT q.query_id, c.vec_id AS nid,
         {o_fround("list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))", 6)} AS s
  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id
),
ftop AS (
  SELECT query_id, nid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, nid) AS rnk
    FROM fscore) WHERE rnk <= 10
),
tscore AS (
  SELECT q.query_id, c.vec_id AS nid,
         {o_fround("list_cosine_similarity(CAST(q.qv[1:16] AS DOUBLE[]), CAST(c.embedding[1:16] AS DOUBLE[]))", 6)} AS s
  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id
),
ttop AS (
  SELECT query_id, nid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, nid) AS rnk
    FROM tscore) WHERE rnk <= 10
),
hits AS (
  SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM ftop f JOIN ttop t ON f.query_id = t.query_id AND f.nid = t.nid
  GROUP BY 1
)
SELECT b.query_id, b.k,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       {o_fround("CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / b.k", 4)} AS overlap_frac
FROM (SELECT query_id, CAST(count(*) AS BIGINT) AS k FROM ftop GROUP BY 1) b
LEFT JOIN hits h ON b.query_id = h.query_id
"""

QUERIES["matryoshka_audit"] = q_matryoshka_audit
ORACLES["matryoshka_audit"] = O_MATRYOSHKA_AUDIT


# ------------------------------------------ int8 quantization audit

def q_int8_quant_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit: per dimension, the min-max
    affine quantizer's scale, reconstruction MSE, and worst absolute
    error — the 4x-memory-cut feasibility report (float32 -> int8 is
    the first compression every vector store applies, before PQ).
    Quantizer: q = floor((v - min) / scale + 0.5), scale =
    (max - min)/255, dequant = min + q * scale.

    Plan (100 TB): ONE posexplode of the vectors feeds a per-dim
    min/max groupBy (64 keys — map-side combined to nothing); the
    per-dim parameters broadcast back onto the exploded stream and the
    error moments are a second 64-key combine. Two scans, zero
    wide-row shuffles. Error sums accumulate in DECIMAL so the
    reported MSE is reduction-order free.
    """
    t = tables(spark, sf_dir, "embeddings")
    vals = t["embeddings"].select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(F.col("dim").cast("long").alias("dim"), F.col("val").cast("double").alias("val"))
    stats = vals.groupBy("dim").agg(
        F.min("val").alias("vmin"), F.max("val").alias("vmax")
    )
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(255.0)
    joined = vals.join(F.broadcast(stats), "dim").withColumn("scale", scale)
    qcode = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.floor((F.col("val") - F.col("vmin")) / F.col("scale") + F.lit(0.5)).cast(
            "double"
        )
    )
    err = F.col("val") - (F.col("vmin") + qcode * F.col("scale"))
    return (
        joined.withColumn("err", err)
        .groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            fround(F.first("vmin"), 6).alias("vmin"),
            fround(F.first("vmax"), 6).alias("vmax"),
            fround(F.first("scale"), 10).alias("scale"),
            fround(
                F.sum((F.col("err") * F.col("err")).cast(DEC)).cast("double")
                / F.count("*"),
                12,
            ).alias("mse"),
            fround(F.max(F.abs("err")), 10).alias("max_abs_err"),
        )
    )


O_INT8_QUANT_AUDIT = f"""
WITH vals AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
stats AS (
  SELECT dim, min(val) AS vmin, max(val) AS vmax,
         (max(val) - min(val)) / 255.0 AS scale
  FROM vals GROUP BY 1
),
errs AS (
  SELECT v.dim, v.val, s.vmin, s.vmax, s.scale,
         v.val - (s.vmin + (CASE WHEN s.scale = 0 THEN 0.0
                                 ELSE CAST(floor((v.val - s.vmin) / s.scale + 0.5) AS DOUBLE)
                            END) * s.scale) AS err
  FROM vals v JOIN stats s USING (dim)
)
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       {o_fround("min(vmin)", 6)} AS vmin,
       {o_fround("min(vmax)", 6)} AS vmax,
       {o_fround("min(scale)", 10)} AS scale,
       {o_fround("CAST(sum(CAST(err * err AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 12)} AS mse,
       {o_fround("max(abs(err))", 10)} AS max_abs_err
FROM errs GROUP BY 1
"""

QUERIES["int8_quant_audit"] = q_int8_quant_audit
ORACLES["int8_quant_audit"] = O_INT8_QUANT_AUDIT


# ------------------------------------------ tokenizer fertility

def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: characters and UTF-8 bytes per
    whitespace token — the multilingual token-budget planner's table
    (the same text costs ~2x the tokens in agglutinative or non-Latin
    languages; byte-level tokenizers price by the byte column).

    Plan (100 TB): pure row-local expressions (no explode — token
    COUNT needs only the split array's size) into one |langs|-key
    map-side-combined groupBy; ratios divide exact integer sums, so
    the doubles are bit-identical across engines.
    """
    t = tables(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(F.size(ws))
    d = t["documents"].select(
        "lang",
        n_tokens.cast("long").alias("toks"),
        F.length("text").cast("long").alias("chars"),
        F.octet_length("text").cast("long").alias("bytes"),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.sum("chars").cast("long").alias("n_chars"),
        F.sum("bytes").cast("long").alias("n_bytes"),
        fround(F.sum("chars") / F.sum("toks"), 6).alias("chars_per_token"),
        fround(F.sum("bytes") / F.sum("toks"), 6).alias("bytes_per_token"),
        fround(F.sum("toks") / F.count("*"), 4).alias("tokens_per_doc"),
    )


O_TOKEN_FERTILITY = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       CAST(sum(chars) AS BIGINT) AS n_chars,
       CAST(sum(bytes) AS BIGINT) AS n_bytes,
       {o_fround("CAST(sum(chars) AS DOUBLE) / sum(toks)", 6)} AS chars_per_token,
       {o_fround("CAST(sum(bytes) AS DOUBLE) / sum(toks)", 6)} AS bytes_per_token,
       {o_fround("CAST(sum(toks) AS DOUBLE) / count(*)", 4)} AS tokens_per_doc
FROM (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks,
         length(text) AS chars,
         strlen(text) AS bytes
  FROM documents
)
GROUP BY 1
"""

QUERIES["token_fertility"] = q_token_fertility
ORACLES["token_fertility"] = O_TOKEN_FERTILITY


# ------------------------------------------ dedup family economics

def q_dedup_family_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-family size histogram with the storage economics:
    for each exact-duplicate family size (after [dedup_normalized]'s
    normalization), how many families, their total bytes, and the
    bytes deduplication would RECLAIM (everything beyond each family's
    canonical min-doc_id representative) — the report that justifies
    running dedup at all on a 100 TB corpus.

    Plan: families key on md5(normalized text) so the groupBy shuffles
    16-byte digests, never document bodies; the representative's size
    rides a struct-min (no second pass); the histogram is a second
    combine over the family frame (size-bounded key space).
    """
    t = tables(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    fams = (
        t["documents"]
        .select(
            F.md5(norm).alias("fam"),
            "doc_id",
            F.octet_length("text").cast("long").alias("b"),
        )
        .groupBy("fam")
        .agg(
            F.count("*").cast("long").alias("fam_size"),
            F.sum("b").cast("long").alias("bytes"),
            F.min(F.struct("doc_id", "b")).getField("b").alias("rep_bytes"),
        )
    )
    return fams.groupBy("fam_size").agg(
        F.count("*").cast("long").alias("n_families"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.sum(F.col("bytes") - F.col("rep_bytes")).cast("long").alias("reclaimable_bytes"),
    )


O_DEDUP_FAMILY_STATS = """
WITH fams AS (
  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fam,
         CAST(count(*) AS BIGINT) AS fam_size,
         CAST(sum(strlen(text)) AS BIGINT) AS bytes,
         CAST(arg_min(strlen(text), doc_id) AS BIGINT) AS rep_bytes
  FROM documents GROUP BY 1
)
SELECT fam_size,
       CAST(count(*) AS BIGINT) AS n_families,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(sum(bytes - rep_bytes) AS BIGINT) AS reclaimable_bytes
FROM fams GROUP BY 1
"""

QUERIES["dedup_family_stats"] = q_dedup_family_stats
ORACLES["dedup_family_stats"] = O_DEDUP_FAMILY_STATS


# ------------------------------------------ Cohen's kappa

def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the marker-based language classifier against
    the labeled lang column — chance-corrected agreement, the metric
    that exposes a classifier that merely predicts the majority class
    (raw accuracy on an 80%-English corpus looks fine at 0.8; kappa
    calls it 0). Complements [langid_confusion]'s per-cell view with
    the single defensible summary number.

    Plan (100 TB): everything derives from the |langs|² confusion-cell
    frame (one map-side-combined groupBy over the corpus); margins,
    observed and expected agreement are arithmetic on that tiny frame.
    kappa is computed from the ROUNDED po/pe so both engines transform
    identical doubles.
    """
    t = tables(spark, sf_dir, "documents")
    pred = X.language_id(t["documents"], "text", "doc_id").select("doc_id", "lang_pred")
    truth = t["documents"].select("doc_id", "lang")
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("lang") == F.col("lang_pred"), F.col("n"))).cast(
            "long"
        ).alias("n_agree"),
    )
    rowm = cells.groupBy(F.col("lang").alias("l")).agg(F.sum("n").alias("rn"))
    colm = cells.groupBy(F.col("lang_pred").alias("l")).agg(F.sum("n").alias("cn"))
    exp_ = (
        rowm.join(colm, "l")
        .crossJoin(F.broadcast(tot.select("n_docs")))
        .agg(
            # per-addend decimal conversion -> the 5-term sum is
            # reduction-order free across engines
            F.sum(
                (
                    F.col("rn").cast("double")
                    * F.col("cn")
                    / (F.col("n_docs").cast("double") * F.col("n_docs"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("_pe")
        )
    )
    po = fround(F.col("n_agree") / F.col("n_docs"), 6)
    pe = fround(F.col("_pe"), 6)
    return tot.crossJoin(F.broadcast(exp_)).select(
        "n_docs",
        "n_agree",
        po.alias("po"),
        pe.alias("pe"),
        fround((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


O_COHENS_KAPPA = f"""
WITH pred AS (
  SELECT doc_id, lang,
       CASE WHEN {_H_EN} = 0 AND {_H_DE} = 0 AND {_H_FR} = 0 AND {_H_ES} = 0 THEN 'und'
            WHEN {_H_EN} >= {_H_DE} AND {_H_EN} >= {_H_FR} AND {_H_EN} >= {_H_ES} THEN 'en'
            WHEN {_H_DE} >= {_H_FR} AND {_H_DE} >= {_H_ES} THEN 'de'
            WHEN {_H_FR} >= {_H_ES} THEN 'fr'
            ELSE 'es' END AS lang_pred
  FROM documents
),
cells AS (
  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN lang = lang_pred THEN n END) AS BIGINT) AS n_agree
  FROM cells
),
expd AS (
  SELECT CAST(sum(CAST(CAST(rn AS DOUBLE) * cn / (CAST(n_docs AS DOUBLE) * n_docs)
                       AS DECIMAL(30,10))) AS DOUBLE) AS _pe
  FROM (SELECT lang AS l, sum(n) AS rn FROM cells GROUP BY 1) r
  JOIN (SELECT lang_pred AS l, sum(n) AS cn FROM cells GROUP BY 1) c USING (l)
  CROSS JOIN tot
)
SELECT n_docs, n_agree,
       {o_fround("CAST(n_agree AS DOUBLE) / n_docs", 6)} AS po,
       {o_fround("_pe", 6)} AS pe,
       {o_fround(
           f"({o_fround('CAST(n_agree AS DOUBLE) / n_docs', 6)}"
           f" - {o_fround('_pe', 6)})"
           f" / (1.0 - {o_fround('_pe', 6)})", 6)} AS kappa
FROM tot CROSS JOIN expd
"""

QUERIES["cohens_kappa"] = q_cohens_kappa
ORACLES["cohens_kappa"] = O_COHENS_KAPPA


# ------------------------------------------ blocking-quality audit

def q_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit for the FastSS 1-deletion scheme that
    feeds [record_linkage]: reduction ratio (how many of the n² pairs
    blocking never generates) and pair completeness (what fraction of
    TRUE distance-1 pairs the candidate set retains) — the two numbers
    every entity-resolution paper reports before trusting a blocker
    (Christen 2012).

    The ground truth here is the exhaustive all-pairs edit-distance
    scan, so the audit is corpus-quadratic BY CONSTRUCTION — the query
    therefore runs it on a bounded DETERMINISTIC sample (the metrics
    are ratios, so a sample estimates them unbiasedly, and a modulo
    predicate is engine-portable where RNG sampling is not). The
    modulus ADAPTS to corpus size (r9 — measured 7.6 s → >10 min on a
    10× sf1 with the fixed %10): the smallest power of 10 that keeps
    the sample ≤ ~1500 rows, floored at 10, computed integer-exactly
    in BOTH engines as '1' || repeat('0', digits(ceil(n/1500) − 1)) —
    no float log10 whose ULP could flip the modulus between engines.
    The sample, and with it the quadratic truth scan, stays constant
    as the corpus grows. Exact-on-the-sample is what lets the oracle
    check it. The candidate side joins raw deletion keys (the
    production path's xxhash64 keys would add a ~2⁻⁶⁴ collision term
    to the audit itself).
    """
    from data_ingestors_spark.operators.fuzzy import _deletion_keys

    t = tables(spark, sf_dir, "customer")
    mod = t["customer"].agg(
        F.expr(
            "CAST(concat('1', repeat('0', "
            "length(CAST((count(*) + 1499) DIV 1500 - 1 AS STRING)))) AS BIGINT)"
        ).alias("m")
    )
    cust = (
        t["customer"]
        .crossJoin(F.broadcast(mod))
        .filter(F.col("c_custkey") % F.greatest(F.col("m"), F.lit(10)) == 0)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("v"))
    )
    keys = cust.select("id", F.explode(_deletion_keys("v")).alias("k"))
    cands = (
        keys.alias("a")
        .join(keys.alias("b"), F.col("a.k") == F.col("b.k"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    truth = (
        cust.alias("x")
        .join(cust.alias("y"), F.col("x.id") < F.col("y.id"))
        .filter(F.levenshtein(F.col("x.v"), F.col("y.v")) == 1)
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )
    found = cands.join(truth, ["id_a", "id_b"], "left_semi")
    n = cust.agg(
        F.count("*").cast("long").alias("n_records"),
        (F.count("*") * (F.count("*") - 1) / 2).cast("long").alias("n_total_pairs"),
    )
    nc = cands.agg(F.count("*").cast("long").alias("n_candidates"))
    nt = truth.agg(F.count("*").cast("long").alias("n_true"))
    nf = found.agg(F.count("*").cast("long").alias("n_found"))
    return (
        n.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nf))
        .select(
            "n_records",
            "n_total_pairs",
            "n_candidates",
            "n_true",
            "n_found",
            fround(
                F.lit(1.0) - F.col("n_candidates") / F.col("n_total_pairs"), 6
            ).alias("reduction_ratio"),
            fround(F.col("n_found") / F.col("n_true"), 6).alias("pair_completeness"),
        )
    )


O_BLOCKING_AUDIT = f"""
WITH mod AS (
  SELECT greatest(CAST('1' || repeat('0',
           length(CAST((count(*) + 1499) // 1500 - 1 AS VARCHAR))) AS BIGINT),
         10) AS m
  FROM customer
),
cust AS (
  SELECT c_custkey, c_name FROM customer, mod WHERE c_custkey % mod.m = 0
),
keys AS (
  SELECT c_custkey AS id, c_name AS k FROM cust
  UNION
  SELECT c_custkey, substr(c_name, 1, i - 1) || substr(c_name, i + 1, length(c_name))
  FROM cust, unnest(range(1, length(c_name) + 1)) AS t(i)
),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM keys a JOIN keys b ON a.k = b.k AND a.id < b.id
),
truth AS (
  SELECT x.c_custkey AS id_a, y.c_custkey AS id_b
  FROM cust x JOIN cust y ON x.c_custkey < y.c_custkey
  WHERE levenshtein(x.c_name, y.c_name) = 1
),
found AS (
  SELECT c.id_a, c.id_b FROM cands c
  WHERE EXISTS (SELECT 1 FROM truth t WHERE t.id_a = c.id_a AND t.id_b = c.id_b)
),
n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_records,
         CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_total_pairs
  FROM cust
)
SELECT n_records, n_total_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM cands) AS n_candidates,
       (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM found) AS n_found,
       {o_fround("1.0 - (SELECT count(*) FROM cands) / CAST(n_total_pairs AS DOUBLE)", 6)} AS reduction_ratio,
       {o_fround("(SELECT count(*) FROM found) / CAST((SELECT count(*) FROM truth) AS DOUBLE)", 6)} AS pair_completeness
FROM n
"""

QUERIES["blocking_audit"] = q_blocking_audit
ORACLES["blocking_audit"] = O_BLOCKING_AUDIT


# ------------------------------------------ prefix-filter similarity join

def q_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs set-similarity self-join (Jaccard >= 0.8) over the
    UNBLOCKED corpus via df-ordered prefix filtering (Bayardo et al.,
    WWW 2007) — the ssjoin pruning [ngram_jaccard]'s source blocking
    sidesteps. The oracle below is the exhaustive all-pairs scan, so a
    green row proves the prefix-prefix candidate join lossless on this
    corpus. Plan notes in the operator docstring
    ([operators/dedup.py prefix_filter_pairs]): ids-only candidate
    shuffle, token-set verify joined back off a persisted frame.

    Measured-cost note: the synthetic word-soup corpus draws every
    document from one tiny vocabulary, so word-SET Jaccard is
    adversarially high — ~24% of ALL pairs are true matches at t=0.8
    (30k of 125k at sf0.01). The wall cost here is therefore bound by
    the OUTPUT (and near-total candidate survival), not by the pruning
    — no exact algorithm beats its own answer size. On a real open
    corpus (diverse vocab) the df-ordered prefixes prune as published;
    for a corpus known to be this self-similar you compose with
    blocking ([ngram_jaccard]) instead of an unblocked ssjoin.
    """
    t = tables(spark, sf_dir, "documents")
    return D.prefix_filter_pairs(t["documents"], "text", "doc_id", threshold=0.8)


O_PREFIX_FILTER_JOIN = f"""
WITH w AS (
  SELECT doc_id,
         list_distinct(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS words
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {o_fround('''CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
             / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))''', 6)} AS jaccard
FROM w a JOIN w b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
      / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) >= 0.8
"""

QUERIES["prefix_filter_join"] = q_prefix_filter_join
ORACLES["prefix_filter_join"] = O_PREFIX_FILTER_JOIN


# --- kNN label-noise audit ---------------------------------------------

def q_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit by k-nearest-neighbor disagreement: for each
    audited embedding (a corpus-adaptive deterministic sample — the
    FULL corpus at ≤2000 rows), the majority label among its 10 exact
    cosine neighbors vs its own label — the Confident-Learning-style
    screen a training pipeline runs to surface mislabeled examples
    before fine-tuning.

    Plan: the scorer is the Arrow-GEMM exact top-k path
    (cosine_topk_numpy) with an adaptively-sampled audit set as the
    query side (full corpus at ≤2000 rows; see the modulus comment
    in the body) against the full corpus as neighbors — at the
    benched scale the collected query matrix is |corpus| x 64 floats
    (~1 MB), and each Arrow batch does one C @ Q.T GEMM with batch-local
    top-k, so the shuffle carries <= k rows per query. At billion-row
    scale the all-vs-all contract swaps the scorer for the ANN tiers
    (embedding_ann_* — identical output contract) or the chunked-grid
    pair join of semantic_dedup; the vote/label logic below is
    unchanged. That swap is ENFORCED, not prose: cosine_topk_numpy
    fail-louds above its max_collected_queries bound (default 100k
    rows), so an oversize corpus can never silently OOM the driver
    here — the same bound covers the two label broadcasts below,
    which are corpus-keyed ids-only frames. Voting: groupBy(query, neighbor label) on the k*n
    candidate frame, majority by (votes desc, label asc) row_number
    over the per-query <= |labels| vote rows; labels join back via a
    broadcast of the ids->label frame (ids-only payload). Ranking uses
    6-dp-rounded similarities (same portable rounding as the oracle),
    so the neighbor set is engine-exact.
    """
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    labels = emb.select("vec_id", "label")
    # Audit-set modulus adapts to corpus size (r9): auditing EVERY row
    # keeps query count ∝ corpus, i.e. all-vs-all quadratic growth. A
    # production noise screen audits a bounded deterministic sample —
    # m = 10^(digits(⌈n/2000⌉) − 1) (integer-exact in both engines,
    # same device as [q_blocking_audit]); m = 1 at ≤2000 rows, so every
    # driver test scale still audits the full corpus.
    mod = emb.agg(
        F.expr(
            "CAST(concat('1', repeat('0', "
            "length(CAST((count(*) + 1999) DIV 2000 AS STRING)) - 1)) AS BIGINT)"
        ).alias("m")
    )
    audited = (
        emb.crossJoin(F.broadcast(mod))
        .filter(F.col("vec_id") % F.col("m") == 0)
    )
    knn = S.cosine_topk_numpy(emb, audited, k=10)
    votes = (
        knn.join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("nb_label"),
                )
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nb_label")
        .agg(F.count("*").cast("long").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nb_label").asc()
    )
    maj = votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        maj.join(
            F.broadcast(labels.select(F.col("vec_id").alias("query_id"), "label")),
            "query_id",
        )
        .select(
            F.col("query_id").alias("vec_id"),
            "label",
            F.col("nb_label").alias("knn_label"),
            F.col("votes").alias("knn_votes"),
            F.when(F.col("nb_label") != F.col("label"), 1).otherwise(0).cast("long").alias("noisy"),
        )
        .orderBy("vec_id")
    )


O_KNN_LABEL_NOISE = f"""
WITH mod AS (
  SELECT CAST('1' || repeat('0',
           length(CAST((count(*) + 1999) // 2000 AS VARCHAR)) - 1) AS BIGINT) AS m
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS nb_label,
         {o_fround("list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))", 6)} AS cos_sim
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  CROSS JOIN mod
  WHERE q.vec_id % mod.m = 0
),
knn AS (
  SELECT query_id, nb_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
    FROM scored
  ) WHERE rnk <= 10
),
votes AS (
  SELECT query_id, nb_label, CAST(count(*) AS BIGINT) AS votes
  FROM knn GROUP BY 1, 2
),
maj AS (
  SELECT query_id, nb_label, votes FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY votes DESC, nb_label ASC) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT m.query_id AS vec_id, e.label, m.nb_label AS knn_label,
       m.votes AS knn_votes,
       CAST(CASE WHEN m.nb_label <> e.label THEN 1 ELSE 0 END AS BIGINT) AS noisy
FROM maj m JOIN embeddings e ON e.vec_id = m.query_id
ORDER BY vec_id
"""

QUERIES["knn_label_noise"] = q_knn_label_noise
ORACLES["knn_label_noise"] = O_KNN_LABEL_NOISE


# --- per-document character entropy filter ------------------------------

def q_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-entropy profile: Shannon entropy (bits) of
    each document's character distribution, the low-entropy count
    (H < 3.0 — repeated-character boilerplate, padding, degenerate
    generations), and the source-level mean — the gibberish/boilerplate
    screen that complements [gopher_quality]'s word-level rules with a
    tokenizer-free signal.

    Scale shape: the explode emits one row per character, but the
    FIRST groupBy keys on (doc_id, char) and partial-aggregates
    map-side — the shuffle carries at most |alphabet| rows per document
    (~60 here), not the character count. Entropy folds that per-doc
    histogram with exact integer ratios into log2 (identical libm
    doubles both engines); the per-source reduce is a third
    combiner-friendly groupBy. The 3.0-bit classification boundary
    sits far from any realistic last-ulp drift.
    """
    from data_ingestors_spark.queries.base import davg, o_davg  # noqa: F401

    t = tables(spark, sf_dir, "documents")
    ch = (
        t["documents"]
        .select("doc_id", "source", F.explode(F.split("text", "")).alias("c"))
        .filter(F.col("c") != "")
    )
    hist = ch.groupBy("doc_id", "source", "c").agg(
        F.count("*").cast("long").alias("k")
    )
    p = F.col("k").cast("double") / F.col("n").cast("double")
    ent = (
        hist.withColumn("n", F.sum("k").over(Window.partitionBy("doc_id")))
        .groupBy("doc_id", "source")
        .agg((-F.sum((p * F.log2(p)).cast(DEC))).cast("double").alias("h"))
    )
    return (
        ent.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            davg(F.col("h"), 4).alias("mean_entropy_bits"),
            F.sum(F.when(F.col("h") < 3.0, 1).otherwise(0)).cast("long").alias("n_low_entropy"),
        )
        .orderBy("source")
    )


def _o_char_entropy() -> str:
    from data_ingestors_spark.queries.base import o_davg

    return f"""
WITH ch AS (
  SELECT doc_id, source, c
  FROM documents, unnest(string_split(text, '')) AS u(c)
  WHERE c <> ''
),
hist AS (
  SELECT doc_id, source, c, CAST(count(*) AS BIGINT) AS k FROM ch GROUP BY 1, 2, 3
),
ent AS (
  SELECT doc_id, source,
         CAST(-sum(CAST((CAST(k AS DOUBLE) / n) * log2(CAST(k AS DOUBLE) / n)
                         AS DECIMAL(30,10))) AS DOUBLE) AS h
  FROM (SELECT *, sum(k) OVER (PARTITION BY doc_id) AS n FROM hist)
  GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       {o_davg("h", 4)} AS mean_entropy_bits,
       CAST(sum(CASE WHEN h < 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_entropy
FROM ent GROUP BY 1 ORDER BY 1
"""


O_CHAR_ENTROPY_FILTER = _o_char_entropy()

QUERIES["char_entropy_filter"] = q_char_entropy_filter
ORACLES["char_entropy_filter"] = O_CHAR_ENTROPY_FILTER


# ------------------------------------------ retrieval quality metrics


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality scorecard — NDCG@10, MRR@10, precision@10 of
    exact cosine retrieval where a neighbor is relevant iff it shares
    the query's class label: the evaluation loop that gates every ANN
    tier ([q_embedding_ann*]) before it replaces the exact path.

    Query set is a deterministic modulo sample whose modulus ADAPTS
    to corpus size (r9 — a fixed %50 made the query count grow with
    the corpus, turning the eval corpus-quadratic; a real retrieval
    benchmark is a FIXED query set, so the faithful scale behavior is
    corpus-linear). Same integer-exact device as [q_blocking_audit]:
    m = 50 · 10^(digits(⌈n/2000⌉) − 1), computed via string length in
    BOTH engines — no float log10 ULP hazard; at ≤2000 embedding rows
    (every driver test scale) m stays 50, so results are unchanged
    there. Per query, IDCG is computed from the query's own relevant-corpus
    count R (sequence(1, min(R,10)) exploded, gains decimal-summed on
    BOTH engines — no literal lookup table, no float repr hazard).
    Queries with R = 0 score 0 (never NULL-divided). Final row is the
    decimal-exact mean over queries.

    Plan (100 TB): brute-force scoring is the evaluation baseline by
    construction (corpus-linear per query, queries broadcast — the
    same shape as [cosine_topk_bruteforce]); the metric reduction is
    per-query rows -> |queries| rows -> 1 row, all partial-aggregable.
    """
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    mod = emb.agg(
        F.expr(
            "50 * CAST(concat('1', repeat('0', "
            "length(CAST((count(*) + 1999) DIV 2000 AS STRING)) - 1)) AS BIGINT)"
        ).alias("m")
    )
    queries = (
        emb.crossJoin(F.broadcast(mod))
        .filter(F.col("vec_id") % F.col("m") == 0)
    )
    top = S.cosine_topk_bruteforce(emb, queries, k=10)
    lab = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label"))
    qlab = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    scored = (
        top.join(F.broadcast(qlab), "query_id")
        .join(lab, "neighbor_id")
        .withColumn("rel", (F.col("n_label") == F.col("q_label")).cast("int"))
    )
    per_q = scored.groupBy("query_id").agg(
        F.sum(
            (F.col("rel") / F.log2(F.col("rnk") + 1)).cast(DEC)
        ).cast("double").alias("dcg"),
        F.max(F.when(F.col("rel") == 1, F.lit(1.0) / F.col("rnk")).otherwise(0.0)).alias("rr"),
        (F.sum("rel") / F.lit(10.0)).alias("p10"),
    )
    # R per query: relevant corpus size (same label, excluding self)
    rel_n = (
        emb.select(F.col("label").alias("q_label"), F.col("vec_id").alias("query_id"))
        .join(
            emb.groupBy(F.col("label").alias("q_label"))
            .agg(F.count("*").cast("long").alias("n_label_rows")),
            "q_label",
        )
        .crossJoin(F.broadcast(mod))
        .filter(F.col("query_id") % F.col("m") == 0)
        .select("query_id", (F.col("n_label_rows") - 1).alias("r_total"))
    )
    idcg = (
        rel_n.select(
            "query_id",
            F.explode(F.sequence(F.lit(1), F.least(F.col("r_total"), F.lit(10)))).alias("i"),
        )
        .groupBy("query_id")
        .agg(F.sum((F.lit(1.0) / F.log2(F.col("i") + 1)).cast(DEC)).cast("double").alias("idcg"))
    )
    per_q_full = (
        per_q.join(F.broadcast(idcg), "query_id", "left")
        .withColumn(
            "ndcg",
            F.when(F.col("idcg").isNull() | (F.col("idcg") == 0), F.lit(0.0)).otherwise(
                F.col("dcg") / F.col("idcg")
            ),
        )
    )
    return per_q_full.agg(
        F.count("*").cast("long").alias("n_queries"),
        fround(F.sum(F.col("ndcg").cast(DEC)).cast("double") / F.count("*"), 6).alias("ndcg_at_10"),
        fround(F.sum(F.col("rr").cast(DEC)).cast("double") / F.count("*"), 6).alias("mrr_at_10"),
        fround(F.sum(F.col("p10").cast(DEC)).cast("double") / F.count("*"), 6).alias("p_at_10"),
    )


O_RETRIEVAL_EVAL = f"""
WITH mod AS (
  SELECT 50 * CAST('1' || repeat('0',
           length(CAST((count(*) + 1999) // 2000 AS VARCHAR)) - 1) AS BIGINT) AS m
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS q_vec, label AS q_label
      FROM embeddings, mod WHERE vec_id % mod.m = 0),
scored AS (
  SELECT q.query_id, q.q_label, c.vec_id AS neighbor_id, c.label AS n_label,
         {o_fround("list_cosine_similarity(CAST(q.q_vec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))", 6)} AS cos_sim
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
top AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
  QUALIFY rnk <= 10
),
per_q AS (
  SELECT query_id,
         CAST(sum(CAST((CASE WHEN n_label = q_label THEN 1 ELSE 0 END) / log2(rnk + 1)
                       AS DECIMAL(30,10))) AS DOUBLE) AS dcg,
         max(CASE WHEN n_label = q_label THEN 1.0 / rnk ELSE 0.0 END) AS rr,
         sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) / 10.0 AS p10
  FROM top GROUP BY 1
),
rel_n AS (
  SELECT e.vec_id AS query_id, g.n_label_rows - 1 AS r_total
  FROM embeddings e
  JOIN (SELECT label, CAST(count(*) AS BIGINT) AS n_label_rows
        FROM embeddings GROUP BY 1) g ON g.label = e.label
  CROSS JOIN mod
  WHERE e.vec_id % mod.m = 0
),
idcg AS (
  SELECT query_id,
         CAST(sum(CAST(1.0 / log2(i + 1) AS DECIMAL(30,10))) AS DOUBLE) AS idcg
  FROM (SELECT query_id, unnest(range(1, least(r_total, 10) + 1)) AS i FROM rel_n)
  GROUP BY 1
),
per_q_full AS (
  SELECT per_q.*,
         CASE WHEN idcg.idcg IS NULL OR idcg.idcg = 0 THEN 0.0
              ELSE dcg / idcg.idcg END AS ndcg
  FROM per_q LEFT JOIN idcg USING (query_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       {o_fround("CAST(sum(CAST(ndcg AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS ndcg_at_10,
       {o_fround("CAST(sum(CAST(rr AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS mrr_at_10,
       {o_fround("CAST(sum(CAST(p10 AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS p_at_10
FROM per_q_full
"""

QUERIES["retrieval_eval"] = q_retrieval_eval
ORACLES["retrieval_eval"] = O_RETRIEVAL_EVAL


def q_binary_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit sign) embedding-quantization fidelity audit: on a
    deterministic pair sample, the calibration curve of the 64-bit
    sign sketch — per true-cosine bin, the mean sign-agreement
    fraction and the mean absolute error of the LSH cosine estimate
    cos(pi*(1 - agree)) — the go/no-go table before swapping 32x
    smaller binary codes into the retrieval tier (the 1-bit sibling
    of [q_int8_quant_audit] / [q_matryoshka_audit]).

    Determinism: pair sample is two modulo strata (vec_id % 23 / %
    29, id-ordered); sign agreement is integer; cosine folds exactly
    like the proven [cosine_similarity_col] path; libm cos on
    identical doubles matches across engines; binning uses the
    ROUNDED cosine so bin edges are engine-identical.

    Plan (100 TB): both strata are tiny (n/23 x n/29 of a sampled
    audit corpus); the pair join is the broadcast of one stratum;
    everything after is row-local + one 10-key groupBy. The "sampled
    audit corpus" contract is ENFORCED: the broadcast stratum is
    counted first and anything above MAX_BROADCAST_STRATUM rows
    fails loudly (raise the modulus, not the bound)."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = emb.filter(F.col("vec_id") % 23 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    b = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb")
    )
    n_b = b.count()
    if n_b > MAX_BROADCAST_STRATUM:
        raise ValueError(
            f"binary_embedding_audit: broadcast stratum has {n_b} rows "
            f"(> {MAX_BROADCAST_STRATUM}); raise the sampling modulus so "
            "the audit stays a bounded pair sample instead of a corpus join"
        )
    agree = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: ((x > 0) == (y > 0)).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("cos_r", fround(S.cosine_similarity_col(F.col("va"), F.col("vb")), 6))
        .withColumn("sign_agree", agree / F.size("va"))
        .withColumn(
            "est_err",
            F.abs(
                F.cos(F.lit(float(__import__("math").pi)) * (1 - F.col("sign_agree")))
                - F.col("cos_r")
            ),
        )
        .withColumn(
            "bin",
            F.least(
                F.greatest(F.floor((F.col("cos_r") + 1) * 5), F.lit(0)), F.lit(9)
            ).cast("long"),
        )
    )
    return (
        pairs.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            fround(F.sum(F.col("sign_agree").cast(DEC)).cast("double") / F.count("*"), 6).alias("avg_sign_agree"),
            fround(F.sum(F.col("cos_r").cast(DEC)).cast("double") / F.count("*"), 6).alias("avg_cos"),
            fround(F.sum(F.col("est_err").cast(DEC)).cast("double") / F.count("*"), 6).alias("avg_est_err"),
        )
        .orderBy("bin")
    )


O_BINARY_EMBEDDING_AUDIT = f"""
WITH a AS (SELECT vec_id AS id_a, CAST(embedding AS DOUBLE[]) AS va
           FROM embeddings WHERE vec_id % 23 = 0),
b AS (SELECT vec_id AS id_b, CAST(embedding AS DOUBLE[]) AS vb
      FROM embeddings WHERE vec_id % 29 = 0),
pairs AS (
  SELECT id_a, id_b, va, vb,
         {o_fround("list_cosine_similarity(va, vb)", 6)} AS cos_r,
         (SELECT sum(CASE WHEN (va[i] > 0) = (vb[i] > 0) THEN 1 ELSE 0 END)
          FROM unnest(range(1, len(va) + 1)) AS t(i)) / CAST(len(va) AS DOUBLE)
           AS sign_agree
  FROM a JOIN b ON id_a < id_b
),
scored AS (
  SELECT cos_r, sign_agree,
         abs(cos(pi() * (1 - sign_agree)) - cos_r) AS est_err,
         CAST(least(greatest(floor((cos_r + 1) * 5), 0), 9) AS BIGINT) AS bin
  FROM pairs
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
       {o_fround("CAST(sum(CAST(sign_agree AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS avg_sign_agree,
       {o_fround("CAST(sum(CAST(cos_r AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS avg_cos,
       {o_fround("CAST(sum(CAST(est_err AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS avg_est_err
FROM scored GROUP BY 1 ORDER BY 1
"""

QUERIES["binary_embedding_audit"] = q_binary_embedding_audit
ORACLES["binary_embedding_audit"] = O_BINARY_EMBEDDING_AUDIT


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build a fixed top-1000
    vocabulary from global term frequency (ties broken by token — the
    deterministic analog of a trained tokenizer's merge list), then
    report per-source token counts, OOV tokens, and OOV rate — the
    number that decides whether a corpus slice needs tokenizer
    retraining before it wastes context on byte-fallback.

    Plan (100 TB): vocab = one word-count groupBy + top-k (TakeOrdered
    prune, no global sort); membership is a broadcast LEFT join of the
    (source, word, count) partial-agg frame — token rows never carry
    text twice. All-integer arithmetic until the final division."""
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        "source",
        F.explode(F.split(D.normalize_text(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), "w")
        .limit(1000)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    per_sw = words.groupBy("source", "w").agg(F.count("*").cast("long").alias("n"))
    j = per_sw.join(F.broadcast(vocab), "w", "left")
    return (
        j.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.countDistinct(F.when(F.col("in_vocab").isNull(), F.col("w")))
            .cast("long")
            .alias("oov_types"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            "oov_types",
            fround(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


O_OOV_RATE = f"""
WITH words AS (
  SELECT source, w FROM (
    SELECT source,
           unnest(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE w <> ''
),
vocab AS (
  SELECT w, 1 AS in_vocab
  FROM (SELECT w, count(*) AS tf FROM words GROUP BY 1)
  ORDER BY tf DESC, w LIMIT 1000
),
per_sw AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY 1, 2
),
j AS (SELECT per_sw.*, vocab.in_vocab FROM per_sw LEFT JOIN vocab USING (w))
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN in_vocab IS NULL THEN n ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(count(DISTINCT CASE WHEN in_vocab IS NULL THEN w END) AS BIGINT) AS oov_types,
       {o_fround("sum(CASE WHEN in_vocab IS NULL THEN n ELSE 0 END) / CAST(sum(n) AS DOUBLE)", 6)} AS oov_rate
FROM j GROUP BY 1 ORDER BY 1
"""

QUERIES["oov_rate"] = q_oov_rate
ORACLES["oov_rate"] = O_OOV_RATE


def q_unicode_class_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source — letter / digit /
    whitespace / punctuation-or-other fractions plus chars-per-row —
    the cheap mojibake-and-markup detector that runs before any
    model-based quality score ([q_byte_stats] is its byte-level
    sibling; this one is class-level).

    Plan (100 TB): ALL row-local regexp counts folded by one partial-
    aggregable groupBy; nothing explodes, nothing shuffles but the
    |sources|-row aggregate."""
    t = tables(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_letter = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    n_space = F.length(F.regexp_replace("text", "[^ \\t\\n]", ""))
    d = t["documents"].select(
        "source",
        n_chars.alias("nc"),
        n_letter.alias("nl"),
        n_digit.alias("nd"),
        n_space.alias("ns"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("n_chars"),
            fround(F.sum("nl") / F.sum("nc"), 6).alias("letter_frac"),
            fround(F.sum("nd") / F.sum("nc"), 6).alias("digit_frac"),
            fround(F.sum("ns") / F.sum("nc"), 6).alias("space_frac"),
            fround(
                (F.sum("nc") - F.sum("nl") - F.sum("nd") - F.sum("ns")) / F.sum("nc"), 6
            ).alias("other_frac"),
        )
        .orderBy("source")
    )


O_UNICODE_CLASS_MIX = f"""
WITH d AS (
  SELECT source,
         length(text) AS nc,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS nl,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd,
         length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS ns
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       {o_fround("sum(nl) / CAST(sum(nc) AS DOUBLE)", 6)} AS letter_frac,
       {o_fround("sum(nd) / CAST(sum(nc) AS DOUBLE)", 6)} AS digit_frac,
       {o_fround("sum(ns) / CAST(sum(nc) AS DOUBLE)", 6)} AS space_frac,
       {o_fround("(sum(nc) - sum(nl) - sum(nd) - sum(ns)) / CAST(sum(nc) AS DOUBLE)", 6)} AS other_frac
FROM d GROUP BY 1 ORDER BY 1
"""

QUERIES["unicode_class_mix"] = q_unicode_class_mix
ORACLES["unicode_class_mix"] = O_UNICODE_CLASS_MIX


def q_snm_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood (SNM, Hernandez-Stolfo 1995) entity
    blocking: records sorted by the match key, candidates limited to
    a sliding window of w=5 positions, verified at edit distance <=
    1 — the second classic blocker next to FastSS ([q_fuzzy_match]),
    trading FastSS's exactness guarantee for key-order locality (SNM
    misses pairs whose keys sort far apart; the window bound makes
    candidate volume exactly n*w regardless of key skew — the
    property FastSS needs a df cap for).

    Plan (100 TB): the global sort rank IS the algorithm (range-
    partition the sort at scale — ranks stay consistent across
    partition boundaries because neighbors within w cross at most one
    boundary, handled by the +w explode); candidate generation is an
    ids-only equi-join on rank, fan-out exactly w per record."""
    t = tables(spark, sf_dir, "customer")
    cust = t["customer"].select("c_custkey", "c_name")
    ranked = cust.withColumn(
        "rnk", F.row_number().over(Window.orderBy("c_name", "c_custkey"))
    )
    probes = ranked.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.explode(F.sequence(F.col("rnk") + 1, F.col("rnk") + 5)).alias("rnk"),
    )
    cand = probes.join(
        ranked.select(
            F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b"), "rnk"
        ),
        "rnk",
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


O_SNM_LINKAGE = """
WITH ranked AS (
  SELECT c_custkey, c_name,
         row_number() OVER (ORDER BY c_name, c_custkey) AS rnk
  FROM customer
)
SELECT least(a.c_custkey, b.c_custkey) AS id_a,
       greatest(a.c_custkey, b.c_custkey) AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
FROM ranked a JOIN ranked b
  ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 5
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""

QUERIES["snm_linkage"] = q_snm_linkage
ORACLES["snm_linkage"] = O_SNM_LINKAGE


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    runs — exact cosine and 1-bit sign-Hamming — per query from the
    deterministic modulo sample: RRF(d) = sum over runs of
    1/(60 + rank_d). The standard zero-training ensemble before a
    learned reranker; fused top-10 per query.

    Exactness: ranks are integer (rounded-score ordering with id
    tiebreaks), each RRF term is one exact integer division, the
    two-term sum is a fixed-order coalesce addition — bit-identical
    on both engines.

    Plan (100 TB): both runs broadcast the query set and scan the
    corpus once (the [cosine_topk_bruteforce] shape); fusion is a
    full outer join of two (query, neighbor, rank) frames capped at
    20 rows/query each. The query-sample modulus ADAPTS to corpus
    size (r9, same device and rationale as [q_retrieval_eval]: a
    fixed %50 grows the query set with the corpus and turns the
    benchmark quadratic; m = 50·10^(digits(⌈n/2000⌉)−1) keeps it a
    fixed-size benchmark set, unchanged at every ≤2000-row test
    scale)."""
    t = tables(spark, sf_dir, "embeddings")
    # _spread: the corpus side of the cross join otherwise runs in
    # ONE task off the single parquet file (same lesson as
    # embedding_dim_corr)
    emb = _spread(t["embeddings"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mod = emb.agg(
        F.expr(
            "50 * CAST(concat('1', repeat('0', "
            "length(CAST((count(*) + 1999) DIV 2000 AS STRING)) - 1)) AS BIGINT)"
        ).alias("m")
    )
    q = F.broadcast(
        emb.crossJoin(F.broadcast(mod))
        .filter(F.col("vec_id") % F.col("m") == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    pairs = c.crossJoin(q).filter(F.col("neighbor_id") != F.col("query_id"))
    agree = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: ((x > 0) == (y > 0)).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        fround(S.cosine_similarity_col(F.col("qv"), F.col("cv")), 6).alias("cos_r"),
        agree.alias("ham_agree"),
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), "neighbor_id")
    wb = Window.partitionBy("query_id").orderBy(F.desc("ham_agree"), "neighbor_id")
    run_a = (
        scored.withColumn("rank_a", F.row_number().over(wa))
        .filter(F.col("rank_a") <= 20)
        .select("query_id", "neighbor_id", "rank_a")
    )
    run_b = (
        scored.withColumn("rank_b", F.row_number().over(wb))
        .filter(F.col("rank_b") <= 20)
        .select("query_id", "neighbor_id", "rank_b")
    )
    fused = (
        run_a.join(run_b, ["query_id", "neighbor_id"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(F.lit(1.0) / (60 + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (60 + F.col("rank_b")), F.lit(0.0)),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "neighbor_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            fround(F.col("rrf"), 6).alias("rrf"),
            "fused_rank",
        )
    )


O_RRF_FUSION = f"""
WITH mod AS (
  SELECT 50 * CAST('1' || repeat('0',
           length(CAST((count(*) + 1999) // 2000 AS VARCHAR)) - 1) AS BIGINT) AS m
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings, mod WHERE vec_id % mod.m = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {o_fround("list_cosine_similarity(qv, CAST(c.embedding AS DOUBLE[]))", 6)} AS cos_r,
         (SELECT sum(CASE WHEN (qv[i] > 0) = (CAST(c.embedding AS DOUBLE[])[i] > 0)
                          THEN 1 ELSE 0 END)
          FROM unnest(range(1, len(qv) + 1)) AS t(i)) AS ham_agree
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
run_a AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank_a
  FROM scored QUALIFY rank_a <= 20
),
run_b AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY ham_agree DESC, neighbor_id) AS rank_b
  FROM scored QUALIFY rank_b <= 20
),
fused AS (
  SELECT coalesce(run_a.query_id, run_b.query_id) AS query_id,
         coalesce(run_a.neighbor_id, run_b.neighbor_id) AS neighbor_id,
         coalesce(1.0 / (60 + rank_a), 0.0) + coalesce(1.0 / (60 + rank_b), 0.0) AS rrf
  FROM run_a FULL OUTER JOIN run_b
    ON run_a.query_id = run_b.query_id AND run_a.neighbor_id = run_b.neighbor_id
)
SELECT query_id, neighbor_id,
       {o_fround("rrf", 6)} AS rrf,
       CAST(fused_rank AS BIGINT) AS fused_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS fused_rank
  FROM fused
) WHERE fused_rank <= 10
"""

QUERIES["rrf_fusion"] = q_rrf_fusion
ORACLES["rrf_fusion"] = O_RRF_FUSION


def q_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH banding S-curve — P(candidate) = 1-(1-s^r)^b
    over a similarity grid for the (rows r x bands b) splits of a
    32-hash signature — the tuning table [minhash_near_duplicates]'s
    banding parameters are read off of (threshold ~ (1/b)^(1/r)).
    Pure engine-portable math (integer grid, pow on identical
    doubles); |grid| x |configs| rows, nothing scans the corpus —
    registered so the tuning story ships with the operator it tunes.
    """
    from data_ingestors_spark.session import tune

    tune(spark)  # contract: session tuned like every query (no scan needed)
    configs = spark.createDataFrame(
        [(2, 16), (4, 8), (8, 4), (16, 2)], "r int, b int"
    )
    grid = spark.range(1, 20).select((F.col("id") * 0.05).alias("s"))
    p = 1 - F.pow(1 - F.pow(F.col("s"), F.col("r")), F.col("b"))
    thr = F.pow(1.0 / F.col("b"), 1.0 / F.col("r"))
    return (
        grid.crossJoin(F.broadcast(configs))
        .select(
            F.col("r").cast("int").alias("r"),
            F.col("b").cast("int").alias("b"),
            fround(F.col("s"), 2).alias("s"),
            fround(p, 6).alias("p_candidate"),
            fround(thr, 6).alias("threshold_est"),
        )
        .orderBy("r", "s")
    )


O_LSH_TUNING_CURVE = f"""
WITH grid AS (SELECT i * 0.05 AS s FROM unnest(range(1, 20)) AS t(i)),
configs AS (SELECT * FROM (VALUES (2, 16), (4, 8), (8, 4), (16, 2)) AS c(r, b))
SELECT CAST(r AS INTEGER) AS r, CAST(b AS INTEGER) AS b,
       {o_fround("s", 2)} AS s,
       {o_fround("1 - pow(1 - pow(s, r), b)", 6)} AS p_candidate,
       {o_fround("pow(1.0 / b, 1.0 / r)", 6)} AS threshold_est
FROM grid CROSS JOIN configs
ORDER BY r, s
"""

QUERIES["lsh_tuning_curve"] = q_lsh_tuning_curve
ORACLES["lsh_tuning_curve"] = O_LSH_TUNING_CURVE


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplicate matrix: for every ordered source
    pair, how many canonical fingerprints appear in BOTH — the number
    that decides which feeds are mirrors of each other and in which
    direction to drop ([q_dedup_family_stats] sizes families; this
    locates them across feeds).

    Plan (100 TB): collapse to the distinct (fingerprint, source)
    frame FIRST (partial-aggregable), self-join on fingerprint only —
    the join fan-out is per-fingerprint source-set squared, bounded by
    the source count, never by document count; text never shuffles."""
    t = tables(spark, sf_dir, "documents")
    fps = (
        X.fingerprint(t["documents"], "text", "doc_id")
        .join(t["documents"].select("doc_id", "source"), "doc_id")
        .select("fp_md5", "source")
        .distinct()
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp_md5") == F.col("b.fp_md5"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared_fps"))
        .orderBy("source_a", "source_b")
    )


O_CROSS_SOURCE_DUPS = """
WITH fps AS (
  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5,
         source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps
FROM fps a JOIN fps b ON a.fp_md5 = b.fp_md5 AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["cross_source_dups"] = q_cross_source_dups
ORACLES["cross_source_dups"] = O_CROSS_SOURCE_DUPS


def q_dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup impact: if exact-duplicate families collapse
    to one survivor each, how many documents / characters does each
    source shed — the budget table that justifies (or kills) a dedup
    pass per feed ([q_dedup_family_stats] is the global histogram;
    this allocates the savings).

    Survivor rule matches [q_dedup_canonical]: one row per
    fingerprint survives GLOBALLY; a source's loss is its rows minus
    its survivors (a family spanning sources keeps its single
    survivor in the max_by-chosen source).

    Plan (100 TB): drops are attributed INSIDE the family
    aggregation — a partial-aggregable (fp, source) groupBy collapses
    the corpus to per-source family partials (counts, char sums, and
    the source's best (nc, -doc_id) candidate), a second groupBy
    picks each family's winning source, and the two aggregated
    frames join on fp_md5. Nothing corpus-sized is ever broadcast
    or joined back to the documents table; text shuffles never, ids
    and counts only."""
    t = tables(spark, sf_dir, "documents")
    # fingerprint computed INLINE (same md5-of-normalized-text as
    # operators/text.py:fingerprint) — joining the corpus to its own
    # fingerprint frame on doc_id would add a full extra shuffle
    d = t["documents"].select(
        "doc_id",
        "source",
        F.length("text").alias("nc"),
        F.md5(D.normalize_text(F.col("text"))).alias("fp_md5"),
    )
    # Per-(family, source) partials. `best` is the source's top
    # survivor candidate under the global rule max(nc, -doc_id);
    # doc_id uniqueness makes the struct key unique, so every max /
    # max_by below is deterministic.
    per_src = d.groupBy("fp_md5", "source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("nc").cast("long").alias("chars"),
        F.max(
            F.struct(F.col("nc"), (-F.col("doc_id")).alias("negid"))
        ).alias("best"),
    )
    # Per-family winner: the source holding the global survivor, plus
    # that survivor's char count (needed to net it out of the winning
    # source's dropped chars).
    win = per_src.groupBy("fp_md5").agg(
        F.max_by(
            F.struct(
                F.col("source").alias("wsrc"),
                F.col("best").getField("nc").alias("wnc"),
            ),
            F.col("best"),
        ).alias("w")
    )
    j = per_src.join(win, "fp_md5")
    drop_n = F.when(
        F.col("source") == F.col("w.wsrc"), F.col("n") - F.lit(1)
    ).otherwise(F.col("n"))
    drop_chars = F.when(
        F.col("source") == F.col("w.wsrc"), F.col("chars") - F.col("w.wnc")
    ).otherwise(F.col("chars"))
    return (
        j.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum(drop_n).cast("long").alias("n_dropped"),
            F.sum("chars").cast("long").alias("n_chars"),
            F.sum(drop_chars).cast("long").alias("chars_dropped"),
            fround(F.sum(drop_chars) / F.sum("chars"), 6).alias(
                "char_drop_frac"
            ),
        )
        .orderBy("source")
    )


O_DEDUP_IMPACT_REPORT = f"""
WITH d AS (
  SELECT doc_id, source, length(text) AS nc,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5
  FROM documents
),
surv AS (
  SELECT fp_md5, doc_id AS keep_id
  FROM (SELECT fp_md5, doc_id,
               row_number() OVER (PARTITION BY fp_md5
                                  ORDER BY nc DESC, doc_id) AS rnk
        FROM d)
  WHERE rnk = 1
),
flagged AS (
  SELECT d.*, s.keep
  FROM d LEFT JOIN (SELECT keep_id AS doc_id, 1 AS keep FROM surv) s USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CAST(sum(CASE WHEN keep IS NULL THEN nc ELSE 0 END) AS BIGINT) AS chars_dropped,
       {o_fround("sum(CASE WHEN keep IS NULL THEN nc ELSE 0 END) / CAST(sum(nc) AS DOUBLE)", 6)} AS char_drop_frac
FROM flagged GROUP BY 1 ORDER BY 1
"""

QUERIES["dedup_impact_report"] = q_dedup_impact_report
ORACLES["dedup_impact_report"] = O_DEDUP_IMPACT_REPORT


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup impact: per source, what would ingesting a
    NEW batch (the deterministic doc_id % 10 == 0 slice) add to an
    already-deduped corpus (the % 10 != 0 slice) — exact-dup-vs-corpus
    count, in-batch-dup count, novel survivors, and novel character
    mass. The pre-flight report a pipeline runs before committing a
    feed ([q_dedup_impact_report] is its whole-corpus retrospective
    sibling; the operator twin
    operators/dedup.py:incremental_dedup_report computes THIS report
    against a bucketed fingerprint index reading only the batch's
    touched buckets — equality of the two paths is test-asserted).

    Survivor rule among batch-only families: (max nc, min doc_id) —
    same as [q_dedup_canonical]; attribution is family-side (per-
    (fp, source) partials + winner join), nothing corpus-sized ever
    broadcasts.

    Plan (100 TB): one distinct over corpus fingerprints (ids only),
    one fp-keyed left join for the corpus flag, two partial-aggregable
    groupBys + one fp-keyed aggregated join for the family split."""
    t = tables(spark, sf_dir, "documents")
    d = t["documents"].select(
        "doc_id",
        "source",
        F.length("text").alias("nc"),
        F.md5(D.normalize_text(F.col("text"))).alias("fp_md5"),
    )
    corpus = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select("fp_md5")
        .distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    b = d.filter(F.col("doc_id") % 10 == 0)
    flag = b.join(corpus, "fp_md5", "left")
    tot = flag.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("in_corpus").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_corpus"),
        F.sum("nc").cast("long").alias("n_chars"),
    )
    new = flag.filter(F.col("in_corpus").isNull())
    per_src = new.groupBy("fp_md5", "source").agg(
        F.count("*").cast("long").alias("n"),
        F.max(F.struct(F.col("nc"), (-F.col("doc_id")).alias("negid"))).alias("best"),
    )
    win = per_src.groupBy("fp_md5").agg(
        F.max_by(
            F.struct(
                F.col("source").alias("wsrc"),
                F.col("best").getField("nc").alias("wnc"),
            ),
            F.col("best"),
        ).alias("w")
    )
    is_w = F.col("source") == F.col("w.wsrc")
    fam = (
        per_src.join(win, "fp_md5")
        .groupBy("source")
        .agg(
            F.sum(F.when(is_w, 1).otherwise(0)).cast("long").alias("n_novel"),
            F.sum(F.col("n") - F.when(is_w, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_batch"),
            F.sum(F.when(is_w, F.col("w.wnc")).otherwise(0))
            .cast("long")
            .alias("chars_novel"),
        )
    )
    return (
        tot.join(fam, "source", "left")
        .fillna(0, subset=["n_novel", "n_dup_batch", "chars_novel"])
        .select(
            "source",
            "n_docs",
            "n_dup_corpus",
            "n_dup_batch",
            "n_novel",
            "n_chars",
            "chars_novel",
            fround(F.col("n_novel") / F.col("n_docs"), 6).alias("novel_frac"),
        )
        .orderBy("source")
    )


O_INCREMENTAL_DEDUP = f"""
WITH d AS (
  SELECT doc_id, source, length(text) AS nc,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5
  FROM documents
),
corpus AS (SELECT DISTINCT fp_md5 FROM d WHERE doc_id % 10 <> 0),
b AS (SELECT * FROM d WHERE doc_id % 10 = 0),
flag AS (
  SELECT b.*, (c.fp_md5 IS NOT NULL) AS in_corpus
  FROM b LEFT JOIN corpus c USING (fp_md5)
),
tot AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_corpus,
         CAST(sum(nc) AS BIGINT) AS n_chars
  FROM flag GROUP BY 1
),
new AS (SELECT * FROM flag WHERE NOT in_corpus),
fam2 AS (
  SELECT source,
         CAST(count(*) FILTER (WHERE is_surv) AS BIGINT) AS n_novel,
         CAST(count(*) FILTER (WHERE NOT is_surv) AS BIGINT) AS n_dup_batch,
         CAST(sum(CASE WHEN is_surv THEN nc ELSE 0 END) AS BIGINT) AS chars_novel
  FROM (
    SELECT n.source, n.nc,
           row_number() OVER (PARTITION BY n.fp_md5
                              ORDER BY n.nc DESC, n.doc_id) = 1 AS is_surv
    FROM new n
  )
  GROUP BY 1
)
SELECT t.source, t.n_docs, t.n_dup_corpus,
       coalesce(f.n_dup_batch, 0) AS n_dup_batch,
       coalesce(f.n_novel, 0) AS n_novel,
       t.n_chars,
       coalesce(f.chars_novel, 0) AS chars_novel,
       {o_fround("coalesce(f.n_novel, 0) / CAST(t.n_docs AS DOUBLE)", 6)} AS novel_frac
FROM tot t LEFT JOIN fam2 f USING (source)
ORDER BY t.source
"""

QUERIES["incremental_dedup"] = q_incremental_dedup
ORACLES["incremental_dedup"] = O_INCREMENTAL_DEDUP


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative token count and
    cumulative distinct vocabulary at ten doc-id checkpoints, plus the
    ln V / ln N ratio — the saturation diagnostic that tells a corpus
    curator whether more of the same feed still adds new vocabulary
    (flat curve = diminishing returns, pair with [q_doc_novelty]).

    Determinism: checkpoints are integer fractions of max doc_id;
    'first seen' is min doc_id per word — no ordering ambiguity.

    Plan (100 TB): the token explosion collapses immediately into TWO
    bounded frames — per-doc token counts (|docs| rows) and per-word
    first-seen (|vocab| rows); each cross-joins the broadcast 10-row
    checkpoint grid and partial-aggregates. The corpus is scanned
    once; nothing doc- or vocab-sized shuffles more than once."""
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        "doc_id",
        F.explode(F.split(D.normalize_text(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    per_doc = words.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_tok"))
    first_seen = words.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    mx = t["documents"].agg(F.max("doc_id").alias("max_doc"))
    grid = (
        spark.range(1, 11)
        .select(F.col("id").cast("int").alias("decile"))
        .crossJoin(F.broadcast(mx))
        .select(
            "decile",
            F.floor(F.col("max_doc") * F.col("decile") / 10).alias("cutoff"),
        )
    )
    toks = (
        per_doc.crossJoin(F.broadcast(grid))
        .filter(F.col("doc_id") <= F.col("cutoff"))
        .groupBy("decile")
        .agg(F.sum("n_tok").cast("long").alias("cum_tokens"))
    )
    vocab = (
        first_seen.crossJoin(F.broadcast(grid))
        .filter(F.col("first_doc") <= F.col("cutoff"))
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("cum_vocab"))
    )
    return (
        toks.join(vocab, "decile")
        .select(
            "decile",
            "cum_tokens",
            "cum_vocab",
            fround(F.log("cum_vocab") / F.log("cum_tokens"), 6).alias("heaps_ratio"),
        )
        .orderBy("decile")
    )


O_VOCAB_GROWTH = f"""
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE w <> ''
),
per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM words GROUP BY 1),
first_seen AS (SELECT w, min(doc_id) AS first_doc FROM words GROUP BY 1),
grid AS (
  SELECT CAST(d AS INTEGER) AS decile,
         CAST(floor((SELECT max(doc_id) FROM documents) * d / 10.0) AS BIGINT) AS cutoff
  FROM unnest(range(1, 11)) AS t(d)
),
toks AS (
  SELECT decile, CAST(sum(n_tok) AS BIGINT) AS cum_tokens
  FROM per_doc CROSS JOIN grid WHERE doc_id <= cutoff GROUP BY 1
),
vocab AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS cum_vocab
  FROM first_seen CROSS JOIN grid WHERE first_doc <= cutoff GROUP BY 1
)
SELECT decile, cum_tokens, cum_vocab,
       {o_fround("ln(cum_vocab) / ln(cum_tokens)", 6)} AS heaps_ratio
FROM toks JOIN vocab USING (decile)
ORDER BY decile
"""

QUERIES["vocab_growth"] = q_vocab_growth
ORACLES["vocab_growth"] = O_VOCAB_GROWTH


def q_duplicate_prefix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix duplication histogram: documents grouped by their
    first 40 normalized characters, reported as family-size bands —
    the cheapest template/boilerplate detector (mirror sites and
    form-letter feeds share openings long before full fingerprints
    match; [q_dup_span_stats] is the exact-substring deep scan).

    Plan (100 TB): ONE groupBy on a 40-char key (fixed-width, ids
    never carried), then a |distinct sizes|-row histogram groupBy.
    Nothing joins; the prefix is computed in codegen."""
    t = tables(spark, sf_dir, "documents")
    fam = (
        t["documents"]
        .select(
            F.substring(D.normalize_text(F.col("text")), 1, 40).alias("pfx")
        )
        .groupBy("pfx")
        .agg(F.count("*").cast("long").alias("fam_size"))
    )
    return (
        fam.groupBy("fam_size")
        .agg(F.count("*").cast("long").alias("n_families"))
        .select(
            "fam_size",
            "n_families",
            (F.col("fam_size") * F.col("n_families")).cast("long").alias("n_docs"),
            (F.when(F.col("fam_size") > 1, (F.col("fam_size") - 1) * F.col("n_families"))
             .otherwise(0)).cast("long").alias("n_redundant"),
        )
        .orderBy("fam_size")
    )


O_DUPLICATE_PREFIX_AUDIT = """
WITH fam AS (
  SELECT substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 40) AS pfx,
         CAST(count(*) AS BIGINT) AS fam_size
  FROM documents GROUP BY 1
)
SELECT fam_size,
       CAST(count(*) AS BIGINT) AS n_families,
       CAST(fam_size * count(*) AS BIGINT) AS n_docs,
       CAST(CASE WHEN fam_size > 1 THEN (fam_size - 1) * count(*) ELSE 0 END AS BIGINT) AS n_redundant
FROM fam GROUP BY 1 ORDER BY 1
"""

QUERIES["duplicate_prefix_audit"] = q_duplicate_prefix_audit
ORACLES["duplicate_prefix_audit"] = O_DUPLICATE_PREFIX_AUDIT


def q_chunk_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking cost audit: with 200-char chunks on a
    150-char stride (the RAG-standard overlap), how much character
    mass does each source DUPLICATE into its chunk store — the
    storage/compute multiplier to budget before re-embedding a corpus
    ([q_chunk_documents] materializes chunks; this prices them).

    Per doc: n_chunks = 1 if nc <= 200 else ceil((nc-200)/150)+1;
    chunk chars = sum_i min(200, nc - 150*i) — exact integer
    arithmetic, identical in both engines.

    Plan (100 TB): the chunk-start enumeration is a row-local
    sequence fold (<= nc/150 elements, no explode survives the
    projection); one partial-aggregable groupBy per source."""
    t = tables(spark, sf_dir, "documents")
    size, stride = 200, 150
    nc = F.col("n_chars")
    n_chunks = F.when(nc <= size, F.lit(1)).otherwise(
        F.ceil((nc - size) / F.lit(stride)) + 1
    )
    chunk_chars = F.aggregate(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.least(F.lit(size).cast("long"), nc - i * stride),
    )
    per_doc = t["documents"].select(
        "source",
        nc.alias("nc"),
        n_chunks.cast("long").alias("n_chunks"),
        chunk_chars.alias("chunk_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("nc").cast("long").alias("n_chars"),
            F.sum("chunk_chars").cast("long").alias("chunk_chars"),
            fround(
                (F.sum("chunk_chars") - F.sum("nc")) / F.sum("nc"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("source")
    )


O_CHUNK_OVERLAP_AUDIT = f"""
WITH per_doc AS (
  SELECT source, n_chars AS nc,
         CASE WHEN n_chars <= 200 THEN 1
              ELSE CAST(ceil((n_chars - 200) / 150.0) AS BIGINT) + 1 END AS n_chunks
  FROM documents
),
chunks AS (
  SELECT source, nc, n_chunks,
         (SELECT sum(least(200, nc - 150 * i))
          FROM unnest(range(0, n_chunks)) AS t(i)) AS chunk_chars
  FROM per_doc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CAST(sum(chunk_chars) AS BIGINT) AS chunk_chars,
       {o_fround("(sum(chunk_chars) - sum(nc)) / CAST(sum(nc) AS DOUBLE)", 6)} AS dup_ratio
FROM chunks GROUP BY 1 ORDER BY 1
"""

QUERIES["chunk_overlap_audit"] = q_chunk_overlap_audit
ORACLES["chunk_overlap_audit"] = O_CHUNK_OVERLAP_AUDIT


def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm hygiene audit per label: L2 norm min / mean / max
    plus the count outside [0.9, 1.1] — the 30-second check that an
    embedding column is (or is not) unit-normalized before anyone
    trusts cosine == dot shortcuts downstream.

    Norms fold with the proven sequential-double pattern
    ([cosine_similarity_col]'s _norm — matches DuckDB list math);
    aggregates are decimal-exact.

    Plan (100 TB): one row-local norm per vector, one
    partial-aggregable groupBy per label. Nothing joins."""
    t = tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        F.col("label").cast("long").alias("label"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    d = emb.select("label", fround(norm, 6).alias("nrm"))
    return (
        d.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            fround(F.min("nrm"), 6).alias("min_norm"),
            fround(F.sum(F.col("nrm").cast(DEC)).cast("double") / F.count("*"), 6).alias("avg_norm"),
            fround(F.max("nrm"), 6).alias("max_norm"),
            F.sum(F.when((F.col("nrm") < 0.9) | (F.col("nrm") > 1.1), 1).otherwise(0))
            .cast("long")
            .alias("n_outside_band"),
        )
        .orderBy("label")
    )


O_EMBEDDING_NORM_AUDIT = f"""
WITH d AS (
  SELECT CAST(label AS BIGINT) AS label,
         {o_fround("sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))", 6)} AS nrm
  FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       {o_fround("min(nrm)", 6)} AS min_norm,
       {o_fround("CAST(sum(CAST(nrm AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS avg_norm,
       {o_fround("max(nrm)", 6)} AS max_norm,
       CAST(sum(CASE WHEN nrm < 0.9 OR nrm > 1.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_outside_band
FROM d GROUP BY 1 ORDER BY 1
"""

QUERIES["embedding_norm_audit"] = q_embedding_norm_audit
ORACLES["embedding_norm_audit"] = O_EMBEDDING_NORM_AUDIT


def q_label_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance audit of the embedding table's labels: per label
    the count, corpus share, and imbalance ratio vs the largest class
    — the first table anyone prints before training a classifier
    ([q_info_gain_screen] asks if the features carry signal; this
    asks if the labels are usable at all).

    Plan (100 TB): one |labels|-row count groupBy; the max joins back
    as a 1-row broadcast. Nothing else."""
    t = tables(spark, sf_dir, "embeddings")
    per = t["embeddings"].groupBy("label").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.max("n").cast("long").alias("n_max"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            fround(F.col("n") / F.col("n_total"), 6).alias("share"),
            fround(F.col("n_max") / F.col("n"), 6).alias("imbalance_vs_max"),
        )
        .orderBy("label")
    )


O_LABEL_BALANCE_AUDIT = f"""
WITH per AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total, CAST(max(n) AS BIGINT) AS n_max FROM per)
SELECT label, n,
       {o_fround("n / CAST(n_total AS DOUBLE)", 6)} AS share,
       {o_fround("n_max / CAST(n AS DOUBLE)", 6)} AS imbalance_vs_max
FROM per CROSS JOIN tot ORDER BY label
"""

QUERIES["label_balance_audit"] = q_label_balance_audit
ORACLES["label_balance_audit"] = O_LABEL_BALANCE_AUDIT


def q_embedding_quantile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantile calibration table for clipped int8
    quantization: p01 / p50 / p99 of every embedding dimension plus
    the symmetric clip scale max(|p01|, |p99|) — the table
    [q_int8_quant_audit] assumes exists; this builds it (outlier-
    robust scales beat min/max by ignoring the 1% tails).

    quantile_cont == F.percentile on identical doubles (proven
    portable in key_skew_audit and grouped_quantiles).

    Plan (100 TB): the posexplode collapses straight into a 64-key
    percentile groupBy — map-side combined, one shuffle of digest-
    sized partials, 64 output rows."""
    t = tables(spark, sf_dir, "embeddings")
    dims = t["embeddings"].select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    p01, p50, p99 = (
        F.percentile("v", F.lit(0.01)),
        F.percentile("v", F.lit(0.5)),
        F.percentile("v", F.lit(0.99)),
    )
    return (
        dims.groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            fround(p01, 6).alias("p01"),
            fround(p50, 6).alias("p50"),
            fround(p99, 6).alias("p99"),
            fround(F.greatest(F.abs(p01), F.abs(p99)), 6).alias("clip_scale"),
        )
        .select(F.col("dim").cast("int").alias("dim"), "n", "p01", "p50", "p99", "clip_scale")
        .orderBy("dim")
    )


O_EMBEDDING_QUANTILE_CLIP = f"""
WITH dims AS (
  SELECT d.dim, CAST(embedding[d.dim + 1] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
)
SELECT CAST(dim AS INTEGER) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       {o_fround("quantile_cont(v, 0.01)", 6)} AS p01,
       {o_fround("quantile_cont(v, 0.5)", 6)} AS p50,
       {o_fround("quantile_cont(v, 0.99)", 6)} AS p99,
       {o_fround("greatest(abs(quantile_cont(v, 0.01)), abs(quantile_cont(v, 0.99)))", 6)} AS clip_scale
FROM dims GROUP BY dim ORDER BY dim
"""

QUERIES["embedding_quantile_clip"] = q_embedding_quantile_clip
ORACLES["embedding_quantile_clip"] = O_EMBEDDING_QUANTILE_CLIP


def q_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram head-coverage curve: the cumulative share of all bigram
    occurrences covered by the top-10/30/100/300/1000 bigrams — the
    'how templated is this corpus' diagnostic ([q_zipf_fit] fits
    unigrams; template spam shows up as a bigram head that covers
    everything).

    Ranking is fully tiebroken (count desc, then the bigram text), so
    the cumulative sums are engine-identical integers.

    Plan (100 TB): bigrams collapse into ONE count groupBy (|vocab|²
    bounded); the curve is a window cumsum over that aggregated frame
    — at most |vocab|² rows ever sort, never the corpus."""
    t = tables(spark, sf_dir, "documents")
    # materialize the token array ONCE per doc — inlining the
    # split/filter into every element_at makes the transform O(len²)
    # per document (measured 11.2 s -> ~1 s at sf0.1)
    toks = t["documents"].select(
        F.filter(
            F.split(D.normalize_text(F.col("text")), " "), lambda x: x != ""
        ).alias("ws")
    )
    ws = F.col("ws")
    bg = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(ws) - 1, F.lit(0)),
                    ),
                    lambda i: F.concat_ws(
                        " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                    ),
                )
            ).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.asc("bg"))
    tot = bg.agg(F.sum("c").cast("long").alias("n_total"))
    ranked = (
        bg.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "cum_c",
            F.sum(F.col("c").cast(DEC)).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("long"),
        )
        .filter(F.col("rnk").isin(10, 30, 100, 300, 1000))
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.col("rnk").cast("int").alias("top_k"),
            F.col("cum_c").alias("cum_occurrences"),
            "n_total",
            fround(F.col("cum_c") / F.col("n_total"), 6).alias("coverage"),
        )
        .orderBy("top_k")
    )


O_NGRAM_COVERAGE_CURVE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     x -> x <> '') AS ws
  FROM documents
),
base AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bg
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM toks)
),
bg AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM bg),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, bg) AS rnk,
         CAST(sum(CAST(c AS DECIMAL(30,10))) OVER (ORDER BY c DESC, bg
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
  FROM bg
)
SELECT CAST(rnk AS INTEGER) AS top_k, cum_c AS cum_occurrences, n_total,
       {o_fround("cum_c / CAST(n_total AS DOUBLE)", 6)} AS coverage
FROM ranked CROSS JOIN tot
WHERE rnk IN (10, 30, 100, 300, 1000)
ORDER BY top_k
"""

QUERIES["ngram_coverage_curve"] = q_ngram_coverage_curve
ORACLES["ngram_coverage_curve"] = O_NGRAM_COVERAGE_CURVE


def q_source_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair vocabulary-profile cosine: each source as its
    unigram count vector, all pairwise cosines — the corpus-mixing
    dashboard that shows which feeds are near-clones of each other
    ([q_vocab_overlap] counts shared types; this weighs them).

    Exactness: dot products and norms fold integer counts in decimal;
    the final cosine is one double expression.

    Plan (100 TB): the corpus collapses to a (source, word) count
    frame (|sources| x |vocab| bounded); the pair join is that frame
    against itself on the WORD key (each word contributes its
    sources² cells — |sources| is a config-sized dimension, so the
    fan-out is bounded); norms are a |sources|-row frame broadcast
    onto |sources|² rows."""
    t = tables(spark, sf_dir, "documents")
    sw = (
        t["documents"]
        .select(
            "source",
            F.explode(F.split(D.normalize_text(F.col("text")), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    a = sw.select(F.col("source").alias("source_a"), "w", F.col("c").alias("ca"))
    b = sw.select(F.col("source").alias("source_b"), "w", F.col("c").alias("cb"))
    dots = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum((F.col("ca") * F.col("cb")).cast(DEC)).cast("double").alias("dot"))
    )
    norms = sw.groupBy("source").agg(
        F.sqrt(F.sum((F.col("c") * F.col("c")).cast(DEC)).cast("double")).alias("nrm")
    )
    return (
        dots.join(
            F.broadcast(norms.select(F.col("source").alias("source_a"), F.col("nrm").alias("na"))),
            "source_a",
        )
        .join(
            F.broadcast(norms.select(F.col("source").alias("source_b"), F.col("nrm").alias("nb"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            fround(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .orderBy("source_a", "source_b")
    )


O_SOURCE_SIMILARITY_MATRIX = f"""
WITH sw AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT source,
           unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE w <> ''
  GROUP BY 1, 2
),
dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(CAST(a.c * b.c AS DECIMAL(30,10))) AS DOUBLE) AS dot
  FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
),
norms AS (
  SELECT source, sqrt(CAST(sum(CAST(c * c AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
  FROM sw GROUP BY 1
)
SELECT source_a, source_b,
       {o_fround("dot / (na.nrm * nb.nrm)", 6)} AS cosine
FROM dots
JOIN norms na ON na.source = source_a
JOIN norms nb ON nb.source = source_b
ORDER BY source_a, source_b
"""

QUERIES["source_similarity_matrix"] = q_source_similarity_matrix
ORACLES["source_similarity_matrix"] = O_SOURCE_SIMILARITY_MATRIX


def q_length_bucket_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup rate by document-length bucket (powers of two): are the
    duplicates concentrated in short boilerplate or long mirrored
    pages? The slicing that decides WHERE a dedup pass pays for
    itself ([q_dedup_impact_report] slices by source; this slices by
    length).

    Survivor rule is the global (max nc, min doc_id) — identical to
    the impact report — and the non-survivor flag attributes inside
    the family aggregation (per-(fp, bucket) partials + winner join),
    so nothing corpus-sized broadcasts.

    Plan (100 TB): one fingerprint groupBy family split, one
    log2-bucket projection, two bounded aggregated joins."""
    t = tables(spark, sf_dir, "documents")
    d = t["documents"].select(
        "doc_id",
        F.length("text").alias("nc"),
        F.md5(D.normalize_text(F.col("text"))).alias("fp_md5"),
    ).withColumn(
        "bucket", F.floor(F.log2(F.greatest(F.col("nc"), F.lit(1)))).cast("int")
    )
    per_b = d.groupBy("fp_md5", "bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.max(F.struct(F.col("nc"), (-F.col("doc_id")).alias("negid"))).alias("best"),
    )
    win = per_b.groupBy("fp_md5").agg(
        F.max_by(F.col("bucket"), F.col("best")).alias("wbucket")
    )
    is_w = F.col("bucket") == F.col("wbucket")
    return (
        per_b.join(win, "fp_md5")
        .groupBy("bucket")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum(F.col("n") - F.when(is_w, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_dropped",
            fround(F.col("n_dropped") / F.col("n_docs"), 6).alias("dup_rate"),
        )
        .orderBy("bucket")
    )


O_LENGTH_BUCKET_DEDUP_RATE = f"""
WITH d AS (
  SELECT doc_id, length(text) AS nc,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5,
         CAST(floor(log2(greatest(length(text), 1))) AS INTEGER) AS bucket
  FROM documents
),
flagged AS (
  SELECT bucket,
         row_number() OVER (PARTITION BY fp_md5 ORDER BY nc DESC, doc_id) = 1 AS is_surv
  FROM d
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE NOT is_surv) AS BIGINT) AS n_dropped,
       {o_fround("count(*) FILTER (WHERE NOT is_surv) / CAST(count(*) AS DOUBLE)", 6)} AS dup_rate
FROM flagged GROUP BY 1 ORDER BY 1
"""

QUERIES["length_bucket_dedup_rate"] = q_length_bucket_dedup_rate
ORACLES["length_bucket_dedup_rate"] = O_LENGTH_BUCKET_DEDUP_RATE


def q_mix_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition residuals: per (lang, source) cell the
    observed count vs the independence expectation N·p_lang·p_source,
    with the standardized Pearson residual (obs − exp)/√exp — the
    cell-level drill-down under [q_mutual_information]'s single
    dependence number (|residual| > 2 marks the cells skewing the
    mix).

    Exactness: expectations are products of exact integer marginals
    over one N; residuals are single double expressions.

    Plan (100 TB): one (lang, source) count groupBy; both marginals
    derive FROM that |cells|-frame (no second corpus scan); marginal
    joins are |langs|- and |sources|-row broadcasts."""
    t = tables(spark, sf_dir, "documents")
    cells = t["documents"].groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("obs")
    )
    ml = cells.groupBy("lang").agg(F.sum("obs").cast("long").alias("n_lang"))
    ms = cells.groupBy("source").agg(F.sum("obs").cast("long").alias("n_source"))
    n = cells.agg(F.sum("obs").cast("long").alias("n_total"))
    exp = F.col("n_lang") * F.col("n_source") / F.col("n_total")
    return (
        cells.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "obs",
            fround(exp, 4).alias("expected"),
            fround((F.col("obs") - exp) / F.sqrt(exp), 6).alias("std_residual"),
        )
        .orderBy("lang", "source")
    )


O_MIX_RESIDUALS = f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
  FROM documents GROUP BY 1, 2
),
ml AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS n_lang FROM cells GROUP BY 1),
ms AS (SELECT source, CAST(sum(obs) AS BIGINT) AS n_source FROM cells GROUP BY 1),
n AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM cells)
SELECT lang, source, obs,
       {o_fround("n_lang * n_source / CAST(n_total AS DOUBLE)", 4)} AS expected,
       {o_fround("(obs - n_lang * n_source / CAST(n_total AS DOUBLE)) / sqrt(n_lang * n_source / CAST(n_total AS DOUBLE))", 6)} AS std_residual
FROM cells JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN n
ORDER BY lang, source
"""

QUERIES["mix_residuals"] = q_mix_residuals
ORACLES["mix_residuals"] = O_MIX_RESIDUALS


def q_cluster_compactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-cluster compactness/separation audit over the embedding
    table: per label the mean and max Euclidean distance to its own
    centroid, the nearest OTHER centroid, and the separation margin
    (nearest-centroid gap / mean radius — a silhouette-style score
    from exact arithmetic) — the 'are these labels even clusters'
    check before anyone trusts [q_knn_label_noise]'s votes.

    Exactness: centroids are decimal-exact per-dimension means;
    distances fold per-dim squares in decimal; the nearest-other
    choice uses the ROUNDED distance with a label tiebreak.

    Plan (100 TB): centroids via one (label, dim) posexplode groupBy
    (|labels| x 64 rows, broadcast back); per-vector distances join
    vectors to their OWN label's centroid array (|labels|-row
    broadcast); centroid-pair distances are a |labels|²-row job."""
    t = tables(spark, sf_dir, "embeddings")
    dims = t["embeddings"].select(
        "vec_id", "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    cent = dims.groupBy("label", "dim").agg(
        (F.sum(F.col("v").cast(DEC)).cast("double") / F.count("*")).alias("c")
    )
    # per-vector squared distance to own centroid (decimal fold)
    own = (
        dims.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(
                F.sum(((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).cast(DEC))
                .cast("double")
            ).alias("dist")
        )
    )
    radius = own.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        (F.sum(F.col("dist").cast(DEC)).cast("double") / F.count("*")).alias("mean_r_raw"),
        F.max("dist").alias("max_r_raw"),
    )
    # centroid pairwise distances
    ca = cent.select(F.col("label").alias("la"), "dim", F.col("c").alias("va"))
    cb = cent.select(F.col("label").alias("lb"), "dim", F.col("c").alias("vb"))
    cd = (
        ca.join(cb, "dim")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sqrt(
                F.sum(((F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))).cast(DEC))
                .cast("double")
            ).alias("cdist")
        )
    )
    wnear = Window.partitionBy("la").orderBy(
        fround(F.col("cdist"), 6).asc(), F.col("lb").asc()
    )
    nearest = (
        cd.withColumn("rn", F.row_number().over(wnear))
        .filter(F.col("rn") == 1)
        .select(F.col("la").alias("label"), F.col("lb").alias("nearest_label"), "cdist")
    )
    return (
        radius.join(nearest, "label")
        .select(
            "label",
            "n",
            fround(F.col("mean_r_raw"), 6).alias("mean_radius"),
            fround(F.col("max_r_raw"), 6).alias("max_radius"),
            "nearest_label",
            fround(F.col("cdist"), 6).alias("nearest_centroid_dist"),
            fround(F.col("cdist") / F.col("mean_r_raw"), 6).alias("separation"),
        )
        .orderBy("label")
    )


O_CLUSTER_COMPACTNESS = f"""
WITH dims AS (
  SELECT vec_id, label, d.dim AS dim, CAST(embedding[d.dim + 1] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
),
cent AS (
  SELECT label, dim,
         CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS c
  FROM dims GROUP BY 1, 2
),
own AS (
  SELECT vec_id, d.label,
         sqrt(CAST(sum(CAST((v - c) * (v - c) AS DECIMAL(30,10))) AS DOUBLE)) AS dist
  FROM dims d JOIN cent USING (label, dim)
  GROUP BY 1, 2
),
radius AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(dist AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean_r_raw,
         max(dist) AS max_r_raw
  FROM own GROUP BY 1
),
cd AS (
  SELECT a.label AS la, b.label AS lb,
         sqrt(CAST(sum(CAST((a.c - b.c) * (a.c - b.c) AS DECIMAL(30,10))) AS DOUBLE)) AS cdist
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
  GROUP BY 1, 2
),
nearest AS (
  SELECT la AS label, lb AS nearest_label, cdist
  FROM (SELECT la, lb, cdist,
               row_number() OVER (PARTITION BY la
                                  ORDER BY {o_fround("cdist", 6)} ASC, lb ASC) AS rn
        FROM cd)
  WHERE rn = 1
)
SELECT r.label, n,
       {o_fround("mean_r_raw", 6)} AS mean_radius,
       {o_fround("max_r_raw", 6)} AS max_radius,
       nearest_label,
       {o_fround("cdist", 6)} AS nearest_centroid_dist,
       {o_fround("cdist / mean_r_raw", 6)} AS separation
FROM radius r JOIN nearest USING (label)
ORDER BY r.label
"""

QUERIES["cluster_compactness"] = q_cluster_compactness
ORACLES["cluster_compactness"] = O_CLUSTER_COMPACTNESS


def q_cross_lang_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix contamination screen: per source, its majority
    language (by doc count, ties to the smaller code), how many docs
    deviate from it, and the contamination rate — the routing check
    before per-language corpora are carved out of multi-feed ingest
    ([q_mix_residuals] scores the whole matrix; this names each
    feed's outliers).

    Plan (100 TB): one (source, lang) count groupBy; the majority
    pick is a row_number over the |cells|-row aggregated frame; one
    final |sources|-row aggregate."""
    t = tables(spark, sf_dir, "documents")
    cells = t["documents"].groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    maj = (
        cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("majority_lang"))
    )
    return (
        cells.join(maj, "source")
        .groupBy("source", "majority_lang")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("lang") != F.col("majority_lang"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_off_lang"),
        )
        .select(
            "source",
            "majority_lang",
            "n_docs",
            "n_off_lang",
            fround(F.col("n_off_lang") / F.col("n_docs"), 6).alias("contamination"),
        )
        .orderBy("source")
    )


O_CROSS_LANG_CONTAMINATION = f"""
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
maj AS (
  SELECT source, lang AS majority_lang
  FROM (SELECT source, lang, n,
               row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
        FROM cells)
  WHERE rn = 1
)
SELECT source, majority_lang,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN lang <> majority_lang THEN n ELSE 0 END) AS BIGINT) AS n_off_lang,
       {o_fround("sum(CASE WHEN lang <> majority_lang THEN n ELSE 0 END) / CAST(sum(n) AS DOUBLE)", 6)} AS contamination
FROM cells JOIN maj USING (source)
GROUP BY 1, 2 ORDER BY 1
"""

QUERIES["cross_lang_contamination"] = q_cross_lang_contamination
ORACLES["cross_lang_contamination"] = O_CROSS_LANG_CONTAMINATION


def q_dedup_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the dedup survivor rule keep the GOOD copy? Mean quality
    score (the [q_quality_score] 0-5 tier) of survivors vs dropped
    duplicates, per family-size band — the sanity check on the
    (max nc, min doc_id) rule before it deletes petabytes
    ([q_dedup_impact_report] counts what drops; this scores it).

    Plan (100 TB): quality is a row-local projection; the family
    split is one fingerprint window (same shuffle the dedup pass
    already pays); one banded aggregate ends it. Nothing joins."""
    t = tables(spark, sf_dir, "documents")
    q = X.quality_score(t["documents"], "text", "doc_id")
    d = t["documents"].select(
        "doc_id",
        F.length("text").alias("nc"),
        F.md5(D.normalize_text(F.col("text"))).alias("fp_md5"),
    ).join(q, "doc_id")
    wf = Window.partitionBy("fp_md5")
    wr = Window.partitionBy("fp_md5").orderBy(F.desc("nc"), F.asc("doc_id"))
    fam = d.select(
        "quality",
        F.count("*").over(wf).alias("fam_size"),
        (F.row_number().over(wr) == 1).alias("is_surv"),
    ).filter(F.col("fam_size") > 1)
    band = F.when(F.col("fam_size") >= 5, F.lit("5+")).otherwise(
        F.col("fam_size").cast("string")
    )
    return (
        fam.groupBy(band.alias("family_size"))
        .agg(
            F.sum(F.when(F.col("is_surv"), 1).otherwise(0)).cast("long").alias("n_survivors"),
            F.sum(F.when(~F.col("is_surv"), 1).otherwise(0)).cast("long").alias("n_dropped"),
            fround(
                F.sum(F.when(F.col("is_surv"), F.col("quality")).otherwise(0).cast(DEC)).cast("double")
                / F.sum(F.when(F.col("is_surv"), 1).otherwise(0)),
                6,
            ).alias("avg_quality_kept"),
            fround(
                F.sum(F.when(~F.col("is_surv"), F.col("quality")).otherwise(0).cast(DEC)).cast("double")
                / F.sum(F.when(~F.col("is_surv"), 1).otherwise(0)),
                6,
            ).alias("avg_quality_dropped"),
        )
        .orderBy("family_size")
    )


O_DEDUP_SURVIVOR_QUALITY = f"""
WITH stats AS (
  SELECT doc_id,
         length(text) AS nc,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5,
         (CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END
          + CASE WHEN len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')) >= 20 THEN 1 ELSE 0 END
          + CASE WHEN length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) / CAST(length(text) AS DOUBLE) <= 0.10 THEN 1 ELSE 0 END
          + CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE) <= 0.20 THEN 1 ELSE 0 END
          + CASE WHEN length(text) / CAST(len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')) AS DOUBLE) BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END
         ) AS quality
  FROM documents
),
fam AS (
  SELECT quality,
         count(*) OVER (PARTITION BY fp_md5) AS fam_size,
         row_number() OVER (PARTITION BY fp_md5 ORDER BY nc DESC, doc_id) = 1 AS is_surv
  FROM stats
)
SELECT CASE WHEN fam_size >= 5 THEN '5+' ELSE CAST(fam_size AS VARCHAR) END AS family_size,
       CAST(count(*) FILTER (WHERE is_surv) AS BIGINT) AS n_survivors,
       CAST(count(*) FILTER (WHERE NOT is_surv) AS BIGINT) AS n_dropped,
       {o_fround("CAST(sum(CASE WHEN is_surv THEN CAST(quality AS DECIMAL(30,10)) ELSE 0 END) AS DOUBLE) / count(*) FILTER (WHERE is_surv)", 6)} AS avg_quality_kept,
       {o_fround("CAST(sum(CASE WHEN NOT is_surv THEN CAST(quality AS DECIMAL(30,10)) ELSE 0 END) AS DOUBLE) / count(*) FILTER (WHERE NOT is_surv)", 6)} AS avg_quality_dropped
FROM fam WHERE fam_size > 1
GROUP BY 1 ORDER BY 1
"""

QUERIES["dedup_survivor_quality"] = q_dedup_survivor_quality
ORACLES["dedup_survivor_quality"] = O_DEDUP_SURVIVOR_QUALITY


def q_lang_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language document-length quantiles (p25/p50/p75/p95)
    plus count and decimal-exact mean — the length profile that sets
    per-language chunking and truncation budgets (the ORACLE-PAIRED
    exact sibling of the digest-based [grouped_quantiles]).

    percentile(array) == quantile_cont per element on identical
    integer inputs (proven portable).

    Plan (100 TB): ONE groupBy with a single array-quantile buffer
    per language (no global sort, no window)."""
    t = tables(spark, sf_dir, "documents")
    qs = F.percentile(
        "n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95))
    )
    return (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            fround(
                F.sum(F.col("n_chars").cast(DEC)).cast("double") / F.count("*"), 4
            ).alias("mean_chars"),
            qs.alias("qs"),
        )
        .select(
            "lang",
            "n_docs",
            "mean_chars",
            fround(F.col("qs")[0], 4).alias("p25"),
            fround(F.col("qs")[1], 4).alias("p50"),
            fround(F.col("qs")[2], 4).alias("p75"),
            fround(F.col("qs")[3], 4).alias("p95"),
        )
        .orderBy("lang")
    )


O_LANG_LENGTH_QUANTILES = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       {o_fround("CAST(sum(CAST(n_chars AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS mean_chars,
       {o_fround("quantile_cont(n_chars, 0.25)", 4)} AS p25,
       {o_fround("quantile_cont(n_chars, 0.5)", 4)} AS p50,
       {o_fround("quantile_cont(n_chars, 0.75)", 4)} AS p75,
       {o_fround("quantile_cont(n_chars, 0.95)", 4)} AS p95
FROM documents GROUP BY 1 ORDER BY 1
"""

QUERIES["lang_length_quantiles"] = q_lang_length_quantiles
ORACLES["lang_length_quantiles"] = O_LANG_LENGTH_QUANTILES


def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-length histogram over the whole corpus: per character
    length, token occurrences, distinct types, and the occurrence
    share — the sizing table behind byte-vs-word tokenizer budgets
    ([q_token_fertility] measures a specific tokenizer; this profiles
    the raw text it must cover).

    Plan (100 TB): the explode collapses into one (length) count
    groupBy carrying a distinct-type conditional; the 1-row total
    broadcasts. Bounded by max word length."""
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        F.explode(F.split(D.normalize_text(F.col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")
    per = words.groupBy(F.length("w").alias("wlen")).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("n_types"),
    )
    tot = per.agg(F.sum("n_tokens").cast("long").alias("n_all"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("wlen").cast("int").alias("wlen"),
            "n_tokens",
            "n_types",
            fround(F.col("n_tokens") / F.col("n_all"), 6).alias("token_share"),
        )
        .orderBy("wlen")
    )


O_TOKEN_LENGTH_HISTOGRAM = f"""
WITH words AS (
  SELECT w FROM (
    SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE w <> ''
),
per AS (
  SELECT length(w) AS wlen,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT w) AS BIGINT) AS n_types
  FROM words GROUP BY 1
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n_all FROM per)
SELECT CAST(wlen AS INTEGER) AS wlen, n_tokens, n_types,
       {o_fround("n_tokens / CAST(n_all AS DOUBLE)", 6)} AS token_share
FROM per CROSS JOIN tot ORDER BY wlen
"""

QUERIES["token_length_histogram"] = q_token_length_histogram
ORACLES["token_length_histogram"] = O_TOKEN_LENGTH_HISTOGRAM


def q_embedding_sign_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension sign balance of the embedding table: the
    positive fraction and its deviation from 1/2 for every dimension
    — the bias audit that decides whether the 1-bit sign sketch
    ([q_binary_embedding_audit]) can work at all (a dimension that is
    90% positive carries almost no sign information).

    Plan (100 TB): posexplode straight into a 64-key conditional
    count groupBy — one scan, one bounded shuffle."""
    t = tables(spark, sf_dir, "embeddings")
    dims = t["embeddings"].select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    return (
        dims.groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("v") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            "n_pos",
            fround(F.col("n_pos") / F.col("n"), 6).alias("pos_frac"),
            fround(F.abs(F.col("n_pos") / F.col("n") - 0.5), 6).alias("bias"),
        )
        .orderBy("dim")
    )


O_EMBEDDING_SIGN_BALANCE = f"""
WITH dims AS (
  SELECT d.dim, CAST(embedding[d.dim + 1] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
)
SELECT CAST(dim AS INTEGER) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       {o_fround("sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)} AS pos_frac,
       {o_fround("abs(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) - 0.5)", 6)} AS bias
FROM dims GROUP BY dim ORDER BY dim
"""

QUERIES["embedding_sign_balance"] = q_embedding_sign_balance
ORACLES["embedding_sign_balance"] = O_EMBEDDING_SIGN_BALANCE


def q_stopword_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword coverage per source: the share of tokens taken by the
    corpus's own df-top-5 words — the head-end complement to
    [q_oov_rate]'s tail (machine-generated feeds skew BOTH ends, and
    a source whose stopword share diverges from the corpus norm reads
    differently downstream).

    The stopword list is data-derived (top-5 by global count, ties to
    the word) — deterministic, no external lexicon.

    Plan (100 TB): one word-count groupBy + top-5 (TakeOrdered), one
    (source, word) partial-agg frame joined to the 5-row broadcast."""
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        "source",
        F.explode(F.split(D.normalize_text(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    stop = (
        words.groupBy("w")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), "w")
        .limit(5)
        .select("w", F.lit(1).alias("is_stop"))
    )
    per = words.groupBy("source", "w").agg(F.count("*").cast("long").alias("n"))
    return (
        per.join(F.broadcast(stop), "w", "left")
        .groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("is_stop").isNotNull(), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_stop"),
        )
        .select(
            "source",
            "n_tokens",
            "n_stop",
            fround(F.col("n_stop") / F.col("n_tokens"), 6).alias("stop_share"),
        )
        .orderBy("source")
    )


O_STOPWORD_COVERAGE = f"""
WITH words AS (
  SELECT source, w FROM (
    SELECT source,
           unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE w <> ''
),
stop AS (
  SELECT w, 1 AS is_stop
  FROM (SELECT w, count(*) AS tf FROM words GROUP BY 1)
  ORDER BY tf DESC, w LIMIT 5
),
per AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN is_stop IS NOT NULL THEN n ELSE 0 END) AS BIGINT) AS n_stop,
       {o_fround("sum(CASE WHEN is_stop IS NOT NULL THEN n ELSE 0 END) / CAST(sum(n) AS DOUBLE)", 6)} AS stop_share
FROM per LEFT JOIN stop USING (w)
GROUP BY 1 ORDER BY 1
"""

QUERIES["stopword_coverage"] = q_stopword_coverage
ORACLES["stopword_coverage"] = O_STOPWORD_COVERAGE


def q_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance ranking of the embedding table: sample
    variance (decimal co-moments) and the dead-dimension flag
    (variance < 1e-6) for all 64 dims, ranked most-informative first
    — the PCA-free feature triage next to [q_embedding_sign_balance]
    and [q_info_gain_screen] ([q_matryoshka_audit] asks the same of
    PREFIXES; this asks it per dimension).

    Plan (100 TB): posexplode into one 64-key co-moment groupBy;
    the rank is a window over 64 rows."""
    t = tables(spark, sf_dir, "embeddings")
    dims = t["embeddings"].select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    per = dims.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast(DEC)).alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast(DEC)).alias("s2"),
    )
    n = F.col("n").cast("double")
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n) / (n - 1)
    scored = per.select(
        F.col("dim").cast("int").alias("dim"),
        fround(var, 6).alias("variance"),
        (fround(var, 6) < 1e-6).alias("is_dead"),
    )
    w = Window.orderBy(F.desc("variance"), F.asc("dim"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).orderBy("dim")


O_EMBEDDING_DIM_VARIANCE = f"""
WITH dims AS (
  SELECT d.dim, CAST(embedding[d.dim + 1] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
),
per AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) AS s1,
         CAST(sum(CAST(v * v AS DECIMAL(30,10))) AS DOUBLE) AS s2
  FROM dims GROUP BY 1
),
scored AS (
  SELECT CAST(dim AS INTEGER) AS dim,
         {o_fround("(s2 - s1 * s1 / n) / (n - 1)", 6)} AS variance,
         {o_fround("(s2 - s1 * s1 / n) / (n - 1)", 6)} < 1e-6 AS is_dead
  FROM per
)
SELECT dim, variance, is_dead,
       CAST(row_number() OVER (ORDER BY variance DESC, dim) AS INTEGER) AS rank
FROM scored ORDER BY dim
"""

QUERIES["embedding_dim_variance"] = q_embedding_dim_variance
ORACLES["embedding_dim_variance"] = O_EMBEDDING_DIM_VARIANCE


def q_cross_lang_dup_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language duplicate families: exact-fingerprint families
    grouped by how many distinct languages they span — the
    mislabeled-language / copy-paste detector ([q_cross_source_dups]
    slices families by feed; this slices by language, where >1 lang
    on IDENTICAL text means the lang tag, not the text, is wrong).

    Plan (100 TB): one (fp) groupBy carrying a distinct-lang count,
    one histogram groupBy over the aggregated frame."""
    t = tables(spark, sf_dir, "documents")
    fam = (
        t["documents"]
        .select(
            F.md5(D.normalize_text(F.col("text"))).alias("fp_md5"),
            "lang",
        )
        .groupBy("fp_md5")
        .agg(
            F.count("*").cast("long").alias("fam_size"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .filter(F.col("fam_size") > 1)
    )
    return (
        fam.groupBy("n_langs")
        .agg(
            F.count("*").cast("long").alias("n_families"),
            F.sum("fam_size").cast("long").alias("n_docs"),
            F.max("fam_size").alias("max_family"),
        )
        .orderBy("n_langs")
    )


O_CROSS_LANG_DUP_FAMILIES = """
WITH fam AS (
  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5,
         CAST(count(*) AS BIGINT) AS fam_size,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents GROUP BY 1
  HAVING count(*) > 1
)
SELECT n_langs,
       CAST(count(*) AS BIGINT) AS n_families,
       CAST(sum(fam_size) AS BIGINT) AS n_docs,
       CAST(max(fam_size) AS BIGINT) AS max_family
FROM fam GROUP BY 1 ORDER BY 1
"""

QUERIES["cross_lang_dup_families"] = q_cross_lang_dup_families
ORACLES["cross_lang_dup_families"] = O_CROSS_LANG_DUP_FAMILIES
