"""Deduplication operators for training-data pipelines.

Exact, normalized-exact, MinHash+LSH, SimHash, and n-gram Jaccard
near-dup — all expressed as DataFrame programs:

- candidate generation is always *bucketed* (hash group / LSH band
  join), never all-pairs: at 100 TB an O(n²) similarity join is
  impossible; LSH keeps it at O(n · bands) with a shuffle per band
  join. Verification runs only on bucket-collision candidates.
- hash functions are Spark's deterministic Murmur3 (``hash``) and
  xxhash64 (``xxhash64``) with integer seed columns — reproducible
  across runs and executors, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- exact -------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct text, keeping
    the smallest id (deterministic, unlike dropDuplicates)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def normalize_text(c) -> "F.Column":
    """Canonical text form: lowercase, non-alphanumerics collapsed to
    single spaces, trimmed. Shared by normalized dedup + fingerprint."""
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def normalized_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-exact dedup after canonicalization (case / punctuation /
    whitespace insensitive)."""
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# --- MinHash + LSH ------------------------------------------------------


def shingle_docs(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(doc_id, shingles) with the tokenization materialized ONCE per
    doc — the split/normalize regex must not be re-evaluated per
    shingle index (an O(words²) regex trap)."""
    words_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("words"),
    )
    if n == 1:
        sh = F.array_distinct(F.col("words"))
    else:
        idx = F.sequence(F.lit(0), F.greatest(F.size("words") - n, F.lit(0)))
        sh = F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("words"), i + 1, n)))
        )
    return words_df.select("doc_id", sh.alias("shingles")).filter(F.size("shingles") > 0)


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: for each seed, the min Murmur3 hash
    over the doc's shingle set. All JVM-side higher-order functions."""
    shingled = shingle_docs(df, text_col, id_col, shingle_n)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), lambda s, i=i: F.hash(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return shingled.select("doc_id", "shingles", sig.alias("signature"))


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact Jaccard verification.

    shingle → minhash → band → bucket self-join → verify. Bands of
    r = num_hashes/bands rows; docs colliding in ≥1 band become
    candidates; candidates are verified with exact Jaccard on shingle
    sets so the output has no false positives (recall is the usual LSH
    probability 1-(1-t^r)^b).
    """
    r = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n).cache()

    # Stage 1 — candidate ids from the band join. The join payload is
    # (band, bucket, id) ONLY: at 100 TB you never shuffle shingle
    # arrays through an LSH self-join; pairs are two longs.
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            F.concat_ws(",", *[F.col("signature")[b * r + j] for j in range(r)])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    right = band_rows.select(
        F.col("band").alias("band_r"),
        F.col("bucket").alias("bucket_r"),
        F.col("doc_id").alias("id_b"),
    )
    cand = (
        band_rows.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("bucket") == F.col("bucket_r"))
            & (F.col("doc_id") < F.col("id_b")),
        )
        .select(F.col("doc_id").alias("id_a"), "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    # Stage 2 — cheap signature-based Jaccard estimate (fraction of
    # equal minhash components) prunes the band join's false positives
    # before any shingle array moves.
    sig_only = sigs.select("doc_id", "signature")
    est_eq = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b)
    ) / F.lit(float(num_hashes))
    est = (
        cand.join(sig_only.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a")), "id_a")
        .join(sig_only.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("sig_b")), "id_b")
        .withColumn("est_j", est_eq)
        .filter(F.col("est_j") >= threshold - 0.2)
        .select("id_a", "id_b")
    )

    # Stage 3 — exact verification on the survivors only.
    sh_only = sigs.select("doc_id", "shingles")
    pairs = est.join(
        sh_only.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a"
    ).join(
        sh_only.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --- SimHash ------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document.

    explode tokens → xxhash64 → per-bit signed vote sum → recombine.
    One shuffle (groupBy doc); the 64 vote sums are plain conditional
    aggregates, fully codegen'd.
    """
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = tokens.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.shiftright(h, i).bitwiseAND(1) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else bit * F.lit(-(1 << 63)).cast("long")
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4×16-bit keys
    (pigeonhole: hamming ≤3 ⇒ at least one identical band), bucket-join,
    verify exact Hamming distance."""
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    right = bands.select(
        F.col("band").alias("band_r"),
        F.col("key").alias("key_r"),
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sim_b"),
    )
    cand = (
        bands.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("key") == F.col("key_r"))
            & (F.col("doc_id") < F.col("id_b")),
        )
        .select(F.col("doc_id").alias("id_a"), "id_b", "simhash", "sim_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("simhash").bitwiseXOR(F.col("sim_b")))
    return cand.select("id_a", "id_b", hamming.cast("int").alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --- n-gram Jaccard (bounded candidate set) ----------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-set Jaccard over a *blocked* candidate set (pairs
    sharing ``block_col``). Blocking bounds the pair count; for
    unblocked corpora use minhash_near_duplicates instead."""
    words = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(block_col).alias("block"), words.alias("words")
    )
    right = base.select(
        F.col("block").alias("block_r"), F.col("doc_id").alias("id_b"), F.col("words").alias("w_b")
    )
    pairs = base.join(
        right, (F.col("block") == F.col("block_r")) & (F.col("doc_id") < F.col("id_b"))
    )
    inter = F.size(F.array_intersect("words", "w_b")).cast("double")
    union = F.size(F.array_union("words", "w_b")).cast("double")
    return (
        pairs.select(F.col("doc_id").alias("id_a"), "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
