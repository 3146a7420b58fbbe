"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus is never shuffled randomly: train/test membership must
be a pure function of the record (reproducible across runs, engines,
and re-ingests), and samples must be drawn without a global sort of
the full table. Everything here keys on md5 of the stable id — the one
hash both Spark and DuckDB implement identically — so every query has
an exact DuckDB oracle.

- hash_split: 90/10 membership from the first 4 hex digits of
  md5(doc_id) — a narrow scan + map-side aggregation, no shuffle of
  payloads, no RNG state;
- deterministic_sample: top-k by md5 order. The Spark plan is a
  TakeOrderedAndProject (per-partition heap of k, merge of k·p rows on
  the driver) — NOT a full sort of the corpus;
- stratified_quota: k per label via a bounded window per group — the
  per-class cap pattern for balanced fine-tuning sets;
- corpus_prep: the composed LLM-corpus filter (dedup exact → language
  → length band → per-source token budget) as ONE declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.queries.base import tables
from data_ingestors_spark.functions.rounding import fround, o_fround

# first 4 hex chars of md5: fixed-width lowercase hex compares
# lexicographically == numerically, so the 90% cut is a plain string
# comparison against 'e666' (0xe666 = 58982 ≈ 0.9 * 65536) — no
# base conversion, identical in every engine
_TRAIN_CUT_HEX = "e666"


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 split: membership is a pure function of
    doc_id, stable under re-ingest and engine swap."""
    t = tables(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = F.when(prefix < _TRAIN_CUT_HEX, "train").otherwise("test")
    return (
        t["documents"]
        .select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


O_HASH_SPLIT = f"""
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_TRAIN_CUT_HEX}'
            THEN 'train' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible k-sample: the 100 smallest md5(doc_id) values.
    Catalyst compiles orderBy+limit to TakeOrderedAndProject — each
    partition keeps a k-heap, the driver merges k·p candidates; the
    corpus is never globally sorted."""
    t = tables(spark, sf_dir, "documents")
    return (
        t["documents"]
        .select("doc_id", "lang", "source", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(100)
        .select("doc_id", "lang", "source")
    )


O_DETERMINISTIC_SAMPLE = """
SELECT doc_id, lang, source
FROM (SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents ORDER BY h LIMIT 100)
"""


def q_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 25 docs per (lang) stratum, chosen by md5 order — the
    balanced-subset pattern. Window is bounded per group; with heavy
    skew the rank column could come from the salted two-phase form
    (queries/advanced.py q_salted_groupby) instead."""
    t = tables(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        t["documents"]
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 25)
        .select("doc_id", "lang")
    )


O_STRATIFIED_QUOTA = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 25
"""


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep plan: exact-dedup on content, keep
    en/de/fr, keep 50..2000 chars, then per-source doc counts + char
    budget. One declarative plan: the dedup groupBy and the final
    aggregation are the only shuffles; filters run before both."""
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"].filter(
        F.col("lang").isin("en", "de", "fr")
        & (F.col("n_chars") >= 50)
        & (F.col("n_chars") <= 2000)
    )
    # exact dedup: keep the smallest doc_id per content hash
    keeper = (
        docs.groupBy(F.md5("text").alias("chash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(keeper, "doc_id", "inner")
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


O_CORPUS_PREP = """
WITH docs AS (
  SELECT * FROM documents
  WHERE lang IN ('en','de','fr') AND n_chars BETWEEN 50 AND 2000
),
keeper AS (
  SELECT min(doc_id) AS doc_id FROM docs GROUP BY md5(text)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM docs JOIN keeper USING (doc_id)
GROUP BY source
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing — the data-mixing step of
    multilingual/multi-source LLM training (sampling weight ∝
    n_s^(1/T), T=2 here): big sources are down-weighted, small sources
    up-weighted, then each source contributes its quota of docs chosen
    by md5 order (deterministic, engine-portable).

    Scale shape: per-source counts are one partial-aggregated groupBy;
    quotas are computed on that tiny frame and broadcast back. The
    per-source pick is EXACT two-phase top-k: md5 hex order equals the
    numeric order of the hash value, so a uniform pre-filter on the
    first 32 hash bits (threshold = 4× the expected quota rate) shrinks
    the window-sort input from the whole corpus to ~4×N rows before
    ranking — the 100 TB shape, where sorting every doc per source
    just to keep the first thousand would dominate the job. Exactness
    is verified, not assumed: if any source undershoots its quota
    inside the filtered set (binomially negligible, but possible), the
    rank falls back to the unfiltered frame.
    """
    total_n = 1000
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    # w_s = n^(1/2) / sum(n^(1/2)); quota = floor(N * w_s)
    counts = counts.withColumn("wraw", F.sqrt(F.col("n").cast("double")))
    # scalar normalizer via broadcast cross join — NOT an empty-partition
    # window (single-partition window is exactly what doctor.py flags)
    wsum = counts.agg(F.sum("wraw").alias("wsum"))
    quotas = (
        counts.crossJoin(F.broadcast(wsum))
        .withColumn(
            "quota", F.floor(F.lit(total_n) * F.col("wraw") / F.col("wsum")).cast("long")
        )
        .withColumn(
            # pre-filter threshold on the first 32 hash bits: pass rate
            # ≈ 4 × quota/n (md5 is uniform); min() caps at "keep all"
            "h32_max",
            F.least(
                F.lit(float(2**32)),
                F.ceil(F.lit(float(2**32)) * 4 * F.col("quota") / F.col("n")).cast("double"),
            ),
        )
        .select("source", "quota", "h32_max")
    )
    h = F.md5(F.col("doc_id").cast("string"))
    h32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    tagged = docs.join(F.broadcast(quotas), "source")
    pre = tagged.filter(h32 < F.col("h32_max"))
    # exactness check: every source must retain >= quota rows after the
    # filter (md5 order is monotone in h32, so >= quota survivors imply
    # the true top-quota set survived intact). Anchored on `quotas`, not
    # `pre`: a source whose rows ALL fail the pre-filter has no group in
    # `pre` at all, so grouping `pre` alone would silently drop it from
    # the output instead of triggering the fallback (P ≈ e^-4q per
    # source — rare, but the exactness contract admits no "rare").
    kept = pre.groupBy("source").agg(F.count("*").alias("kept"))
    short = (
        quotas.filter(F.col("quota") > 0)
        .join(kept, "source", "left")
        .filter(F.coalesce(F.col("kept"), F.lit(0)) < F.col("quota"))
        .limit(1)
        .count()
    )
    pick_from = tagged if short else pre
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = pick_from.withColumn("rk", F.row_number().over(w))
    return ranked.filter(F.col("rk") <= F.col("quota")).select(
        "doc_id", "source", F.col("rk").cast("long").alias("rk")
    )


O_TEMPERATURE_MIX = """
WITH counts AS (
  SELECT source, count(*) AS n, sqrt(CAST(count(*) AS DOUBLE)) AS wraw
  FROM documents GROUP BY source
), quotas AS (
  SELECT source, CAST(floor(1000 * wraw / sum(wraw) OVER ()) AS BIGINT) AS quota
  FROM counts
), ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, ranked.source, CAST(rk AS BIGINT) AS rk
FROM ranked JOIN quotas ON ranked.source = quotas.source
WHERE rk <= quota
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED k-sample (Efraimidis–Spirakis A-ES):
    each doc draws u ∈ (0,1] from the portable 60-bit md5 hash and is
    ranked by ln(u)/w — the top-k by that key is an exact weighted
    sample without replacement, inclusion probability ∝ weight (here
    n_chars: longer docs proportionally more likely). Deterministic in
    both engines (same hash → same u → same IEEE ln/divide), so unlike
    a seeded rand() this is oracle-checkable and replay-stable across
    partitionings. Same TakeOrderedAndProject shape as
    deterministic_sample — per-partition k-heaps, no global sort."""
    t = tables(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "source", "n_chars")
    )


O_WEIGHTED_SAMPLE = """
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         ln((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
            / CAST(1152921504606846976 AS DOUBLE))
           / CAST(n_chars AS DOUBLE) AS k
  FROM documents WHERE n_chars > 0
  ORDER BY k DESC, doc_id ASC LIMIT 100
)
"""



QUERIES = {
    "hash_split": q_hash_split,
    "deterministic_sample": q_deterministic_sample,
    "weighted_sample": q_weighted_sample,
    "stratified_quota": q_stratified_quota,
    "corpus_prep": q_corpus_prep,
    "temperature_mix": q_temperature_mix,
}

ORACLES = {
    "hash_split": O_HASH_SPLIT,
    "deterministic_sample": O_DETERMINISTIC_SAMPLE,
    "weighted_sample": O_WEIGHTED_SAMPLE,
    "stratified_quota": O_STRATIFIED_QUOTA,
    "corpus_prep": O_CORPUS_PREP,
    "temperature_mix": O_TEMPERATURE_MIX,
}


_BUDGET_TOKENS = 50_000


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained corpus selection: take documents in
    quality order (longest first, ties by doc_id) while the cumulative
    whitespace-token count stays within the budget — the greedy
    curation step when the training run has a fixed token allowance.

    Plan: token counts are a row-local projection; the selection is
    ONE running-sum window over the quality order and a filter —
    no self-join, no loop. At 100 TB the global ordered window would
    range-partition on the quality key (Spark's window already sorts
    by range partition); a per-source budget variant would partition
    the window and stay embarrassingly parallel.
    """
    from data_ingestors_spark.queries.base import tables as _t

    t = _t(spark, sf_dir, "documents")
    toks = t["documents"].select(
        "doc_id",
        "n_chars",
        F.when(F.trim(F.col("text")) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col("text")), "\\s+")))
        .cast("long")
        .alias("ws_tokens"),
    )
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        toks.withColumn("cum_tokens", F.sum("ws_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("doc_id", "ws_tokens", "cum_tokens")
    )


O_BUDGET_SELECT = f"""
WITH toks AS (
  SELECT doc_id, n_chars,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens
  FROM documents
)
SELECT doc_id, ws_tokens,
       CAST(sum(ws_tokens) OVER (ORDER BY n_chars DESC, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens
FROM toks
QUALIFY cum_tokens <= {_BUDGET_TOKENS}
"""

QUERIES["budget_select"] = q_budget_select
ORACLES["budget_select"] = O_BUDGET_SELECT


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-rebalancing plan: per-source keep rates that move the
    corpus toward a UNIFORM source mix without upsampling — rate_s =
    min(1, target_per_source / n_s) — plus expected kept counts and
    the achieved (post-clamp) share. The one-pass waterfill a
    pretraining mix pipeline prints before committing to a
    [q_temperature_mix]-style reweighting (clamped sources keep 100%
    and the residual deficit is reported, not silently redistributed
    — an iterative waterfill closes it; the plan table makes the gap
    visible first).

    All arithmetic is exact-integer division; plan rides the
    |sources|-row aggregate frame."""
    t = tables(spark, sf_dir, "documents")
    per = t["documents"].groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_sources"),
    )
    target = F.col("n_total") / F.col("n_sources")
    rate = F.least(F.lit(1.0), target / F.col("n_docs"))
    kept = F.floor(rate * F.col("n_docs")).cast("long")
    planned = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        fround(rate, 6).alias("keep_rate"),
        kept.alias("n_kept"),
    )
    ktot = planned.agg(F.sum("n_kept").cast("long").alias("k_total"))
    return (
        planned.crossJoin(F.broadcast(ktot))
        .select(
            "source",
            "n_docs",
            "keep_rate",
            "n_kept",
            fround(F.col("n_kept") / F.col("k_total"), 6).alias("achieved_share"),
        )
        .orderBy("source")
    )


O_MIXTURE_PLAN = f"""
WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total, CAST(count(*) AS BIGINT) AS n_sources FROM per),
planned AS (
  SELECT source, n_docs,
         {o_fround("least(1.0, (n_total / CAST(n_sources AS DOUBLE)) / n_docs)", 6)} AS keep_rate,
         CAST(floor(least(1.0, (n_total / CAST(n_sources AS DOUBLE)) / n_docs) * n_docs) AS BIGINT) AS n_kept
  FROM per CROSS JOIN tot
),
ktot AS (SELECT CAST(sum(n_kept) AS BIGINT) AS k_total FROM planned)
SELECT source, n_docs, keep_rate, n_kept,
       {o_fround("n_kept / CAST(k_total AS DOUBLE)", 6)} AS achieved_share
FROM planned CROSS JOIN ktot
ORDER BY source
"""

QUERIES["mixture_plan"] = q_mixture_plan
ORACLES["mixture_plan"] = O_MIXTURE_PLAN


def q_stratified_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation sampling plan over (source, lang) strata for
    a 10,000-document budget: each stratum's optimal share is
    N_h·S_h / Σ N_h·S_h (S_h = the stratum's doc-length stddev — the
    classic variance-optimal allocation), floored to integers, capped
    at the stratum population — the statistically-grounded sibling of
    [q_mixture_plan]'s temperature waterfill.

    Exactness: stratum stddevs come from decimal co-moment sums;
    the allocation is one double expression per stratum; floor makes
    the integer cut engine-identical.

    Plan (100 TB): ONE partial-aggregable groupBy to |strata| cells,
    a 1-row total cross join, row-local allocation arithmetic."""
    t = tables(spark, sf_dir, "documents")
    nc = F.col("n_chars")
    cells = t["documents"].groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_pop"),
        F.sum(nc.cast("decimal(30,10)")).alias("s1"),
        F.sum((nc * nc).cast("decimal(30,10)")).alias("s2"),
    )
    n, s1, s2 = (
        F.col("n_pop").cast("double"),
        F.col("s1").cast("double"),
        F.col("s2").cast("double"),
    )
    # singleton strata have no variance estimate — weight them 0
    # (they still appear in the plan, capped at their population)
    sd = F.when(
        F.col("n_pop") > 1, F.sqrt((s2 - s1 * s1 / n) / (n - 1))
    ).otherwise(F.lit(0.0))
    weighted = cells.select(
        "source", "lang", "n_pop", (n * sd).alias("w")
    )
    tot = weighted.agg(
        F.sum(F.col("w").cast("decimal(30,10)")).cast("double").alias("w_all")
    )
    alloc = F.floor(F.lit(10_000) * F.col("w") / F.col("w_all")).cast("long")
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_pop",
            fround(F.col("w") / F.col("w_all"), 6).alias("alloc_share"),
            F.least(alloc, F.col("n_pop")).alias("n_sample"),
        )
        .orderBy("source", "lang")
    )


O_STRATIFIED_SAMPLE_PLAN = f"""
WITH cells AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n_pop,
         CAST(sum(CAST(n_chars AS DECIMAL(30,10))) AS DOUBLE) AS s1,
         CAST(sum(CAST(n_chars * n_chars AS DECIMAL(30,10))) AS DOUBLE) AS s2
  FROM documents GROUP BY 1, 2
),
weighted AS (
  SELECT source, lang, n_pop,
         CASE WHEN n_pop > 1
              THEN n_pop * sqrt((s2 - s1 * s1 / n_pop) / (n_pop - 1))
              ELSE 0.0 END AS w
  FROM cells
),
tot AS (SELECT CAST(sum(CAST(w AS DECIMAL(30,10))) AS DOUBLE) AS w_all FROM weighted)
SELECT source, lang, n_pop,
       {o_fround("w / w_all", 6)} AS alloc_share,
       CAST(least(CAST(floor(10000 * w / w_all) AS BIGINT), n_pop) AS BIGINT) AS n_sample
FROM weighted CROSS JOIN tot
ORDER BY source, lang
"""

QUERIES["stratified_sample_plan"] = q_stratified_sample_plan
ORACLES["stratified_sample_plan"] = O_STRATIFIED_SAMPLE_PLAN
