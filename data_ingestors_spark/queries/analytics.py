"""Statistical / analytical surface beyond the core relational set:
co-moment aggregates (corr/covar/stddev/var), linear-regression
aggregates, calendar gap-fill via date sequences, unpivot (wide to
long), median + boolean + bitwise aggregates, JSON-to-map scalar
functions, benchmark-contamination overlap (the decontamination pass
of an LLM training pipeline), and per-document TF-IDF top-k terms.

Scale notes (100 TB): every query here is a single shuffle on its
group key (co-moment aggs combine map-side), the calendar explode is
bounded by group-span not table size, and the contamination join
carries only (doc_id, gram-hash) pairs — never document text.

Cross-engine hazards per queries/base.py: decimal accumulators for
order-free sums, fround for every computed double (co-moment results
differ ~1e-12 relative between engines' merge orders — rounding
absorbs it), BIGINT casts for integer aggregates, unique tiebreakers
in every ranked selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.queries.base import (
    DEC,
    davg,
    dsum,
    fround,
    o_davg,
    o_dsum,
    o_fround,
    tables,
)


#: Density cap on basket size for the O(k^2)/O(k^3) per-basket
#: self-joins (item_cosine, copurchase_*, assoc_rules) — the basket
#: analog of FastSS's ``DEFAULT_MAX_KEY_DF``. A degenerate whale
#: basket (one key holding m distinct items) emits m^2 (or m^3) rows
#: from a single input key, which no partitioning strategy can split;
#: real baskets here are k = 4-7 items per order and <= ~200 per
#: customer at any SF, so the default only fires on data that should
#: have been cleaned upstream. Baskets ABOVE the cap are dropped
#: entirely (deterministic, and the standard treatment — a key that
#: co-occurs with everything carries no association signal).
MAX_BASKET_ITEMS = 1000


def _cap_baskets(items: DataFrame, key_col: str, cap: int = None) -> DataFrame:
    """Drop baskets with more than ``cap`` distinct items before a
    per-basket pair/triple fan-out. One window count over the basket
    key — the same hash partitioning the downstream self-join needs,
    so AQE reuses the exchange and the guard costs no extra shuffle
    of the items frame."""
    cap = MAX_BASKET_ITEMS if cap is None else cap
    w = Window.partitionBy(key_col)
    return (
        items.withColumn("_bk_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_bk_n") <= cap)
        .drop("_bk_n")
    )


# ---------------------------------------------------------------- stats

def q_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-moment aggregate family per return flag: correlation and
    covariance of (quantity, price), stddev / variance. One partial
    aggregation, map-side combined."""
    t = tables(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            fround(F.corr(q, p), 6).alias("corr_qty_price"),
            fround(F.covar_samp(q, p), 2).alias("covar_s"),
            fround(F.covar_pop(q, p), 2).alias("covar_p"),
            fround(F.stddev_samp(p), 4).alias("sd_price"),
            fround(F.var_samp(q), 4).alias("var_qty"),
        )
    )


O_STATS_AGGS = f"""
SELECT l_returnflag,
       {o_fround("corr(l_quantity, l_extendedprice)", 6)} AS corr_qty_price,
       {o_fround("covar_samp(l_quantity, l_extendedprice)", 2)} AS covar_s,
       {o_fround("covar_pop(l_quantity, l_extendedprice)", 2)} AS covar_p,
       {o_fround("stddev_samp(l_extendedprice)", 4)} AS sd_price,
       {o_fround("var_samp(l_quantity)", 4)} AS var_qty
FROM lineitem GROUP BY l_returnflag
"""


def q_regr_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (price ~ quantity) per line
    status: slope, intercept, R², point count."""
    t = tables(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        t["lineitem"]
        .groupBy("l_linestatus")
        .agg(
            fround(F.regr_slope(y, x), 4).alias("slope"),
            fround(F.regr_intercept(y, x), 2).alias("intercept"),
            fround(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).cast("long").alias("n_pts"),
        )
    )


O_REGR_AGGS = f"""
SELECT l_linestatus,
       {o_fround("regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
       {o_fround("regr_intercept(l_extendedprice, l_quantity)", 2)} AS intercept,
       {o_fround("regr_r2(l_extendedprice, l_quantity)", 6)} AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pts
FROM lineitem GROUP BY l_linestatus
"""


# ------------------------------------------------------------- gap fill

def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: per-user daily event counts with missing
    days zero-filled across each user's own [first, last] day span —
    the hypertable time_bucket_gapfill analog. The explode is bounded
    by span length per user, not by table size, so at 100 TB the
    generated calendar stays proportional to (users x days)."""
    t = tables(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    return cal.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events")
    )


O_GAP_FILL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), cal AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT cal.user_id, cal.day, coalesce(daily.n_events, 0) AS n_events
FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
"""


# -------------------------------------------------------------- unpivot

def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot of an aggregate row (sum qty / price /
    discount per return flag) into (flag, measure, val) — Spark's
    ``DataFrame.unpivot`` (melt)."""
    t = tables(spark, sf_dir, "lineitem")
    wide = (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
            dsum(F.col("l_discount"), 4).alias("sum_disc"),
        )
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="val",
    )


O_UNPIVOT_MEASURES = f"""
WITH wide AS (
  SELECT l_returnflag,
         {o_dsum("l_quantity")} AS sum_qty,
         {o_dsum("l_extendedprice")} AS sum_price,
         {o_dsum("l_discount", 4)} AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS measure, sum_price AS val FROM wide
UNION ALL
SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS val FROM wide
"""


# --------------------------------------------- median / bool / bit aggs

def q_median_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (interpolated), boolean aggregates, and a guarded
    every/any pair per event type."""
    t = tables(spark, sf_dir, "events")
    v = F.col("value")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            fround(F.median(v), 6).alias("med_value"),
            F.bool_and(v > 0).alias("all_pos"),
            F.bool_or(v > 99).alias("any_high"),
        )
    )


O_MEDIAN_BOOL_AGGS = f"""
SELECT event_type,
       {o_fround("median(value)", 6)} AS med_value,
       bool_and(value > 0) AS all_pos,
       bool_or(value > 99) AS any_high
FROM events GROUP BY event_type
"""


def q_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates over user ids per event type —
    integer-exact, order-free by construction."""
    t = tables(spark, sf_dir, "events")
    u = F.col("user_id")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.bit_and(u).cast("long").alias("band"),
            F.bit_or(u).cast("long").alias("bor"),
            F.bit_xor(u).cast("long").alias("bxor"),
        )
    )


O_BIT_AGGS = """
SELECT event_type,
       CAST(bit_and(user_id) AS BIGINT) AS band,
       CAST(bit_or(user_id) AS BIGINT) AS bor,
       CAST(bit_xor(user_id) AS BIGINT) AS bxor
FROM events GROUP BY event_type
"""


# ------------------------------------------------------------ map funcs

def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props parsed to a typed map, then the map scalar surface:
    element access, cardinality, key membership. Output stays scalar
    (maps themselves are unordered and hash-hostile across engines)."""
    t = tables(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return t["events"].select(
        "event_id",
        F.element_at(m, "k").cast("long").alias("k_val"),
        F.size(m).cast("long").alias("n_keys"),
        F.when(F.map_contains_key(m, "k"), 1).otherwise(0).cast("long").alias("has_k"),
    )


O_MAP_FUNCS = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
       CAST(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS has_k
FROM events
"""


def q_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a 3-key map per row, then
    transform_values, map_filter, and map_zip_with — emitted as
    deterministic scalars (summed transformed values, surviving-key
    count, zipped dot product) since raw maps are unordered and
    hash-hostile across engines."""
    t = tables(spark, sf_dir, "lineitem")
    li = t["lineitem"].filter(F.col("l_linenumber") == 1)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("disc"), F.col("l_discount"),
        F.lit("tax"), F.col("l_tax"),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    big = F.map_filter(m, lambda k, v: v > 0.05)
    weights = F.create_map(
        F.lit("qty"), F.lit(1.0), F.lit("disc"), F.lit(10.0), F.lit("tax"), F.lit(100.0)
    )
    prod = F.map_zip_with(m, weights, lambda k, a, b: a * b)
    return li.select(
        "l_orderkey",
        fround(
            F.aggregate(F.map_values(doubled), F.lit(0.0), lambda acc, v: acc + v), 6
        ).alias("sum_doubled"),
        F.size(big).cast("long").alias("n_big"),
        fround(
            F.aggregate(F.map_values(prod), F.lit(0.0), lambda acc, v: acc + v), 6
        ).alias("weighted"),
    )


O_MAP_HOF = f"""
SELECT l_orderkey,
       {o_fround("(l_quantity*2) + (l_discount*2) + (l_tax*2)", 6)} AS sum_doubled,
       CAST((CASE WHEN l_quantity > 0.05 THEN 1 ELSE 0 END)
          + (CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
          + (CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       {o_fround("l_quantity*1.0 + l_discount*10.0 + l_tax*100.0", 6)} AS weighted
FROM lineitem WHERE l_linenumber = 1
"""


# ----------------------------------------------- contamination overlap

def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: fraction of each candidate doc's
    distinct word 5-grams that appear anywhere in the benchmark set
    (source = 'src0').

    Scale shape: per-doc gram de-duplication happens ROW-LOCALLY with
    ``array_distinct`` inside codegen — the round-3 version shuffled
    every (doc_id, gram) pair through a global ``distinct()`` (and
    computed that exploded frame twice: once under the broadcast, once
    for the candidate side), which was both the 2–4 s line item and
    the high run-to-run variance. Now the candidate side is never
    shuffled at gram granularity: ``n_grams`` is an array length, and
    the only gram-keyed shuffle is the distinct over the (small)
    benchmark set, which then broadcasts into a semi join — at 100 TB
    the benchmark gram set is the dimension side, the corpus side
    streams map-side."""
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    ws = F.split("text", " ")
    gram_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 4),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
        )
    )
    base = docs.filter(F.size(ws) >= 5).select("doc_id", "source", gram_arr.alias("grams"))
    bench = (
        base.filter(F.col("source") == "src0")
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    cand = base.filter(F.col("source") != "src0")
    total = cand.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
    matched = (
        cand.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    return (
        total.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            fround(F.coalesce("n_hit", F.lit(0)) / F.col("n_grams"), 6).alias("overlap"),
        )
    )


O_CONTAMINATION_CHECK = f"""
WITH grams AS (
  SELECT DISTINCT doc_id, source,
         unnest([array_to_string(ws[i:i+4], ' ')
                 for i in generate_series(1, len(ws) - 4)]) AS gram
  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents)
  WHERE len(ws) >= 5
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE source = 'src0'
), cand AS (
  SELECT doc_id, gram FROM grams WHERE source <> 'src0'
), total AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM cand GROUP BY 1
), matched AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM cand WHERE gram IN (SELECT gram FROM bench) GROUP BY 1
)
SELECT total.doc_id, total.n_grams,
       coalesce(matched.n_hit, 0) AS n_hit,
       {o_fround("coalesce(matched.n_hit, 0) / total.n_grams", 6)} AS overlap
FROM total LEFT JOIN matched ON total.doc_id = matched.doc_id
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average for irregular series (the TWAP/sensor
    staple): each observation holds until the next one, so its weight
    is the microsecond gap to the successor; the last observation per
    user carries no weight. Integer microsecond weights and decimal
    accumulation keep the result order-free across engines."""
    from data_ingestors_spark.queries.base import DEC

    t = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    weighted = (
        t["events"]
        .select("user_id", "ts", "event_id", "value")
        .withColumn("w_us", gap_us)
        .filter(F.col("w_us").isNotNull())
    )
    num = F.sum((F.col("value") * F.col("w_us")).cast(DEC)).cast("double")
    den = F.sum("w_us")
    return weighted.groupBy("user_id").agg(
        fround(num / den, 6).alias("twap"),
        F.count("*").cast("long").alias("n_intervals"),
    )


O_TIME_WEIGHTED_AVG = f"""
WITH gaps AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS w_us
  FROM events
)
SELECT user_id,
       {o_fround("CAST(sum(CAST(value * w_us AS DECIMAL(30,10))) AS DOUBLE) / sum(w_us)", 6)} AS twap,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM gaps WHERE w_us IS NOT NULL
GROUP BY user_id
"""


# ----------------------------------------------------- rolling anomaly

def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each event's value scored
    against the mean/std of the PREVIOUS 50 same-type events; |z| > 3
    flags. Rolling moments come from decimal-exact sum and sum-of-
    squares over the frame — order-free, so Spark's incremental
    window evaluation and DuckDB's segment-tree combine cannot drift
    apart (double window sums would). One shuffle on event_type."""
    from data_ingestors_spark.queries.base import DEC

    t = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    v = F.col("value")
    n = F.count(v).over(w)
    s = F.sum(v.cast(DEC)).over(w).cast("double")
    sq = F.sum((v * v).cast(DEC)).over(w).cast("double")
    mean = s / n
    var = (sq - s * s / n) / (n - 1)
    z = (v - mean) / F.sqrt(var)
    return (
        t["events"]
        .select("event_id", "event_type", "value", n.alias("n_win"), z.alias("z_raw"))
        .filter((F.col("n_win") >= 20) & (F.abs("z_raw") > 3))
        .select("event_id", "event_type", fround(F.col("z_raw"), 4).alias("z"))
    )


O_ROLLING_ANOMALY = f"""
WITH scored AS (
  SELECT event_id, event_type, value,
         count(value) OVER w AS n_win,
         CAST(sum(CAST(value AS DECIMAL(30,10))) OVER w AS DOUBLE) AS s,
         CAST(sum(CAST(value * value AS DECIMAL(30,10))) OVER w AS DOUBLE) AS sq
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT event_id, event_type, n_win,
         (value - s / n_win) / sqrt((sq - s * s / n_win) / (n_win - 1)) AS z_raw
  FROM scored
)
SELECT event_id, event_type, {o_fround("z_raw", 4)} AS z
FROM z WHERE n_win >= 20 AND abs(z_raw) > 3
"""


# ------------------------------------------------------ corpus packing

def q_corpus_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training prep: documents fill
    fixed-budget token bins sequentially per source (deterministic
    doc_id order). bin = floor(tokens_before / budget) — one window
    cumsum per source partition, integer-exact, then a per-bin
    rollup. At scale each source packs independently (one shuffle on
    source), which is how packing is sharded in practice."""
    budget = 512
    t = tables(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id")
    binned = (
        t["documents"]
        .select("doc_id", "source", toks.alias("tokens"))
        .withColumn(
            "bin_id",
            F.floor((F.sum("tokens").over(w) - F.col("tokens")) / budget).cast("long"),
        )
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("tokens").cast("long").alias("bin_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


O_CORPUS_PACKING = """
WITH toks AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents
), binned AS (
  SELECT doc_id, source, tokens,
         CAST(floor((sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
                    / 512) AS BIGINT) AS bin_id
  FROM toks
)
SELECT source, bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS bin_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM binned GROUP BY source, bin_id
"""


# --------------------------------------------------------------- tf-idf

def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Term and document frequencies
    are integer-exact; the only double is ln(N/df), rounded engine-
    portably BEFORE ranking so the selected set is identical across
    engines; word is the tiebreaker. N rides a broadcast 1-row frame
    (doctor-exempt) instead of a driver count() — one corpus scan
    total, not two."""
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    # corpus size as a broadcast 1-row frame folded into the vocab-sized
    # df table — NOT a driver-side docs.count(), which would be a second
    # full scan of the corpus at scale
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("word").agg(F.count("*").cast("long").alias("df")).crossJoin(
        F.broadcast(n_docs)
    )
    scored = tf.join(F.broadcast(df_), "word").select(
        "doc_id",
        "word",
        fround(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "word", "tfidf", F.col("rk").cast("long").alias("rk"))
    )


O_TFIDF_TOPK = f"""
WITH tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1, 2
), df AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.word,
         {o_fround("tf.tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df.df)", 6)} AS tfidf
  FROM tf JOIN df ON tf.word = df.word
), ranked AS (
  SELECT doc_id, word, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS BIGINT) AS rk
  FROM scored
)
SELECT doc_id, word, tfidf, rk FROM ranked WHERE rk <= 3
"""


# ------------------------------------------------------------------ BM25

def q_bm25_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Okapi BM25 relevance to a fixed term set —
    the lexical retrieval baseline of a RAG / similarity-search stack
    (operators/text.py bm25_score). The top-k orders on the exact
    DECIMAL score (identical quantized values in both engines) with
    doc_id as tiebreaker, then rounds for output."""
    from data_ingestors_spark.operators.text import bm25_score

    t = tables(spark, sf_dir, "documents")
    scored = bm25_score(t["documents"], "text", "doc_id", ["vector", "merge", "window"])
    return (
        scored.orderBy(F.desc("bm25_dec"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", fround(F.col("bm25_dec").cast("double"), 6).alias("bm25"))
    )


O_BM25_RELEVANCE = f"""
WITH toks AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(dl AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS avgdl
  FROM dl
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE w IN ('vector', 'merge', 'window') GROUP BY 1, 2
), dfreq AS (
  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id,
         sum(CAST(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl))
         AS DECIMAL(30,10))) AS bm25_dec
  FROM tf
  JOIN dfreq ON tf.w = dfreq.w
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       {o_fround("CAST(bm25_dec AS DOUBLE)", 6)} AS bm25
FROM scored
ORDER BY bm25_dec DESC, doc_id ASC
LIMIT 20
"""



def q_dup_ngram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-n-gram character fraction (Rae et al.
    2021 repetition filters): per document, the fraction of characters
    covered by occurrences of trigrams that appear more than once in
    the doc. Complements repetition_stats' word/bigram signals with
    the char-weighted measure the published filters threshold on
    (docs failing dup_3gram_char_frac > ~0.18 are dropped).

    Shape: one explode bounded by words-per-doc, a per-(doc, trigram)
    count, and a char-weighted conditional sum — all map-side partials
    on the doc_id key; the trigram text itself never shuffles beyond
    the per-doc agg."""
    t = tables(spark, sf_dir, "documents")
    # Materialize the token array in its own projection before the HOF:
    # referencing an unmaterialized split() expression inside the
    # transform lambda re-evaluates the split once per trigram index
    # (O(words^2) char work per doc) — same let-bind fix as
    # bigram_logprob / ngram_coverage_curve.
    toks = t["documents"].select("doc_id", F.split("text", " ").alias("ws"))
    ws = F.col("ws")
    base = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(ws) - 2, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(ws, i, 3)),
            )
        ).alias("tri"),
    ).filter(F.size(F.split(F.col("tri"), " ")) == 3)
    per_tri = base.groupBy("doc_id", "tri").agg(
        F.count("*").cast("long").alias("c"), F.length("tri").cast("long").alias("chars")
    )
    return per_tri.groupBy("doc_id").agg(
        fround(
            F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("chars")).otherwise(0))
            / F.sum(F.col("c") * F.col("chars")),
            6,
        ).alias("dup_3gram_char_frac"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("long").alias("dup_tri_n"),
        F.sum("c").cast("long").alias("tri_n"),
    )


O_DUP_NGRAM_CHARS = f"""
WITH base AS (
  SELECT doc_id, tri
  FROM (
    SELECT doc_id,
           unnest([array_to_string(ws[i:i+2], ' ')
                   for i in generate_series(1, greatest(len(ws) - 2, 1))]) AS tri
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  )
  WHERE len(string_split(tri, ' ')) = 3
), per_tri AS (
  SELECT doc_id, tri, CAST(count(*) AS BIGINT) AS c,
         CAST(length(tri) AS BIGINT) AS chars
  FROM base GROUP BY 1, 2
)
SELECT doc_id,
       {o_fround("CAST(sum(CASE WHEN c > 1 THEN c * chars ELSE 0 END) AS DOUBLE) / sum(c * chars)", 6)} AS dup_3gram_char_frac,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tri_n,
       CAST(sum(c) AS BIGINT) AS tri_n
FROM per_tri GROUP BY doc_id
"""



# --------------------------------------------------- repetition stats

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and the fraction of bigrams taken by the most frequent
    bigram. One explode bounded by words-per-doc; the per-doc scalar
    stats never leave the row."""
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    ws = F.split("text", " ")
    base = docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.concat_ws(" ", F.slice(ws, i, 2)),
            )
        ).alias("bigram"),
    ).filter(F.col("n_words") >= 2)
    per_bigram = base.groupBy("doc_id", "n_words", "n_distinct", "bigram").agg(
        F.count("*").cast("long").alias("c")
    )
    return per_bigram.groupBy("doc_id", "n_words", "n_distinct").agg(
        F.max("c").cast("long").alias("top_bigram_n"),
        F.sum("c").cast("long").alias("n_bigrams"),
    ).select(
        "doc_id",
        "n_words",
        fround(1.0 - F.col("n_distinct") / F.col("n_words"), 6).alias("dup_word_frac"),
        fround(F.col("top_bigram_n") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
    )


O_REPETITION_STATS = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
         unnest([array_to_string(ws[i:i+1], ' ')
                 for i in generate_series(1, len(ws) - 1)]) AS bigram
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  WHERE len(ws) >= 2
), per_bigram AS (
  SELECT doc_id, n_words, n_distinct, bigram, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3, 4
)
SELECT doc_id, n_words,
       {o_fround("1.0 - n_distinct / n_words", 6)} AS dup_word_frac,
       {o_fround("CAST(max(c) AS DOUBLE) / sum(c)", 6)} AS top_bigram_frac
FROM per_bigram GROUP BY doc_id, n_words, n_distinct
"""


# ----------------------------------------------- embedding centroids

def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, one row per
    (label, dimension) — vector aggregation via posexplode so the
    partial aggregation is map-side combined per (label, dim) and no
    vector ever needs to fit anywhere special. Decimal accumulators
    keep the mean order-free."""
    t = tables(spark, sf_dir, "embeddings")
    return (
        t["embeddings"]
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.col("label").cast("long").alias("label"), (F.col("pos") + 1).cast("long").alias("dim"))
        .agg(davg(F.col("v"), 6).alias("centroid"))
    )


O_EMBEDDING_CENTROIDS = f"""
SELECT CAST(label AS BIGINT) AS label, CAST(s.d AS BIGINT) AS dim,
       {o_davg("s.v", 6)} AS centroid
FROM (
  SELECT label,
         unnest([struct_pack(d := i, v := embedding[i])
                 for i in generate_series(1, len(embedding))]) AS s
  FROM embeddings
)
GROUP BY 1, 2
"""


# -------------------------------------------------------------- funnel

def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> signup -> purchase: a user
    counts for a stage only if that event happens strictly after the
    previous stage's first event. Three keyed min-aggregations chained
    by join — each stage's frame shrinks, so the joins get cheaper as
    the funnel narrows."""
    t = tables(spark, sf_dir, "events")
    ev = t["events"]

    def first_after(etype: str, prev: DataFrame | None, prev_col: str | None, out: str) -> DataFrame:
        stage = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            stage = stage.join(prev, "user_id").filter(F.col("ts") > F.col(prev_col))
        return stage.groupBy("user_id").agg(F.min("ts").alias(out))

    v = first_after("view", None, None, "v_ts")
    s = first_after("signup", v, "v_ts", "s_ts")
    p = first_after("purchase", s, "s_ts", "p_ts")
    return (
        v.agg(F.count("*").cast("long").alias("n_view"))
        .crossJoin(s.agg(F.count("*").cast("long").alias("n_signup_after")))
        .crossJoin(p.agg(F.count("*").cast("long").alias("n_purchase_after")))
    )


O_FUNNEL_ANALYSIS = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1
), s AS (
  SELECT e.user_id, min(e.ts) AS s_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'signup' AND e.ts > v.v_ts GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.s_ts GROUP BY 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup_after,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_after
"""


# ----------------------------------------------------- cohort retention

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day,
    distinct active users per (cohort_day, day_offset). Two shuffles
    (first-seen per user, then the matrix aggregation)."""
    t = tables(spark, sf_dir, "events")
    ev = t["events"].select("user_id", F.to_date("ts").alias("day"))
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(cohort, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("long").alias("day_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


O_COHORT_RETENTION = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
SELECT cohort.cohort_day,
       CAST(datediff('day', cohort.cohort_day, ev.day) AS BIGINT) AS day_offset,
       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
FROM ev JOIN cohort ON ev.user_id = cohort.user_id
GROUP BY 1, 2
"""


# ------------------------------------------------------- robust stats

def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust statistics through BOTH grouped Python
    UDF surfaces: median/MAD/outlier-count via applyInPandas and a
    geometric-mean pandas UDAF, joined into one row per group."""
    from data_ingestors_spark.operators.robust import geomean_by_group, mad_outlier_stats

    t = tables(spark, sf_dir, "events")
    ev = t["events"]
    mad = mad_outlier_stats(ev, "event_type", "value", k=3.0)
    gm = geomean_by_group(ev, "event_type", "value")
    return mad.join(gm, "event_type").select(
        "event_type",
        fround(F.col("med"), 6).alias("med"),
        fround(F.col("mad"), 6).alias("mad"),
        "n_outliers",
        fround(F.col("gm"), 6).alias("gm"),
    )


O_ROBUST_STATS = f"""
WITH s AS (
  SELECT event_type, median(value) AS med, mad(value) AS mad,
         exp(avg(ln(value))) AS gm
  FROM events GROUP BY 1
)
SELECT e.event_type,
       {o_fround("any_value(s.med)", 6)} AS med,
       {o_fround("any_value(s.mad)", 6)} AS mad,
       CAST(sum(CASE WHEN abs(e.value - s.med) > 3.0 * s.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       {o_fround("any_value(s.gm)", 6)} AS gm
FROM events e JOIN s ON e.event_type = s.event_type
GROUP BY e.event_type
"""


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch rollup (rows-only: Datasketches HLL has no
    DuckDB twin; the 5% accuracy envelope and merge-associativity are
    asserted in tests/test_operators.py): daily per-type sketches
    merged to per-type distinct-user estimates without re-scanning
    raw data."""
    from data_ingestors_spark.operators.sketches import (
        build_sketch_rollup,
        merge_sketch_rollup,
    )

    t = tables(spark, sf_dir, "events")
    ev = t["events"].select(F.to_date("ts").alias("day"), "user_id", "event_type")
    daily = build_sketch_rollup(ev, ["day", "event_type"], "user_id")
    return merge_sketch_rollup(daily, ["event_type"])


QUERIES = {
    "hll_rollup": q_hll_rollup,
    "robust_stats": q_robust_stats,
    "repetition_stats": q_repetition_stats,
    "embedding_centroids": q_embedding_centroids,
    "funnel_analysis": q_funnel_analysis,
    "cohort_retention": q_cohort_retention,
    "stats_aggs": q_stats_aggs,
    "regr_aggs": q_regr_aggs,
    "gap_fill": q_gap_fill,
    "unpivot_measures": q_unpivot_measures,
    "median_bool_aggs": q_median_bool_aggs,
    "bit_aggs": q_bit_aggs,
    "map_funcs": q_map_funcs,
    "map_hof": q_map_hof,
    "contamination_check": q_contamination_check,
    "tfidf_topk": q_tfidf_topk,
    "bm25_relevance": q_bm25_relevance,
    "dup_ngram_chars": q_dup_ngram_chars,
    "corpus_packing": q_corpus_packing,
    "rolling_anomaly": q_rolling_anomaly,
    "time_weighted_avg": q_time_weighted_avg,
}

ORACLES = {
    "robust_stats": O_ROBUST_STATS,
    "repetition_stats": O_REPETITION_STATS,
    "embedding_centroids": O_EMBEDDING_CENTROIDS,
    "funnel_analysis": O_FUNNEL_ANALYSIS,
    "cohort_retention": O_COHORT_RETENTION,
    "stats_aggs": O_STATS_AGGS,
    "regr_aggs": O_REGR_AGGS,
    "gap_fill": O_GAP_FILL,
    "unpivot_measures": O_UNPIVOT_MEASURES,
    "median_bool_aggs": O_MEDIAN_BOOL_AGGS,
    "bit_aggs": O_BIT_AGGS,
    "map_funcs": O_MAP_FUNCS,
    "map_hof": O_MAP_HOF,
    "contamination_check": O_CONTAMINATION_CHECK,
    "tfidf_topk": O_TFIDF_TOPK,
    "bm25_relevance": O_BM25_RELEVANCE,
    "dup_ngram_chars": O_DUP_NGRAM_CHARS,
    "corpus_packing": O_CORPUS_PACKING,
    "rolling_anomaly": O_ROLLING_ANOMALY,
    "time_weighted_avg": O_TIME_WEIGHTED_AVG,
}


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust corpus statistics: per source, the document
    length distribution winsorized at [p05, p95] — exact interpolated
    percentiles (one groupBy), then every doc's length clamped to the
    band and averaged decimal-exact. The robust mean a corpus-quality
    dashboard reports instead of the raw mean a few megadocs skew.

    Scale: percentile pass is one shuffle on source; the stats frame is
    |sources| rows and broadcasts back onto the fact scan, so the
    second pass is shuffle-free until its own groupBy — two narrow aggs
    total, no sort, no window over the corpus."""
    t = tables(spark, sf_dir, "documents")
    d = t["documents"]
    stats = d.groupBy("source").agg(
        F.percentile("n_chars", 0.05).alias("_p05"),
        F.percentile("n_chars", 0.95).alias("_p95"),
        F.count("*").cast("long").alias("_n"),
    )
    clamped = d.join(F.broadcast(stats), "source").withColumn(
        "_clamped",
        F.least(F.greatest(F.col("n_chars").cast("double"), F.col("_p05")), F.col("_p95")),
    )
    return clamped.groupBy("source").agg(
        F.min("_n").alias("n_docs"),
        fround(F.min("_p05"), 4).alias("p05"),
        fround(F.min("_p95"), 4).alias("p95"),
        davg(F.col("_clamped"), 4).alias("win_mean"),
    )


O_WINSORIZED_STATS = f"""
WITH stats AS (
  SELECT source,
         quantile_cont(n_chars, 0.05) AS _p05,
         quantile_cont(n_chars, 0.95) AS _p95,
         CAST(count(*) AS BIGINT) AS _n
  FROM documents GROUP BY source
)
SELECT d.source,
       min(_n) AS n_docs,
       {o_fround("min(_p05)", 4)} AS p05,
       {o_fround("min(_p95)", 4)} AS p95,
       {o_davg("least(greatest(CAST(n_chars AS DOUBLE), _p05), _p95)", 4)} AS win_mean
FROM documents d JOIN stats USING (source)
GROUP BY d.source
"""

QUERIES["winsorized_stats"] = q_winsorized_stats
ORACLES["winsorized_stats"] = O_WINSORIZED_STATS


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over order baskets: the 20 part pairs most
    often ordered together, with support and lift. Per-order distinct
    items self-join on the order key — fan-out is O(k²) in basket size
    (k ≈ 4-7 here), never corpus-quadratic — then one groupBy counts
    pair support. Lift joins the tiny per-part support frame
    (broadcast) onto the already-limited top-k only.

    Ranked by (support desc, part_a, part_b) — the unique tiebreaker
    chain makes the selected set deterministic across engines.

    Broadcast side: ``top`` is the 20-row frame, so IT is the broadcast
    side of the lift joins and the O(|parts|) ``support`` frame streams
    — at 100 TB ``support`` has one row per distinct part (hundreds of
    millions) and broadcasting it would OOM the driver.

    Whale guard: baskets above :data:`MAX_BASKET_ITEMS` are dropped
    before the O(k²) fan-out (never fires on sane data — see the
    constant's doc)."""
    t = tables(spark, sf_dir, "lineitem")
    items = _cap_baskets(
        t["lineitem"].select("l_orderkey", "l_partkey").distinct(), "l_orderkey"
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
    )
    top = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_both"))
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(20)
    )
    support = items.groupBy("l_partkey").agg(F.count("*").cast("long").alias("n_part"))
    # corpus total as a 1-row broadcast scalar frame, not a driver action
    total = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    with_a = (
        support.withColumnRenamed("l_partkey", "part_a")
        .join(F.broadcast(top), "part_a")
        .withColumnRenamed("n_part", "n_a")
    )
    return (
        support.withColumnRenamed("l_partkey", "part_b")
        .join(F.broadcast(with_a), "part_b")
        .withColumnRenamed("n_part", "n_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_both",
            fround(
                F.col("n_both")
                * F.col("n_orders").cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


O_COPURCHASE_PAIRS = f"""
WITH items AS (
  -- mirror MAX_BASKET_ITEMS: Spark drops whale baskets before the fan-out
  SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= {MAX_BASKET_ITEMS}
), top AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  ORDER BY n_both DESC, part_a, part_b
  LIMIT 20
), support AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part FROM items GROUP BY 1
), total AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
)
SELECT part_a, part_b, n_both,
       {o_fround("n_both * CAST(n_orders AS DOUBLE) / (sa.n_part * sb.n_part)", 6)} AS lift
FROM top
JOIN support sa ON sa.l_partkey = part_a
JOIN support sb ON sb.l_partkey = part_b
CROSS JOIN total
"""

QUERIES["copurchase_pairs"] = q_copurchase_pairs
ORACLES["copurchase_pairs"] = O_COPURCHASE_PAIRS


def q_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each source's word distribution — the
    corpus-diversity signal that separates a template farm (low
    entropy) from organic text. Two shuffles: word counts per
    (source, word), then a decimal-exact fold of -p·log2(p) per
    source. Nothing is collected; the per-source vocabulary rides the
    same agg."""
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        "source",
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
    )
    counts = words.groupBy("source", "w").agg(F.count("*").alias("c"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    term = -p * F.log2(p)
    return (
        counts.join(F.broadcast(totals), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_vocab"),
            F.max("t").cast("long").alias("n_tokens"),
            fround(F.sum(term.cast("decimal(30,10)")).cast("double"), 6).alias(
                "entropy_bits"
            ),
        )
    )


O_SOURCE_ENTROPY = f"""
WITH words AS (
  SELECT source,
         unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), words_f AS (
  SELECT source, w FROM words WHERE w <> ''
), counts AS (
  SELECT source, w, count(*) AS c FROM words_f GROUP BY 1, 2
), totals AS (
  SELECT source, sum(c) AS t FROM counts GROUP BY 1
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_vocab,
       CAST(max(t) AS BIGINT) AS n_tokens,
       {o_fround("CAST(sum(CAST(-(c / CAST(t AS DOUBLE)) * log2(c / CAST(t AS DOUBLE)) AS DECIMAL(30,10))) AS DOUBLE)", 6)} AS entropy_bits
FROM counts JOIN totals USING (source)
GROUP BY source
"""

QUERIES["source_entropy"] = q_source_entropy
ORACLES["source_entropy"] = O_SOURCE_ENTROPY


def q_dup_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The line/paragraph half of Gopher's repetition table (Rae et
    al. 2021 A1.1; dup_ngram_chars + repetition_stats cover the
    n-gram half): per document, the fraction of line occurrences that
    are duplicates of another line IN THE SAME DOC, the char-weighted
    variant the published thresholds use, and the same two measures
    over paragraphs (blank-line-separated). Empty lines are ignored;
    documents with no non-empty line are absent.

    Shape: two bounded explodes (lines, paragraphs), each reduced by
    a combiner-friendly groupBy keyed on doc_id — per-doc work never
    leaves the doc key, so there is no hot-text skew by construction
    — then one tiny per-doc join (AQE broadcasts)."""
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]

    def side(pattern: str, prefix: str) -> DataFrame:
        parts = F.filter(
            F.transform(F.split("text", pattern), lambda p: F.trim(p)),
            lambda p: p != "",
        )
        per = (
            docs.select("doc_id", F.explode(parts).alias("p"))
            .groupBy("doc_id", "p")
            .agg(F.count("*").alias("c"), F.length("p").alias("chars"))
        )
        return per.groupBy("doc_id").agg(
            F.sum("c").cast("long").alias(f"n_{prefix}"),
            fround(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
                / F.sum("c"),
                6,
            ).alias(f"dup_{prefix}_frac"),
            fround(
                F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("chars")).otherwise(0))
                / F.sum(F.col("c") * F.col("chars")),
                6,
            ).alias(f"dup_{prefix}_char_frac"),
        )

    return side(r"\n", "line").join(side(r"\n{2,}", "para"), "doc_id")


O_DUP_LINE_STATS = f"""
WITH lines AS (
  SELECT doc_id, trim(p) AS p
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS p FROM documents)
  WHERE trim(p) <> ''
), per_l AS (
  SELECT doc_id, p, count(*) AS c, length(p) AS chars FROM lines GROUP BY 1, 2
), agg_l AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_line,
         {o_fround("CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c)", 6)} AS dup_line_frac,
         {o_fround("CAST(sum(CASE WHEN c > 1 THEN c * chars ELSE 0 END) AS DOUBLE) / sum(c * chars)", 6)} AS dup_line_char_frac
  FROM per_l GROUP BY doc_id
), paras AS (
  SELECT doc_id, trim(p) AS p
  FROM (SELECT doc_id, unnest(string_split_regex(text, '\\n{{2,}}')) AS p FROM documents)
  WHERE trim(p) <> ''
), per_p AS (
  SELECT doc_id, p, count(*) AS c, length(p) AS chars FROM paras GROUP BY 1, 2
), agg_p AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_para,
         {o_fround("CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c)", 6)} AS dup_para_frac,
         {o_fround("CAST(sum(CASE WHEN c > 1 THEN c * chars ELSE 0 END) AS DOUBLE) / sum(c * chars)", 6)} AS dup_para_char_frac
  FROM per_p GROUP BY doc_id
)
SELECT doc_id, n_line, dup_line_frac, dup_line_char_frac,
       n_para, dup_para_frac, dup_para_char_frac
FROM agg_l JOIN agg_p USING (doc_id)
"""

QUERIES["dup_line_stats"] = q_dup_line_stats
ORACLES["dup_line_stats"] = O_DUP_LINE_STATS


def q_mad_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    measure outlier detection uses when stddev is poisoned by the
    outliers themselves. Exact interpolated medians (Spark
    `percentile`, DuckDB `median` — same average-of-middle-two rule):
    one groupBy for the per-group median, a broadcast join back, one
    groupBy for the median of |x − med|. Both shuffles are on the
    small group key; the join back broadcasts the per-group medians
    frame (one row per group)."""
    t = tables(spark, sf_dir, "orders")
    o = t["orders"]
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            fround(F.first("med"), 4).alias("median_price"),
            fround(
                F.expr("percentile(abs(o_totalprice - med), 0.5)"), 4
            ).alias("mad_price"),
        )
    )


O_MAD_STATS = f"""
WITH med AS (
  SELECT o_orderpriority, median(o_totalprice) AS med
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {o_fround("min(med)", 4)} AS median_price,
       {o_fround("median(abs(o_totalprice - med))", 4)} AS mad_price
FROM orders o JOIN med USING (o_orderpriority)
GROUP BY o.o_orderpriority
"""

QUERIES["mad_stats"] = q_mad_stats
ORACLES["mad_stats"] = O_MAD_STATS


def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the most frequent order priority
    per customer market segment, ties broken by the smallest value —
    engine-portable by construction (native mode() functions break
    ties arbitrarily, so the count + rank formulation IS the portable
    operator). Counts are one partial-aggregated groupBy; the rank
    window rides the tiny (segment, priority) count frame."""
    t = tables(spark, sf_dir, "customer", "orders")
    counts = (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_orders"),
        )
    )


O_MODE_PER_GROUP = """
WITH counts AS (
  SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY n DESC, o_orderpriority) AS rnk
  FROM counts
)
SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS n_orders
FROM ranked WHERE rnk = 1
"""

QUERIES["mode_per_group"] = q_mode_per_group
ORACLES["mode_per_group"] = O_MODE_PER_GROUP


def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped string aggregation (LISTAGG / string_agg): per order
    priority, the sorted comma-joined distinct order statuses plus
    their count. Engine-portable ONLY because the order is forced:
    collect_set carries no order, so sort_array + array_join pins it
    (the same reason the DuckDB oracle needs ORDER BY inside
    string_agg). collect_set keeps the per-group state bounded by the
    distinct-value count — fine for low-cardinality payloads, and the
    distinct-first shape to use when it is not."""
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.count_distinct("o_orderstatus").cast("long").alias("n_statuses"),
        )
    )


O_GROUP_CONCAT = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
FROM orders GROUP BY o_orderpriority
"""

QUERIES["group_concat"] = q_group_concat
ORACLES["group_concat"] = O_GROUP_CONCAT


# -------------------------------------------------------- snapshot diff

def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff between two per-user activity snapshots (first
    20 vs last 21 days of the event window, overlapping): which users
    appeared, disappeared, or changed volume — the incremental-ingest
    reconciliation primitive (operators/joins.py:keyed_diff).

    Plan: each snapshot is one partial-aggregated groupBy with the
    date filter pushed to the scan; the diff is ONE full outer join on
    the snapshot key. Snapshots written bucketed by the key make the
    join exchange-free at scale.
    """
    from data_ingestors_spark.operators.joins import keyed_diff

    t = tables(spark, sf_dir, "events")

    def snap(pred):
        return (
            t["events"]
            .filter(pred)
            .groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n_events"))
        )

    old = snap(F.col("ts") < F.lit("2024-01-21").cast("timestamp"))
    new = snap(F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
    return keyed_diff(old, new, ["user_id"], ["n_events"])


O_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS old_n_events
  FROM events WHERE ts < TIMESTAMP '2024-01-21' GROUP BY 1
), new AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS new_n_events
  FROM events WHERE ts >= TIMESTAMP '2024-01-10' GROUP BY 1
)
SELECT COALESCE(old.user_id, new.user_id) AS user_id,
       CASE WHEN old.user_id IS NULL THEN 'added'
            WHEN new.user_id IS NULL THEN 'removed'
            WHEN old_n_events IS DISTINCT FROM new_n_events THEN 'modified'
            ELSE 'unchanged' END AS status,
       old_n_events, new_n_events
FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
"""

QUERIES["snapshot_diff"] = q_snapshot_diff
ORACLES["snapshot_diff"] = O_SNAPSHOT_DIFF


# ------------------------------------------- windowed (timed) funnel

_FUNNEL_GAP_S = 86400  # each step within 1 day of the previous


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel view -> click -> purchase where each
    step happens within 1 day of the previous step. Unlike the greedy
    first-event funnel ([funnel_analysis]), a windowed funnel must
    consider EVERY candidate chain — a later view can start a
    completing sequence after the first view's window expired — so the
    exact form is the per-user chain join: equi-join on user_id with
    range predicates, per-user cost O(k^2) in that user's event count,
    never corpus-quadratic. Earliest completion per user, then one
    aggregate row.
    """
    t = tables(spark, sf_dir, "events")
    ev = t["events"]

    def stage(etype, a, b, c):
        return ev.filter(F.col("event_type") == etype).select(
            F.col("user_id").alias(a), F.col("ts").alias(b), F.col("event_id").alias(c)
        )

    v = stage("view", "uv", "v_ts", "v_id")
    c = stage("click", "uc", "c_ts", "c_id")
    p = stage("purchase", "up", "p_ts", "p_id")
    gap = F.lit(_FUNNEL_GAP_S)
    chains = (
        v.join(c, (F.col("uv") == F.col("uc"))
               & (F.col("c_ts") > F.col("v_ts"))
               & (F.col("c_ts").cast("double") - F.col("v_ts").cast("double") <= gap))
        .join(p, (F.col("uv") == F.col("up"))
              & (F.col("p_ts") > F.col("c_ts"))
              & (F.col("p_ts").cast("double") - F.col("c_ts").cast("double") <= gap))
    )
    per_user = chains.groupBy(F.col("uv").alias("user_id")).agg(
        F.min(
            F.col("p_ts").cast("double") - F.col("v_ts").cast("double")
        ).alias("fastest_s")
    )
    return per_user.agg(
        F.count("*").cast("long").alias("n_converted"),
        fround(
            F.sum(F.col("fastest_s").cast(DEC)).cast("double") / F.count("*"), 4
        ).alias("avg_fastest_s"),
    )


O_FUNNEL_WINDOWED = f"""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
chains AS (
  SELECT v.user_id,
         date_diff('microsecond', v.ts, p.ts) / 1000000.0 AS dur_s
  FROM v
  JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        AND date_diff('microsecond', v.ts, c.ts) / 1000000.0 <= {_FUNNEL_GAP_S}
  JOIN p ON p.user_id = v.user_id AND p.ts > c.ts
        AND date_diff('microsecond', c.ts, p.ts) / 1000000.0 <= {_FUNNEL_GAP_S}
), per_user AS (
  SELECT user_id, min(dur_s) AS fastest_s FROM chains GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       {o_fround("CAST(sum(CAST(fastest_s AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS avg_fastest_s
FROM per_user
"""

QUERIES["funnel_windowed"] = q_funnel_windowed
ORACLES["funnel_windowed"] = O_FUNNEL_WINDOWED


def q_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: each purchase's value credited to the
    clicks in the prior 24 h under three standard models — last-touch
    (most recent click takes all), first-touch, and linear (split
    evenly) — reported as attributed revenue per click DAY. The
    channel-attribution shape with day standing in for channel.

    Plan: candidate (purchase, click) pairs are the same per-user
    bounded chain join as [funnel_windowed]; model weights are one
    row_number window per purchase (frame = that purchase's clicks)
    plus a count — then one union and one decimal-summed groupBy.
    """
    t = tables(spark, sf_dir, "events")
    ev = t["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"), F.col("value").alias("p_val"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    pairs = p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("p_ts").cast("double") - F.col("c_ts").cast("double") <= 86400),
    )
    w_desc = Window.partitionBy("p_id").orderBy(F.desc("c_ts"), F.desc("c_id"))
    w_asc = Window.partitionBy("p_id").orderBy(F.asc("c_ts"), F.asc("c_id"))
    n_w = Window.partitionBy("p_id")
    pairs = (
        pairs.withColumn("rn_last", F.row_number().over(w_desc))
        .withColumn("rn_first", F.row_number().over(w_asc))
        .withColumn("n_clicks", F.count("*").over(n_w))
    )
    day = F.to_date("c_ts").alias("click_day")
    last = pairs.filter(F.col("rn_last") == 1).select(
        F.lit("last_touch").alias("model"), day, F.col("p_val").alias("credit")
    )
    first = pairs.filter(F.col("rn_first") == 1).select(
        F.lit("first_touch").alias("model"), day, F.col("p_val").alias("credit")
    )
    linear = pairs.select(
        F.lit("linear").alias("model"),
        day,
        (F.col("p_val") / F.col("n_clicks")).alias("credit"),
    )
    return (
        last.unionByName(first)
        .unionByName(linear)
        .groupBy("model", "click_day")
        .agg(
            fround(F.sum(F.col("credit").cast(DEC)).cast("double"), 4).alias("attributed"),
            F.count("*").cast("long").alias("n_credits"),
        )
    )


O_ATTRIBUTION_MODELS = f"""
WITH p AS (
  SELECT user_id pu, ts p_ts, event_id p_id, value p_val
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id cu, ts c_ts, event_id c_id FROM events WHERE event_type = 'click'
), pairs AS (
  SELECT *,
         row_number() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) AS rn_last,
         row_number() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS rn_first,
         count(*) OVER (PARTITION BY p_id) AS n_clicks
  FROM p JOIN c ON pu = cu AND c_ts < p_ts
     AND date_diff('microsecond', c_ts, p_ts) / 1000000.0 <= 86400
), credits AS (
  SELECT 'last_touch' AS model, CAST(c_ts AS DATE) AS click_day, p_val AS credit
  FROM pairs WHERE rn_last = 1
  UNION ALL
  SELECT 'first_touch', CAST(c_ts AS DATE), p_val FROM pairs WHERE rn_first = 1
  UNION ALL
  SELECT 'linear', CAST(c_ts AS DATE), p_val / n_clicks FROM pairs
)
SELECT model, click_day,
       {o_fround("CAST(sum(CAST(credit AS DECIMAL(30,10))) AS DOUBLE)", 4)} AS attributed,
       CAST(count(*) AS BIGINT) AS n_credits
FROM credits GROUP BY model, click_day
"""

QUERIES["attribution_models"] = q_attribution_models
ORACLES["attribution_models"] = O_ATTRIBUTION_MODELS


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: customers scored into quartiles on Recency
    (days since last order), Frequency (order count), and Monetary
    (total spend), then counted per (r, f, m) segment — the classic
    customer-base health grid.

    Plan: one partial-aggregated groupBy builds the per-customer RFM
    triple; each quartile is an ntile window over the CUSTOMER frame
    (one row per customer, not per order) ordered with an explicit
    key tiebreak so the quartile assignment is engine-deterministic;
    the final segment count is another combiner-friendly groupBy.
    """
    t = tables(spark, sf_dir, "orders")
    rfm = t["orders"].groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("long").alias("freq"),
        dsum(F.col("o_totalprice")).alias("spend"),
    )
    wr = Window.orderBy(F.desc("last_order"), F.asc("cust"))   # recent = best
    wf = Window.orderBy(F.desc("freq"), F.asc("cust"))
    wm = Window.orderBy(F.desc("spend"), F.asc("cust"))
    scored = (
        rfm.withColumn("r", F.ntile(4).over(wr))
        .withColumn("f", F.ntile(4).over(wf))
        .withColumn("m", F.ntile(4).over(wm))
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").cast("long").alias("n_customers"),
        fround(F.sum(F.col("spend").cast(DEC)).cast("double"), 2).alias("segment_spend"),
    )


O_RFM_SEGMENTS = f"""
WITH rfm AS (
  SELECT o_custkey AS cust,
         max(o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS freq,
         {o_dsum("o_totalprice")} AS spend
  FROM orders GROUP BY 1
), scored AS (
  SELECT cust, spend,
         ntile(4) OVER (ORDER BY last_order DESC, cust) AS r,
         ntile(4) OVER (ORDER BY freq DESC, cust) AS f,
         ntile(4) OVER (ORDER BY spend DESC, cust) AS m
  FROM rfm
)
SELECT r, f, m,
       CAST(count(*) AS BIGINT) AS n_customers,
       {o_fround("CAST(sum(CAST(spend AS DECIMAL(30,10))) AS DOUBLE)", 2)} AS segment_spend
FROM scored GROUP BY r, f, m
"""

QUERIES["rfm_segments"] = q_rfm_segments
ORACLES["rfm_segments"] = O_RFM_SEGMENTS


def q_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus drift: KL(P_source || P_corpus) in bits over
    word distributions — the CCNet/RedPajama-style signal for "this
    source's language diverges from the mixture" (high KL = niche or
    degenerate source worth inspecting before training).

    No smoothing is needed: the corpus distribution is the superset
    mixture, so every source word has corpus mass > 0.

    Plan (100 TB): word counts per (source, word) and per word are
    both map-side-combined groupBys; the counts-to-corpus join is a
    word-keyed equi-join carrying only (source, w, c) — document text
    never shuffles. Source totals (|sources| rows) and the corpus
    total (1 row) ride broadcasts. KL terms fold in decimal so the
    sum is merge-order-exact across engines.
    """
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        "source",
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
    )
    counts = words.groupBy("source", "w").agg(F.count("*").alias("c"))
    corpus = counts.groupBy("w").agg(F.sum("c").alias("cc"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    total = corpus.agg(F.sum("cc").alias("tt"))  # 1-row scalar frame
    p_s = F.col("c") / F.col("t")
    ratio = (F.col("c") * F.col("tt")) / (F.col("t") * F.col("cc"))
    term = p_s * F.log2(ratio)
    return (
        counts.join(corpus, "w")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.max("t").cast("long").alias("n_tokens"),
            fround(F.sum(term.cast(DEC)).cast("double"), 6).alias("kl_bits"),
        )
    )


O_KL_DRIFT = f"""
WITH words AS (
  SELECT source,
         unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), words_f AS (
  SELECT source, w FROM words WHERE w <> ''
), counts AS (
  SELECT source, w, count(*) AS c FROM words_f GROUP BY 1, 2
), corpus AS (
  SELECT w, sum(c) AS cc FROM counts GROUP BY 1
), totals AS (
  SELECT source, sum(c) AS t FROM counts GROUP BY 1
), total AS (
  SELECT sum(cc) AS tt FROM corpus
)
SELECT source,
       CAST(max(t) AS BIGINT) AS n_tokens,
       {o_fround("CAST(sum(CAST((c / CAST(t AS DOUBLE)) * log2((c * CAST(tt AS DOUBLE)) / (CAST(t AS DOUBLE) * cc)) AS DECIMAL(30,10))) AS DOUBLE)", 6)} AS kl_bits
FROM counts
JOIN corpus USING (w)
JOIN totals USING (source)
CROSS JOIN total
GROUP BY source
"""

QUERIES["kl_drift"] = q_kl_drift
ORACLES["kl_drift"] = O_KL_DRIFT


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-significant-
    digit distribution vs log10(1 + 1/d), with each digit's chi-square
    contribution — the classic synthetic-data / fraud smell test.

    The first digit comes from the DECIMAL STRING of floor(x), not
    floor(x / 10^floor(log10 x)) — the string form sidesteps the
    engine-dependent log10 ulp at exact powers of ten.

    Plan (100 TB): one map-side-combined groupBy onto 9 digit rows;
    the row count rides a 1-row broadcast scalar frame.
    """
    t = tables(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = (
        t["orders"]
        .filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").cast("double").alias("n"))  # 1-row scalar
    p_exp = F.log10(1 + 1 / F.col("digit").cast("double"))
    expected = F.col("n") * p_exp
    return (
        obs.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            fround(F.col("n_obs") / F.col("n"), 6).alias("p_obs"),
            fround(p_exp, 6).alias("p_exp"),
            fround(
                (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected,
                4,
            ).alias("chi2_term"),
        )
    )


O_BENFORD_DIGITS = f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders WHERE o_totalprice >= 1
  GROUP BY 1
), total AS (
  SELECT CAST(sum(n_obs) AS DOUBLE) AS n FROM obs
)
SELECT digit, n_obs,
       {o_fround("n_obs / n", 6)} AS p_obs,
       {o_fround("log10(1 + 1 / CAST(digit AS DOUBLE))", 6)} AS p_exp,
       {o_fround("(n_obs - n * log10(1 + 1 / CAST(digit AS DOUBLE))) * (n_obs - n * log10(1 + 1 / CAST(digit AS DOUBLE))) / (n * log10(1 + 1 / CAST(digit AS DOUBLE)))", 4)} AS chi2_term
FROM obs CROSS JOIN total
"""

QUERIES["benford_digits"] = q_benford_digits
ORACLES["benford_digits"] = O_BENFORD_DIGITS


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: standardize the
    daily-count series, cumulative-sum the z-scores, and flag the day
    where |CUSUM| peaks — a level shift in event volume shows up as
    the peak of the drift walk (Page 1954).

    Engine-exactness: mean/std are derived from INTEGER (n, Σc, Σc²)
    aggregates, so both engines compute bit-identical doubles; the
    running CUSUM folds in decimal so DuckDB's segment-tree window
    accumulation and Spark's running fold agree exactly.

    Plan (100 TB): raw events collapse to one row per (type, day) in
    a map-side-combined groupBy; every window after that is
    partitioned by event_type over the bounded daily frame (rows =
    days in span, not events).
    """
    t = tables(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("c") - mean) / F.sqrt(var)
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("cusum", F.sum(z.cast(DEC)).over(w_cum))
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), F.asc("day")
    )
    return (
        walked.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("n").alias("n_days"),
            fround(F.abs(F.col("cusum")).cast("double"), 4).alias("peak_cusum"),
        )
    )


O_CUSUM_CHANGEPOINT = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY 1
), walked AS (
  SELECT d.event_type, d.day, s.n,
         sum(CAST((d.c - s.s1 / CAST(s.n AS DOUBLE))
                  / sqrt((s.s2 - s.s1 * CAST(s.s1 AS DOUBLE) / s.n) / (s.n - 1))
                  AS DECIMAL(30,10)))
           OVER (PARTITION BY d.event_type ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily d JOIN stats s USING (event_type)
), picked AS (
  SELECT event_type, day, n, cusum,
         row_number() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, day) AS rn
  FROM walked
)
SELECT event_type, day AS change_day, n AS n_days,
       {o_fround("CAST(abs(cusum) AS DOUBLE)", 4)} AS peak_cusum
FROM picked WHERE rn = 1
"""

QUERIES["cusum_changepoint"] = q_cusum_changepoint
ORACLES["cusum_changepoint"] = O_CUSUM_CHANGEPOINT


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier customer-survival curve: duration = days between a
    customer's first and last order; a customer whose last order falls
    more than 90 days before the corpus horizon is an observed churn
    (event), later ones are right-censored. S(t) multiplies
    (1 - d_t / n_t) over event times <= t — the standard estimator
    with censoring handled exactly.

    Engine-exactness: the log-survival terms fold in decimal under the
    ordered window (exp of an exact decimal sum), so segment-tree vs
    running-fold accumulation cannot diverge.

    Plan (100 TB): per-customer first/last collapse map-side; the KM
    table itself is one row per distinct duration-day (bounded by the
    date span, thousands not billions), so the single-partition
    ordered window rides a frame that is small BY CONSTRUCTION —
    at extreme spans switch the cumulative terms to a range-join
    rollup. Doctor: D2-exempt for exactly that reason.
    """
    t = tables(spark, sf_dir, "orders")
    horizon = t["orders"].agg(
        F.date_sub(F.max(F.to_date("o_orderdate")), 90).alias("cutoff")
    )  # 1-row scalar frame
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.min(F.to_date("o_orderdate")).alias("first_d"),
            F.max(F.to_date("o_orderdate")).alias("last_d"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last_d", "first_d").alias("dur"),
            F.when(F.col("last_d") < F.col("cutoff"), 1).otherwise(0).alias("event"),
        )
    )
    by_dur = per_cust.groupBy("dur").agg(
        F.sum("event").cast("long").alias("d"),
        F.count("*").cast("long").alias("m"),
    )
    total = by_dur.agg(F.sum("m").cast("long").alias("tot"))  # 1-row scalar
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = F.col("tot") - F.coalesce(F.sum("m").over(w_prev), F.lit(0))
    stepped = (
        by_dur.crossJoin(F.broadcast(total))
        .withColumn("n_risk", at_risk)
        .withColumn(
            "log_s",
            F.sum(
                F.log(1 - F.col("d") / F.col("n_risk")).cast(DEC)
            ).over(w_cum),
        )
    )
    return stepped.filter(F.col("d") > 0).select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        F.col("d").alias("n_events"),
        fround(F.exp(F.col("log_s").cast("double")), 6).alias("survival"),
    )


O_SURVIVAL_KM = f"""
WITH horizon AS (
  SELECT max(CAST(o_orderdate AS DATE)) - 90 AS cutoff FROM orders
), per_cust AS (
  SELECT date_diff('day', min(CAST(o_orderdate AS DATE)), max(CAST(o_orderdate AS DATE))) AS dur,
         CASE WHEN max(CAST(o_orderdate AS DATE)) < (SELECT cutoff FROM horizon)
              THEN 1 ELSE 0 END AS event
  FROM orders GROUP BY o_custkey
), by_dur AS (
  SELECT dur, CAST(sum(event) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS m
  FROM per_cust GROUP BY dur
), total AS (
  SELECT CAST(sum(m) AS BIGINT) AS tot FROM by_dur
), risked AS (
  SELECT dur, d,
         tot - coalesce(sum(m) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM by_dur CROSS JOIN total
), stepped AS (
  SELECT dur, d, n_risk,
         sum(CAST(ln(1 - d / CAST(n_risk AS DOUBLE)) AS DECIMAL(30,10)))
           OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS log_s
  FROM risked
)
SELECT CAST(dur AS INTEGER) AS duration_days, n_risk, d AS n_events,
       {o_fround("exp(CAST(log_s AS DOUBLE))", 6)} AS survival
FROM stepped WHERE d > 0
"""

QUERIES["survival_km"] = q_survival_km
ORACLES["survival_km"] = O_SURVIVAL_KM


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-spend concentration per nation —
    the inequality lens on revenue: 0 = every customer spends alike,
    1 = one whale funds the nation. Uses the ranked-cumulative form
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over per-customer spend sorted
    ascending (rank ties broken by customer key so both engines rank
    identically).

    Plan (100 TB): per-customer spend is a map-side-combined groupBy;
    the rank window partitions by NATION over the per-customer frame
    (customers per nation, not orders); the final fold is another
    combiner-friendly groupBy. Spend sums fold in decimal so rank
    inputs are engine-exact.
    """
    t = tables(spark, sf_dir, "orders", "customer", "nation")
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("spend"))
        .join(
            t["customer"].select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.asc("spend"), F.asc("o_custkey"))
    ranked = spend.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(F.col("i") * F.col("spend")).cast("double").alias("iws"),
            F.sum("spend").cast("double").alias("s"),
        )
        .select(
            "n_name",
            "n_customers",
            # ratio in DOUBLE from the exact decimal sums — decimal
            # division truncates scale differently per engine
            fround(
                2 * F.col("iws") / (F.col("n_customers") * F.col("s"))
                - (F.col("n_customers") + 1) / F.col("n_customers").cast("double"),
                6,
            ).alias("gini"),
        )
    )


O_GINI_CONCENTRATION = f"""
WITH spend AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(30,10))) AS spend
  FROM orders GROUP BY 1
), tagged AS (
  SELECT n_name, o_custkey, spend
  FROM spend
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
), ranked AS (
  SELECT n_name, spend,
         row_number() OVER (PARTITION BY n_name ORDER BY spend ASC, o_custkey ASC) AS i
  FROM tagged
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       {o_fround("2 * CAST(sum(i * spend) AS DOUBLE) / (count(*) * CAST(sum(spend) AS DOUBLE)) - (count(*) + 1) / CAST(count(*) AS DOUBLE)", 6)} AS gini
FROM ranked
GROUP BY n_name
"""

QUERIES["gini_concentration"] = q_gini_concentration
ORACLES["gini_concentration"] = O_GINI_CONCENTRATION


def q_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity over the
    binary customer×part purchase matrix, top-5 neighbors per part
    among pairs co-bought by ≥ 2 customers — the classic "customers
    who bought X also bought Y" neighborhood model.

    cos(a,b) = |A∩B| / √(|A|·|B|) on customer sets, computed from
    pair co-occurrence counts — no vectors materialize.

    Plan (100 TB): distinct (customer, part) collapses map-side; the
    pair fan-out self-joins per CUSTOMER basket (O(k²) in basket
    size, never corpus-quadratic; degenerate whale baskets are
    DROPPED by the enforced :data:`MAX_BASKET_ITEMS` cap — the guard
    the r7 docstring only promised); per-part popularity joins stream
    on the part key — both sides are |parts|-sized, no broadcast. The
    top-5 window partitions by part. Co-count ≥ 2 prunes the pair
    tail before any join."""
    t = tables(spark, sf_dir, "lineitem", "orders")
    bought = _cap_baskets(
        t["lineitem"]
        .join(t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"), "l_orderkey")
        .select("o_custkey", "l_partkey")
        .distinct(),
        "o_custkey",
    )
    a, b = bought.alias("a"), bought.alias("b")
    co = (
        a.join(b, "o_custkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    pop = bought.groupBy(F.col("l_partkey")).agg(
        F.count("*").cast("long").alias("n")
    )
    scored = (
        co.join(pop.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a")), "part_a")
        .join(pop.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b")), "part_b")
        .withColumn(
            "cosine",
            fround(
                F.col("n_both") / F.sqrt(F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("part_a").orderBy(
        F.desc("cosine"), F.desc("n_both"), F.asc("part_b")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("part_a", "part_b", "n_both", "cosine", F.col("rnk").cast("int").alias("rnk"))
    )


O_ITEM_COSINE = f"""
WITH bought AS (
  -- mirror MAX_BASKET_ITEMS: Spark drops whale baskets before the fan-out
  SELECT o_custkey, l_partkey
  FROM (SELECT DISTINCT o_custkey, l_partkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
  QUALIFY count(*) OVER (PARTITION BY o_custkey) <= {MAX_BASKET_ITEMS}
), co AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM bought a JOIN bought b
    ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
), pop AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM bought GROUP BY 1
), scored AS (
  SELECT part_a, part_b, n_both,
         {o_fround("n_both / sqrt(pa.n * CAST(pb.n AS DOUBLE))", 6)} AS cosine
  FROM co
  JOIN pop pa ON pa.l_partkey = part_a
  JOIN pop pb ON pb.l_partkey = part_b
), ranked AS (
  SELECT part_a, part_b, n_both, cosine,
         row_number() OVER (PARTITION BY part_a ORDER BY cosine DESC, n_both DESC, part_b ASC) AS rnk
  FROM scored
)
SELECT part_a, part_b, n_both, cosine, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
"""

QUERIES["item_cosine"] = q_item_cosine
ORACLES["item_cosine"] = O_ITEM_COSINE


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and price per return
    flag — the monotonic-association check that Pearson (stats_aggs)
    misses on non-linear relationships. Ties get average ranks (the
    standard fractional-rank treatment), then Pearson-on-ranks.

    Engine-exactness: average ranks are exact rationals computed from
    integer window counts; the rank co-moments fold in decimal so the
    final correlation is engine-identical before rounding.

    Plan (100 TB): rank windows partition by the GROUP key — at scale
    swap ntile-free exact ranks for approx-quantile bucketed ranks if
    a single group's frame outgrows a task.
    """
    t = tables(spark, sf_dir, "lineitem")
    li = t["lineitem"].select("l_returnflag", "l_quantity", "l_extendedprice")
    # fractional (average) rank: rank() + (cnt_ties - 1) / 2
    def frank(col: str) -> "F.Column":
        w = Window.partitionBy("l_returnflag").orderBy(col)
        wt = Window.partitionBy("l_returnflag", col)
        return F.rank().over(w) + (F.count("*").over(wt) - 1) / 2

    ranked = li.select(
        "l_returnflag",
        frank("l_quantity").cast(DEC).alias("rq"),
        frank("l_extendedprice").cast(DEC).alias("rp"),
    )
    agg = ranked.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rq").cast("double").alias("sq"),
        F.sum("rp").cast("double").alias("sp"),
        F.sum(F.col("rq") * F.col("rp")).cast("double").alias("sqp"),
        F.sum(F.col("rq") * F.col("rq")).cast("double").alias("sqq"),
        F.sum(F.col("rp") * F.col("rp")).cast("double").alias("spp"),
    )
    num = F.col("n") * F.col("sqp") - F.col("sq") * F.col("sp")
    den = F.sqrt(
        (F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq"))
        * (F.col("n") * F.col("spp") - F.col("sp") * F.col("sp"))
    )
    return agg.select(
        "l_returnflag", "n", fround(num / den, 6).alias("spearman")
    )


O_SPEARMAN_CORR = f"""
WITH ranked AS (
  SELECT l_returnflag,
         CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
              + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
              AS DECIMAL(30,10)) AS rq,
         CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
              + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
              AS DECIMAL(30,10)) AS rp
  FROM lineitem
), agg AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rq) AS DOUBLE) AS sq,
         CAST(sum(rp) AS DOUBLE) AS sp,
         CAST(sum(rq * rp) AS DOUBLE) AS sqp,
         CAST(sum(rq * rq) AS DOUBLE) AS sqq,
         CAST(sum(rp * rp) AS DOUBLE) AS spp
  FROM ranked GROUP BY 1
)
SELECT l_returnflag, n,
       {o_fround("(n * sqp - sq * sp) / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))", 6)} AS spearman
FROM agg
"""

QUERIES["spearman_corr"] = q_spearman_corr
ORACLES["spearman_corr"] = O_SPEARMAN_CORR


def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-drift
    complement to kl_drift: KL weighs shared words by usage, this
    measures raw lexical overlap of the TYPE sets (template farms
    share near-identical vocabularies; organic sources diverge).

    Plan (100 TB): the (source, word) type set collapses map-side;
    the pair intersection is a word-keyed self-join carrying only
    (source, word-hash) — with S sources a word shared by all S
    fans out O(S²) pairs, bounded by the SOURCE count (tens), never
    by corpus size. Per-source type counts ride a broadcast.
    """
    t = tables(spark, sf_dir, "documents")
    vocab = (
        t["documents"]
        .select(
            "source",
            F.explode(
                F.filter(
                    F.split(
                        F.trim(
                            F.regexp_replace(
                                F.lower(F.col("text")), "[^a-z0-9]+", " "
                            )
                        ),
                        " ",
                    ),
                    lambda w: w != "",
                )
            ).alias("w"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").cast("long").alias("nv"))
    a = vocab.select(F.col("source").alias("src_a"), "w")
    b = vocab.select(F.col("source").alias("src_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("nv_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("nv_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            fround(
                F.col("n_common")
                / (F.col("nv_a") + F.col("nv_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


O_VOCAB_OVERLAP = f"""
WITH words AS (
  SELECT source,
         unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), vocab AS (
  SELECT DISTINCT source, w FROM words WHERE w <> ''
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS nv FROM vocab GROUP BY 1
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_common
  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       {o_fround("n_common / CAST(sa.nv + sb.nv - n_common AS DOUBLE)", 6)} AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
"""

QUERIES["vocab_overlap"] = q_vocab_overlap
ORACLES["vocab_overlap"] = O_VOCAB_OVERLAP


# --------------------------------------------- period-over-period deltas

def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year
    percentage deltas on a GAP-FREE month spine — the standard BI
    trend query done right: lag() over raw grouped months silently
    compares across gaps, so the spine (sequence of all months between
    min and max) is generated first and empty months land as 0
    revenue; a delta against a 0 base is NULL, not infinity.

    Plan (100 TB): the monthly rollup is one map-side-combined groupBy
    (month cardinality is data-size-independent); the spine explodes
    from a 1-row min/max agg; the trailing lag window orders the
    ~tens-to-hundreds-of-months frame in ONE partition — bounded by
    calendar span, not data volume, so the single-partition sort is
    safe at any scale.
    """
    t = tables(spark, sf_dir, "orders")
    monthly = (
        t["orders"]
        .groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
        )
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
    )
    spine = (
        monthly.agg(F.min("month").alias("lo"), F.max("month").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 month"))
            ).alias("month")
        )
    )
    full = spine.join(monthly, "month", "left").select(
        "month", F.coalesce("revenue", F.lit(0.0)).alias("revenue")
    )
    w = Window.orderBy("month")
    lagd = full.select(
        "month",
        "revenue",
        F.lag("revenue", 1).over(w).alias("_p1"),
        F.lag("revenue", 12).over(w).alias("_p12"),
    )

    def pct(base):
        return F.when(
            base.isNull() | (base == 0), F.lit(None).cast("double")
        ).otherwise(fround((F.col("revenue") - base) / base * 100, 4))

    return lagd.select(
        "month",
        "revenue",
        pct(F.col("_p1")).alias("mom_pct"),
        pct(F.col("_p12")).alias("yoy_pct"),
    )


O_PERIOD_OVER_PERIOD = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         {o_dsum("o_totalprice")} AS revenue
  FROM orders GROUP BY 1
), bounds AS (SELECT min(month) AS lo, max(month) AS hi FROM monthly),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month
  FROM bounds
), filled AS (
  SELECT s.month, coalesce(m.revenue, 0.0) AS revenue
  FROM spine s LEFT JOIN monthly m USING (month)
), lagd AS (
  SELECT month, revenue,
         lag(revenue, 1) OVER (ORDER BY month) AS _p1,
         lag(revenue, 12) OVER (ORDER BY month) AS _p12
  FROM filled
)
SELECT month, revenue,
       CASE WHEN _p1 IS NULL OR _p1 = 0 THEN NULL
            ELSE {o_fround("(revenue - _p1) / _p1 * 100", 4)} END AS mom_pct,
       CASE WHEN _p12 IS NULL OR _p12 = 0 THEN NULL
            ELSE {o_fround("(revenue - _p12) / _p12 * 100", 4)} END AS yoy_pct
FROM lagd
"""

QUERIES["period_over_period"] = q_period_over_period
ORACLES["period_over_period"] = O_PERIOD_OVER_PERIOD


# ------------------------------------------------- decile lift analysis

def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate lift by order-value decile: do expensive orders get
    returned more? Orders bin into spend deciles via interpolated
    percentile cutoffs; the outcome is "order contains at least one
    returned line"; lift is decile return-rate over the global rate —
    the standard model-lift / risk-segmentation readout.

    Plan (100 TB): cutoffs come from ONE percentile aggregate (its
    partial buffer is a value->count map, no global sort — unlike
    ntile, which would single-partition the fact table); the 1-row
    cutoff frame broadcasts into a CASE-chain binning expression.
    Outcome flags collapse order-grain via a map-side-combined
    groupBy on l_orderkey before joining orders. Rates divide exact
    BIGINT counts; both engines compute identical cutoff doubles.
    """
    t = tables(spark, sf_dir, "orders", "lineitem")
    # ONE percentile aggregate with an array of quantiles: nine
    # separate F.percentile calls each build their own value->count
    # buffer over the (nearly unique) price column — measured 9x the
    # aggregation work for identical cutoffs
    cuts = t["orders"].agg(
        F.percentile(
            "o_totalprice", F.array(*[F.lit(q / 10.0) for q in range(1, 10)])
        ).alias("cs")
    ).select(*[F.col("cs")[q - 1].alias(f"c{q}") for q in range(1, 10)])
    returned = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "ret"
            )
        )
    )
    dec = F.lit(1)
    for q in range(1, 10):
        dec = dec + F.when(F.col("o_totalprice") > F.col(f"c{q}"), 1).otherwise(0)
    binned = (
        t["orders"]
        .join(returned, "o_orderkey", "left")
        .na.fill({"ret": 0})
        .crossJoin(F.broadcast(cuts))
        .select(dec.cast("long").alias("decile"), "ret")
    )
    per = binned.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("ret").cast("long").alias("n_returned"),
    )
    tot = per.agg(
        F.sum("n_orders").alias("tn"), F.sum("n_returned").alias("tr")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_orders",
        "n_returned",
        fround(F.col("n_returned") / F.col("n_orders"), 6).alias("return_rate"),
        fround(
            (F.col("n_returned") / F.col("n_orders"))
            / (F.col("tr") / F.col("tn")),
            4,
        ).alias("lift"),
    )


_O_CUTS = ", ".join(
    f"quantile_cont(o_totalprice, {q / 10.0}) AS c{q}" for q in range(1, 10)
)
_O_DEC = "1 + " + " + ".join(
    f"(CASE WHEN o_totalprice > c{q} THEN 1 ELSE 0 END)" for q in range(1, 10)
)

O_DECILE_LIFT = f"""
WITH cuts AS (
  SELECT {_O_CUTS} FROM orders
), returned AS (
  SELECT l_orderkey AS o_orderkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY 1
), binned AS (
  SELECT CAST({_O_DEC} AS BIGINT) AS decile, coalesce(ret, 0) AS ret
  FROM orders LEFT JOIN returned USING (o_orderkey) CROSS JOIN cuts
), per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(ret) AS BIGINT) AS n_returned
  FROM binned GROUP BY 1
), tot AS (
  SELECT sum(n_orders) AS tn, sum(n_returned) AS tr FROM per
)
SELECT decile, n_orders, n_returned,
       {o_fround("CAST(n_returned AS DOUBLE) / n_orders", 6)} AS return_rate,
       {o_fround("(CAST(n_returned AS DOUBLE) / n_orders) / (CAST(tr AS DOUBLE) / tn)", 4)} AS lift
FROM per CROSS JOIN tot
"""

QUERIES["decile_lift"] = q_decile_lift
ORACLES["decile_lift"] = O_DECILE_LIFT


# ------------------------------------------------- byte-level corpus audit

def q_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte/character profile: UTF-8 bytes-per-char and the
    non-ASCII character fraction — the cheap scan that tells you which
    sources are multibyte-heavy (CJK, emoji, mojibake) before sizing
    tokenizer throughput or storage. A source whose bytes_per_char
    jumps round-over-round usually changed encoding upstream.

    Plan (100 TB): entirely row-local expressions (octet_length,
    char length, ASCII-strip regexp) folded by one map-side-combined
    groupBy on source. Integer sums are exact BIGINTs; ratios divide
    them in identical double math.
    """
    t = tables(spark, sf_dir, "documents")
    nonascii = F.length(F.regexp_replace(F.col("text"), "[\\x00-\\x7F]", ""))
    return (
        t["documents"]
        .select(
            "source",
            F.octet_length("text").alias("nb"),
            F.length("text").alias("nc"),
            nonascii.alias("na"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("total_chars"),
            F.sum("nb").cast("long").alias("total_bytes"),
            fround(F.sum("nb") / F.sum("nc"), 4).alias("bytes_per_char"),
            fround(F.sum("na") / F.sum("nc"), 6).alias("nonascii_char_frac"),
        )
    )


O_BYTE_STATS = f"""
WITH per AS (
  SELECT source,
         strlen(text) AS nb,
         length(text) AS nc,
         length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS na
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS total_chars,
       CAST(sum(nb) AS BIGINT) AS total_bytes,
       {o_fround("CAST(sum(nb) AS DOUBLE) / sum(nc)", 4)} AS bytes_per_char,
       {o_fround("CAST(sum(na) AS DOUBLE) / sum(nc)", 6)} AS nonascii_char_frac
FROM per
GROUP BY source
"""

QUERIES["byte_stats"] = q_byte_stats
ORACLES["byte_stats"] = O_BYTE_STATS


# ------------------------------------------------- shipping latency SLA

def q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles (p50/p90/p99 days) per order
    priority — the SLA view of the fulfillment pipeline, and the query
    shape every latency dashboard runs (grouped tail percentiles over
    a fact-fact join).

    Plan (100 TB): lineitem joins orders on the orderkey — both sides
    shuffle-partition on the same key (co-located if the tables are
    bucketed by orderkey at write time, exchange-free then). The
    percentile aggregate's partial state is a value->count map over
    DISTINCT day-latencies (small ints), so map-side combine keeps the
    shuffle tiny; no global sort anywhere.
    """
    t = tables(spark, sf_dir, "orders", "lineitem")
    lat = t["lineitem"].join(
        t["orders"].select(
            F.col("o_orderkey").alias("l_orderkey"),
            "o_orderdate",
            "o_orderpriority",
        ),
        "l_orderkey",
    ).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "days"
        ),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        fround(F.percentile("days", 0.5), 4).alias("p50_days"),
        fround(F.percentile("days", 0.9), 4).alias("p90_days"),
        fround(F.percentile("days", 0.99), 4).alias("p99_days"),
    )


O_SHIP_LATENCY = f"""
WITH lat AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS days
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       {o_fround("quantile_cont(days, 0.5)", 4)} AS p50_days,
       {o_fround("quantile_cont(days, 0.9)", 4)} AS p90_days,
       {o_fround("quantile_cont(days, 0.99)", 4)} AS p99_days
FROM lat
GROUP BY o_orderpriority
"""

QUERIES["ship_latency"] = q_ship_latency
ORACLES["ship_latency"] = O_SHIP_LATENCY


# ------------------------------------------------------ cohort LTV

def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, per (cohort_month, month_offset) revenue and the running
    cumulative revenue along each cohort's life — the revenue twin of
    [cohort_retention]'s user-count matrix.

    Plan: one groupBy finds each customer's cohort month (partial agg,
    min combines map-side); the fact-side join shuffles on o_custkey
    once; the matrix aggregation is a second combiner-friendly groupBy.
    The cumulative window partitions by cohort_month over the ALREADY
    AGGREGATED matrix — partition size is bounded by the month span of
    the data (offsets), never by row count. Month arithmetic uses
    year*12+month deltas so both engines compute identical integers;
    revenue accumulates in DECIMAL (dsum) and the cumulative sum runs
    over those already-rounded 2-dp values in DECIMAL again, so the
    window's left-to-right order is the same exact sum in both engines.
    """
    t = tables(spark, sf_dir, "orders")
    o = t["orders"].select(
        "o_custkey",
        F.trunc("o_orderdate", "month").alias("month"),
        "o_totalprice",
    )
    cohort = o.groupBy("o_custkey").agg(F.min("month").alias("cohort_month"))
    months = (F.year("month") - F.year("cohort_month")) * 12 + (
        F.month("month") - F.month("cohort_month")
    )
    mat = (
        o.join(cohort, "o_custkey")
        .groupBy("cohort_month", months.cast("long").alias("month_offset"))
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_active"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return mat.withColumn(
        "cum_revenue",
        fround(F.sum(F.col("revenue").cast(DEC)).over(w).cast("double"), 2),
    ).orderBy("cohort_month", "month_offset")


O_COHORT_LTV = f"""
WITH o AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS month, o_totalprice FROM orders
),
cohort AS (SELECT o_custkey, min(month) AS cohort_month FROM o GROUP BY 1),
mat AS (
  SELECT cohort_month,
         CAST((year(month) - year(cohort_month)) * 12
              + (month(month) - month(cohort_month)) AS BIGINT) AS month_offset,
         CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
         {o_dsum("o_totalprice")} AS revenue
  FROM o JOIN cohort USING (o_custkey)
  GROUP BY 1, 2
)
SELECT cohort_month, month_offset, n_active, revenue,
       {o_fround('''CAST(sum(CAST(revenue AS DECIMAL(30,10)))
              OVER (PARTITION BY cohort_month ORDER BY month_offset) AS DOUBLE)''', 2)} AS cum_revenue
FROM mat ORDER BY cohort_month, month_offset
"""

QUERIES["cohort_ltv"] = q_cohort_ltv
ORACLES["cohort_ltv"] = O_COHORT_LTV


# ------------------------------------------------ time-decayed trends

def q_decayed_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity per event type (half-life
    7 days, anchored at the corpus max date): the trending score that
    weights today's events at 1 and last month's at ~0.05, plus each
    type's share of the total decayed mass — recency-weighted ranking
    without a cutoff cliff.

    Plan: the anchor date is a 1-row scalar frame (broadcast cross
    join, no driver action). groupBy(event_type, age_days) collapses
    the fact table FIRST — map-side combine, and the frame it emits is
    bounded by |types| x |days|, data-size-independent — so pow() runs
    once per (type, day) cell, not per event, and both engines call it
    on identical doubles from identical integer ages. Decayed sums then
    accumulate in DECIMAL over that tiny frame; the share denominator
    is a second 1-row broadcast. Rounding at 4 dp sits ~12 orders of
    magnitude above any last-ulp libm pow() divergence.
    """
    t = tables(spark, sf_dir, "events")
    ev = t["events"].select(F.to_date("ts").alias("day"), "event_type")
    anchor = ev.agg(F.max("day").alias("d0"))
    cells = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("event_type", F.datediff("d0", "day").cast("long").alias("age"))
        .agg(F.count("*").cast("double").alias("n"))
    )
    wgt = F.pow(F.lit(0.5), F.col("age").cast("double") / 7.0)
    per_type = cells.groupBy("event_type").agg(
        F.sum(F.col("n").cast("long")).alias("n_events"),
        F.sum((F.col("n") * wgt).cast(DEC)).alias("dec_mass"),
    )
    total = per_type.agg(F.sum("dec_mass").alias("tot"))
    return (
        per_type.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n_events",
            fround(F.col("dec_mass").cast("double"), 4).alias("decayed_count"),
            fround((F.col("dec_mass") / F.col("tot")).cast("double"), 6).alias("share"),
        )
        .orderBy("event_type")
    )


O_DECAYED_TRENDS = f"""
WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
anchor AS (SELECT max(day) AS d0 FROM ev),
cells AS (
  SELECT event_type, CAST(datediff('day', day, d0) AS BIGINT) AS age,
         CAST(count(*) AS DOUBLE) AS n
  FROM ev CROSS JOIN anchor GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, CAST(sum(CAST(n AS BIGINT)) AS BIGINT) AS n_events,
         sum(CAST(n * pow(0.5, CAST(age AS DOUBLE) / 7.0) AS DECIMAL(30,10))) AS dec_mass
  FROM cells GROUP BY 1
)
SELECT event_type, n_events,
       {o_fround("CAST(dec_mass AS DOUBLE)", 4)} AS decayed_count,
       {o_fround("CAST(dec_mass / (SELECT sum(dec_mass) FROM per_type) AS DOUBLE)", 6)} AS share
FROM per_type ORDER BY 1
"""

QUERIES["decayed_trends"] = q_decayed_trends
ORACLES["decayed_trends"] = O_DECAYED_TRENDS


# ------------------------------------------ frequent 3-itemsets

def q_copurchase_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most co-purchased part TRIPLES — the size-3 extension of
    [copurchase_pairs], with the Apriori pruning that makes itemset
    mining survive scale: an item that appears in fewer than
    ``min_item_support`` baskets cannot be in any frequent triple, so
    the semi-join prefilter shrinks every basket BEFORE the O(k^3)
    per-basket enumeration.

    Plan: distinct (order, part) first (partial-agg dedup); item
    supports are one combiner-friendly groupBy; the prefilter is a
    semi join on part id (ids-only shuffle — at 100 TB the frequent-
    item set is still per-part-bounded, NOT broadcast, per the r5
    broadcast-side advice). The triple enumeration self-joins the
    filtered baskets twice on the order key with a < b < c, so each
    basket of size k emits C(k,3) rows and nothing is corpus-
    quadratic; the count groupBy partial-aggregates and a
    deterministic (n desc, a, b, c) top-20 closes it. Whale baskets
    above :data:`MAX_BASKET_ITEMS` are dropped before the C(k,3)
    enumeration (cap applied AFTER the Apriori prefilter, so a basket
    is judged on its frequent-item size).
    """
    t = tables(spark, sf_dir, "lineitem")
    items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 3)
        .select("l_partkey")
    )
    fitems = _cap_baskets(items.join(freq, "l_partkey", "semi"), "l_orderkey")
    a = fitems.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = fitems.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    c = fitems.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pc"))
    triples = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .join(c, "ok")
        .filter(F.col("pb") < F.col("pc"))
    )
    return (
        triples.groupBy("pa", "pb", "pc")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "pa", "pb", "pc")
        .limit(20)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("pc").alias("part_c"),
            "n_orders",
        )
    )


O_COPURCHASE_TRIPLES = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
freq AS (
  SELECT l_partkey FROM items GROUP BY 1 HAVING count(*) >= 3
),
f AS (
  -- mirror MAX_BASKET_ITEMS: Spark caps AFTER the frequent-item semi join
  SELECT l_orderkey, l_partkey
  FROM items WHERE l_partkey IN (SELECT l_partkey FROM freq)
  QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= {MAX_BASKET_ITEMS}
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, c.l_partkey AS part_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM f a
JOIN f b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN f c ON b.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY 1, 2, 3
ORDER BY n_orders DESC, part_a, part_b, part_c
LIMIT 20
"""

QUERIES["copurchase_triples"] = q_copurchase_triples
ORACLES["copurchase_triples"] = O_COPURCHASE_TRIPLES


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules A -> B over order baskets with the
    full Agrawal-Srikant metric set: support, confidence, lift, and
    conviction — the step after [q_copurchase_pairs]'s undirected
    counts that a recommender or store-layout pipeline actually
    consumes. Top-50 rules by confidence.

    Exactness: every metric is a single division of exact integer
    products (n_both*N / n_a*n_b etc.), so both engines produce the
    identical IEEE double before the portable rounding; conviction is
    NULL when confidence = 1 (division by zero) in both.

    Plan (100 TB): ordered-pair fan-out is O(k²) per basket, never
    corpus-quadratic; min-support (>= 2, matching the co-purchase graph) HAVING prunes the pair tail before
    the metric joins; per-part support frames stream on the part key
    (|parts|-sized — NOT broadcast); the 1-row basket total cross-
    joins broadcast. Whale baskets above :data:`MAX_BASKET_ITEMS`
    are dropped before the fan-out."""
    t = tables(spark, sf_dir, "lineitem")
    items = _cap_baskets(
        t["lineitem"].select("l_orderkey", "l_partkey").distinct(), "l_orderkey"
    )
    a, b = items.alias("a"), items.alias("b")
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    support = items.groupBy("l_partkey").agg(F.count("*").cast("long").alias("n_part"))
    total = items.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    scored = (
        co.join(support.select(F.col("l_partkey").alias("antecedent"), F.col("n_part").alias("n_ante")), "antecedent")
        .join(support.select(F.col("l_partkey").alias("consequent"), F.col("n_part").alias("n_cons")), "consequent")
        .crossJoin(F.broadcast(total))
    )
    conf = F.col("n_both") / F.col("n_ante")
    return (
        scored.select(
            "antecedent",
            "consequent",
            "n_both",
            "n_ante",
            "n_cons",
            fround(F.col("n_both") / F.col("n_orders"), 6).alias("support"),
            fround(conf, 6).alias("confidence"),
            fround(
                (F.col("n_both") * F.col("n_orders"))
                / (F.col("n_ante") * F.col("n_cons")).cast("double"),
                6,
            ).alias("lift"),
            F.when(
                F.col("n_both") < F.col("n_ante"),
                fround(
                    ((F.col("n_orders") - F.col("n_cons")) * F.col("n_ante"))
                    / (F.col("n_orders") * (F.col("n_ante") - F.col("n_both"))).cast("double"),
                    6,
                ),
            ).alias("conviction"),
        )
        .orderBy(F.desc("confidence"), F.desc("lift"), "antecedent", "consequent")
        .limit(50)
    )


O_ASSOC_RULES = f"""
WITH items AS (
  -- mirror MAX_BASKET_ITEMS: Spark drops whale baskets before the fan-out
  SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= {MAX_BASKET_ITEMS}
),
co AS (
  SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
         CAST(count(*) AS BIGINT) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
support AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part FROM items GROUP BY 1),
total AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items)
SELECT antecedent, consequent, n_both,
       sa.n_part AS n_ante, sc.n_part AS n_cons,
       {o_fround("n_both / CAST(n_orders AS DOUBLE)", 6)} AS support,
       {o_fround("n_both / CAST(sa.n_part AS DOUBLE)", 6)} AS confidence,
       {o_fround("(n_both * n_orders) / CAST(sa.n_part * sc.n_part AS DOUBLE)", 6)} AS lift,
       CASE WHEN n_both < sa.n_part THEN
         {o_fround("((n_orders - sc.n_part) * sa.n_part) / CAST(n_orders * (sa.n_part - n_both) AS DOUBLE)", 6)}
       END AS conviction
FROM co
JOIN support sa ON sa.l_partkey = antecedent
JOIN support sc ON sc.l_partkey = consequent
CROSS JOIN total
ORDER BY confidence DESC, lift DESC, antecedent, consequent
LIMIT 50
"""

QUERIES["assoc_rules"] = q_assoc_rules
ORACLES["assoc_rules"] = O_ASSOC_RULES


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding + Information Value of the
    customer-nation feature against the order-returned outcome — the
    credit-scoring feature transform (WOE = ln(p_event/p_nonevent)
    per category, IV = sum (p_e - p_ne) * WOE) that turns a
    categorical into a monotone risk score; IV bands gate feature
    selection (<0.02 useless, >0.3 strong).

    Laplace +1 smoothing on both counts keeps empty cells finite in
    both engines; ln() on identical doubles is libm-portable.

    Plan (100 TB): outcome collapses to order grain map-side, ONE
    groupBy to |nations| cells, two broadcast scalar totals — no
    sort, no self-join."""
    t = tables(spark, sf_dir, "orders", "lineitem", "customer")
    returned = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret"))
    )
    base = (
        t["orders"]
        .join(returned, "o_orderkey", "left")
        .na.fill({"ret": 0})
        .join(
            t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
            "o_custkey",
        )
    )
    cells = base.groupBy("c_nationkey").agg(
        F.sum("ret").cast("long").alias("n_event"),
        F.sum(1 - F.col("ret")).cast("long").alias("n_nonevent"),
    )
    tot = cells.agg(
        F.sum("n_event").cast("long").alias("t_e"),
        F.sum("n_nonevent").cast("long").alias("t_ne"),
        F.count("*").cast("long").alias("n_cats"),
    )
    p_e = (F.col("n_event") + 1) / (F.col("t_e") + F.col("n_cats"))
    p_ne = (F.col("n_nonevent") + 1) / (F.col("t_ne") + F.col("n_cats"))
    woe = F.log(p_e / p_ne)
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "n_event",
        "n_nonevent",
        fround(woe, 6).alias("woe"),
        ((p_e - p_ne) * woe).alias("iv_term"),
    )
    iv = scored.agg(
        fround(F.sum(F.col("iv_term").cast(DEC)).cast("double"), 6).alias("iv")
    )
    return (
        scored.crossJoin(F.broadcast(iv))
        .select("c_nationkey", "n_event", "n_nonevent", "woe", "iv")
        .orderBy("c_nationkey")
    )


O_WOE_IV = f"""
WITH returned AS (
  SELECT l_orderkey AS o_orderkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY 1
),
base AS (
  SELECT c_nationkey, coalesce(ret, 0) AS ret
  FROM orders
  LEFT JOIN returned USING (o_orderkey)
  JOIN customer ON c_custkey = o_custkey
),
cells AS (
  SELECT c_nationkey,
         CAST(sum(ret) AS BIGINT) AS n_event,
         CAST(sum(1 - ret) AS BIGINT) AS n_nonevent
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_event) AS BIGINT) AS t_e,
         CAST(sum(n_nonevent) AS BIGINT) AS t_ne,
         CAST(count(*) AS BIGINT) AS n_cats
  FROM cells
),
scored AS (
  SELECT c_nationkey, n_event, n_nonevent,
         {o_fround("ln(((n_event + 1) / CAST(t_e + n_cats AS DOUBLE)) / ((n_nonevent + 1) / CAST(t_ne + n_cats AS DOUBLE)))", 6)} AS woe,
         (((n_event + 1) / CAST(t_e + n_cats AS DOUBLE)) - ((n_nonevent + 1) / CAST(t_ne + n_cats AS DOUBLE)))
           * ln(((n_event + 1) / CAST(t_e + n_cats AS DOUBLE)) / ((n_nonevent + 1) / CAST(t_ne + n_cats AS DOUBLE))) AS iv_term
  FROM cells CROSS JOIN tot
),
iv AS (SELECT {o_fround("CAST(sum(CAST(iv_term AS DECIMAL(30,10))) AS DOUBLE)", 6)} AS iv FROM scored)
SELECT c_nationkey, n_event, n_nonevent, woe, iv
FROM scored CROSS JOIN iv
ORDER BY c_nationkey
"""

QUERIES["woe_iv"] = q_woe_iv
ORACLES["woe_iv"] = O_WOE_IV


def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength per event type: the fraction
    of daily-count variance explained by the day-of-week means
    (between-group SS over total SS — one-way ANOVA R²) — the single
    number that says whether a weekly seasonal model is worth
    fitting ([q_seasonal_decompose] then extracts it).

    Exactness: daily counts are integers; all sums of squares
    accumulate in DECIMAL from integer products, so both engines get
    identical doubles before the one division. Day-of-week is the
    portable datediff-mod-7 form.

    Plan (100 TB): events collapse to the (type, day) count frame
    FIRST (partial-aggregable); everything after rides |types| x
    |days| rows."""
    t = tables(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy(
            "event_type",
            F.to_date("ts").alias("d"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn(
            "dow",
            F.pmod(F.datediff(F.col("d"), F.lit("1970-01-05").cast("date")), F.lit(7)).cast("int"),
        )
    )
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("n").cast(DEC)).cast("double").alias("s"),
        F.sum((F.col("n") * F.col("n")).cast(DEC)).cast("double").alias("ss"),
    )
    per_type = per_dow.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("n_days"),
        F.sum(F.col("s").cast(DEC)).cast("double").alias("st"),
        F.sum(F.col("ss").cast(DEC)).cast("double").alias("sst"),
        F.sum((F.col("s") * F.col("s") / F.col("k")).cast(DEC)).cast("double").alias("sb_raw"),
    )
    ss_total = F.col("sst") - F.col("st") * F.col("st") / F.col("n_days")
    ss_between = F.col("sb_raw") - F.col("st") * F.col("st") / F.col("n_days")
    return per_type.select(
        "event_type",
        "n_days",
        fround(ss_between / ss_total, 6).alias("seasonality_r2"),
    ).orderBy("event_type")


O_SEASONALITY_STRENGTH = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
dowd AS (
  SELECT event_type, n,
         CAST((datediff('day', DATE '1970-01-05', d) % 7 + 7) % 7 AS INTEGER) AS dow
  FROM daily
),
per_dow AS (
  SELECT event_type, dow,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(n AS DECIMAL(30,10))) AS DOUBLE) AS s,
         CAST(sum(CAST(n * n AS DECIMAL(30,10))) AS DOUBLE) AS ss
  FROM dowd GROUP BY 1, 2
),
per_type AS (
  SELECT event_type,
         CAST(sum(k) AS BIGINT) AS n_days,
         CAST(sum(CAST(s AS DECIMAL(30,10))) AS DOUBLE) AS st,
         CAST(sum(CAST(ss AS DECIMAL(30,10))) AS DOUBLE) AS sst,
         CAST(sum(CAST(s * s / k AS DECIMAL(30,10))) AS DOUBLE) AS sb_raw
  FROM per_dow GROUP BY 1
)
SELECT event_type, n_days,
       {o_fround("(sb_raw - st * st / n_days) / (sst - st * st / n_days)", 6)} AS seasonality_r2
FROM per_type ORDER BY event_type
"""

QUERIES["seasonality_strength"] = q_seasonality_strength
ORACLES["seasonality_strength"] = O_SEASONALITY_STRENGTH


def q_repeat_purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per market segment: day gaps between a
    customer's consecutive orders, summarized as count / mean /
    median / p90 — the reorder-cycle table that calibrates churn
    windows and replenishment nudges.

    Exactness: gaps are integer days from a per-customer lag window
    ((date, orderkey) order); mean divides a DECIMAL sum; the
    percentiles use the interpolated-percentile pair proven
    hash-portable by key_skew_audit (F.percentile == quantile_cont
    on integer inputs).

    Plan (100 TB): one shuffle on o_custkey for the lag window, one
    |segments|-row aggregate; percentile partials ride the distinct
    gap-value counts, never a global sort."""
    t = tables(spark, sf_dir, "orders", "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        t["orders"]
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn(
            "gap_days",
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
            ),
        )
        .filter(F.col("gap_days").isNotNull())
        .join(
            t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
            "o_custkey",
        )
    )
    return (
        gaps.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            fround(
                F.sum(F.col("gap_days").cast(DEC)).cast("double") / F.count("*"), 4
            ).alias("avg_gap_days"),
            fround(F.percentile("gap_days", 0.5), 4).alias("median_gap_days"),
            fround(F.percentile("gap_days", 0.9), 4).alias("p90_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


O_REPEAT_PURCHASE_GAPS = f"""
WITH gaps AS (
  SELECT o_custkey,
         datediff('day',
                  CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
                  CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
),
j AS (
  SELECT c_mktsegment, gap_days
  FROM gaps JOIN customer ON c_custkey = o_custkey
  WHERE gap_days IS NOT NULL
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_gaps,
       {o_fround("CAST(sum(CAST(gap_days AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS avg_gap_days,
       {o_fround("quantile_cont(gap_days, 0.5)", 4)} AS median_gap_days,
       {o_fround("quantile_cont(gap_days, 0.9)", 4)} AS p90_gap_days
FROM j GROUP BY 1 ORDER BY 1
"""

QUERIES["repeat_purchase_gaps"] = q_repeat_purchase_gaps
ORACLES["repeat_purchase_gaps"] = O_REPEAT_PURCHASE_GAPS


def q_brand_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue-share movers between the first and second halves
    of the order-date range: share in each half (decimal-exact
    revenue sums) and the top-15 absolute shifts — the 'what changed'
    BI readout next to [q_period_over_period]'s absolute deltas.

    Plan (100 TB): one 1-row midpoint broadcast, one conditional-
    aggregate scan to |brands| cells, two broadcast half-totals; the
    top-15 is a TakeOrdered with full tiebreaks. BOTH engines rank on
    the 6-dp-ROUNDED shift (the oracle's ORDER BY wraps the same
    portable rounding), so the rank-15/16 cut can't diverge when two
    raw shifts round to the same value."""
    t = tables(spark, sf_dir, "lineitem", "orders", "part")
    rng = t["orders"].agg(
        ((F.min(F.unix_micros("o_orderdate")) + F.max(F.unix_micros("o_orderdate"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    li = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .crossJoin(F.broadcast(rng))
    )
    in_a = F.unix_micros("o_orderdate") < F.col("mid_us")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cells = li.groupBy("p_brand").agg(
        F.sum(F.when(in_a, rev).otherwise(F.lit(None)).cast(DEC)).cast("double").alias("rev_a"),
        F.sum(F.when(~in_a, rev).otherwise(F.lit(None)).cast(DEC)).cast("double").alias("rev_b"),
    ).na.fill({"rev_a": 0.0, "rev_b": 0.0})
    tot = cells.agg(
        F.sum(F.col("rev_a").cast(DEC)).cast("double").alias("t_a"),
        F.sum(F.col("rev_b").cast(DEC)).cast("double").alias("t_b"),
    )
    shared = cells.crossJoin(F.broadcast(tot)).select(
        "p_brand",
        fround(F.col("rev_a") / F.col("t_a"), 6).alias("share_a"),
        fround(F.col("rev_b") / F.col("t_b"), 6).alias("share_b"),
        fround(F.col("rev_b") / F.col("t_b") - F.col("rev_a") / F.col("t_a"), 6).alias("share_shift"),
    )
    return shared.orderBy(
        F.desc(F.abs(F.col("share_shift"))), "p_brand"
    ).limit(15)


O_BRAND_SHARE_SHIFT = f"""
WITH rng AS (
  SELECT CAST(floor((min(epoch_us(o_orderdate)) + max(epoch_us(o_orderdate))) / 2) AS BIGINT) AS mid_us
  FROM orders
),
cells AS (
  SELECT p_brand,
         coalesce(CAST(sum(CASE WHEN epoch_us(o_orderdate) < mid_us
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)) END) AS DOUBLE), 0.0) AS rev_a,
         coalesce(CAST(sum(CASE WHEN epoch_us(o_orderdate) >= mid_us
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)) END) AS DOUBLE), 0.0) AS rev_b
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON p_partkey = l_partkey
  CROSS JOIN rng
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(CAST(rev_a AS DECIMAL(30,10))) AS DOUBLE) AS t_a,
         CAST(sum(CAST(rev_b AS DECIMAL(30,10))) AS DOUBLE) AS t_b
  FROM cells
)
SELECT p_brand,
       {o_fround("rev_a / t_a", 6)} AS share_a,
       {o_fround("rev_b / t_b", 6)} AS share_b,
       {o_fround("rev_b / t_b - rev_a / t_a", 6)} AS share_shift
FROM cells CROSS JOIN tot
ORDER BY abs({o_fround("rev_b / t_b - rev_a / t_a", 6)}) DESC, p_brand
LIMIT 15
"""

QUERIES["brand_share_shift"] = q_brand_share_shift
ORACLES["brand_share_shift"] = O_BRAND_SHARE_SHIFT


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation: the Herfindahl-
    Hirschman index (sum of squared revenue shares, x10000 as
    antitrust convention) plus supplier count and top-supplier share
    — the supply-risk screen ([q_gini_concentration] is the customer-
    side sibling with a different inequality metric).

    Exactness: per-supplier revenue folds in DECIMAL; shares and the
    squared-share sum reuse the decimal-fold; HHI bands are integer
    thresholds on the rounded value.

    Plan (100 TB): one (nation, supplier) partial agg, one
    |nations|-row reduce — the squared-share sum needs the nation
    total first, carried by a broadcast-size join on nation."""
    t = tables(spark, sf_dir, "lineitem", "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per = (
        t["lineitem"]
        .join(
            t["supplier"].select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"),
            "l_suppkey",
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(rev.cast(DEC)).cast("double").alias("rev"))
    )
    tot = per.groupBy("s_nationkey").agg(
        F.sum(F.col("rev").cast(DEC)).cast("double").alias("t_rev"),
        F.count("*").cast("long").alias("n_suppliers"),
    )
    j = per.join(tot, "s_nationkey")
    share = F.col("rev") / F.col("t_rev")
    return (
        j.groupBy("s_nationkey")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            fround(F.sum((share * share).cast(DEC)).cast("double") * 10000, 2).alias("hhi"),
            fround(F.max(share), 6).alias("top_share"),
        )
        .withColumn(
            "band",
            F.when(F.col("hhi") < 1500, F.lit("competitive"))
            .when(F.col("hhi") < 2500, F.lit("moderate"))
            .otherwise(F.lit("concentrated")),
        )
        .orderBy("s_nationkey")
    )


O_SUPPLIER_HHI = f"""
WITH per AS (
  SELECT s_nationkey, l_suppkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE) AS rev
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY 1, 2
),
tot AS (
  SELECT s_nationkey,
         CAST(sum(CAST(rev AS DECIMAL(30,10))) AS DOUBLE) AS t_rev,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM per GROUP BY 1
),
hhi AS (
  SELECT per.s_nationkey,
         max(n_suppliers) AS n_suppliers,
         {o_fround("CAST(sum(CAST((rev / t_rev) * (rev / t_rev) AS DECIMAL(30,10))) AS DOUBLE) * 10000", 2)} AS hhi,
         {o_fround("max(rev / t_rev)", 6)} AS top_share
  FROM per JOIN tot USING (s_nationkey)
  GROUP BY 1
)
SELECT s_nationkey, n_suppliers, hhi, top_share,
       CASE WHEN hhi < 1500 THEN 'competitive'
            WHEN hhi < 2500 THEN 'moderate'
            ELSE 'concentrated' END AS band
FROM hhi ORDER BY s_nationkey
"""

QUERIES["supplier_hhi"] = q_supplier_hhi
ORACLES["supplier_hhi"] = O_SUPPLIER_HHI


def q_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order basket-size histogram: per distinct-item count k, how
    many orders, their share of all orders, and the decimal-exact
    average order total — the shape parameter every co-purchase /
    recommender query in this module implicitly depends on (and the
    empirical justification for :data:`MAX_BASKET_ITEMS`).

    Plan (100 TB): distinct (order, part) collapses map-side, one
    |orders|-row count groupBy, one |sizes|-row histogram groupBy;
    order totals join on the order key (ids + one double). The 1-row
    total broadcast-cross-joins for the share."""
    t = tables(spark, sf_dir, "lineitem", "orders")
    sizes = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count("*").cast("long").alias("basket_size"))
        .join(
            t["orders"].select(
                F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
            ),
            "l_orderkey",
        )
    )
    tot = sizes.agg(F.count("*").cast("long").alias("n_total"))
    return (
        sizes.groupBy("basket_size")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            davg(F.col("o_totalprice"), 4).alias("avg_order_total"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "basket_size",
            "n_orders",
            fround(F.col("n_orders") / F.col("n_total"), 6).alias("order_share"),
            "avg_order_total",
        )
        .orderBy("basket_size")
    )


O_BASKET_SIZE_DISTRIBUTION = f"""
WITH sizes AS (
  SELECT l_orderkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS basket_size
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT basket_size, o_totalprice
  FROM sizes JOIN orders ON l_orderkey = o_orderkey
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM j)
SELECT basket_size,
       CAST(count(*) AS BIGINT) AS n_orders,
       {o_fround("count(*) / CAST(n_total AS DOUBLE)", 6)} AS order_share,
       {o_davg("o_totalprice", 4)} AS avg_order_total
FROM j CROSS JOIN tot
GROUP BY basket_size, n_total ORDER BY basket_size
"""

QUERIES["basket_size_distribution"] = q_basket_size_distribution
ORACLES["basket_size_distribution"] = O_BASKET_SIZE_DISTRIBUTION


def q_duplicate_invoice_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice screen: pairs of orders by the SAME customer
    with the IDENTICAL total price within 7 days of each other — the
    finance-ops dedup audit (double-billing / replayed feed), the
    money-domain cousin of [q_dedup_exact].

    Plan (100 TB): equi-join on (custkey, totalprice) — the candidate
    space is bounded by exact-amount repeats per customer (never
    corpus-quadratic), and the 7-day predicate prunes the tail before
    anything aggregates. Output is the full pair list with the gap in
    days, deterministically ordered."""
    t = tables(spark, sf_dir, "orders")
    o = t["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.unix_micros("o_orderdate").alias("od_us"),
    )
    a, b = o.alias("a"), o.alias("b")
    day_us = 86_400_000_000
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_totalprice") == F.col("b.o_totalprice"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(
            F.abs(F.col("a.od_us") - F.col("b.od_us")) <= F.lit(7 * day_us)
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            F.col("a.o_totalprice").alias("totalprice"),
            (F.abs(F.col("a.od_us") - F.col("b.od_us")) / F.lit(day_us))
            .cast("double")
            .alias("gap_days"),
        )
        .withColumn("gap_days", fround(F.col("gap_days"), 6))
        .orderBy("custkey", "order_a", "order_b")
    )


O_DUPLICATE_INVOICE_DETECTION = f"""
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS order_a,
       b.o_orderkey AS order_b,
       a.o_totalprice AS totalprice,
       {o_fround("abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate)) / CAST(86400000000 AS DOUBLE)", 6)} AS gap_days
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_totalprice = b.o_totalprice
 AND a.o_orderkey < b.o_orderkey
WHERE abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate)) <= 7 * 86400000000
ORDER BY custkey, order_a, order_b
"""

QUERIES["duplicate_invoice_detection"] = q_duplicate_invoice_detection
ORACLES["duplicate_invoice_detection"] = O_DUPLICATE_INVOICE_DETECTION


def q_supplier_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier pricing-anomaly screen: per (part, supplier), the mean
    unit price (extendedprice / quantity, decimal-exact mean) against
    the part's exact median unit price across all suppliers; top-20
    by absolute log price ratio — the procurement-audit cousin of
    [q_mad_stats] (which flags rows; this flags SUPPLIERS).

    Parts with a single supplier-price row are excluded (their ratio
    is identically 1). percentile == quantile_cont on identical
    doubles (proven portable in key_skew_audit).

    Plan (100 TB): unit price is row-local; per-(part,supp) means and
    per-part medians are two partial-aggregable groupBys; the stats
    join streams on the part key (|parts|-sized, NOT broadcast). The
    top-20 is a TakeOrdered with the rounded key + full tiebreaks."""
    t = tables(spark, sf_dir, "lineitem")
    up = t["lineitem"].select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    per_supp = up.groupBy("l_partkey", "l_suppkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        (F.sum(F.col("unit_price").cast(DEC)).cast("double") / F.count("*")).alias(
            "avg_up_raw"
        ),
    )
    per_part = up.groupBy("l_partkey").agg(
        F.percentile("unit_price", F.lit(0.5)).alias("med_up_raw"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
    )
    j = per_supp.join(per_part, "l_partkey").filter(F.col("n_supps") > 1)
    ratio_r = fround(F.col("avg_up_raw") / F.col("med_up_raw"), 6)
    return (
        j.select(
            "l_partkey",
            "l_suppkey",
            "n_lines",
            fround(F.col("avg_up_raw"), 4).alias("avg_unit_price"),
            fround(F.col("med_up_raw"), 4).alias("part_median_price"),
            ratio_r.alias("price_ratio"),
        )
        .orderBy(
            F.desc(F.abs(F.log(F.col("price_ratio")))),
            "l_partkey",
            "l_suppkey",
        )
        .limit(20)
    )


O_SUPPLIER_PRICE_OUTLIERS = f"""
WITH up AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
),
per_supp AS (
  SELECT l_partkey, l_suppkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(unit_price AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS avg_up_raw
  FROM up GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey,
         quantile_cont(unit_price, 0.5) AS med_up_raw,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
  FROM up GROUP BY 1
)
SELECT l_partkey, l_suppkey, n_lines,
       {o_fround("avg_up_raw", 4)} AS avg_unit_price,
       {o_fround("med_up_raw", 4)} AS part_median_price,
       {o_fround("avg_up_raw / med_up_raw", 6)} AS price_ratio
FROM per_supp JOIN per_part USING (l_partkey)
WHERE n_supps > 1
ORDER BY abs(ln({o_fround("avg_up_raw / med_up_raw", 6)})) DESC, l_partkey, l_suppkey
LIMIT 20
"""

QUERIES["supplier_price_outliers"] = q_supplier_price_outliers
ORACLES["supplier_price_outliers"] = O_SUPPLIER_PRICE_OUTLIERS


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full supplier-nation x customer-nation revenue flow matrix —
    the generalization of [q_volume_shipping] (TPC-H Q7 fixes two
    nations; BI wants the whole matrix plus each cell's share of the
    exporting nation's revenue).

    Plan (100 TB): lineitem joins orders on the order key (the one
    big shuffle), then ids-only supplier/customer bridges to the two
    25-row nation dims (broadcast); the matrix aggregation is
    |nations|² cells, partial-aggregated map-side. The per-exporter
    share joins the cell frame to its own |nations|-row rollup."""
    t = tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flows = (
        t["lineitem"]
        .join(
            t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(t["supplier"].select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"), "l_suppkey")
        .join(t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"), "o_custkey")
        .join(F.broadcast(n1), "s_nationkey")
        .join(F.broadcast(n2), "c_nationkey")
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            dsum(rev, 2).alias("revenue"),
        )
    )
    exp_tot = flows.groupBy("supp_nation").agg(
        F.sum(F.col("revenue").cast(DEC)).cast("double").alias("exp_revenue")
    )
    return (
        flows.join(exp_tot, "supp_nation")
        .select(
            "supp_nation",
            "cust_nation",
            "n_lines",
            "revenue",
            fround(F.col("revenue") / F.col("exp_revenue"), 6).alias("exp_share"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


O_NATION_TRADE_BALANCE = f"""
WITH flows AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(count(*) AS BIGINT) AS n_lines,
         {o_dsum("l_extendedprice * (1 - l_discount)", 2)} AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  GROUP BY 1, 2
),
exp_tot AS (
  SELECT supp_nation,
         CAST(sum(CAST(revenue AS DECIMAL(30,10))) AS DOUBLE) AS exp_revenue
  FROM flows GROUP BY 1
)
SELECT supp_nation, cust_nation, n_lines, revenue,
       {o_fround("revenue / exp_revenue", 6)} AS exp_share
FROM flows JOIN exp_tot USING (supp_nation)
ORDER BY supp_nation, cust_nation
"""

QUERIES["nation_trade_balance"] = q_nation_trade_balance
ORACLES["nation_trade_balance"] = O_NATION_TRADE_BALANCE


def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-response screen per brand: the OLS slope (and fit) of
    quantity on discount — does a deeper discount move more units of
    this brand? The pricing-team readout next to [q_promo_revenue]'s
    revenue split. Positive slope = discount-responsive.

    Exactness: the co-moment form slope = (n·Sxy − Sx·Sy) /
    (n·Sxx − Sx²) over decimal-folded sums — every operand
    engine-identical; r² from the same sums.

    Plan (100 TB): one part-key join for the brand, ONE
    partial-aggregable groupBy to |brands| cells; the regression is
    row-local arithmetic on the cell frame."""
    t = tables(spark, sf_dir, "lineitem", "part")
    x, y = F.col("l_discount"), F.col("l_quantity")
    cells = (
        t["lineitem"]
        .join(t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand"), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(x.cast(DEC)).alias("sx"),
            F.sum(y.cast(DEC)).alias("sy"),
            F.sum((x * y).cast(DEC)).alias("sxy"),
            F.sum((x * x).cast(DEC)).alias("sxx"),
            F.sum((y * y).cast(DEC)).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return cells.select(
        "p_brand",
        "n",
        fround(cov_n / var_x, 6).alias("slope"),
        fround(sy / n - (cov_n / var_x) * (sx / n), 6).alias("intercept"),
        fround((cov_n * cov_n) / (var_x * var_y), 6).alias("r2"),
    ).orderBy("p_brand")


O_PRICE_ELASTICITY = f"""
WITH cells AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_discount * l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(l_discount * l_discount AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS syy
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT p_brand, n,
       {o_fround("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS slope,
       {o_fround("sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n)", 6)} AS intercept,
       {o_fround("pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS r2
FROM cells ORDER BY p_brand
"""

QUERIES["price_elasticity"] = q_price_elasticity
ORACLES["price_elasticity"] = O_PRICE_ELASTICITY


def q_customer_churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn audit per nation: customers whose LAST order is more than
    365 days before the newest order anywhere (the data-derived
    anchor — reproducible, no wall clock), plus never-ordered
    customers, and the combined at-risk rate — the lifecycle readout
    next to [q_new_vs_returning]'s acquisition view.

    Plan (100 TB): per-customer last-order is one partial-aggregable
    groupBy; the 1-row anchor broadcast-cross-joins; customers LEFT
    join that |customers|-row frame on the customer key (ids only) so
    never-ordered rows survive; one |nations|-row aggregate ends it."""
    t = tables(spark, sf_dir, "orders", "customer", "nation")
    last = t["orders"].groupBy("o_custkey").agg(
        F.max(F.unix_micros("o_orderdate")).alias("last_us")
    )
    anchor = t["orders"].agg(F.max(F.unix_micros("o_orderdate")).alias("anchor_us"))
    year_us = 365 * 86_400_000_000
    j = (
        t["customer"]
        .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
        .join(last, "o_custkey", "left")
        .crossJoin(F.broadcast(anchor))
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
    )
    churned = (F.col("last_us").isNotNull()) & (
        F.col("anchor_us") - F.col("last_us") > year_us
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(F.when(F.col("last_us").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_never_ordered"),
            F.sum(F.when(churned, 1).otherwise(0)).cast("long").alias("n_churned"),
        )
        .select(
            "n_name",
            "n_customers",
            "n_never_ordered",
            "n_churned",
            fround(
                (F.col("n_never_ordered") + F.col("n_churned")) / F.col("n_customers"),
                6,
            ).alias("at_risk_rate"),
        )
        .orderBy("n_name")
    )


O_CUSTOMER_CHURN_FLAGS = f"""
WITH last AS (
  SELECT o_custkey, max(epoch_us(o_orderdate)) AS last_us
  FROM orders GROUP BY 1
),
anchor AS (SELECT max(epoch_us(o_orderdate)) AS anchor_us FROM orders),
j AS (
  SELECT n.n_name, l.last_us, a.anchor_us
  FROM customer c
  LEFT JOIN last l ON c.c_custkey = l.o_custkey
  CROSS JOIN anchor a
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN last_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_never_ordered,
       CAST(sum(CASE WHEN last_us IS NOT NULL AND anchor_us - last_us > 365 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       {o_fround("(sum(CASE WHEN last_us IS NULL THEN 1 ELSE 0 END) + sum(CASE WHEN last_us IS NOT NULL AND anchor_us - last_us > 365 * 86400000000 THEN 1 ELSE 0 END)) / CAST(count(*) AS DOUBLE)", 6)} AS at_risk_rate
FROM j GROUP BY 1 ORDER BY 1
"""

QUERIES["customer_churn_flags"] = q_customer_churn_flags
ORACLES["customer_churn_flags"] = O_CUSTOMER_CHURN_FLAGS


def q_supplier_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source-risk bands: per part, the share of shipped
    quantity held by its TOP supplier, banded into risk tiers — the
    procurement-resilience histogram next to
    [q_supplier_price_outliers]' pricing screen and [q_supplier_hhi]'s
    nation-level concentration.

    Exactness: quantities are exact decimal sums; the top share is an
    integer-exact max/sum ratio; band edges compare the ROUNDED share
    so the cut is engine-identical.

    Plan (100 TB): two partial-aggregable groupBys — (part, supp)
    quantities then per-part max/total via one more groupBy — and a
    |parts|-row banding projection into a <= 4-row histogram."""
    t = tables(spark, sf_dir, "lineitem")
    ps = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty")
    )
    per_part = ps.groupBy("l_partkey").agg(
        (F.max("qty").cast("double") / F.sum("qty").cast("double")).alias("top_share_raw"),
        F.count("*").cast("long").alias("n_supps"),
    )
    share = fround(F.col("top_share_raw"), 6)
    band = (
        F.when(share >= 0.999999, F.lit("single_source"))
        .when(share >= 0.75, F.lit("dominant"))
        .when(share >= 0.5, F.lit("majority"))
        .otherwise(F.lit("diversified"))
    )
    return (
        per_part.select(band.alias("risk_band"), "n_supps")
        .groupBy("risk_band")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            fround(F.avg("n_supps"), 4).alias("avg_suppliers"),
        )
        .orderBy("risk_band")
    )


O_SUPPLIER_DEPENDENCY = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(30,10))) AS qty
  FROM lineitem GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey,
         CAST(max(qty) AS DOUBLE) / CAST(sum(qty) AS DOUBLE) AS top_share_raw,
         CAST(count(*) AS BIGINT) AS n_supps
  FROM ps GROUP BY 1
),
banded AS (
  SELECT CASE WHEN {o_fround("top_share_raw", 6)} >= 0.999999 THEN 'single_source'
              WHEN {o_fround("top_share_raw", 6)} >= 0.75 THEN 'dominant'
              WHEN {o_fround("top_share_raw", 6)} >= 0.5 THEN 'majority'
              ELSE 'diversified' END AS risk_band,
         n_supps
  FROM per_part
)
SELECT risk_band,
       CAST(count(*) AS BIGINT) AS n_parts,
       {o_fround("avg(n_supps)", 4)} AS avg_suppliers
FROM banded GROUP BY 1 ORDER BY 1
"""

QUERIES["supplier_dependency"] = q_supplier_dependency
ORACLES["supplier_dependency"] = O_SUPPLIER_DEPENDENCY


def q_order_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly order-line backlog curve: lines placed (by order date)
    vs lines shipped (by ship date) per ISO week, with the running
    open-line backlog — the fulfillment-health time series next to
    [q_ship_latency]'s per-line latency distribution.

    date_trunc('week') cast to DATE is the proven engine-portable
    week key (both ISO Monday).

    Plan (100 TB): two partial-aggregable weekly count scans (placed
    needs the one order-key join), a full outer join on the ~weeks-
    sized key, and a cumsum window over the |weeks|-row frame —
    nothing row-level ever sorts."""
    t = tables(spark, sf_dir, "lineitem", "orders")
    li = t["lineitem"].join(
        t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
        "l_orderkey",
    )
    placed = li.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week")
    ).agg(F.count("*").cast("long").alias("placed"))
    shipped = t["lineitem"].groupBy(
        F.date_trunc("week", F.col("l_shipdate")).cast("date").alias("week")
    ).agg(F.count("*").cast("long").alias("shipped"))
    j = placed.join(shipped, "week", "full").fillna(0, subset=["placed", "shipped"])
    w = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    return (
        j.select(
            "week",
            "placed",
            "shipped",
            (F.sum("placed").over(w) - F.sum("shipped").over(w))
            .cast("long")
            .alias("backlog"),
        )
        .orderBy("week")
    )


O_ORDER_BACKLOG_CURVE = """
WITH placed AS (
  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
         CAST(count(*) AS BIGINT) AS placed
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
shipped AS (
  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
         CAST(count(*) AS BIGINT) AS shipped
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT coalesce(p.week, s.week) AS week,
         coalesce(placed, 0) AS placed,
         coalesce(shipped, 0) AS shipped
  FROM placed p FULL JOIN shipped s ON p.week = s.week
)
SELECT week, placed, shipped,
       CAST(sum(placed) OVER w - sum(shipped) OVER w AS BIGINT) AS backlog
FROM j
WINDOW w AS (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY week
"""

QUERIES["order_backlog_curve"] = q_order_backlog_curve
ORACLES["order_backlog_curve"] = O_ORDER_BACKLOG_CURVE


def q_weekly_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-volatility profile per nation: week-over-week growth
    rates on a GAP-FREE week spine (the [q_period_over_period]
    discipline at week grain), summarized as mean growth, growth
    stddev, and the worst single week — the risk column next to the
    trend dashboards.

    Weeks with zero prior revenue are excluded from growth stats
    (division by zero is not a growth rate) in both engines.

    Plan (100 TB): one (nation, week) revenue groupBy, a broadcast
    |weeks|-row spine cross join per nation for gap-freeness, one lag
    window over the |nations| x |weeks| aggregated frame, one final
    |nations|-row aggregate."""
    t = tables(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    weekly = (
        t["lineitem"]
        .join(
            t["orders"].select(
                F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_orderdate"
            ),
            "l_orderkey",
        )
        .join(
            t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
            "o_custkey",
        )
        .join(
            F.broadcast(
                t["nation"].select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
            ),
            "c_nationkey",
        )
        .groupBy(
            "n_name",
            F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week"),
        )
        .agg(F.sum(rev.cast(DEC)).cast("double").alias("wrev"))
    )
    bounds = weekly.agg(
        F.min("week").alias("w0"), F.max("week").alias("w1")
    )
    spine = (
        weekly.select("n_name")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "n_name",
            F.explode(F.sequence(F.col("w0"), F.col("w1"), F.expr("interval 7 days"))).alias("week"),
        )
    )
    filled = spine.join(weekly, ["n_name", "week"], "left").fillna(
        0.0, subset=["wrev"]
    )
    w = Window.partitionBy("n_name").orderBy("week")
    g = filled.withColumn("prev", F.lag("wrev").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("prev") > 0)
    ).withColumn("growth", F.col("wrev") / F.col("prev") - 1)
    return (
        g.groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_weeks"),
            fround(
                F.sum(F.col("growth").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("mean_growth"),
            fround(
                F.sqrt(
                    (
                        F.sum((F.col("growth") * F.col("growth")).cast(DEC)).cast("double")
                        - F.pow(F.sum(F.col("growth").cast(DEC)).cast("double"), 2)
                        / F.count("*")
                    )
                    / (F.count("*") - 1)
                ),
                6,
            ).alias("growth_std"),
            fround(F.min("growth"), 6).alias("worst_week"),
        )
        .orderBy("n_name")
    )


O_WEEKLY_VOLATILITY = f"""
WITH weekly AS (
  SELECT n_name, CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE) AS wrev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
bounds AS (SELECT min(week) AS w0, max(week) AS w1 FROM weekly),
spine AS (
  SELECT n_name, CAST(unnest(range(CAST(w0 AS TIMESTAMP), CAST(w1 AS TIMESTAMP) + INTERVAL 1 DAY, INTERVAL 7 DAY)) AS DATE) AS week
  FROM (SELECT DISTINCT n_name FROM weekly) CROSS JOIN bounds
),
filled AS (
  SELECT s.n_name, s.week, coalesce(w.wrev, 0.0) AS wrev
  FROM spine s LEFT JOIN weekly w ON s.n_name = w.n_name AND s.week = w.week
),
g AS (
  SELECT n_name, wrev / prev - 1 AS growth
  FROM (SELECT n_name, wrev,
               lag(wrev) OVER (PARTITION BY n_name ORDER BY week) AS prev
        FROM filled)
  WHERE prev IS NOT NULL AND prev > 0
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_weeks,
       {o_fround("CAST(sum(CAST(growth AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS mean_growth,
       {o_fround("sqrt((CAST(sum(CAST(growth * growth AS DECIMAL(30,10))) AS DOUBLE) - pow(CAST(sum(CAST(growth AS DECIMAL(30,10))) AS DOUBLE), 2) / count(*)) / (count(*) - 1))", 6)} AS growth_std,
       {o_fround("min(growth)", 6)} AS worst_week
FROM g GROUP BY 1 ORDER BY 1
"""

QUERIES["weekly_volatility"] = q_weekly_volatility
ORACLES["weekly_volatility"] = O_WEEKLY_VOLATILITY


def q_discount_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate by discount depth: per discount level, line count,
    returned-line rate, and average quantity — does discounting move
    units that come straight back? The margin-quality check next to
    [q_price_elasticity]'s volume slope.

    Discounts are a small discrete set in this schema, so the group
    key is the exact value — no binning ambiguity.

    Plan (100 TB): ONE conditional-aggregate scan to |discounts|
    cells. Nothing joins."""
    t = tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy(fround(F.col("l_discount"), 2).alias("discount"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
            davg(F.col("l_quantity"), 4).alias("avg_qty"),
        )
        .select(
            "discount",
            "n_lines",
            "n_returned",
            fround(F.col("n_returned") / F.col("n_lines"), 6).alias("return_rate"),
            "avg_qty",
        )
        .orderBy("discount")
    )


O_DISCOUNT_RETURN_RATE = f"""
SELECT {o_fround("l_discount", 2)} AS discount,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       {o_fround("sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)} AS return_rate,
       {o_davg("l_quantity", 4)} AS avg_qty
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["discount_return_rate"] = q_discount_return_rate
ORACLES["discount_return_rate"] = O_DISCOUNT_RETURN_RATE


def q_revenue_concentration_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 number per nation: how many customers — and what
    fraction of the customer base — fund 80% of the nation's revenue.
    [q_gini_concentration] scores the inequality; this is the
    operational headcount a sales team actually plans around.

    Determinism: customers rank by (spend desc, custkey asc) —
    decimal-exact spend, full tiebreak; the 80% threshold compares
    decimal-exact cumulative sums, so the cut row is engine-exact.

    Plan (100 TB): per-customer spend is one groupBy; the rank and
    running sum ride a window partitioned BY NATION (no global
    sort); the answer is one more |nations|-row aggregate."""
    t = tables(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    spend = (
        t["lineitem"]
        .join(
            t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
            "o_custkey",
        )
        .join(
            F.broadcast(
                t["nation"].select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
            ),
            "c_nationkey",
        )
        .groupBy("n_name", "o_custkey")
        .agg(F.sum(rev.cast(DEC)).alias("spend"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("spend"), F.asc("o_custkey"))
    wtot = Window.partitionBy("n_name")
    ranked = spend.select(
        "n_name",
        F.row_number().over(w).alias("rnk"),
        F.sum("spend").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("spend").over(wtot).alias("tot"),
        F.count("*").over(wtot).alias("n_cust"),
    )
    hit = ranked.filter(
        F.col("cum").cast("double") >= 0.8 * F.col("tot").cast("double")
    )
    return (
        hit.groupBy("n_name")
        .agg(
            F.min("rnk").cast("long").alias("n_top_customers"),
            F.first("n_cust").cast("long").alias("n_customers"),
        )
        .select(
            "n_name",
            "n_top_customers",
            "n_customers",
            fround(F.col("n_top_customers") / F.col("n_customers"), 6).alias(
                "top_frac"
            ),
        )
        .orderBy("n_name")
    )


O_REVENUE_CONCENTRATION_8020 = f"""
WITH spend AS (
  SELECT n_name, o_custkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS spend
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT n_name,
         row_number() OVER (PARTITION BY n_name ORDER BY spend DESC, o_custkey) AS rnk,
         sum(spend) OVER (PARTITION BY n_name ORDER BY spend DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(spend) OVER (PARTITION BY n_name) AS tot,
         count(*) OVER (PARTITION BY n_name) AS n_cust
  FROM spend
)
SELECT n_name,
       CAST(min(rnk) AS BIGINT) AS n_top_customers,
       CAST(any_value(n_cust) AS BIGINT) AS n_customers,
       {o_fround("min(rnk) / CAST(any_value(n_cust) AS DOUBLE)", 6)} AS top_frac
FROM ranked
WHERE CAST(cum AS DOUBLE) >= 0.8 * CAST(tot AS DOUBLE)
GROUP BY 1 ORDER BY 1
"""

QUERIES["revenue_concentration_8020"] = q_revenue_concentration_8020
ORACLES["revenue_concentration_8020"] = O_REVENUE_CONCENTRATION_8020


def q_segment_revenue_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment P&L profile: per c_mktsegment the customer
    count, order count, decimal-exact revenue, revenue share, and
    average order value — the first slice every commercial dashboard
    opens with (the customer dimension [q_rfm_segments] computes
    behaviorally, this reads declaratively).

    Plan (100 TB): lineitem joins orders on the order key (the one
    big shuffle), the |customers|-sized segment bridge streams on the
    customer key; ONE |segments|-row aggregate + a 1-row total
    broadcast."""
    t = tables(spark, sf_dir, "lineitem", "orders", "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        t["lineitem"]
        .join(
            t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
            "o_custkey",
        )
    )
    per = j.groupBy("c_mktsegment").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        F.sum(rev.cast(DEC)).alias("rev_dec"),
    )
    tot = per.agg(F.sum("rev_dec").alias("rev_all"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "n_customers",
            "n_orders",
            fround(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            fround(
                F.col("rev_dec").cast("double") / F.col("rev_all").cast("double"), 6
            ).alias("rev_share"),
            fround(F.col("rev_dec").cast("double") / F.col("n_orders"), 4).alias(
                "avg_order_value"
            ),
        )
        .orderBy("c_mktsegment")
    )


O_SEGMENT_REVENUE_PROFILE = f"""
WITH per AS (
  SELECT c_mktsegment,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
),
tot AS (SELECT sum(rev_dec) AS rev_all FROM per)
SELECT c_mktsegment, n_customers, n_orders,
       {o_fround("CAST(rev_dec AS DOUBLE)", 2)} AS revenue,
       {o_fround("CAST(rev_dec AS DOUBLE) / CAST(rev_all AS DOUBLE)", 6)} AS rev_share,
       {o_fround("CAST(rev_dec AS DOUBLE) / n_orders", 4)} AS avg_order_value
FROM per CROSS JOIN tot
ORDER BY c_mktsegment
"""

QUERIES["segment_revenue_profile"] = q_segment_revenue_profile
ORACLES["segment_revenue_profile"] = O_SEGMENT_REVENUE_PROFILE


def q_latency_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly fulfillment-latency trend: decimal-exact mean and exact
    p90 of order-to-ship days per order month — the time dimension
    [q_ship_latency]'s per-priority snapshot lacks; a drifting p90 is
    the early warning before SLAs breach.

    Latency = integer microsecond delta / 86400e6 — identical doubles;
    percentile == quantile_cont (proven portable).

    Plan (100 TB): one order-key join, one month groupBy (percentile
    partials, no global sort)."""
    t = tables(spark, sf_dir, "lineitem", "orders")
    lat = (
        (F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate"))
        / F.lit(86_400_000_000.0)
    )
    j = t["lineitem"].join(
        t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
        "l_orderkey",
    ).select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        lat.alias("lat"),
    )
    return (
        j.groupBy("month")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            fround(
                F.sum(F.col("lat").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("mean_days"),
            fround(F.percentile("lat", F.lit(0.9)), 6).alias("p90_days"),
        )
        .orderBy("month")
    )


O_LATENCY_TREND = f"""
WITH j AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         (epoch_us(l_shipdate) - epoch_us(o_orderdate)) / 86400000000.0 AS lat
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_lines,
       {o_fround("CAST(sum(CAST(lat AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS mean_days,
       {o_fround("quantile_cont(lat, 0.9)", 6)} AS p90_days
FROM j GROUP BY 1 ORDER BY 1
"""

QUERIES["latency_trend"] = q_latency_trend
ORACLES["latency_trend"] = O_LATENCY_TREND


def q_brand_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand repeat-purchase loyalty: per brand, distinct buyers, the
    buyers who came back (>= 2 distinct orders containing the brand),
    and the repeat rate — the loyalty readout next to
    [q_price_elasticity]'s discount response.

    Plan (100 TB): (brand, customer) order counts collapse through
    TWO partial-aggregable groupBys (distinct (brand, cust, order)
    first, then counts); the brand bridge joins stream on the part
    key. One |brands|-row output."""
    t = tables(spark, sf_dir, "lineitem", "orders", "part")
    bco = (
        t["lineitem"]
        .join(
            t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .select("p_brand", "o_custkey", "l_orderkey")
        .distinct()
    )
    per_cust = bco.groupBy("p_brand", "o_custkey").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    return (
        per_cust.groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_buyers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_repeat_buyers"),
        )
        .select(
            "p_brand",
            "n_buyers",
            "n_repeat_buyers",
            fround(F.col("n_repeat_buyers") / F.col("n_buyers"), 6).alias(
                "repeat_rate"
            ),
        )
        .orderBy("p_brand")
    )


O_BRAND_LOYALTY = f"""
WITH bco AS (
  SELECT DISTINCT p_brand, o_custkey, l_orderkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
),
per_cust AS (
  SELECT p_brand, o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM bco GROUP BY 1, 2
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_buyers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_buyers,
       {o_fround("sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)} AS repeat_rate
FROM per_cust GROUP BY 1 ORDER BY 1
"""

QUERIES["brand_loyalty"] = q_brand_loyalty
ORACLES["brand_loyalty"] = O_BRAND_LOYALTY


def q_parts_never_sold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-stock audit: parts with NO lineitem at all, counted per
    brand with the dead share — the catalog-hygiene anti-join
    ([q_orphan_audit] checks the FK the other way).

    Plan (100 TB): one left-anti join on the part key (ids only),
    one |brands|-row aggregate over the full catalog for the
    denominators."""
    t = tables(spark, sf_dir, "part", "lineitem")
    sold = t["lineitem"].select(F.col("l_partkey").alias("p_partkey")).distinct()
    dead = t["part"].join(sold, "p_partkey", "left_anti").groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_dead")
    )
    allb = t["part"].groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_parts")
    )
    return (
        allb.join(dead, "p_brand", "left")
        .fillna(0, subset=["n_dead"])
        .select(
            "p_brand",
            "n_parts",
            "n_dead",
            fround(F.col("n_dead") / F.col("n_parts"), 6).alias("dead_share"),
        )
        .orderBy("p_brand")
    )


O_PARTS_NEVER_SOLD = f"""
WITH dead AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_dead
  FROM part
  WHERE p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem)
  GROUP BY 1
),
allb AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts FROM part GROUP BY 1
)
SELECT p_brand, n_parts, coalesce(n_dead, 0) AS n_dead,
       {o_fround("coalesce(n_dead, 0) / CAST(n_parts AS DOUBLE)", 6)} AS dead_share
FROM allb LEFT JOIN dead USING (p_brand)
ORDER BY p_brand
"""

QUERIES["parts_never_sold"] = q_parts_never_sold
ORACLES["parts_never_sold"] = O_PARTS_NEVER_SOLD


def q_first_order_ltv_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does a customer's FIRST order value predict their lifetime
    value? Pearson correlation (decimal co-moments) between first-
    order total and total spend, plus the mean LTV multiple — the
    one-number justification for first-order-based acquisition
    bidding ([q_cohort_ltv] gives the curve; this gives the signal
    strength).

    First order = (min date, tie to min orderkey) — deterministic.

    Plan (100 TB): per-customer first order via one max_by groupBy
    (no window over the fact table), totals in the same pass; the
    correlation is a 1-row decimal co-moment aggregate."""
    t = tables(spark, sf_dir, "orders")
    per = t["orders"].groupBy("o_custkey").agg(
        F.min_by(
            F.col("o_totalprice"),
            F.struct(F.unix_micros("o_orderdate").alias("us"), F.col("o_orderkey")),
        ).alias("first_val"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("ltv"),
        F.count("*").cast("long").alias("n_orders"),
    )
    x, y = F.col("first_val"), F.col("ltv")
    agg = per.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(x.cast(DEC)).alias("sx"),
        F.sum(y.cast(DEC)).alias("sy"),
        F.sum((x * y).cast(DEC)).alias("sxy"),
        F.sum((x * x).cast(DEC)).alias("sxx"),
        F.sum((y * y).cast(DEC)).alias("syy"),
    )
    n = F.col("n_customers").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return agg.select(
        "n_customers",
        fround(corr, 6).alias("first_ltv_corr"),
        fround(sy / sx, 6).alias("mean_ltv_multiple"),
    )


O_FIRST_ORDER_LTV_CORR = f"""
WITH firsts AS (
  SELECT o_custkey, o_totalprice AS first_val
  FROM (SELECT o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders)
  WHERE rn = 1
),
tots AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) AS ltv
  FROM orders GROUP BY 1
),
per AS (
  SELECT f.o_custkey, f.first_val, t.ltv
  FROM firsts f JOIN tots t USING (o_custkey)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(CAST(first_val AS DECIMAL(30,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(ltv AS DECIMAL(30,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(first_val * ltv AS DECIMAL(30,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(first_val * first_val AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(ltv * ltv AS DECIMAL(30,10))) AS DOUBLE) AS syy
  FROM per
)
SELECT n_customers,
       {o_fround("(n_customers * sxy - sx * sy) / sqrt((n_customers * sxx - sx * sx) * (n_customers * syy - sy * sy))", 6)} AS first_ltv_corr,
       {o_fround("sy / sx", 6)} AS mean_ltv_multiple
FROM agg
"""

QUERIES["first_order_ltv_corr"] = q_first_order_ltv_corr
ORACLES["first_order_ltv_corr"] = O_FIRST_ORDER_LTV_CORR


def q_weekend_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday commerce profile: order counts, decimal-
    exact revenue, average order value, and the weekend/weekday AOV
    ratio — the day-mix control every promo analysis needs before
    crediting a campaign ([q_activity_heatmap] is the event-side
    grid; this is the money side).

    dayofweek: Spark's is 1=Sunday; DuckDB dow() is 0=Sunday — both
    sides classify weekend as {Sat, Sun} explicitly, so the mapping
    difference cannot leak.

    Plan (100 TB): ONE conditional-aggregate scan of orders into two
    cells; the ratio cross-joins two 1-row frames."""
    t = tables(spark, sf_dir, "orders")
    is_wknd = F.dayofweek("o_orderdate").isin(1, 7)  # Sun=1, Sat=7
    per = t["orders"].groupBy(
        is_wknd.alias("is_weekend")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
    )
    return per.select(
        "is_weekend",
        "n_orders",
        fround(F.col("rev_dec").cast("double"), 2).alias("revenue"),
        fround(F.col("rev_dec").cast("double") / F.col("n_orders"), 4).alias(
            "avg_order_value"
        ),
    ).orderBy("is_weekend")


O_WEEKEND_EFFECT = f"""
SELECT dayofweek(o_orderdate) IN (0, 6) AS is_weekend,
       CAST(count(*) AS BIGINT) AS n_orders,
       {o_fround("CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)", 2)} AS revenue,
       {o_fround("CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS avg_order_value
FROM orders GROUP BY 1 ORDER BY 1
"""

QUERIES["weekend_effect"] = q_weekend_effect
ORACLES["weekend_effect"] = O_WEEKEND_EFFECT


def q_order_size_vs_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do bigger orders ship slower? Per order-priority, the Pearson
    correlation (decimal co-moments) between basket line count and
    the order's mean ship latency — the ops question behind
    [q_latency_trend]'s drift and [q_ship_latency]'s tails.

    Plan (100 TB): per-order (lines, mean latency) is one groupBy on
    the order key carrying the priority along; the correlation is a
    |priorities|-row co-moment aggregate."""
    t = tables(spark, sf_dir, "lineitem", "orders")
    lat = (
        (F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate"))
        / F.lit(86_400_000_000.0)
    )
    per_order = (
        t["lineitem"]
        .join(
            t["orders"].select(
                F.col("o_orderkey").alias("l_orderkey"),
                "o_orderdate",
                "o_orderpriority",
            ),
            "l_orderkey",
        )
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            (F.sum(lat.cast(DEC)).cast("double") / F.count("*")).alias("mlat"),
        )
    )
    x, y = F.col("n_lines").cast("double"), F.col("mlat")
    agg = per_order.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(x.cast(DEC)).alias("sx"),
        F.sum(y.cast(DEC)).alias("sy"),
        F.sum((x * y).cast(DEC)).alias("sxy"),
        F.sum((x * x).cast(DEC)).alias("sxx"),
        F.sum((y * y).cast(DEC)).alias("syy"),
    )
    n = F.col("n_orders").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        "o_orderpriority",
        "n_orders",
        fround(corr, 6).alias("size_latency_corr"),
        fround(sy / n, 4).alias("mean_latency_days"),
    ).orderBy("o_orderpriority")


O_ORDER_SIZE_VS_LATENCY = f"""
WITH per_order AS (
  SELECT l_orderkey, o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate)) / 86400000000.0 AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mlat
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
agg AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(n_lines AS DECIMAL(30,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(mlat AS DECIMAL(30,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(n_lines * mlat AS DECIMAL(30,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(n_lines * CAST(n_lines AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(mlat * mlat AS DECIMAL(30,10))) AS DOUBLE) AS syy
  FROM per_order GROUP BY 1
)
SELECT o_orderpriority, n_orders,
       {o_fround("(n_orders * sxy - sx * sy) / sqrt((n_orders * sxx - sx * sx) * (n_orders * syy - sy * sy))", 6)} AS size_latency_corr,
       {o_fround("sy / n_orders", 4)} AS mean_latency_days
FROM agg ORDER BY o_orderpriority
"""

QUERIES["order_size_vs_latency"] = q_order_size_vs_latency
ORACLES["order_size_vs_latency"] = O_ORDER_SIZE_VS_LATENCY


def q_balance_vs_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance vs realized-spend screen per market segment:
    Pearson correlation between c_acctbal and the customer's total
    order value, plus the revenue share carried by NEGATIVE-balance
    customers — the credit-risk lens on the commercial base
    ([q_customer_churn_flags] is the activity lens).

    Customers with no orders count as zero spend (left join), so the
    correlation covers the whole base, not just actives.

    Plan (100 TB): per-customer spend is one groupBy; the |customers|
    frame joins customers on the customer key (ids + one double);
    one |segments|-row co-moment aggregate ends it."""
    t = tables(spark, sf_dir, "orders", "customer")
    spend = t["orders"].groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("spend")
    )
    j = (
        t["customer"]
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .join(spend, "c_custkey", "left")
        .fillna(0.0, subset=["spend"])
    )
    x, y = F.col("c_acctbal"), F.col("spend")
    agg = j.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(x.cast(DEC)).alias("sx"),
        F.sum(y.cast(DEC)).alias("sy"),
        F.sum((x * y).cast(DEC)).alias("sxy"),
        F.sum((x * x).cast(DEC)).alias("sxx"),
        F.sum((y * y).cast(DEC)).alias("syy"),
        F.sum(F.when(x < 0, y).otherwise(0).cast(DEC)).alias("neg_spend"),
    )
    n = F.col("n_customers").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        "c_mktsegment",
        "n_customers",
        fround(corr, 6).alias("balance_spend_corr"),
        fround(F.col("neg_spend").cast("double") / sy, 6).alias(
            "neg_balance_rev_share"
        ),
    ).orderBy("c_mktsegment")


O_BALANCE_VS_SPEND = f"""
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) AS spend
  FROM orders GROUP BY 1
),
j AS (
  SELECT c.c_mktsegment, c.c_acctbal, coalesce(s.spend, 0.0) AS spend
  FROM customer c LEFT JOIN spend s USING (c_custkey)
),
agg AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(spend AS DECIMAL(30,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(c_acctbal * spend AS DECIMAL(30,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(c_acctbal * c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(spend * spend AS DECIMAL(30,10))) AS DOUBLE) AS syy,
         CAST(sum(CAST(CASE WHEN c_acctbal < 0 THEN spend ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE) AS neg_spend
  FROM j GROUP BY 1
)
SELECT c_mktsegment, n_customers,
       {o_fround("(n_customers * sxy - sx * sy) / sqrt((n_customers * sxx - sx * sx) * (n_customers * syy - sy * sy))", 6)} AS balance_spend_corr,
       {o_fround("neg_spend / sy", 6)} AS neg_balance_rev_share
FROM agg ORDER BY c_mktsegment
"""

QUERIES["balance_vs_spend"] = q_balance_vs_spend
ORACLES["balance_vs_spend"] = O_BALANCE_VS_SPEND


def q_priority_mix_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority composition drift: per year, each priority's
    share of orders — the upstream-mix shift that silently moves
    every latency SLA downstream ([q_latency_trend] would show the
    symptom; this shows the cause).

    Plan (100 TB): ONE (year, priority) count groupBy; yearly totals
    derive from the aggregated frame and broadcast back."""
    t = tables(spark, sf_dir, "orders")
    cells = t["orders"].groupBy(
        F.year("o_orderdate").cast("int").alias("yr"), "o_orderpriority"
    ).agg(F.count("*").cast("long").alias("n"))
    tot = cells.groupBy("yr").agg(F.sum("n").cast("long").alias("n_yr"))
    return (
        cells.join(F.broadcast(tot), "yr")
        .select(
            "yr",
            "o_orderpriority",
            "n",
            fround(F.col("n") / F.col("n_yr"), 6).alias("share"),
        )
        .orderBy("yr", "o_orderpriority")
    )


O_PRIORITY_MIX_TREND = f"""
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT yr, CAST(sum(n) AS BIGINT) AS n_yr FROM cells GROUP BY 1)
SELECT yr, o_orderpriority, n,
       {o_fround("n / CAST(n_yr AS DOUBLE)", 6)} AS share
FROM cells JOIN tot USING (yr)
ORDER BY yr, o_orderpriority
"""

QUERIES["priority_mix_trend"] = q_priority_mix_trend
ORACLES["priority_mix_trend"] = O_PRIORITY_MIX_TREND


def q_tax_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tax-rate vocabulary audit: every distinct l_tax value with its
    line count, share, and decimal-exact collected tax — the
    reference-data check that catches a feed quietly introducing a
    new rate ([q_fd_audit] would flag the dependency break; this
    names the offending value and prices it).

    Plan (100 TB): ONE |rates|-cell groupBy + a 1-row total
    broadcast."""
    t = tables(spark, sf_dir, "lineitem")
    per = t["lineitem"].groupBy(
        fround(F.col("l_tax"), 2).alias("tax_rate")
    ).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum((F.col("l_extendedprice") * F.col("l_tax")).cast(DEC)).alias("tax_dec"),
    )
    tot = per.agg(F.sum("n_lines").cast("long").alias("n_all"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "tax_rate",
            "n_lines",
            fround(F.col("n_lines") / F.col("n_all"), 6).alias("line_share"),
            fround(F.col("tax_dec").cast("double"), 2).alias("tax_collected"),
        )
        .orderBy("tax_rate")
    )


O_TAX_RATE_AUDIT = f"""
WITH per AS (
  SELECT {o_fround("l_tax", 2)} AS tax_rate,
         CAST(count(*) AS BIGINT) AS n_lines,
         sum(CAST(l_extendedprice * l_tax AS DECIMAL(30,10))) AS tax_dec
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(n_lines) AS BIGINT) AS n_all FROM per)
SELECT tax_rate, n_lines,
       {o_fround("n_lines / CAST(n_all AS DOUBLE)", 6)} AS line_share,
       {o_fround("CAST(tax_dec AS DOUBLE)", 2)} AS tax_collected
FROM per CROSS JOIN tot ORDER BY tax_rate
"""

QUERIES["tax_rate_audit"] = q_tax_rate_audit
ORACLES["tax_rate_audit"] = O_TAX_RATE_AUDIT


def q_part_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-SKU adoption curve: per month, how many parts recorded
    their FIRST EVER sale, with the running distinct-catalog-sold
    cumulative — the assortment-velocity readout next to
    [q_parts_never_sold]'s dead stock.

    First sale = min (orderdate, orderkey tiebreak irrelevant: min
    date suffices for month grain) per part.

    Plan (100 TB): per-part first month is one partial-aggregable
    min groupBy; the curve is a |months|-row count + cumsum window
    over that aggregated frame."""
    t = tables(spark, sf_dir, "lineitem", "orders")
    first = (
        t["lineitem"]
        .join(
            t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
            "l_orderkey",
        )
        .groupBy("l_partkey")
        .agg(
            F.min(F.date_trunc("month", F.col("o_orderdate")).cast("date")).alias(
                "first_month"
            )
        )
    )
    per = first.groupBy(F.col("first_month").alias("month")).agg(
        F.count("*").cast("long").alias("n_new_parts")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "month",
        "n_new_parts",
        F.sum("n_new_parts").over(w).cast("long").alias("cum_parts_sold"),
    ).orderBy("month")


O_PART_ADOPTION_CURVE = """
WITH first AS (
  SELECT l_partkey,
         min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS first_month
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
per AS (
  SELECT first_month AS month, CAST(count(*) AS BIGINT) AS n_new_parts
  FROM first GROUP BY 1
)
SELECT month, n_new_parts,
       CAST(sum(n_new_parts) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_parts_sold
FROM per ORDER BY month
"""

QUERIES["part_adoption_curve"] = q_part_adoption_curve
ORACLES["part_adoption_curve"] = O_PART_ADOPTION_CURVE


def q_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier catalog-breadth profile per nation: distinct parts
    supplied per supplier (decimal-exact mean, exact max) and the
    nation's catalog coverage — the supply-base depth view next to
    [q_supplier_dependency]'s per-part risk bands.

    Plan (100 TB): distinct (supplier, part) collapses map-side; one
    per-supplier count, one |nations|-row aggregate; the catalog
    total is a 1-row broadcast."""
    t = tables(spark, sf_dir, "lineitem", "supplier", "nation", "part")
    sp = t["lineitem"].select("l_suppkey", "l_partkey").distinct()
    per_supp = sp.groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("n_parts")
    )
    cat = t["part"].agg(F.count("*").cast("long").alias("n_catalog"))
    nat_parts = (
        sp.join(
            t["supplier"].select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"),
            "l_suppkey",
        )
        .select("s_nationkey", "l_partkey")
        .distinct()
        .groupBy("s_nationkey")
        .agg(F.count("*").cast("long").alias("nation_parts"))
    )
    j = (
        per_supp.join(
            t["supplier"].select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"),
            "l_suppkey",
        )
        .groupBy("s_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            fround(
                F.sum(F.col("n_parts").cast(DEC)).cast("double") / F.count("*"), 4
            ).alias("avg_parts_per_supplier"),
            F.max("n_parts").alias("max_parts"),
        )
    )
    return (
        j.join(nat_parts, "s_nationkey")
        .join(
            F.broadcast(
                t["nation"].select(F.col("n_nationkey").alias("s_nationkey"), "n_name")
            ),
            "s_nationkey",
        )
        .crossJoin(F.broadcast(cat))
        .select(
            "n_name",
            "n_suppliers",
            "avg_parts_per_supplier",
            "max_parts",
            fround(F.col("nation_parts") / F.col("n_catalog"), 6).alias(
                "catalog_coverage"
            ),
        )
        .orderBy("n_name")
    )


O_SUPPLIER_BREADTH = f"""
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
per_supp AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts FROM sp GROUP BY 1
),
cat AS (SELECT CAST(count(*) AS BIGINT) AS n_catalog FROM part),
nat_parts AS (
  SELECT s_nationkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS nation_parts
  FROM sp JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1
),
j AS (
  SELECT s_nationkey,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         {o_fround("CAST(sum(CAST(n_parts AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS avg_parts_per_supplier,
         CAST(max(n_parts) AS BIGINT) AS max_parts
  FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT n_name, n_suppliers, avg_parts_per_supplier, max_parts,
       {o_fround("nation_parts / CAST(n_catalog AS DOUBLE)", 6)} AS catalog_coverage
FROM j
JOIN nat_parts USING (s_nationkey)
JOIN nation ON s_nationkey = n_nationkey
CROSS JOIN cat
ORDER BY n_name
"""

QUERIES["supplier_breadth"] = q_supplier_breadth
ORACLES["supplier_breadth"] = O_SUPPLIER_BREADTH
