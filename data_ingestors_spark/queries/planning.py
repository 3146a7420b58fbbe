"""Shuffle-reduction and planner-diagnostic operators.

Three operators a 100 TB pipeline runs BEFORE (or instead of) the
expensive plan: a Bloom-prefiltered semi join that cuts big-side
shuffle volume when neither side broadcasts, a join-key skew audit
that surfaces the hot keys that will dominate a shuffle before you
pay for it, and an exact join-cardinality predictor (sum over shared
keys of count products) that prices a join from two cheap aggregates.

Registry contract as everywhere: identical output column names on the
Spark and DuckDB sides, integer aggregates cast to BIGINT, doubles
rounded engine-portably (queries/base.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestors_spark.functions.rounding import fround, o_fround
from data_ingestors_spark.operators.joins import bloom_semi_join
from data_ingestors_spark.queries.base import o_dsum, dsum, tables

QUERIES: dict = {}
ORACLES: dict = {}


# --- Bloom-prefiltered semi join ---------------------------------------

def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority mix for customers in the BUILDING segment with a
    positive balance — computed as ``orders ⋉ qualifying-customers``
    through :func:`bloom_semi_join`.

    Why the detour through a Bloom filter: at 100 TB neither orders
    nor the qualifying-customer key set fits the broadcast threshold,
    so a plain semi join shuffles the FULL orders table on o_custkey.
    The 128 Kbit filter (~16 KB serialized) broadcasts no matter how
    many keys qualify and eliminates provably-unmatched orders on the
    map side, so the shuffle carries matches + <1% false positives;
    the trailing exact semi join removes those, making the result
    bit-identical to the plain semi join (which is exactly what the
    oracle runs).
    """
    t = tables(spark, sf_dir, "orders", "customer")
    keys = (
        t["customer"]
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 0))
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    hits = bloom_semi_join(t["orders"], keys, "o_custkey")
    return hits.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


O_BLOOM_PREFILTER_JOIN = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {o_dsum("o_totalprice")} AS revenue
FROM orders
WHERE EXISTS (
  SELECT 1 FROM customer
  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING' AND c_acctbal > 0
)
GROUP BY o_orderpriority
"""

QUERIES["bloom_prefilter_join"] = q_bloom_prefilter_join
ORACLES["bloom_prefilter_join"] = O_BLOOM_PREFILTER_JOIN


# --- join-key skew audit ------------------------------------------------

_SKEW_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
)


def q_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew report for the three hottest join keys in the
    schema: rows-per-key dispersion metrics that predict whether a
    shuffle on that key needs salting / AQE skew splitting.

    Metrics chosen to be PARTIAL-AGGREGABLE — no global sort, so the
    audit stays cheap at any scale (a Gini over per-key counts would
    need a global rank; top1_share + p99/median + coefficient of
    variation carry the same signal for skew triage):
    - ``top1_share``: hottest key's fraction of all rows (the single
      reducer that AQE must split);
    - ``p99_over_median``: tail-to-typical ratio of rows/key
      (percentile's partial buffer is a value->count map over DISTINCT
      count values, which stays tiny);
    - ``cv``: stddev/mean of rows-per-key from exact integer
      sum / sum-of-squares (bit-identical across engines).
    """
    t = tables(spark, sf_dir, "lineitem", "orders")

    def audit(df: DataFrame, key: str) -> DataFrame:
        counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
        return counts.agg(
            F.lit(key).alias("join_key"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            fround(F.sum("cnt") / F.count("*"), 4).alias("avg_rows_per_key"),
            fround(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
            fround(
                F.percentile("cnt", 0.99) / F.percentile("cnt", 0.5), 4
            ).alias("p99_over_median"),
            fround(
                F.sqrt(
                    F.sum(F.col("cnt") * F.col("cnt")).cast("long")
                    / F.count("*")
                    - F.pow(F.sum("cnt").cast("long") / F.count("*"), 2)
                )
                / (F.sum("cnt").cast("long") / F.count("*")),
                4,
            ).alias("cv"),
        )

    parts = [audit(t[tbl], key) for tbl, key in _SKEW_KEYS]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _o_audit(tbl: str, key: str) -> str:
    return f"""
SELECT '{key}' AS join_key,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       {o_fround("CAST(sum(cnt) AS DOUBLE) / count(*)", 4)} AS avg_rows_per_key,
       {o_fround("CAST(max(cnt) AS DOUBLE) / sum(cnt)", 6)} AS top1_share,
       {o_fround("quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5)", 4)} AS p99_over_median,
       {o_fround("sqrt(CAST(sum(cnt*cnt) AS BIGINT) / CAST(count(*) AS DOUBLE) - pow(CAST(sum(cnt) AS BIGINT) / CAST(count(*) AS DOUBLE), 2)) / (CAST(sum(cnt) AS BIGINT) / CAST(count(*) AS DOUBLE))", 4)} AS cv
FROM (SELECT {key}, count(*) AS cnt FROM {tbl} GROUP BY 1)
"""


O_KEY_SKEW_AUDIT = " UNION ALL ".join(
    _o_audit(tbl, key) for tbl, key in _SKEW_KEYS
)

QUERIES["key_skew_audit"] = q_key_skew_audit
ORACLES["key_skew_audit"] = O_KEY_SKEW_AUDIT


# --- exact join-cardinality predictor ----------------------------------

def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price a join before running it: |A ⋈ B on k| is EXACTLY
    Σ_k cA(k)·cB(k), computable from two per-key count aggregates and
    one count-frame equi-join — never materializing the join output.
    ``top_key_out_rows`` (max single-key product) is the skew hotspot:
    if it dominates ``out_rows`` the join needs salting before anyone
    runs it.

    Audited joins: the FK join lineitem⋈orders, and the two self-join
    shapes whose output is quadratic in per-key counts (the classic
    surprise explosion).

    Scale: per-key counts are map-side-combined groupBys; the
    count-frame join shuffles one row per distinct key, not per data
    row. Products of counts stay in BIGINT — exact in both engines.
    """
    t = tables(spark, sf_dir, "lineitem", "orders", "events")

    def price(
        name: str, left: DataFrame, lkey: str, right: DataFrame, rkey: str
    ) -> DataFrame:
        cl = left.groupBy(F.col(lkey).alias("k")).agg(
            F.count("*").cast("long").alias("cl")
        )
        cr = right.groupBy(F.col(rkey).alias("k")).agg(
            F.count("*").cast("long").alias("cr")
        )
        return cl.join(cr, "k").agg(
            F.lit(name).alias("join_name"),
            F.sum("cl").cast("long").alias("n_left_matched"),
            F.sum("cr").cast("long").alias("n_right_matched"),
            F.count("*").cast("long").alias("n_keys_shared"),
            F.sum(F.col("cl") * F.col("cr")).cast("long").alias("out_rows"),
            F.max(F.col("cl") * F.col("cr")).cast("long").alias("top_key_out_rows"),
        )

    li, od, ev = t["lineitem"], t["orders"], t["events"]
    parts = [
        price("lineitem_x_orders", li, "l_orderkey", od, "o_orderkey"),
        price("lineitem_self_partkey", li, "l_partkey", li, "l_partkey"),
        price("events_self_user", ev, "user_id", ev, "user_id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _o_price(name: str, ltbl: str, lkey: str, rtbl: str, rkey: str) -> str:
    return f"""
SELECT '{name}' AS join_name,
       CAST(sum(cl) AS BIGINT) AS n_left_matched,
       CAST(sum(cr) AS BIGINT) AS n_right_matched,
       CAST(count(*) AS BIGINT) AS n_keys_shared,
       CAST(sum(cl * cr) AS BIGINT) AS out_rows,
       CAST(max(cl * cr) AS BIGINT) AS top_key_out_rows
FROM (SELECT {lkey} AS k, count(*) AS cl FROM {ltbl} GROUP BY 1) L
JOIN (SELECT {rkey} AS k, count(*) AS cr FROM {rtbl} GROUP BY 1) R USING (k)
"""


O_JOIN_CARDINALITY = " UNION ALL ".join(
    [
        _o_price("lineitem_x_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        _o_price("lineitem_self_partkey", "lineitem", "l_partkey", "lineitem", "l_partkey"),
        _o_price("events_self_user", "events", "user_id", "events", "user_id"),
    ]
)

QUERIES["join_cardinality_estimate"] = q_join_cardinality_estimate
ORACLES["join_cardinality_estimate"] = O_JOIN_CARDINALITY


# --- ANALYZE-style column statistics (CBO inputs) -----------------------

_CBO_COLS = (
    ("lineitem", "l_quantity"),
    ("lineitem", "l_discount"),
    ("orders", "o_totalprice"),
    ("documents", "n_chars"),
)


def q_cbo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics — the inputs a cost-based
    optimizer needs before it can price a plan: row/null/NDV counts,
    min/max, and EXACT equi-depth quartile boundaries (the SQL-standard
    discrete rule: smallest value whose cumulative count reaches
    ceil(q*n), spelled out explicitly so both engines apply the same
    rule instead of trusting two different percentile_disc
    interpretations).

    Plan per column: counts/min/max are one map-side-combined agg over
    the scan; boundaries run over the value->count frame (NDV rows,
    not data rows) with one cumulative window. That window is a single
    ordered task — bounded by the column's NDV, which for CBO-stats
    targets (keys, measures) is << row count; a column whose NDV
    approaches row count is exactly the column you'd sample first
    (ANALYZE samples at scale; exactness here is what makes the query
    oracle-checkable).
    """
    from pyspark.sql import Window

    frames = []
    for tbl, col in _CBO_COLS:
        df = tables(spark, sf_dir, tbl)[tbl]
        v = F.col(col).cast("double")
        vc = (
            df.filter(v.isNotNull())
            .groupBy(v.alias("v"))
            .agg(F.count("*").alias("c"))
        )
        cum = vc.withColumn(
            "cum",
            F.sum("c").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        base = df.agg(
            F.count("*").cast("long").alias("n_rows"),
            (F.count("*") - F.count(v)).cast("long").alias("n_null"),
            F.countDistinct(v).cast("long").alias("ndv"),
            fround(F.min(v), 6).alias("vmin"),
            fround(F.max(v), 6).alias("vmax"),
            F.count(v).cast("long").alias("_nn"),
        )
        bounds = cum.crossJoin(F.broadcast(base)).agg(
            F.lit(tbl).alias("tbl"),
            F.lit(col).alias("col"),
            F.first("n_rows").alias("n_rows"),
            F.first("n_null").alias("n_null"),
            F.first("ndv").alias("ndv"),
            F.first("vmin").alias("vmin"),
            F.first("vmax").alias("vmax"),
            *[
                fround(
                    F.min(
                        F.when(
                            F.col("cum") >= F.ceil(F.lit(q) * F.col("_nn")),
                            F.col("v"),
                        )
                    ),
                    6,
                ).alias(name)
                for q, name in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75"))
            ],
        )
        frames.append(bounds)
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def _o_cbo(tbl: str, col: str) -> str:
    return f"""
SELECT '{tbl}' AS tbl, '{col}' AS col, n_rows, n_null, ndv, vmin, vmax,
       {o_fround("min(CASE WHEN cum >= ceil(0.25 * nn) THEN v END)", 6)} AS q25,
       {o_fround("min(CASE WHEN cum >= ceil(0.50 * nn) THEN v END)", 6)} AS q50,
       {o_fround("min(CASE WHEN cum >= ceil(0.75 * nn) THEN v END)", 6)} AS q75
FROM (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum
  FROM (SELECT CAST({col} AS DOUBLE) AS v, count(*) AS c FROM {tbl}
        WHERE {col} IS NOT NULL GROUP BY 1)
) CROSS JOIN (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count({col}) AS BIGINT) AS n_null,
         CAST(count(DISTINCT {col}) AS BIGINT) AS ndv,
         {o_fround(f"min(CAST({col} AS DOUBLE))", 6)} AS vmin,
         {o_fround(f"max(CAST({col} AS DOUBLE))", 6)} AS vmax,
         count({col}) AS nn
  FROM {tbl}
)
GROUP BY 1, 2, 3, 4, 5, 6, 7
"""


O_CBO_STATS = " UNION ALL ".join(_o_cbo(t, c) for t, c in _CBO_COLS)

QUERIES["cbo_stats"] = q_cbo_stats
ORACLES["cbo_stats"] = O_CBO_STATS


# --- compaction bin-packing plan ---------------------------------------

_BINPACK_TARGET = 1 << 20  # 1 MiB per output file at this SF
_BINPACK_ROW_BYTES = 128


def q_file_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: bin-pack a per-supplier file
    inventory (size proxy: rows x 128 B) into ~1 MiB output groups by
    running-total fill in key order — the planning step before a
    compaction job rewrites a hot table's small files (the classic
    100 TB operational task: millions of 1-10 MB files -> 128 MB
    targets).

    Running-total fill (bin = (cum - bytes) div target) is chosen over
    first-fit-decreasing because it is deterministic, order-preserving
    (compacted files stay range-clustered on the key, so downstream
    partition pruning still works), and expressible as ONE cumulative
    window in any engine; FFD packs ~2% tighter but scrambles key
    locality and is inherently sequential.

    Scale: the window runs over the INVENTORY (one row per input
    file), not the data — a 100 TB table is ~10^6 files, a single
    sorted task; the data itself is never touched by the planner.
    """
    from pyspark.sql import Window

    t = tables(spark, sf_dir, "lineitem")
    inv = t["lineitem"].groupBy(F.col("l_suppkey").alias("file_key")).agg(
        (F.count("*") * F.lit(_BINPACK_ROW_BYTES)).cast("long").alias("bytes")
    )
    cum = inv.withColumn(
        "cum",
        F.sum("bytes").over(
            Window.orderBy("file_key").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    binned = cum.withColumn(
        "bin_id",
        F.expr(f"(cum - bytes) div {_BINPACK_TARGET}").cast("long"),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min("file_key").cast("long").alias("first_key"),
        F.max("file_key").cast("long").alias("last_key"),
    )


O_FILE_BINPACK = f"""
SELECT bin_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(min(file_key) AS BIGINT) AS first_key,
       CAST(max(file_key) AS BIGINT) AS last_key
FROM (
  SELECT file_key, bytes,
         CAST((sum(bytes) OVER (ORDER BY file_key) - bytes)
              // {_BINPACK_TARGET} AS BIGINT) AS bin_id
  FROM (SELECT l_suppkey AS file_key,
               CAST(count(*) * {_BINPACK_ROW_BYTES} AS BIGINT) AS bytes
        FROM lineitem GROUP BY 1)
)
GROUP BY 1
"""

QUERIES["file_binpack"] = q_file_binpack
ORACLES["file_binpack"] = O_FILE_BINPACK
