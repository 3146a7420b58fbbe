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
