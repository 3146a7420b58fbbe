"""Window-function surface (SURVEY.md §2.5): ranking, analytic,
row/range frames, per-group top-k, and the as-of join operator.

All orderings include a unique tiebreaker chain so frames and ranks
are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.operators.asof import asof_join
from data_ingestors_spark.queries.base import tables, DEC, dsum, fround, o_fround


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical row_number ≤ k plan:
    one shuffle on the partition key, no global sort."""
    t = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rnk")
    )


O_TOPK_PER_GROUP = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
WHERE rnk <= 3
"""


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per supplier over ship time (ROWS frame,
    unique order chain). Filtered to a supplier subset so the result
    stays hashable at bench scale — the filter pushes to the scan."""
    t = tables(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .filter(F.col("l_suppkey") < 3)
        .withColumn("running_rev", fround(F.sum(rev.cast(DEC)).over(w).cast("double"), 2))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_rev")
    )


O_RUNNING_SUM = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS running_rev
FROM lineitem
WHERE l_suppkey < 3
"""


def q_lag_lead_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic battery: lag/lead/dense_rank/ntile over one window."""
    t = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            fround(
                F.col("o_totalprice") - F.first("o_totalprice").over(w), 2
            ).alias("delta_from_first"),
        )
    )


O_LAG_LEAD_RANK = f"""
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       {o_fround('''o_totalprice - first_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''', 2)} AS delta_from_first
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric time axis: 30-day trailing spend per
    customer. RANGE (not ROWS) so same-day peers aggregate together —
    deterministic under ties by construction."""
    t = tables(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        fround(F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"), 2).alias("trailing_30d_spend"),
        F.count("*").over(w).cast("long").alias("trailing_30d_orders"),
    )


O_RANGE_FRAME = """
SELECT o_custkey, o_orderkey,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER w AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS trailing_30d_spend,
       count(*) OVER w AS trailing_30d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each event picks up the latest
    order state of the matching customer at event time. Right side is
    pre-aggregated to one row per (key, time) — required for
    deterministic as-of semantics under same-timestamp duplicates."""
    t = tables(spark, sf_dir, "events", "orders")
    joined = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        _daily_orders(t),
        left_on="user_id",
        right_on="cust",
        left_time="ts",
        right_time="od",
        payload=["od", "day_spend", "day_orders"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("od", "yyyy-MM-dd").alias("asof_order_day"),
        "day_spend",
        "day_orders",
    )


O_ASOF_JOIN = """
SELECT e.event_id, e.user_id,
       strftime(d.od, '%Y-%m-%d') AS asof_order_day,
       d.day_spend, d.day_orders
FROM events e
ASOF LEFT JOIN (
  SELECT o_custkey AS cust, o_orderdate AS od,
         floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS day_spend,
         count(*) AS day_orders
  FROM orders GROUP BY 1, 2
) d ON e.user_id = d.cust AND e.ts >= d.od
"""


def _daily_orders(t):
    return (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("cust"), F.col("o_orderdate").alias("od"))
        .agg(
            dsum(F.col("o_totalprice")).alias("day_spend"),
            F.count("*").alias("day_orders"),
        )
    )


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event picks up the NEXT order-day state of
    the matching customer at-or-after event time (same union+window
    single-shuffle plan, mirrored sort)."""
    t = tables(spark, sf_dir, "events", "orders")
    joined = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        _daily_orders(t),
        left_on="user_id",
        right_on="cust",
        left_time="ts",
        right_time="od",
        payload=["od", "day_spend", "day_orders"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("od", "yyyy-MM-dd").alias("next_order_day"),
        "day_spend",
        "day_orders",
    )


O_ASOF_JOIN_FORWARD = """
SELECT e.event_id, e.user_id,
       strftime(d.od, '%Y-%m-%d') AS next_order_day,
       d.day_spend, d.day_orders
FROM events e
ASOF LEFT JOIN (
  SELECT o_custkey AS cust, o_orderdate AS od,
         floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS day_spend,
         count(*) AS day_orders
  FROM orders GROUP BY 1, 2
) d ON e.user_id = d.cust AND e.ts <= d.od
"""


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: closest order day in either direction, exact
    ties resolving backward (pandas merge_asof nearest tie rule). The
    oracle reconstructs it from DuckDB's backward+forward ASOF joins."""
    t = tables(spark, sf_dir, "events", "orders")
    joined = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        _daily_orders(t),
        left_on="user_id",
        right_on="cust",
        left_time="ts",
        right_time="od",
        payload=["od", "day_spend", "day_orders"],
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("od", "yyyy-MM-dd").alias("nearest_order_day"),
        "day_spend",
        "day_orders",
    )


O_ASOF_JOIN_NEAREST = """
WITH d AS (
  SELECT o_custkey AS cust, o_orderdate AS od,
         floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS day_spend,
         count(*) AS day_orders
  FROM orders GROUP BY 1, 2
),
b AS (
  SELECT e.event_id, d.od, d.day_spend, d.day_orders
  FROM events e ASOF LEFT JOIN d ON e.user_id = d.cust AND e.ts >= d.od
),
f AS (
  SELECT e.event_id, d.od, d.day_spend, d.day_orders
  FROM events e ASOF LEFT JOIN d ON e.user_id = d.cust AND e.ts <= d.od
)
SELECT e.event_id, e.user_id,
       strftime(CASE
         WHEN b.od IS NULL THEN f.od
         WHEN f.od IS NULL THEN b.od
         WHEN epoch_us(e.ts) - epoch_us(b.od) <= epoch_us(f.od) - epoch_us(e.ts) THEN b.od
         ELSE f.od END, '%Y-%m-%d') AS nearest_order_day,
       CASE
         WHEN b.od IS NULL THEN f.day_spend
         WHEN f.od IS NULL THEN b.day_spend
         WHEN epoch_us(e.ts) - epoch_us(b.od) <= epoch_us(f.od) - epoch_us(e.ts) THEN b.day_spend
         ELSE f.day_spend END AS day_spend,
       CASE
         WHEN b.od IS NULL THEN f.day_orders
         WHEN f.od IS NULL THEN b.day_orders
         WHEN epoch_us(e.ts) - epoch_us(b.od) <= epoch_us(f.od) - epoch_us(e.ts) THEN b.day_orders
         ELSE f.day_orders END AS day_orders
FROM events e
JOIN b ON e.event_id = b.event_id
JOIN f ON e.event_id = f.event_id
"""


QUERIES = {
    "topk_per_group": q_topk_per_group,
    "running_sum": q_running_sum,
    "lag_lead_rank": q_lag_lead_rank,
    "range_frame": q_range_frame,
    "asof_join": q_asof_join,
    "asof_join_forward": q_asof_join_forward,
    "asof_join_nearest": q_asof_join_nearest,
}

ORACLES = {
    "topk_per_group": O_TOPK_PER_GROUP,
    "running_sum": O_RUNNING_SUM,
    "lag_lead_rank": O_LAG_LEAD_RANK,
    "range_frame": O_RANGE_FRAME,
    "asof_join": O_ASOF_JOIN,
    "asof_join_forward": O_ASOF_JOIN_FORWARD,
    "asof_join_nearest": O_ASOF_JOIN_NEAREST,
}


_ASOF_TOL_S = 1800  # 30 minutes


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toleranced as-of join (pandas merge_asof tolerance parity):
    each purchase event attributes to the user's latest click AT MOST
    30 minutes earlier — older clicks are no match at all, so the
    payload nulls out. Same single-shuffle union+window plan; the
    tolerance is a post-match filter, never a range join."""
    t = tables(spark, sf_dir, "events")
    purchases = t["events"].filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        t["events"]
        .filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(fround(F.max("value"), 6).alias("click_value"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        payload=["click_ts", "click_value"],
        tolerance_seconds=_ASOF_TOL_S,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("attributed_click"),
        "click_value",
    )


O_ASOF_JOIN_TOLERANCE = f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts AS click_ts,
         {o_fround("max(value)", 6)} AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), matched AS (
  SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_value
  FROM purchases p
  ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.click_ts
)
SELECT event_id, user_id,
       CASE WHEN date_diff('second', click_ts, ts) <= {_ASOF_TOL_S}
            THEN strftime(click_ts, '%Y-%m-%d %H:%M:%S') END AS attributed_click,
       CASE WHEN date_diff('second', click_ts, ts) <= {_ASOF_TOL_S}
            THEN click_value END AS click_value
FROM matched
"""

QUERIES["asof_join_tolerance"] = q_asof_join_tolerance
ORACLES["asof_join_tolerance"] = O_ASOF_JOIN_TOLERANCE


def q_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training features: for every order, the
    customer's trailing-90-day order count and revenue AS OF the day
    before the order — the leakage-free feature join a training
    pipeline needs (the same-day exclusion is the subtle part: a
    RANGE frame ending at -1 day can never see the label row or its
    same-day siblings).

    Plan (100 TB): ONE shuffle on o_custkey; the RANGE frame sorts
    within customer only (bounded partitions), no self-join, no
    calendar explode. DECIMAL running sums keep the money exact."""
    t = tables(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-90, -1)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        day.cast("long").alias("day"),
        F.count("o_orderkey").over(w).cast("long").alias("trailing_n"),
        fround(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"),
                F.lit(0.0),
            ),
            2,
        ).alias("trailing_rev"),
    )


O_POINT_IN_TIME_FEATURES = f"""
SELECT o_orderkey, o_custkey,
       CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
       CAST(count(o_orderkey) OVER w AS BIGINT) AS trailing_n,
       {o_fround("coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER w AS DOUBLE), 0.0)", 2)} AS trailing_rev
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
  RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING
)
"""

QUERIES["point_in_time_features"] = q_point_in_time_features
ORACLES["point_in_time_features"] = O_POINT_IN_TIME_FEATURES
