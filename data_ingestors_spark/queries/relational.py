"""Relational operator surface (SURVEY.md §2.5): scans, project/filter,
every join type, aggregation (+cube/rollup/grouping sets/pivot),
sort/limit/top-k, set ops, scalar function families, subqueries.

Each query is a thin, idiomatic DataFrame program — Catalyst owns the
physical plan (broadcast selection, pushdown, AQE). Dimension tables
are explicitly ``broadcast()`` where we know they stay small at any
scale factor (region/nation/supplier), so the plan holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.queries.base import tables, views, DEC, dsum, davg, fround, o_fround, o_dsum, o_davg


# --- Q1: full-scan aggregation (TPC-H Q1 shape) -------------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + groupBy with 8 aggregates; partial aggregation
    (map-side combine) is automatic; filter pushes to the parquet scan."""
    t = tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


O_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS sum_qty,
       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS sum_base_price,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS sum_disc_price,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS sum_charge,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / count(l_quantity)) * 1e4 + 5e-1) / 1e4 AS avg_qty,
       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / count(l_extendedprice)) * 1e4 + 5e-1) / 1e4 AS avg_price,
       floor((CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / count(l_discount)) * 1e4 + 5e-1) / 1e4 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q2: projection / filter / CASE ------------------------------------
def q_filter_project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .filter((F.col("o_totalprice") > 1000.0) & (F.col("o_orderstatus") != "X"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("price"),
            F.when(F.col("o_totalprice") > 50000, "high")
            .when(F.col("o_totalprice") > 10000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.upper("o_orderpriority").alias("priority_uc"),
        )
    )


O_FILTER_PROJECT_CASE = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
       CASE WHEN o_totalprice > 50000 THEN 'high'
            WHEN o_totalprice > 10000 THEN 'mid'
            ELSE 'low' END AS price_band,
       upper(o_orderpriority) AS priority_uc
FROM orders
WHERE o_totalprice > 1000.0 AND o_orderstatus <> 'X'
"""


# --- Q3: multi-way equi-join + agg (broadcast dims) ---------------------
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: fact tables shuffle on their keys; nation is tiny at
    every scale factor → explicit broadcast removes its shuffle."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum(rev).alias("revenue"),
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


O_REVENUE_BY_NATION = """
SELECT n_name,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS revenue,
       count(*) AS n_items,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- Q4: left outer join with null handling -----------------------------
def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders")
    per_cust = t["orders"].groupBy("o_custkey").agg(
        F.count("*").alias("cnt"), dsum(F.col("o_totalprice")).alias("spend")
    )
    return (
        t["customer"]
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("total_spend"),
        )
    )


O_CUSTOMER_ORDER_COUNTS = """
SELECT c_custkey, c_mktsegment,
       CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders,
       coalesce(spend, 0.0) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt, floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS spend
  FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


# --- Q5/Q6: semi / anti joins ------------------------------------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one open ('O') order — left semi
    (EXISTS): no row multiplication, only the probe side's columns."""
    t = tables(spark, sf_dir, "customer", "orders")
    open_orders = t["orders"].filter(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


O_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all — left anti (NOT EXISTS).
    Same shape as the reference's file-pairing orphan check
    (file_pairing_validator.py:60-142 — SURVEY.md V12)."""
    t = tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


O_ANTI_JOIN = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- Q7: full outer join ------------------------------------------------
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders")
    o = t["orders"]
    f_side = (
        o.filter(F.col("o_orderstatus") == "F").groupBy("o_custkey").agg(F.count("*").alias("n_f"))
    ).withColumnRenamed("o_custkey", "k_f")
    o_side = (
        o.filter(F.col("o_orderstatus") == "O").groupBy("o_custkey").agg(F.count("*").alias("n_o"))
    ).withColumnRenamed("o_custkey", "k_o")
    return f_side.join(o_side, F.col("k_f") == F.col("k_o"), "full_outer").select(
        F.coalesce(F.col("k_f"), F.col("k_o")).alias("custkey"),
        F.coalesce(F.col("n_f"), F.lit(0)).cast("long").alias("n_finished"),
        F.coalesce(F.col("n_o"), F.lit(0)).cast("long").alias("n_open"),
    )


O_FULL_OUTER_JOIN = """
SELECT CAST(coalesce(k_f, k_o) AS BIGINT) AS custkey,
       CAST(coalesce(n_f, 0) AS BIGINT) AS n_finished,
       CAST(coalesce(n_o, 0) AS BIGINT) AS n_open
FROM      (SELECT o_custkey AS k_f, count(*) AS n_f FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) a
FULL JOIN (SELECT o_custkey AS k_o, count(*) AS n_o FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) b
  ON k_f = k_o
"""


# --- Q8: cross join -----------------------------------------------------
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dims cartesian (region × supplier) — broadcast NLJ."""
    t = tables(spark, sf_dir, "region", "supplier")
    return (
        t["region"]
        .crossJoin(F.broadcast(t["supplier"]))
        .select("r_regionkey", "r_name", "s_suppkey", F.round("s_acctbal", 2).alias("s_bal"))
    )


O_CROSS_JOIN = """
SELECT r_regionkey, r_name, s_suppkey, round(s_acctbal, 2) AS s_bal
FROM region CROSS JOIN supplier
"""


# --- Q9: non-equi (theta/range) join ------------------------------------
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: customers within ±100 acctbal of each supplier.

    r9 scale rewrite (reference parity unchanged): the broadcast-BNLJ
    form evaluates |customer| × |supplier| predicates and streams a
    pair set that grows QUADRATICALLY when both sides scale inside a
    fixed value domain — the sf1 scale proof measured 18.8× on 10×
    data. The query only needs a per-supplier COUNT and exact DECIMAL
    SUM over a value interval, so compute prefix sums over the
    customer acctbal VALUE-COUNT frame and answer each supplier with
    two boundary lookups (an order-statistics band join) — the pair
    stream never materializes, cost is O(NDV + |supplier|) past the
    value-count aggregation. The single-partition cumulative window
    rides the NDV-bounded value frame (2-decimal currency domain:
    ≤ ~1.1M distinct values at ANY corpus size — the roc_auc /
    quantile_normalize pattern), never the fact table.

    Boundary lookup = the asof union trick: supplier bound rows
    interleave into the cumulative frame ordered by (val, tie); hi
    bounds (s+100) sort AFTER equal-valued customer rows (inclusive),
    lo bounds (s−100) BEFORE (a customer at exactly s−100 is in-band),
    so band_count = cum(hi) − cum(lo⁻) with double-exact boundary
    semantics identical to the BNLJ predicate."""
    t = tables(spark, sf_dir, "supplier", "customer")
    vc = t["customer"].groupBy("c_acctbal").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.col("c_acctbal").cast(DEC)).alias("vsum"),
    )
    base = vc.select(
        F.col("c_acctbal").alias("val"),
        F.lit(0).alias("tie"),
        "cnt",
        "vsum",
        F.lit(None).cast("long").alias("s_suppkey"),
        F.lit(None).cast("string").alias("side"),
    )
    sup = t["supplier"]
    bound_cols = lambda val, tie, side: [  # noqa: E731
        val.alias("val"),
        F.lit(tie).alias("tie"),
        F.lit(None).cast("long").alias("cnt"),
        F.lit(None).cast(DEC).alias("vsum"),
        F.col("s_suppkey"),
        F.lit(side).alias("side"),
    ]
    hi = sup.select(*bound_cols(F.col("s_acctbal") + 100.0, 1, "hi"))
    lo = sup.select(*bound_cols(F.col("s_acctbal") - 100.0, -1, "lo"))
    w = Window.orderBy("val", "tie").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        base.unionByName(hi)
        .unionByName(lo)
        .select(
            "s_suppkey",
            "side",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("ccnt"),
            F.coalesce(F.sum("vsum").over(w), F.lit(0).cast(DEC)).alias("csum"),
        )
        .filter(F.col("s_suppkey").isNotNull())
    )
    is_hi = F.col("side") == "hi"
    return (
        cum.groupBy("s_suppkey")
        .agg(
            F.sum(F.when(is_hi, F.col("ccnt")).otherwise(-F.col("ccnt")))
            .cast("long")
            .alias("n_near"),
            F.sum(F.when(is_hi, F.col("csum")).otherwise(-F.col("csum"))).alias(
                "bsum"
            ),
        )
        .filter(F.col("n_near") > 0)
        .select(
            "s_suppkey",
            "n_near",
            fround(F.col("bsum").cast("double") / F.col("n_near"), 4).alias(
                "avg_near_bal"
            ),
        )
    )


O_RANGE_JOIN = """
SELECT s_suppkey, count(*) AS n_near, floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) / count(c_acctbal)) * 1e4 + 5e-1) / 1e4 AS avg_near_bal
FROM customer JOIN supplier
  ON c_acctbal BETWEEN s_acctbal - 100.0 AND s_acctbal + 100.0
GROUP BY s_suppkey
"""


# --- set operations -----------------------------------------------------
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders")
    o = t["orders"]
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b).withColumnRenamed("o_custkey", "custkey")


O_SET_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .select("c_custkey")
        .exceptAll(t["orders"].select(F.col("o_custkey").alias("c_custkey")).distinct())
        .withColumnRenamed("c_custkey", "custkey")
    )


O_SET_EXCEPT = """
SELECT c_custkey AS custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey FROM orders
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct()


O_UNION_DISTINCT = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


# --- distinct / grouped count-distinct ----------------------------------
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


O_COUNT_DISTINCT = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderpriority
"""


# --- top-k global (deterministic via unique key chain) ------------------
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — TakeOrderedAndProject: per-partition top-k then
    driver merge of k·p rows; no full sort at any scale."""
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


O_TOPK_GLOBAL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --- cube / rollup / grouping sets / pivot ------------------------------
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
    )


O_CUBE = """
SELECT l_returnflag, l_linestatus, floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS sum_qty, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(dsum(F.col("o_totalprice")).alias("total"), F.count("*").alias("n"))
    )


O_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS total, count(*) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS sum_price, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


O_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS sum_price, count(*) AS n
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values (never inferred — inference is a
    driver-side distinct scan and non-deterministic column order)."""
    t = tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(fround(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2))
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_f"),
            F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_o"),
        )
    )


O_PIVOT = """
SELECT l_returnflag,
       coalesce(floor((CAST(sum(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2, 0.0) AS qty_f,
       coalesce(floor((CAST(sum(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2, 0.0) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


# --- scalar function families ------------------------------------------
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "part")
    return t["part"].select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_pre"),
        F.element_at(F.split(F.col("p_type"), " "), 1).alias("type_first_word"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.upper(F.col("p_name"))).alias("name_uc"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
    )


O_STRING_FUNCS = """
SELECT p_partkey,
       lower(p_name) AS name_lc,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substring(p_type, 1, 5) AS type_pre,
       split_part(p_type, ' ', 1) AS type_first_word,
       regexp_extract(p_brand, '(\\d+)', 1) AS brand_num,
       concat_ws('|', p_brand, p_type) AS brand_type,
       trim(upper(p_name)) AS name_uc,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return t["orders"].select(
        "o_orderkey",
        F.year(d).cast("int").alias("yr"),
        F.month(d).cast("int").alias("mo"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.quarter(d).cast("int").alias("qtr"),
        F.date_trunc("month", d).cast("date").cast("string").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_98"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


O_DATE_FUNCS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_day
FROM orders
"""


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            fround(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
            fround(F.sqrt(F.col("l_extendedprice")), 4).alias("sqrt_price"),
            fround(F.log(F.col("l_extendedprice") + 1.0), 4).alias("ln_price"),
            fround(F.pow(F.col("l_discount") + 1.0, 2), 4).alias("pow_disc"),
            F.floor(F.col("l_quantity")).cast("long").alias("qty_floor"),
            F.ceil(F.col("l_quantity")).cast("long").alias("qty_ceil"),
            (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
            F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
            F.least(F.col("l_tax"), F.col("l_discount")).alias("min_rate"),
        )
    )


O_MATH_FUNCS = f"""
SELECT l_orderkey,
       {o_fround("abs(l_extendedprice - 1000.0)", 2)} AS abs_diff,
       {o_fround("sqrt(l_extendedprice)", 4)} AS sqrt_price,
       {o_fround("ln(l_extendedprice + 1.0)", 4)} AS ln_price,
       {o_fround("pow(l_discount + 1.0, 2)", 4)} AS pow_disc,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
       greatest(l_tax, l_discount) AS max_rate,
       least(l_tax, l_discount) AS min_rate
FROM lineitem WHERE l_linenumber = 1
"""


# --- subqueries ---------------------------------------------------------
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + scalar subquery via the SQL frontend —
    Catalyst decorrelates to joins."""
    views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 20000)
        """
    )


O_CORRELATED_EXISTS = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 20000)
"""


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_size
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        """
    )


O_IN_SUBQUERY = """
SELECT p_partkey, p_brand, p_size
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by order, top 10 by
    revenue. Both filters push to the scans before the fact-fact
    shuffle join; the top-k is a global sort of the AGGREGATED frame
    (one row per order), never of the raw join."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = "2024-03-15"
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_orderpriority",
            "revenue",
        )
    )


O_SHIPPING_PRIORITY = f"""
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_orderpriority,
       {o_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2024-03-15'
  AND l_shipdate > TIMESTAMP '2024-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20. Return-flag filter pushes to the lineitem scan; nation
    broadcasts."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("lost_revenue"), F.count("*").cast("long").alias("n_items"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


O_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, n_name,
       {o_dsum("l_extendedprice * (1 - l_discount)")} AS lost_revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): customer nation-keys appearing
    in BOTH the customer and supplier tables keep their multiplicity
    up to the smaller side — the duplicate-preserving set op the
    plain intersect erases."""
    t = tables(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.intersectAll(b)


O_INTERSECT_ALL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds 300, joined back to customer detail.

    Scale shape: the HAVING subquery reduces lineitem to one row per
    qualifying order BEFORE any join (map-side partial agg does most of
    the work); the qualifying-key set is tiny (~0.05% of orders) and
    broadcast into a semi join, so the big fact tables are never
    shuffled against each other for non-qualifying rows."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(F.broadcast(big), F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_totalprice",
            "total_qty",
        )
    )


O_LARGE_ORDERS = f"""
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       o_totalprice, {o_dsum("l_quantity")} AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(30,10))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): yearly-averaged
    revenue from lineitems whose quantity is below 20% of their part's
    average quantity, for one brand.

    Scale shape: the correlated scalar subquery (per-part avg
    quantity) decorrelates into a groupBy on the filtered part set —
    brand filter pushes to BOTH scans, the per-part averages are a
    broadcast-sized frame joined map-side, and the final result is a
    partial-aggregated single row. No repeated subquery execution per
    outer row, which is how the correlated form degenerates in naive
    engines."""
    t = tables(spark, sf_dir, "part", "lineitem")
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    part_avg = li.groupBy("l_partkey").agg(
        F.avg(F.col("l_quantity").cast(DEC)).alias("avg_qty")
    ).select(F.col("l_partkey").alias("ap_key"), "avg_qty")
    return (
        li.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity").cast(DEC) < F.lit(0.2).cast(DEC) * F.col("avg_qty"))
        .agg(
            fround(
                (F.sum(F.col("l_extendedprice").cast(DEC)) / F.lit(7.0).cast(DEC)).cast("double"),
                2,
            ).alias("avg_yearly"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


O_SMALL_QTY_REVENUE = f"""
WITH li AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#4'
), pa AS (
  SELECT l_partkey, avg(CAST(l_quantity AS DECIMAL(30,10))) AS avg_qty
  FROM li GROUP BY l_partkey
)
SELECT {o_fround("CAST(sum(CAST(li.l_extendedprice AS DECIMAL(30,10))) / CAST(7.0 AS DECIMAL(30,10)) AS DOUBLE)", 2)} AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_items
FROM li JOIN pa ON li.l_partkey = pa.l_partkey
WHERE CAST(li.l_quantity AS DECIMAL(30,10)) < CAST(0.2 AS DECIMAL(30,10)) * pa.avg_qty
"""


def q_bottleneck_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (the EXISTS + NOT-EXISTS pair, decorrelated):
    suppliers who were the UNIQUE last shipper in multi-supplier
    orders — there EXISTS another supplier in the order, and there does
    NOT EXIST another supplier who shipped as late. Top 10 by count.

    Scale shape: both correlated subqueries decorrelate into ONE
    window pass over the per-(order, supplier) aggregate — max ship
    date, supplier count, and count-at-max are computed over the same
    order partitioning (one shuffle), instead of two correlated
    re-scans of lineitem per outer row. The final top-k is
    TakeOrderedAndProject over the small per-supplier counts."""
    t = tables(spark, sf_dir, "lineitem", "supplier")
    per_os = t["lineitem"].groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_last")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_os.withColumn("o_last", F.max("s_last").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "n_at_max",
            F.sum(F.when(F.col("s_last") == F.col("o_last"), 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("n_supp") >= 2)                      # EXISTS another supplier
            & (F.col("s_last") == F.col("o_last"))      # this one shipped last
            & (F.col("n_at_max") == 1)                  # NOT EXISTS an equally-late one
        )
    )
    return (
        flagged.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n_bottleneck_orders"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "n_bottleneck_orders")
        .orderBy(F.desc("n_bottleneck_orders"), F.asc("s_suppkey"))
        .limit(10)
    )


O_BOTTLENECK_SUPPLIER = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_last
  FROM lineitem GROUP BY 1, 2
), win1 AS (
  SELECT l_orderkey, l_suppkey, s_last,
         max(s_last) OVER (PARTITION BY l_orderkey) AS o_last,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp
  FROM per_os
), flagged AS (
  SELECT l_suppkey
  FROM (
    SELECT l_suppkey, s_last, o_last, n_supp,
           sum(CASE WHEN s_last = o_last THEN 1 ELSE 0 END)
             OVER (PARTITION BY l_orderkey) AS n_at_max
    FROM win1
  )
  WHERE n_supp >= 2 AND s_last = o_last AND n_at_max = 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS n_bottleneck_orders
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY n_bottleneck_orders DESC, s_suppkey ASC
LIMIT 10
"""


QUERIES = {
    "large_orders": q_large_orders,
    "small_qty_revenue": q_small_qty_revenue,
    "bottleneck_supplier": q_bottleneck_supplier,
    "shipping_priority": q_shipping_priority,
    "intersect_all": q_intersect_all,
    "returned_items": q_returned_items,
    "pricing_summary": q_pricing_summary,
    "filter_project_case": q_filter_project_case,
    "revenue_by_nation": q_revenue_by_nation,
    "customer_order_counts": q_customer_order_counts,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "full_outer_join": q_full_outer_join,
    "cross_join": q_cross_join,
    "range_join": q_range_join,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "union_distinct": q_union_distinct,
    "count_distinct": q_count_distinct,
    "topk_global": q_topk_global,
    "cube": q_cube,
    "rollup": q_rollup,
    "grouping_sets": q_grouping_sets,
    "pivot": q_pivot,
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "math_funcs": q_math_funcs,
    "correlated_exists": q_correlated_exists,
    "in_subquery": q_in_subquery,
}

ORACLES = {
    "large_orders": O_LARGE_ORDERS,
    "small_qty_revenue": O_SMALL_QTY_REVENUE,
    "bottleneck_supplier": O_BOTTLENECK_SUPPLIER,
    "shipping_priority": O_SHIPPING_PRIORITY,
    "intersect_all": O_INTERSECT_ALL,
    "returned_items": O_RETURNED_ITEMS,
    "pricing_summary": O_PRICING_SUMMARY,
    "filter_project_case": O_FILTER_PROJECT_CASE,
    "revenue_by_nation": O_REVENUE_BY_NATION,
    "customer_order_counts": O_CUSTOMER_ORDER_COUNTS,
    "semi_join": O_SEMI_JOIN,
    "anti_join": O_ANTI_JOIN,
    "full_outer_join": O_FULL_OUTER_JOIN,
    "cross_join": O_CROSS_JOIN,
    "range_join": O_RANGE_JOIN,
    "set_intersect": O_SET_INTERSECT,
    "set_except": O_SET_EXCEPT,
    "union_distinct": O_UNION_DISTINCT,
    "count_distinct": O_COUNT_DISTINCT,
    "topk_global": O_TOPK_GLOBAL,
    "cube": O_CUBE,
    "rollup": O_ROLLUP,
    "grouping_sets": O_GROUPING_SETS,
    "pivot": O_PIVOT,
    "string_funcs": O_STRING_FUNCS,
    "date_funcs": O_DATE_FUNCS,
    "math_funcs": O_MATH_FUNCS,
    "correlated_exists": O_CORRELATED_EXISTS,
    "in_subquery": O_IN_SUBQUERY,
}
