"""Remaining TPC-H query shapes (SURVEY.md §2.5 R12), adapted to the
driver schema (no ``partsupp``, no ship-mode/commit/receipt columns,
no phone numbers — see TESTDATA.md). Each keeps the *shape* that makes
the original query interesting — the correlated subquery, the
disjunctive pushdown, the decorrelated EXISTS — expressed Spark-first:

- Q2  ``min_cost_supplier``      correlated scalar-min subquery
- Q4  ``late_order_priority``    EXISTS with a non-equi correlate
- Q5  ``local_supplier_volume``  same-nation join through two paths
- Q6  ``forecast_revenue``       pure scan + conjunctive pushdown
- Q7  ``volume_shipping``        self-aliased dim (nation x2)
- Q8  ``market_share``           conditional-share aggregation
- Q9  ``product_profit``         multi-fact profit rollup by year
- Q11 ``important_parts``        HAVING vs global scalar subquery
- Q12 ``late_line_priority``     non-equi date join + IN-list CASE agg
- Q14 ``promo_revenue``          conditional ratio over one join
- Q15 ``top_supplier``           CTE + max-equality scalar subquery
- Q16 ``parts_supplier_cnt``     count-distinct + NOT IN exclusion
- Q19 ``discounted_revenue``     three-branch disjunctive predicate
- Q20 ``potential_promotion``    nested IN with HAVING threshold
- Q22 ``global_sales_opportunity`` anti-join + avg-scalar threshold

The ``partsupp`` relation is derived as ``SELECT DISTINCT l_partkey,
l_suppkey FROM lineitem`` where a part-supplier relation is needed
(Q2/Q16/Q20) — one extra distinct agg, shuffled on the same key the
downstream join uses, so AQE coalesces the exchange.

Reference parity: tracebloc/data-ingestors has no OLAP query surface
(it is an ingestion framework); these shapes extend the engine beyond
the reference per the build brief, with DuckDB oracles for every one.

Determinism conventions follow queries/__init__.py: decimal-accumulated
money sums (order-free), fround on both engines, BIGINT casts for
counts, INT casts for year(), unique-key order chains under LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestors_spark.queries.base import (
    DEC,
    dsum,
    fround,
    o_dsum,
    o_fround,
    tables,
    views,
)

def _rev() -> "F.Column":
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REV = "l_extendedprice * (1 - l_discount)"


# --- Q6: forecast revenue change ----------------------------------------
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: one-row scan-side aggregate. All three predicates are
    plain column comparisons, so they push into the parquet scan
    (PushedFilters) and the scan reads only 4 columns — at 100 TB this
    is an embarrassingly parallel partial-agg with no shuffle at all
    beyond the final 1-row combine."""
    li = tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


O_FORECAST_REVENUE = f"""
SELECT {o_dsum("l_extendedprice * l_discount")} AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# --- Q4: order priority checking ----------------------------------------
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (no commit/receipt dates in this schema: "late"
    means a lineitem shipped >90 days after the order date). The
    correlated EXISTS becomes a left-semi join whose condition mixes an
    equi key with a non-equi date comparison — Catalyst keeps the equi
    part as the shuffle key and evaluates the date residual post-match,
    so no cartesian and no per-row re-scan."""
    t = tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(t["lineitem"], late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


O_LATE_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1998-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# --- Q5: local supplier volume ------------------------------------------
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where the customer and the lineitem's supplier
    share a nation, for one region-year. nation/region are fixed-size →
    broadcast; supplier scales with SF → plain shuffle join on
    l_suppkey; the same-nation constraint is a post-join residual
    filter (both nationkeys are already in flight — no extra join)."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    asia = (
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
        .join(F.broadcast(t["nation"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


O_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name, {o_dsum(_O_REV)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- Q7: volume shipping ------------------------------------------------
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    The nation dim appears TWICE under different roles (supplier side,
    customer side) — two independently-aliased broadcast joins; the
    symmetric pair predicate is a post-join residual. year() is a
    row-local cast, grouped alongside the two names."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
    )


O_VOLUME_SHIPPING = f"""
SELECT supp_nation, cust_nation, l_year, {o_dsum("volume")} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         {_O_REV} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '2001-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q8: market share ---------------------------------------------------
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, by order year. Share = conditional sum / total sum inside the
    same aggregate pass — one shuffle, no self-join. Both sums
    accumulate in DECIMAL so the cross-engine ratio is bit-stable."""
    t = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "part", "nation", "region"
    )
    asia_keys = (
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
        .join(F.broadcast(t["nation"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(F.col("n_nationkey").alias("mkt_key"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    econ = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .join(econ, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_keys), F.col("c_nationkey") == F.col("mkt_key"), "left_semi")
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            fround(
                F.sum(nation_rev.cast(DEC)).cast("double")
                / F.sum(_rev().cast(DEC)).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


O_MARKET_SHARE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {o_fround(
           "CAST(sum(CAST(CASE WHEN n1.n_name = 'NATION_3' THEN " + _O_REV
           + " ELSE 0.0 END AS DECIMAL(30,10))) AS DOUBLE)"
           " / CAST(sum(CAST(" + _O_REV + " AS DECIMAL(30,10))) AS DOUBLE)", 6)} AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
GROUP BY year(o_orderdate)
"""


# --- Q9: product type profit --------------------------------------------
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp.ps_supplycost: cost is modeled as
    10% of p_retailprice per unit). Profit by supplier nation and order
    year for one part-name family. The name filter prunes part BEFORE
    the fact join; nation broadcasts."""
    t = tables(spark, sf_dir, "orders", "lineitem", "supplier", "part", "nation")
    red = (
        t["part"]
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    profit = _rev() - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(red, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


O_PRODUCT_PROFIT = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {o_dsum(_O_REV + " - 0.1 * p_retailprice * l_quantity")} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q11: important parts -----------------------------------------------
_Q11_SQL = """
WITH val AS (
  SELECT l_partkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_0'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
       floor(CAST(v AS DOUBLE) * 1e2 + 5e-1) / 1e2 AS part_value
FROM val
WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) * 0.005 FROM val)
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem revenue standing in for partsupp
    stock value): parts holding an outsized share of one nation's
    traded value — HAVING against a global-total scalar subquery.
    Catalyst evaluates the scalar once (1-row broadcast, doctor-exempt)
    and the CTE is aggregated once, not re-scanned per row. Both the
    per-part values and the global total accumulate in DECIMAL, so the
    threshold comparison is bit-identical across engines."""
    views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


O_IMPORTANT_PARTS = _Q11_SQL


# --- Q12: late-line priority --------------------------------------------
def q_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode: grouped by l_linestatus; "late"
    = shipped >60 days after order date). The IN-list CASE aggregation
    runs in the same pass as the join output — one shuffle for the
    join, partial aggs map-side."""
    t = tables(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


O_LATE_LINE_PRIORITY = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


# --- Q14: promotion effect ----------------------------------------------
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo share of one month's revenue. Single
    fact-to-part join (partkey), conditional and total sums in one agg
    pass, DECIMAL-accumulated ratio."""
    t = tables(spark, sf_dir, "lineitem", "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1999-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-07-01").cast("timestamp"))
        )
        .join(t["part"].select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            fround(
                F.lit(100.0)
                * F.sum(promo.cast(DEC)).cast("double")
                / F.sum(_rev().cast(DEC)).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


O_PROMO_REVENUE = f"""
SELECT {o_fround(
    "100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN " + _O_REV
    + " ELSE 0.0 END AS DECIMAL(30,10))) AS DOUBLE)"
    " / CAST(sum(CAST(" + _O_REV + " AS DECIMAL(30,10))) AS DOUBLE)", 4)} AS promo_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1999-06-01' AND l_shipdate < TIMESTAMP '1999-07-01'
"""


# --- Q15: top supplier --------------------------------------------------
_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '1999-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       floor(CAST(total_rev AS DOUBLE) * 1e2 + 5e-1) / 1e2 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the quarter's max revenue —
    CTE aggregated once, max-equality scalar subquery (1-row broadcast,
    doctor-exempt). Revenues compare as exact DECIMALs, so the
    max-equality row set cannot differ between engines."""
    views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


O_TOP_SUPPLIER = _Q15_SQL


# --- Q16: parts/supplier relationship -----------------------------------
def q_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp derived from lineitem): distinct
    supplier count per (brand, type, size) bucket, excluding one brand,
    one type, non-listed sizes, and negative-balance suppliers (the
    complaints NOT IN). The exclusion set is an aggregate-built anti
    join; the count-distinct rides the groupBy shuffle."""
    t = tables(spark, sf_dir, "lineitem", "part", "supplier")
    ps = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pfilt = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        ps.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(pfilt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


O_PARTS_SUPPLIER_CNT = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q19: discounted revenue (disjunctive predicates) -------------------
def q_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: a three-branch OR of (brand, size, quantity) windows.
    The branches share the join key, so this stays ONE partkey join;
    Catalyst extracts the common l_quantity bounds for scan pushdown
    and evaluates the residual OR post-join."""
    t = tables(spark, sf_dir, "lineitem", "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    branch = (
        ((br == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((br == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        t["lineitem"]
        .join(t["part"].select("p_partkey", "p_brand", "p_size"), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(dsum(_rev()).alias("revenue"), F.count("*").cast("long").alias("n_items"))
    )


O_DISCOUNTED_REVENUE = f"""
SELECT {o_dsum(_O_REV)} AS revenue, CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q20: potential part promotion --------------------------------------
def q_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty threshold becomes a shipped-quantity
    threshold): suppliers who moved >400 units of red parts in 1999 —
    nested IN subqueries decorrelate to a pruned-part join, a HAVING
    aggregate, and a broadcast semi join against supplier."""
    t = tables(spark, sf_dir, "lineitem", "part", "supplier")
    red_keys = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_keys), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__q"))
        .filter(F.col("__q") > 400)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")
    )


O_POTENTIAL_PROMOTION = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
  GROUP BY l_suppkey
  HAVING sum(CAST(l_quantity AS DECIMAL(30,10))) > 400
)
"""


# --- Q22: global sales opportunity --------------------------------------
_Q22_SQL = """
SELECT CAST(c_nationkey AS INT) AS cntry,
       CAST(count(*) AS BIGINT) AS numcust,
       floor(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) * 1e2 + 5e-1) / 1e2 AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) / count(c_acctbal)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no phone prefixes: nation keys play the
    country-code role): well-funded customers with no orders, by
    country. The avg threshold is a DECIMAL-exact scalar subquery
    (1-row broadcast, doctor-exempt); the NOT EXISTS decorrelates to a
    shuffled anti join on custkey."""
    views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


O_GLOBAL_SALES_OPPORTUNITY = _Q22_SQL


# --- Q2: minimum-cost supplier ------------------------------------------
_Q2_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.n_name, s.s_acctbal
FROM part p
JOIN ps ON p.p_partkey = ps.l_partkey
JOIN eu_supp s ON ps.l_suppkey = s.s_suppkey
WHERE p.p_size = 15 AND p.p_type = 'LARGE'
  AND s.s_acctbal = (
    SELECT min(s2.s_acctbal)
    FROM ps ps2 JOIN eu_supp s2 ON ps2.l_suppkey = s2.s_suppkey
    WHERE ps2.l_partkey = p.p_partkey)
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (acctbal standing in for ps_supplycost): for each
    part of one size/type, the cheapest EU supplier who ships it — the
    classic correlated scalar-min subquery. Catalyst decorrelates it
    into a per-part min aggregate joined back on (partkey, acctbal):
    one extra agg over the derived part-supplier relation, no per-row
    re-execution. Raw doubles pass through both engines untouched, so
    the min-equality is exact."""
    views(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


O_MIN_COST_SUPPLIER = _Q2_SQL


QUERIES = {
    "min_cost_supplier": q_min_cost_supplier,
    "late_order_priority": q_late_order_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "forecast_revenue": q_forecast_revenue,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
    "important_parts": q_important_parts,
    "late_line_priority": q_late_line_priority,
    "promo_revenue": q_promo_revenue,
    "top_supplier": q_top_supplier,
    "parts_supplier_cnt": q_parts_supplier_cnt,
    "discounted_revenue": q_discounted_revenue,
    "potential_promotion": q_potential_promotion,
    "global_sales_opportunity": q_global_sales_opportunity,
}

ORACLES = {
    "min_cost_supplier": O_MIN_COST_SUPPLIER,
    "late_order_priority": O_LATE_ORDER_PRIORITY,
    "local_supplier_volume": O_LOCAL_SUPPLIER_VOLUME,
    "forecast_revenue": O_FORECAST_REVENUE,
    "volume_shipping": O_VOLUME_SHIPPING,
    "market_share": O_MARKET_SHARE,
    "product_profit": O_PRODUCT_PROFIT,
    "important_parts": O_IMPORTANT_PARTS,
    "late_line_priority": O_LATE_LINE_PRIORITY,
    "promo_revenue": O_PROMO_REVENUE,
    "top_supplier": O_TOP_SUPPLIER,
    "parts_supplier_cnt": O_PARTS_SUPPLIER_CNT,
    "discounted_revenue": O_DISCOUNTED_REVENUE,
    "potential_promotion": O_POTENTIAL_PROMOTION,
    "global_sales_opportunity": O_GLOBAL_SALES_OPPORTUNITY,
}
