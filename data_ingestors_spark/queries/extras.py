"""Additional operator-surface queries: exact percentiles, explode /
unnest, array higher-order functions, CTEs, null-handling scalar
functions, HAVING, and approximate aggregates (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestors_spark.queries.base import tables, views, fround, o_fround


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) + median per group."""
    t = tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            fround(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
            fround(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
            fround(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
            F.round(F.min("o_totalprice"), 2).alias("mn"),
            F.round(F.max("o_totalprice"), 2).alias("mx"),
        )
    )


# Interpolated percentiles are computed doubles → engine-portable
# fround; min/max are raw 2-dp money values where round is identity.
O_PERCENTILES = f"""
SELECT o_orderpriority,
       {o_fround("quantile_cont(o_totalprice, 0.5)", 4)} AS p50,
       {o_fround("quantile_cont(o_totalprice, 0.9)", 4)} AS p90,
       {o_fround("quantile_cont(o_totalprice, 0.99)", 4)} AS p99,
       round(min(o_totalprice), 2) AS mn,
       round(max(o_totalprice), 2) AS mx
FROM orders GROUP BY o_orderpriority
"""


def q_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest: word frequency over part type strings."""
    t = tables(spark, sf_dir, "part")
    return (
        t["part"]
        .select(F.explode(F.split(F.col("p_type"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


O_EXPLODE_WORDS = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
WHERE word <> ''
GROUP BY word
"""


def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings: transform /
    filter / aggregate (fold) / array_max — all JVM-side lambdas."""
    t = tables(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return t["embeddings"].select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        fround(l2, 6).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
        fround(F.array_max(v), 6).alias("max_comp"),
        fround(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 6).alias("comp_sum"),
    )


O_ARRAY_HOF = f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       {o_fround("sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))", 6)} AS l2_norm,
       CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS BIGINT) AS n_positive,
       {o_fround("list_max(CAST(embedding AS DOUBLE[]))", 6)} AS max_comp,
       {o_fround("list_sum(CAST(embedding AS DOUBLE[]))", 6)} AS comp_sum
FROM embeddings
"""


def q_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE query: segment spend → segment share per customer."""
    views(spark, sf_dir, "customer", "orders")
    sql = """
        WITH spend AS (
          SELECT o_custkey, floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS total
          FROM orders GROUP BY o_custkey
        ),
        seg AS (
          SELECT c_mktsegment, c_custkey FROM customer
        )
        SELECT c_mktsegment, count(*) AS n_customers,
               floor((CAST(sum(CAST(total AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS seg_spend
        FROM seg JOIN spend ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """
    return spark.sql(sql)


O_CTE_CHAIN = """
WITH spend AS (
  SELECT o_custkey, floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS total
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT c_mktsegment, c_custkey FROM customer
)
SELECT c_mktsegment, count(*) AS n_customers,
       floor((CAST(sum(CAST(total AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS seg_spend
FROM seg JOIN spend ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface: nullif / coalesce / nvl / isnull
    and null-safe equality."""
    t = tables(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    return t["customer"].select(
        "c_custkey",
        F.nullif(seg, F.lit("BUILDING")).alias("seg_nb"),
        F.coalesce(F.nullif(seg, F.lit("BUILDING")), F.lit("(redacted)")).alias("seg_or_default"),
        seg.isNull().alias("seg_is_null"),
        seg.eqNullSafe(F.lit("AUTOMOBILE")).alias("is_auto_nullsafe"),
    )


O_NULL_FUNCS = """
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg_nb,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_or_default,
       c_mktsegment IS NULL AS seg_is_null,
       c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE' AS is_auto_nullsafe
FROM customer
"""


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    t = tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"), fround(F.sum(F.col("l_quantity").cast("decimal(30,10)")).cast("double"), 2).alias("qty"))
        .filter(F.col("n") >= 20)
    )


O_HAVING = """
SELECT l_partkey, count(*) AS n,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 5e-1) / 1e2 AS qty
FROM lineitem GROUP BY l_partkey HAVING count(*) >= 20
"""


def q_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ count-distinct, approximate
    quantiles). Rows-only: sketch algorithms differ across engines by
    design; the exact siblings (count_distinct, percentiles) are the
    oracle-checked counterparts."""
    t = tables(spark, sf_dir, "lineitem")
    return t["lineitem"].agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", [0.25, 0.75]).alias("approx_iqr"),
    )


QUERIES = {
    "percentiles": q_percentiles,
    "explode_words": q_explode_words,
    "array_hof": q_array_hof,
    "cte_chain": q_cte_chain,
    "null_funcs": q_null_funcs,
    "having": q_having,
    "approx_aggs": q_approx_aggs,
}

ORACLES = {
    "percentiles": O_PERCENTILES,
    "explode_words": O_EXPLODE_WORDS,
    "array_hof": O_ARRAY_HOF,
    "cte_chain": O_CTE_CHAIN,
    "null_funcs": O_NULL_FUNCS,
    "having": O_HAVING,
}
