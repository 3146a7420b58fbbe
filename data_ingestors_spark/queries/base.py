"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestors_spark.io.readers import TABLES, load_table
from data_ingestors_spark.session import tune


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load the named benchmark tables (UTC session tz asserted)."""
    tune(spark)
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def views(spark: SparkSession, sf_dir: str, *names: str) -> SparkSession:
    """Register the named tables as temp views for spark.sql queries."""
    for name, df in tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
    return spark


# Exact-decimal accumulation for money aggregates: double sums are
# reduction-order-dependent (Spark partial aggs / DuckDB segment-tree
# window sums combine in different orders), so round(sum(double), 2)
# can land on opposite sides of a rounding boundary. Casting each
# addend to a fixed-scale decimal makes the sum exact and order-free
# in both engines; a binary double can never sit exactly on a
# half-ulp-of-scale-10 decimal boundary, so the per-addend conversion
# is also engine-agnostic.
DEC = "decimal(30,10)"


def dsum(expr: "F.Column", nd: int = 2) -> "F.Column":
    """Order-independent money sum, rounded to nd decimals."""
    return F.round(F.sum(expr.cast(DEC)).cast("double"), nd)


def davg(expr: "F.Column", nd: int = 4) -> "F.Column":
    """Order-independent mean: exact decimal sum / count, in double."""
    return F.round(
        F.sum(expr.cast(DEC)).cast("double") / F.count(expr), nd
    )


def o_dsum(sql_expr: str, nd: int = 2) -> str:
    return f"round(CAST(sum(CAST({sql_expr} AS DECIMAL(30,10))) AS DOUBLE), {nd})"


def o_davg(sql_expr: str, nd: int = 4) -> str:
    return (
        f"round(CAST(sum(CAST({sql_expr} AS DECIMAL(30,10))) AS DOUBLE)"
        f" / count({sql_expr}), {nd})"
    )
