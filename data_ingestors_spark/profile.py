"""One-pass table profiler: per-column stats for data exploration.

``profile(df)`` computes, in ONE aggregation job over one scan:
row count, and per column — null count, approximate distinct count
(HLL++), min/max (orderable types), and mean/stddev (numeric types).
``top_values(df, column, k)`` is the optional second step for the
columns a user drills into (it needs its own groupBy per column, so
it is deliberately not part of the single-pass profile).

Output is a tidy long-format DataFrame (column, metric, value) so it
prints well and exports anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERABLE_EXTRA = (T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType)


def profile(df: DataFrame) -> DataFrame:
    """Single-job profile; returns (column, metric, value[string])."""
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    per_col: list[tuple[str, str, str]] = []  # (alias, column, metric)

    def add(alias: str, col: str, metric: str, expr: "F.Column") -> None:
        aggs.append(expr.alias(alias))
        per_col.append((alias, col, metric))

    for i, field in enumerate(df.schema.fields):
        c = F.col(field.name)
        add(f"n_{i}", field.name, "nulls", F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long"))
        add(f"d_{i}", field.name, "approx_distinct", F.approx_count_distinct(c).cast("long"))
        if isinstance(field.dataType, _NUMERIC + _ORDERABLE_EXTRA):
            add(f"mn_{i}", field.name, "min", F.min(c).cast("string"))
            add(f"mx_{i}", field.name, "max", F.max(c).cast("string"))
        if isinstance(field.dataType, _NUMERIC):
            add(f"avg_{i}", field.name, "mean", F.avg(c).cast("string"))
            add(f"sd_{i}", field.name, "stddev", F.stddev_samp(c).cast("string"))

    row = df.agg(*aggs).collect()[0]
    out = [("*", "rows", str(row["__rows"]))]
    for alias, col, metric in per_col:
        v = row[alias]
        out.append((col, metric, None if v is None else str(v)))
    return spark.createDataFrame(out, "column string, metric string, value string")


def top_values(df: DataFrame, column: str, k: int = 5) -> DataFrame:
    """Most frequent values of one column (deterministic tiebreak)."""
    return (
        df.groupBy(F.col(column).cast("string").alias("value"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
    )


def column_quantiles(
    df: DataFrame, column: str, quantiles: list[float] | None = None, b: int = 200
) -> DataFrame:
    """Quantile drill-down for one numeric column via the mergeable
    centroid digest (operators/digest.py) — no global sort, rank error
    <= ~2/B, so it stays usable on the widest fact tables where
    ``percentile`` / ``approx_percentile`` over a fresh scan is the
    expensive part. Returns (q, est)."""
    from data_ingestors_spark.operators.digest import digest_quantiles

    qs = quantiles or [0.01, 0.25, 0.5, 0.75, 0.99]
    return digest_quantiles(df.select(column), column, qs, b)
