"""Warehouse catalog: make every ingested table queryable by name.

``attach(spark, warehouse_dir)`` registers each table directory under
the warehouse as a temp view (internal bucket column hidden), so a
user can go straight to ``spark.sql("SELECT ... FROM <table>")`` —
the query-side half of the ingest story. Views are lazy: nothing is
read until a query touches the table, and parquet pruning/pushdown
apply as usual.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from data_ingestors_spark.io.writers import read_table


def attach(spark: SparkSession, warehouse_dir: str) -> list[str]:
    """Register every table directory under ``warehouse_dir`` as a
    temp view named after the directory. Returns the attached names
    (sorted). Non-table entries (no parquet inside) are skipped."""
    if not os.path.isdir(warehouse_dir):
        raise FileNotFoundError(warehouse_dir)
    attached: list[str] = []
    for name in sorted(os.listdir(warehouse_dir)):
        path = os.path.join(warehouse_dir, name)
        if not os.path.isdir(path):
            continue
        has_parquet = any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        )
        if not has_parquet:
            continue
        read_table(spark, path).createOrReplaceTempView(name)
        attached.append(name)
    return attached


def sql(spark: SparkSession, warehouse_dir: str, query: str) -> DataFrame:
    """One-shot convenience: attach the warehouse and run a query."""
    attach(spark, warehouse_dir)
    return spark.sql(query)
