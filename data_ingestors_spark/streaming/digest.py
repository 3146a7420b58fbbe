"""Streaming quantiles: incremental mergeable centroid digests over a
value stream.

Per micro-batch, compress the batch's values into <= B equal-weight
centroids (operators/digest.py) and write them under a batch-keyed
partition — centroid sets merge by UNION, so the cumulative digest is
just the concatenation of partials, a replayed batch overwrites its
own partition (exactly-once effect, stream_rollup contract), and any
quantile is answered from the merged centroid frame at read time.

This is the streaming percentile monitor for ingest pipelines: track
p50/p99 of document length / score / latency over an unbounded stream
with bounded state (B centroids per batch, compacted offline), no
global sort, and rank error bounded by ~2/B per merge level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def digest_fold_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    col: str,
    b: int = 200,
) -> None:
    """Write one micro-batch's centroid digest under __batch=<id>."""
    from data_ingestors_spark.operators.digest import build_digest

    partial = build_digest(batch_df, col, b).withColumn(
        "__batch", F.lit(int(batch_id))
    )
    partial.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("__batch").parquet(store_path)


def stream_quantile_digest(
    values: DataFrame,
    store_path: str,
    checkpoint: str,
    *,
    col: str = "value",
    b: int = 200,
    available_now: bool = False,
):
    """Fold a value stream into batch-keyed centroid digests; answer
    quantiles with ``read_stream_quantiles``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        digest_fold_batch(batch_df.sparkSession, batch_df, batch_id, store_path, col, b)

    writer = (
        values.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_quantiles(
    spark: SparkSession, store_path: str, quantiles: list[float], b: int = 200
) -> DataFrame:
    """Merge all batch digests and interpolate the requested
    quantiles — the same math as the batch operator over the union of
    all folded values, within the digest's rank-error bound."""
    from data_ingestors_spark.operators.digest import merge_digest_quantiles

    centroids = spark.read.parquet(store_path).select("c_mean", "c_weight")
    return merge_digest_quantiles(centroids, quantiles, b)
