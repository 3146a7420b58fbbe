"""Mergeable quantile digest — distributed percentiles without a
global sort.

Exact percentiles need a full sort (or Spark's approx_percentile,
whose Greenwald-Khanna state is opaque and not reusable across
grains). The digest here is the t-digest idea in its simplest honest
form: each partition compresses its values into <= B equal-weight
centroids (mean, weight); centroids are tiny (B rows per partition),
merge associatively, and any quantile is answered from the merged
centroid frame by cumulative-weight interpolation.

Error bound: with equal-weight clustering, a rank query can be off by
at most the weight of one centroid per merge level — <= 1/B of the
data per level, two levels here (partition pass + merge pass), so the
RANK error is bounded by ~2/B. B=200 => well under 1 percentile
point. Tail accuracy is uniform (a real t-digest's scale function
sharpens tails at the same budget — the uniform bound is what the
tests assert).

Scale shape: one narrow mapInPandas pass over the value column (no
shuffle), then a groupBy over (key, ~B x n_partitions) centroid rows
— the shuffle carries centroids, never values. The merged digest can
be persisted per day/source and re-merged across grains like the HLL
rollup (operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

import numpy as np
import pandas as pd

CENTROID_SCHEMA = StructType(
    [
        StructField("c_mean", DoubleType()),
        StructField("c_weight", LongType()),
    ]
)


def _compress(values: "np.ndarray", b: int) -> "pd.DataFrame":
    """Sort and chunk into <= b equal-count centroids."""
    values = np.sort(values[~np.isnan(values)])
    n = len(values)
    if n == 0:
        return pd.DataFrame({"c_mean": [], "c_weight": []})
    k = min(b, n)
    bounds = np.linspace(0, n, k + 1).astype(np.int64)
    means = [float(values[lo:hi].mean()) for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    weights = [int(hi - lo) for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    return pd.DataFrame({"c_mean": means, "c_weight": weights})


def build_digest(df: DataFrame, col: str, b: int = 200) -> DataFrame:
    """Compress a value column into per-partition centroids
    ((c_mean, c_weight) rows, <= b per Arrow batch). No shuffle."""

    def gen(batches):
        for pdf in batches:
            yield _compress(pdf[col].to_numpy(dtype=np.float64), b)

    return df.select(F.col(col).alias(col)).mapInPandas(gen, schema=CENTROID_SCHEMA)


def merge_digest_quantiles(
    centroids: DataFrame, quantiles: list[float], b: int = 200
) -> DataFrame:
    """Merge a centroid frame and answer quantiles.

    The merge is one applyInPandas over ALL centroids (bounded: B
    centroids per input partition — for extreme partition counts,
    interpose one extra merge level by bucketing on
    hash(c_mean) % k first; the operation is associative).
    Returns (q, est) rows.
    """
    qs = sorted(quantiles)

    out_schema = StructType(
        [StructField("q", DoubleType()), StructField("est", DoubleType())]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("c_mean").reset_index(drop=True)
        w = pdf["c_weight"].to_numpy(dtype=np.float64)
        m = pdf["c_mean"].to_numpy(dtype=np.float64)
        total = w.sum()
        if total == 0:
            return pd.DataFrame({"q": qs, "est": [float("nan")] * len(qs)})
        # re-compress to b centroids so the persisted digest stays small
        if len(m) > b:
            cum = np.cumsum(w)
            # greedy equal-weight re-clustering
            targets = np.linspace(0, total, b + 1)[1:-1]
            idx = np.searchsorted(cum, targets, side="left")
            groups = np.split(np.arange(len(m)), np.unique(idx))
            m = np.array([np.average(m[g], weights=w[g]) for g in groups if len(g)])
            w = np.array([w[g].sum() for g in groups if len(g)])
        # centroid centers sit at cumulative mid-weights
        centers = np.cumsum(w) - w / 2.0
        ests = np.interp(np.asarray(qs) * total, centers, m)
        return pd.DataFrame({"q": qs, "est": ests})

    return (
        centroids.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda _key, pdf: merge(pdf), schema=out_schema)
    )


def digest_quantiles(
    df: DataFrame, col: str, quantiles: list[float], b: int = 200
) -> DataFrame:
    """End-to-end: compress + merge + interpolate. Rank error <= ~2/b."""
    return merge_digest_quantiles(build_digest(df, col, b), quantiles, b)


def build_digest_grouped(
    df: DataFrame, key: str, col: str, b: int = 64
) -> DataFrame:
    """Per-group centroid digests with bounded worker memory: each
    Arrow batch compresses each group's values it holds into <= b
    centroids — a hot group spanning many batches/partitions just
    contributes more partials, which merge downstream. Output:
    (key, c_mean, c_weight)."""

    out_schema = StructType(
        [df.schema[key]] + list(CENTROID_SCHEMA.fields)
    )

    def gen(batches):
        for pdf in batches:
            parts = []
            for k, sub in pdf.groupby(key, sort=False):
                c = _compress(sub[col].to_numpy(dtype=np.float64), b)
                c.insert(0, key, k)
                parts.append(c)
            yield pd.concat(parts) if parts else pd.DataFrame(
                {key: [], "c_mean": [], "c_weight": []}
            )

    return df.select(key, col).mapInPandas(gen, schema=out_schema)


def grouped_digest_quantiles(
    df: DataFrame, key: str, col: str, quantiles: list[float], b: int = 64
) -> DataFrame:
    """Per-group quantiles from merged per-group digests: one
    centroid-only shuffle keyed on the group (bounded by
    groups x batches x b rows, never values), then the same
    merge + interpolation per group. Rank error <= ~2/b per group.
    Output: (key, q, est)."""
    qs = sorted(quantiles)
    cent = build_digest_grouped(df, key, col, b)

    out_schema = StructType(
        [df.schema[key], StructField("q", DoubleType()), StructField("est", DoubleType())]
    )

    def merge(keyt, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("c_mean").reset_index(drop=True)
        w = pdf["c_weight"].to_numpy(dtype=np.float64)
        m = pdf["c_mean"].to_numpy(dtype=np.float64)
        total = w.sum()
        centers = np.cumsum(w) - w / 2.0
        ests = np.interp(np.asarray(qs) * total, centers, m)
        return pd.DataFrame({key: [keyt[0]] * len(qs), "q": qs, "est": ests})

    return cent.groupBy(key).applyInPandas(merge, schema=out_schema)
