"""Mergeable sketch rollups — the pre-aggregation pattern that makes
distinct counts tractable at 100 TB.

Exact count-distinct over a long window re-scans the raw data every
time. The scalable alternative: aggregate each small grain (e.g. a
day) ONCE into an HLL sketch column (Datasketches, built into Spark:
``hll_sketch_agg``), persist the tiny sketch table, and answer any
coarser question by MERGING sketches (``hll_union_agg``) — no raw
re-scan, sketches are associative and idempotent across grains.

Accuracy is the standard HLL bound (~1.6% at the default lgK=12);
tests assert a 5% envelope against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sketch_rollup(
    df: DataFrame, grain_cols: list[str], distinct_col: str, *, lgk: int = 12
) -> DataFrame:
    """One sketch row per grain: (grain..., n_rows, sketch). Persist
    this instead of raw data for distinct-count serving."""
    return df.groupBy(*grain_cols).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias("sketch"),
    )


def merge_sketch_rollup(rollup: DataFrame, group_cols: list[str]) -> DataFrame:
    """Answer a coarser-grain distinct-count question purely from the
    sketch table: union the sketches under each output group and
    estimate. Never touches raw data."""
    agg = [
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias("approx_distinct"),
    ]
    if group_cols:
        return rollup.groupBy(*group_cols).agg(*agg)
    return rollup.agg(*agg)


def heavy_hitter_candidates(
    df: DataFrame, col: str, support_num: int, support_den: int
) -> DataFrame:
    """Frequent-item candidate generation with NO false negatives.

    Exact frequent-item mining (all values with global frequency >=
    s = support_num/support_den) via a full groupBy shuffles one row
    per distinct value — at 100 TB vocabularies that is the dominant
    shuffle. The two-phase scheme here is the Misra-Gries/SpaceSaving
    pattern: a map-side pass emits only values that are locally
    frequent, and the pigeonhole principle guarantees completeness —
    if freq(x)/N >= s globally, then freq_p(x)/N_p >= s in at least
    one sub-batch (a maximum is >= the weighted mean). The candidate
    set is therefore a superset of the true answer and at most
    support_den items per Arrow batch, so the verify pass counts only
    candidates (broadcast semi-join) instead of the whole vocabulary.

    Thresholding is exact integer arithmetic (count * den >= num * n)
    — no float support fraction, so boundary counts can't be dropped
    by representation error. Per-Arrow-batch evaluation keeps worker
    memory bounded by the batch's distinct values; swap the
    value_counts for a k-counter Misra-Gries loop if even that is too
    wide for an adversarial vocabulary.

    Returns the DISTINCT candidate values (column name preserved).
    """
    import pandas as pd

    schema = df.select(col).schema

    def gen(batches):
        for pdf in batches:
            vc = pdf[col].value_counts()
            n = len(pdf)
            keep = vc[vc * support_den >= support_num * n]
            yield pd.DataFrame({col: keep.index})

    return df.select(col).mapInPandas(gen, schema=schema).distinct()
