"""Robust per-group statistics demonstrating the two grouped Python
UDF surfaces (SURVEY.md §2.5 "UDF surface"): ``applyInPandas``
(grouped map) and a grouped-aggregate ``pandas_udf`` (UDAF). Both are
Arrow-batched — a whole group arrives as one pandas object, nothing
row-at-a-time.

Scale notes: a grouped-map UDF requires each GROUP to fit in one
executor's memory — right for low-cardinality/high-volume groupings
like event types (the whole-group semantics, exact medians, are what
the built-ins can't express without a sort). When groups can be huge
and approximate is fine, prefer ``percentile_approx`` (JVM-side
sketch, map-side combined) — that trade-off is the documented
decision rule, not a limitation discovered later.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outlier_stats(df: DataFrame, group_col: str, value_col: str, k: float = 3.0) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-group median, median absolute
    deviation, and the count of |v - median| > k * MAD outliers —
    whole-group exact statistics in one Arrow batch per group."""

    out_schema = f"{group_col} string, med double, mad double, n_outliers long"

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        med = float(v.median())
        mad = float((v - med).abs().median())
        n = int(((v - med).abs() > k * mad).sum())
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "med": [med], "mad": [mad], "n_outliers": [n]}
        )

    return df.groupBy(group_col).applyInPandas(stats, out_schema)


def geometric_mean_udaf():
    """Grouped-aggregate pandas UDF (UDAF): exp(mean(ln(v))). Arrow
    ships the group's values as one Series; numpy does the math.
    Built lazily — parsing the return type needs an active session,
    so a module-level decorator would break imports without one."""

    @F.pandas_udf("double")
    def geometric_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.astype("float64")).mean()))

    return geometric_mean


def geomean_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    return df.groupBy(group_col).agg(geometric_mean_udaf()(F.col(value_col)).alias("gm"))
