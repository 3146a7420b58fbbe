"""Bit-exactness of the sha256 label bucket vs the Python reference
semantics (SURVEY.md §7 hard-part 2) — property-tested."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_ingestors_spark.functions.label_policy import (
    MISSING_BUCKET,
    N_BUCKETS,
    bucket_label,
    label_bucket_col,
)


def spark_buckets(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    rows = df.select(label_bucket_col(F.col("v")).alias("b")).collect()
    return [r.b for r in rows]


def test_known_values(spark):
    vals = ["cat", "dog", "0", "", None, "  spaced  ", "ümlaut", "日本語", "a" * 300]
    expected = [bucket_label(v) for v in vals]
    assert spark_buckets(spark, vals) == expected


def test_missing_is_minus_one(spark):
    assert spark_buckets(spark, [None, "", "   "]) == [MISSING_BUCKET] * 3


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet=string.printable, min_size=0, max_size=40), min_size=1, max_size=20
    )
)
def test_property_matches_python(spark, values):
    expected = [bucket_label(v) for v in values]
    got = spark_buckets(spark, values)
    assert got == expected
    assert all(b == MISSING_BUCKET or 0 <= b < N_BUCKETS for b in got)
