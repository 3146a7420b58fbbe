"""As-of (backward) join — a native operator Spark lacks.

Semantics: for each left row, attach the right row with the largest
``right_time <= left_time`` within the same key (inclusive), NULLs when
no such row exists — i.e. DuckDB/pandas ``merge_asof`` backward.

Implementation is the **union + window** plan, chosen over
``applyInPandas``/``merge_asof`` because it stays entirely JVM-side and
scales as one shuffle:

1. tag left (1) and right (0) rows, union by (key, time);
2. one window per key ordered by (time, tag) — right rows sort before
   left rows at equal times, giving inclusive semantics;
3. ``last(payload, ignorenulls=True)`` over rows unbounded→current
   carries each right payload forward;
4. keep only left rows.

Cost at scale: a single hash shuffle on the key + an in-partition sort
— identical shape to a sort-merge join, no per-key Python. Hot keys can
be salted by the caller (split the window into salted sub-ranges) if a
single key's history exceeds one executor's partition budget.

The right side must be unique per (key, time) — pre-aggregate if not,
otherwise which same-timestamp row wins is undefined (the reference
ambiguity every asof engine has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None = None,
    *,
    left_on: str | None = None,
    right_on: str | None = None,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """Backward as-of join; returns all left columns + payload columns."""
    lk = left_on or on
    rk = right_on or on
    if lk is None or rk is None:
        raise ValueError("asof_join requires a join key (on= or left_on=/right_on=)")

    # The payload travels as ONE struct so the matched right row is
    # picked atomically: carrying each column independently with
    # last(col, ignorenulls) would stitch values from *different* right
    # rows whenever a payload field is legitimately NULL, diverging
    # from DuckDB/pandas ASOF semantics.
    p_type = right.select(F.struct(*payload).alias("__p")).schema["__p"].dataType
    l_tag = left.select(
        F.col(lk).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(p_type).alias("__p"),
    )
    r_tag = right.select(
        F.col(rk).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.struct(*payload).alias("__p"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        "__l",
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return carried.filter(F.col("__is_left") == 1).select("__l.*", "__p.*")
