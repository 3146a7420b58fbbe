"""As-of join (backward / forward / nearest) — a native operator Spark lacks.

Semantics (per left row, within the same key, NULLs when no match):

- ``backward`` (default): right row with the largest
  ``right_time <= left_time`` (inclusive) — DuckDB/pandas
  ``merge_asof`` backward;
- ``forward``: right row with the smallest ``right_time >= left_time``;
- ``nearest``: whichever of the two is closer in time; exact ties
  resolve BACKWARD (pandas ``merge_asof(direction="nearest")``
  tie rule).

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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join; returns all left columns + payload columns.

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)``
    parity): a matched right row further than this from the left time
    is discarded — the payload comes back NULL, exactly as if no match
    existed. Applied AFTER match selection (same as pandas), so for
    ``nearest`` the closer side is chosen first and then checked."""
    lk = left_on or on
    rk = right_on or on
    if lk is None or rk is None:
        raise ValueError("asof_join requires a join key (on= or left_on=/right_on=)")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")

    # The payload travels as ONE struct so the matched right row is
    # picked atomically: carrying each column independently with
    # last(col, ignorenulls) would stitch values from *different* right
    # rows whenever a payload field is legitimately NULL, diverging
    # from DuckDB/pandas ASOF semantics. The struct also carries the
    # matched right time (__mt) so `nearest` can compare distances.
    r_p = F.struct(
        F.col(right_time).alias("__mt"), F.struct(*payload).alias("__pay")
    )
    p_type = right.select(r_p.alias("__p")).schema["__p"].dataType
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
        r_p.alias("__p"),
    )
    unioned = l_tag.unionByName(r_tag)
    # backward pass: ascending time, right rows first at equal times
    # (inclusive <=). forward pass: the exact mirror — descending time,
    # right rows still first, giving the smallest right_time >= t.
    # Both windows share the SAME hash partitioning on the key: one
    # shuffle, at most two in-partition sorts.
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        carried = unioned.select(
            "__is_left", "__l", "__t",
            F.last("__p", ignorenulls=True).over(wb).alias("__p"),
        )
    elif direction == "forward":
        carried = unioned.select(
            "__is_left", "__l", "__t",
            F.last("__p", ignorenulls=True).over(wf).alias("__p"),
        )
    else:  # nearest: both passes, pick the closer match (tie -> backward)
        both = unioned.select(
            "__is_left",
            "__l",
            "__t",
            F.last("__p", ignorenulls=True).over(wb).alias("__b"),
            F.last("__p", ignorenulls=True).over(wf).alias("__f"),
        )
        t_num = F.col("__t").cast("double")
        b_dist = t_num - F.col("__b.__mt").cast("double")
        f_dist = F.col("__f.__mt").cast("double") - t_num
        carried = both.select(
            "__is_left",
            "__l",
            "__t",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(b_dist <= f_dist, F.col("__b"))
            .otherwise(F.col("__f"))
            .alias("__p"),
        )
    if tolerance_seconds is not None:
        dist = F.abs(
            F.col("__t").cast("timestamp").cast("double")
            - F.col("__p.__mt").cast("timestamp").cast("double")
        )
        carried = carried.withColumn(
            "__p", F.when(dist <= F.lit(float(tolerance_seconds)), F.col("__p"))
        )
    return carried.filter(F.col("__is_left") == 1).select("__l.*", "__p.__pay.*")
