"""Time-series validators (SURVEY.md V2-V6) as single-pass
aggregations. The reference re-reads the whole source per validator
(time_format_validator.py:125-136 etc.); each function here is one
``agg`` over an already-loaded DataFrame, and the monotonicity check
uses a window only on the validated series.

Scale note (SURVEY §7 hard-part 4): global monotonicity via a single
unbounded window serializes one series through one task — fine for
validating one sensor series; for many series, partition the window by
series key. ``validate_time_ordered`` accepts an optional key for
exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_ingestors_spark.validators.base import ValidationResult
from data_ingestors_spark.validators.rules import _bad_numeric


def validate_time_format(df: DataFrame, ts_col: str, schema: dict[str, str]) -> ValidationResult:
    """V3: column exists, declared exactly TIMESTAMP, values parse, and
    the locale-ambiguity guard — a value that parses differently
    day-first vs month-first (non-ISO) is rejected
    (time_format_validator.py:79-107)."""
    if ts_col not in df.columns:
        return ValidationResult(False, errors=[f"timestamp column {ts_col!r} missing"])
    decl = (schema.get(ts_col) or "").strip().upper()
    if decl and decl != "TIMESTAMP":
        return ValidationResult(
            False, errors=[f"{ts_col!r} must be declared TIMESTAMP, got {decl!r}"]
        )
    c = F.trim(F.col(ts_col).cast("string"))
    present = c.isNotNull() & (c != "")
    iso = c.rlike(r"^\d{4}-")
    dayfirst = F.try_to_timestamp(c, F.lit("d.M.yyyy H:m:s"))
    monthfirst = F.try_to_timestamp(c, F.lit("M.d.yyyy H:m:s"))
    plain = F.try_to_timestamp(c)
    unparseable = present & plain.isNull() & dayfirst.isNull() & monthfirst.isNull()
    ambiguous = present & ~iso & dayfirst.isNotNull() & monthfirst.isNotNull() & (
        dayfirst != monthfirst
    )
    row = df.agg(
        F.sum(F.when(unparseable, 1).otherwise(0)).alias("unparseable"),
        F.sum(F.when(ambiguous, 1).otherwise(0)).alias("ambiguous"),
    ).collect()[0]
    errors = []
    if row.unparseable:
        errors.append(f"{row.unparseable} unparseable timestamp value(s)")
    if row.ambiguous:
        errors.append(
            f"{row.ambiguous} locale-ambiguous timestamp value(s) (day-first vs month-first)"
        )
    return ValidationResult(not errors, errors=errors)


def validate_time_ordered(
    df: DataFrame, ts_col: str, series_key: str | None = None
) -> ValidationResult:
    """V4: monotonically increasing timestamps; counts out-of-order
    adjacent pairs via lag."""
    # count pairs where the *input order* breaks time order: compare
    # against the previous row in file order via a monotonic row id.
    keep = [ts_col] + ([series_key] if series_key else [])
    df_id = df.select(*keep).withColumn("__pos", F.monotonically_increasing_id())
    wpos = (
        Window.partitionBy(series_key).orderBy("__pos")
        if series_key
        else Window.partitionBy().orderBy("__pos")
    )
    ts = F.col(ts_col).cast("timestamp")
    flagged = df_id.withColumn(
        "__ooo", F.when(ts < F.lag(ts).over(wpos), 1).otherwise(0)
    )
    row = flagged.agg(F.sum("__ooo").alias("n_out_of_order")).collect()[0]
    n = row.n_out_of_order or 0
    return ValidationResult(
        n == 0,
        errors=[f"{n} out-of-order adjacent timestamp pair(s)"] if n else [],
        metadata={"n_out_of_order": n},
    )


def _ordered_partition_agg(df: DataFrame, ts_col: str) -> DataFrame:
    """The parallel core of :func:`validate_time_ordered_scalable`:
    per scan partition, the within-partition out-of-order count plus
    the (first, last) boundary rows — ONE aggregation, partitioned by
    spark_partition_id, so the plan carries no SinglePartition
    exchange at any input size (plan-asserted in tests)."""
    base = (
        df.select(F.col(ts_col).cast("timestamp").alias("__ts"))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__pos", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("__pid").orderBy("__pos")
    within = base.withColumn(
        "__ooo", F.when(F.col("__ts") < F.lag("__ts").over(w), 1).otherwise(0)
    )
    return (
        within.groupBy("__pid")
        .agg(
            F.sum("__ooo").alias("n_ooo"),
            F.min(F.struct(F.col("__pos").alias("pos"), F.col("__ts").alias("ts"))).alias(
                "first_row"
            ),
            F.max(F.struct(F.col("__pos").alias("pos"), F.col("__ts").alias("ts"))).alias(
                "last_row"
            ),
        )
        .orderBy("__pid")
    )


def validate_time_ordered_scalable(df: DataFrame, ts_col: str) -> ValidationResult:
    """V4 at 100 TB (SURVEY.md §7 hard part 4): monotonicity without a
    single-partition global window. Two parallel pieces:

    1. WITHIN each scan partition: lag over a per-partition window
       (partitionBy(spark_partition_id) — every partition sorts only
       its own rows by arrival position, fully parallel);
    2. ACROSS partitions: each partition reduces to (first_ts,
       last_ts) by arrival position, and the tiny per-partition
       boundary frame (one row per partition) is checked on the
       driver: last(i) <= first(i+1), in partition-id order — file
       order, since Spark's file source assigns split ids in order.

    Equivalent to the global-window form whenever input order is the
    partition-id-then-position order of the scan (parquet/CSV file
    splits), which is the reference's definition of "row order".
    """
    agg = _ordered_partition_agg(df, ts_col).collect()
    # ^ one row per partition — bounded, driver-safe
    n_within = sum(r.n_ooo or 0 for r in agg)
    n_boundary = sum(
        1
        for prev, cur in zip(agg, agg[1:])
        if prev.last_row.ts is not None
        and cur.first_row.ts is not None
        and cur.first_row.ts < prev.last_row.ts
    )
    n = n_within + n_boundary
    return ValidationResult(
        n == 0,
        errors=[f"{n} out-of-order adjacent timestamp pair(s)"] if n else [],
        metadata={
            "n_out_of_order": n,
            "n_within_partition": n_within,
            "n_at_partition_boundary": n_boundary,
            "n_partitions": len(agg),
        },
    )


def validate_time_before_today(df: DataFrame, ts_col: str) -> ValidationResult:
    """V5: no timestamp >= today; reports earliest/latest."""
    ts = F.col(ts_col).cast("timestamp")
    row = df.agg(
        F.sum(F.when(ts >= F.current_date().cast("timestamp"), 1).otherwise(0)).alias("n_future"),
        F.min(ts).alias("earliest"),
        F.max(ts).alias("latest"),
    ).collect()[0]
    n = row.n_future or 0
    return ValidationResult(
        n == 0,
        errors=[f"{n} timestamp(s) not before today"] if n else [],
        metadata={"earliest": str(row.earliest), "latest": str(row.latest)},
    )


def validate_numeric_columns(df: DataFrame, exclude: list[str]) -> ValidationResult:
    """V2: every column except the time axis must be numeric; nulls
    tolerated (lag/window features legitimately blank —
    numeric_columns_validator.py:80-97), null counts reported."""
    cols = [c for c in df.columns if c not in exclude and not c.startswith("__")]
    if not cols:
        return ValidationResult(True)
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.when(_bad_numeric(F.col(c), integral=False), 1).otherwise(0)).alias(f"{c}__non_numeric"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
    row = df.agg(*aggs).collect()[0].asDict()
    errors = [
        f"{k}: {v} non-numeric value(s)"
        for k, v in row.items()
        if k.endswith("__non_numeric") and v
    ]
    meta = {k: v for k, v in row.items() if k.endswith("__nulls")}
    return ValidationResult(not errors, errors=errors, metadata=meta)


def validate_time_to_event(df: DataFrame, time_col: str = "time") -> ValidationResult:
    """V6: required time column by exact name; numeric; non-negative;
    min/max/mean stats; nulls → warning."""
    if time_col not in df.columns:
        return ValidationResult(False, errors=[f"required time column {time_col!r} missing"])
    c = F.col(time_col)
    d = c.cast("string").try_cast("double")
    row = df.agg(
        F.sum(F.when(_bad_numeric(c, integral=False), 1).otherwise(0)).alias("non_numeric"),
        F.sum(F.when(d < 0, 1).otherwise(0)).alias("negative"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("nulls"),
        F.min(d).alias("mn"),
        F.max(d).alias("mx"),
        F.avg(d).alias("mean"),
    ).collect()[0]
    errors = []
    if row.non_numeric:
        errors.append(f"{row.non_numeric} non-numeric time value(s)")
    if row.negative:
        errors.append(f"{row.negative} negative time value(s)")
    warnings = [f"{row.nulls} null time value(s)"] if row.nulls else []
    return ValidationResult(
        not errors,
        errors=errors,
        warnings=warnings,
        metadata={"min": row.mn, "max": row.mx, "mean": row.mean},
    )
