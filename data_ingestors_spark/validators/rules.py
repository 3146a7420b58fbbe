"""Column validation rules as composable conditional aggregations.

The reference's validators are whole-column scans, each independently
re-reading the source (DataValidator chunked scan
tracebloc_ingestor/validators/data_validator.py:143-215; the
time-series validators each do their own full read — SURVEY.md §4
"known inefficiency"). Here every rule is a ``sum(when(cond, 1))`` /
``first(when(cond, v), ignorenulls)`` column expression, and the whole
battery runs as **one** ``df.agg(...)`` pass — one scan at any scale,
map-side partial aggregation, zero Python.

Rule semantics replicated from data_validator.py (SURVEY.md V1):
- values are *present-but-unparseable* only if non-null (missing is
  legal in every column type — data_validator.py:523-537);
- INT family rejects non-integral ("3.5") and non-finite values;
- FLOAT family rejects non-numeric and non-finite;
- BOOL uses the truthy/falsy vocabulary (casts.py);
- VARCHAR(n) counts length > n; CHAR(n) counts length ≠ n;
- DATE/DATETIME/TIME count unparseable present values;
- up to 5 offending samples are collected per rule
  (data_validator.py's sample reporting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestors_spark.functions.casts import (
    FALSY,
    TRUTHY,
    cast_for_decl,
    parse_decl,
    _INT_TYPES,
    _FLOAT_TYPES,
    _DECIMAL_TYPES,
)
from data_ingestors_spark.validators.base import ValidationResult


def _bad_numeric(c: Column, integral: bool) -> Column:
    """Present but not parseable as (integral) finite numeric."""
    s = F.trim(c.cast("string"))
    d = s.try_cast("double")
    present = s.isNotNull() & (s != "")
    bad = d.isNull() | F.isnan(d) | (d == float("inf")) | (d == float("-inf"))
    if integral:
        # `% 1.0`, not floor(): F.floor yields LONG and overflows for
        # |d| > 2^63, misclassifying huge integral values.
        bad = bad | (d % 1.0 != 0.0)
    return present & bad


def _bad_bool(c: Column) -> Column:
    # vocab forms OR numeric-coercible 0/1 ('00', '1e0') conform —
    # mirrors bool_from_vocab exactly (T7 JSON verdicts)
    s = F.lower(F.trim(c.cast("string")))
    coercible = s.try_cast("double").isin(0.0, 1.0)
    return (
        s.isNotNull()
        & (s != "")
        & ~s.isin(TRUTHY + FALSY)
        & ~F.coalesce(coercible, F.lit(False))
    )


def _bad_timestamp(c: Column) -> Column:
    s = F.trim(c.cast("string"))
    return s.isNotNull() & (s != "") & F.try_to_timestamp(s).isNull()


def column_rule_aggs(name: str, decl: str) -> dict[str, Column]:
    """Aggregation columns validating one declared column.

    Returns {metric_name: agg_column}; metric names are
    '<col>__<rule>' so the single agg row unpacks unambiguously.
    """
    c = F.col(name)
    base, args = parse_decl(decl)
    aggs: dict[str, Column] = {f"{name}__nulls": F.sum(F.when(c.isNull(), 1).otherwise(0))}

    def count_of(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    def sample_of(cond: Column) -> Column:
        return F.slice(
            F.array_sort(F.collect_set(F.when(cond, c.cast("string")))), 1, 5
        )

    if base in _INT_TYPES or base == "BIGINT":
        bad = _bad_numeric(c, integral=True)
        # Overflow: numerically integral but outside the declared
        # type's range (conformance cast yields NULL) — an error, not a
        # silent NULL, matching the reference's _raise_on_overflow
        # (csv_ingestor.py:218-221).
        s = F.trim(c.cast("string"))
        present = s.isNotNull() & (s != "")
        overflow = present & ~bad & cast_for_decl(c, decl).isNull()
        aggs[f"{name}__non_integer"] = count_of(bad)
        aggs[f"{name}__overflow"] = count_of(overflow)
        aggs[f"{name}__bad_samples"] = sample_of(bad | overflow)
    elif base in _FLOAT_TYPES or base in _DECIMAL_TYPES:
        bad = _bad_numeric(c, integral=False)
        aggs[f"{name}__non_numeric"] = count_of(bad)
        aggs[f"{name}__bad_samples"] = sample_of(bad)
    elif base in ("BOOL", "BOOLEAN"):
        bad = _bad_bool(c)
        aggs[f"{name}__bad_bool"] = count_of(bad)
        aggs[f"{name}__bad_samples"] = sample_of(bad)
    elif base in ("DATE", "DATETIME", "TIMESTAMP", "TIME"):
        bad = _bad_timestamp(c)
        aggs[f"{name}__unparseable"] = count_of(bad)
        aggs[f"{name}__bad_samples"] = sample_of(bad)
    elif base == "VARCHAR" and args:
        over = c.isNotNull() & (F.length(c.cast("string")) > args[0])
        aggs[f"{name}__too_long"] = count_of(over)
        aggs[f"{name}__bad_samples"] = sample_of(over)
    elif base == "CHAR" and args:
        mis = c.isNotNull() & (F.length(c.cast("string")) != args[0])
        aggs[f"{name}__wrong_length"] = count_of(mis)
        aggs[f"{name}__bad_samples"] = sample_of(mis)
    # TEXT / unparameterized VARCHAR: only the null count applies.
    return aggs


def time_series_aggs(ts_col: str = "timestamp") -> dict[str, Column]:
    """Time-series battery (SURVEY.md V3-V5) as aggregation columns
    over a pre-sorted-window frame; see queries/ingestion.py for the
    composed single-pass form:
    - unparseable timestamps;
    - locale-ambiguous values (day-first vs month-first disagree);
    - timestamps not strictly before today.
    """
    c = F.trim(F.col(ts_col).cast("string"))
    present = c.isNotNull() & (c != "")
    iso = c.rlike(r"^\d{4}-")
    dayfirst = F.try_to_timestamp(c, F.lit("d.M.yyyy H:m:s"))
    monthfirst = F.try_to_timestamp(c, F.lit("M.d.yyyy H:m:s"))
    ambiguous = (
        present
        & ~iso
        & dayfirst.isNotNull()
        & monthfirst.isNotNull()
        & (dayfirst != monthfirst)
    )
    ts = F.try_to_timestamp(c)
    return {
        f"{ts_col}__unparseable": F.sum(F.when(present & ts.isNull() & dayfirst.isNull(), 1).otherwise(0)),
        f"{ts_col}__ambiguous": F.sum(F.when(ambiguous, 1).otherwise(0)),
        f"{ts_col}__not_before_today": F.sum(
            F.when(ts.isNotNull() & (ts >= F.current_date().cast("timestamp")), 1).otherwise(0)
        ),
        f"{ts_col}__min": F.min(ts),
        f"{ts_col}__max": F.max(ts),
    }


def validate_schema_single_pass(df: DataFrame, schema: dict[str, str]) -> ValidationResult:
    """Run the full V1 battery over every declared column in ONE scan.

    Replaces the reference's N sequential chunked passes with a single
    distributed conditional-agg pass (SURVEY.md §4) — same verdicts,
    strictly more informative (all columns reported, not first-failure).
    """
    all_aggs: dict[str, Column] = {}
    for name, decl in schema.items():
        if name not in df.columns:
            continue
        all_aggs.update(column_rule_aggs(name, decl))
    if not all_aggs:
        return ValidationResult(is_valid=True, metadata={"checked_columns": 0})
    row = df.agg(*[v.alias(k) for k, v in all_aggs.items()]).collect()[0].asDict()
    errors: list[str] = []
    metadata: dict[str, object] = dict(row)
    for key, val in row.items():
        if key.endswith("__bad_samples") or key.endswith("__nulls"):
            continue
        if isinstance(val, int) and val > 0:
            col = key.split("__")[0]
            samples = row.get(f"{col}__bad_samples")
            errors.append(f"{key}: {val} offending values (samples: {samples})")
    return ValidationResult(is_valid=not errors, errors=errors, metadata=metadata)
