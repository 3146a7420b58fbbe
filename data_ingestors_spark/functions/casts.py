"""Type conformance casts — MySQL-style declared types → Spark types.

Reproduces the reference's per-type conversion verdicts
(tracebloc_ingestor/ingestors/csv_ingestor.py:184-280 and the JSON
mirror json_ingestor.py:77-181 — SURVEY.md T6/T7):

- INT family: integral values only, no float round-trip truncation
  ("3.5" is an error, "3.0" is 3);
- FLOAT/DOUBLE/DECIMAL: numeric, overflow guarded;
- BOOL: explicit truthy/falsy vocabulary {true,t,yes,y,1,1.0} /
  {false,f,no,n,0,0.0}, case-insensitive — wider than Spark's native
  boolean cast;
- DATE/DATETIME/TIMESTAMP: strict parse; DATE emits date-only;
- TIME: no Spark TimeType pre-4.0 → canonical "HH:mm:ss" string
  (documented divergence, SURVEY §7 hard-part 3);
- VARCHAR/CHAR/TEXT: string passthrough (length checks are a
  validation rule, not a cast).

All casts use ``try_*`` semantics: unparseable present values become
NULL *and are counted* by the validation pass (validators/rules.py),
reproducing the reference's "clear per-column error" contract without
task-aborting exceptions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRUTHY = ["true", "t", "yes", "y", "1", "1.0"]
FALSY = ["false", "f", "no", "n", "0", "0.0"]

_TYPE_RE = re.compile(r"^\s*([A-Za-z]+)\s*(?:\(([^)]*)\))?")

# MySQL declared-type vocabulary → canonical family
# (mirrors database.py:135-156 / data_validator.py:52-75 lockstep).
_INT_TYPES = {"INT", "INTEGER", "TINYINT", "SMALLINT", "MEDIUMINT"}
_FLOAT_TYPES = {"FLOAT", "DOUBLE"}
_DECIMAL_TYPES = {"DECIMAL", "NUMERIC"}
_STR_TYPES = {"VARCHAR", "CHAR", "TEXT"}
_BOOL_TYPES = {"BOOL", "BOOLEAN"}
_BIN_TYPES = {"BLOB", "LONGBLOB"}


def parse_decl(decl: str) -> tuple[str, list[int]]:
    """'DECIMAL(10,2) NOT NULL' → ('DECIMAL', [10, 2])."""
    m = _TYPE_RE.match(decl)
    if not m:
        raise ValueError(f"unparseable type declaration: {decl!r}")
    base = m.group(1).upper()
    args = [int(a) for a in m.group(2).split(",")] if m.group(2) else []
    return base, args


def is_numeric_decl(decl: str) -> bool:
    """True for INT/BIGINT/FLOAT/DOUBLE/DECIMAL declarations."""
    base, _ = parse_decl(decl)
    return base in _INT_TYPES or base == "BIGINT" or base in _FLOAT_TYPES or base in _DECIMAL_TYPES


def bool_from_vocab(c: Column) -> Column:
    """Truthy/falsy vocabulary cast (wider than Spark's bool cast),
    plus the JSON verdicts' numeric-coercible forms: any string whose
    numeric value is exactly 1 or 0 — '00', '1e0', '1.000' — conforms
    (json_ingestor.py:77-181; SURVEY.md T7)."""
    lc = F.lower(F.trim(c.cast("string")))
    num = lc.try_cast("double")
    return (
        F.when(lc.isin(TRUTHY), F.lit(True))
        .when(lc.isin(FALSY), F.lit(False))
        .when(num == 1.0, F.lit(True))
        .when(num == 0.0, F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def cast_for_decl(c: Column, decl: str) -> Column:
    """Build the conformance cast expression for one declared type."""
    base, args = parse_decl(decl)
    if base in _INT_TYPES or base == "BIGINT":
        target = "bigint" if base == "BIGINT" else "int"
        s = F.trim(c.cast("string"))
        # Exact path: canonical integer strings cast DIRECTLY to the
        # target (no double round-trip — BIGINT beyond 2^53 stays
        # exact; the reference keeps exact int64 the same way,
        # csv_ingestor.py:218-221). try_cast's ANSI semantics turn
        # overflow into NULL, which the validator counts as an
        # overflow error (rules.py) rather than silently wrapping.
        exact = s.rlike(r"^[+-]?[0-9]+$")
        # Float-form integrals ("3.0") go through the double — their
        # precision is bounded by the literal anyway. "3.5" → NULL.
        d = s.try_cast("double")
        # integral test via `% 1.0` — F.floor returns LONG, which
        # itself overflows for |d| > 2^63 and would misclassify huge
        # integral values as fractional.
        float_integral = d.isNotNull() & ~F.isnan(d) & (d % 1.0 == 0.0)
        return (
            F.when(exact, s.try_cast(target))
            .when(float_integral, d.try_cast(target))
            .otherwise(F.lit(None).cast(target))
        )
    if base in _FLOAT_TYPES:
        return c.cast("string").try_cast("double")
    if base in _DECIMAL_TYPES:
        p, s = (args + [38, 18])[:2] if args else (38, 18)
        return c.cast("string").try_cast(f"decimal({p},{s})")
    if base in _BOOL_TYPES:
        return bool_from_vocab(c)
    if base == "DATE":
        return c.cast("string").try_cast("date")
    if base in ("DATETIME", "TIMESTAMP"):
        return c.cast("string").try_cast("timestamp")
    if base == "TIME":
        # Canonical HH:mm:ss string (SURVEY §7: no TimeType); the
        # source's fractional-second digits are re-appended verbatim
        # (the reference keeps the whole string verbatim, base.py TIME
        # passthrough) — date_format alone would truncate them.
        s = F.trim(c.cast("string"))
        t = F.try_to_timestamp(F.concat(F.lit("1970-01-01 "), s))
        whole = F.date_format(t, "HH:mm:ss")
        frac = F.regexp_extract(s, r"\.([0-9]+)\s*$", 1)
        return F.when(t.isNull(), F.lit(None).cast("string")).when(
            frac != "", F.concat(whole, F.lit("."), frac)
        ).otherwise(whole)
    if base in _STR_TYPES:
        return c.cast("string")
    if base in _BIN_TYPES:
        return c.cast("binary")
    raise ValueError(f"unsupported declared type: {decl!r}")


def conform_types(df: DataFrame, schema: dict[str, str]) -> DataFrame:
    """Apply conformance casts for every declared column present in df.

    Undeclared columns pass through unchanged. One projection — Catalyst
    fuses it with neighbors; nothing leaves the JVM.
    """
    cols = []
    for name in df.columns:
        if name in schema:
            cols.append(cast_for_decl(F.col(name), schema[name]).alias(name))
        else:
            cols.append(F.col(name))
    return df.select(cols)
