"""T8 declared processors: ``spec.processors[]`` resolved to real
DataFrame transforms.

The reference's YAML schema accepts ``spec.processors`` but its runner
warns and skips them (cli/run.py:112-119, schema/ingest.v1.json:246-270
— "accepted but deferred"). Here they run: each entry names a Python
function by dotted path, is imported on the driver, and is applied to
the conformed DataFrame in declaration order via ``df.transform``.

A processor is ``fn(df: DataFrame, **kwargs) -> DataFrame``. Because it
composes into the same logical plan, Catalyst still sees through it —
a processor that only adds column expressions costs no extra scan,
shuffle, or materialization (unlike the reference's per-record
``transform(record)`` hook, which is inherently row-at-a-time).

Entry forms::

    spec:
      processors:
        - data_ingestors_spark.ingest.processors:drop_full_null_rows
        - function: my_pkg.cleaning:clip_outliers
          args: {column: price, lo: 0.0, hi: 1e6}

Two example processors ship below; user code supplies the rest.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Processor = Callable[..., DataFrame]


def resolve_processor(spec: "str | dict") -> tuple[Processor, dict[str, Any], str]:
    """``"pkg.mod:fn"`` or ``{"function": ..., "args": {...}}`` →
    (callable, kwargs, display-name). Fails loud with the path and the
    underlying import error — a typo'd processor must stop the run
    before any data moves."""
    if isinstance(spec, str):
        path, kwargs = spec, {}
    else:
        path, kwargs = spec["function"], dict(spec.get("args") or {})
    modname, sep, fnname = path.partition(":")
    if not sep:
        modname, _, fnname = path.rpartition(".")
    if not modname or not fnname:
        raise ValueError(
            f"processor {path!r}: expected 'package.module:function' "
            "(or dotted 'package.module.function')"
        )
    try:
        mod = importlib.import_module(modname)
    except ImportError as e:
        raise ValueError(f"processor {path!r}: cannot import {modname!r}: {e}") from e
    fn = getattr(mod, fnname, None)
    if not callable(fn):
        raise ValueError(f"processor {path!r}: {modname}.{fnname} is not a callable")
    return fn, kwargs, path


def apply_processors(df: DataFrame, specs: "tuple | list") -> DataFrame:
    """Apply declared processors in order. Resolution happens for ALL
    entries before the first is applied, so a bad later entry cannot
    leave a half-processed plan."""
    resolved = [resolve_processor(s) for s in specs]
    for fn, kwargs, path in resolved:
        out = fn(df, **kwargs)
        if not isinstance(out, DataFrame):
            raise ValueError(f"processor {path!r} returned {type(out).__name__}, not a DataFrame")
        df = out
    return df


# --- example processors --------------------------------------------------


def drop_full_null_rows(df: DataFrame) -> DataFrame:
    """Drop rows where every column is NULL (a common CSV-tail artifact)."""
    return df.na.drop(how="all")


def clip_column(df: DataFrame, column: str, lo: float, hi: float) -> DataFrame:
    """Clamp a numeric column into [lo, hi] — winsorization-style repair."""
    c = F.col(column)
    return df.withColumn(column, F.least(F.greatest(c, F.lit(lo)), F.lit(hi)))
