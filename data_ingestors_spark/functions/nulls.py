"""Null-form normalization — the reference's load-bearing null semantics.

The reference unifies four null representations to SQL NULL in
``process_record`` (tracebloc_ingestor/ingestors/base.py:342-377):
Python None, float NaN/NaT, pd.NA, and the literal empty string "".
Booleans are exempt from stringification; every other non-null value is
stringified and stripped. Tabular CSV reads additionally treat the
sentinels "NA"/"NULL"/"None" as missing (csv_ingestor.py:62-67).

Here the whole policy is one declarative column expression per column —
a single projection, fully codegen'd, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestors_spark.io.readers import TABULAR_NA_VALUES


def normalize_nulls(df: DataFrame, columns: list[str] | None = None, tabular: bool = True) -> DataFrame:
    """Map all null forms to NULL; trim everything else to a clean string.

    Works on the raw (all-string) post-read frame. Boolean-typed
    columns pass through untouched (base.py:358-371).
    """
    sentinels = list(TABULAR_NA_VALUES) if tabular else [""]
    out = []
    target = set(columns or df.columns)
    for field in df.schema.fields:
        c = F.col(field.name)
        if field.name not in target or isinstance(field.dataType, T.BooleanType):
            out.append(c)
            continue
        if isinstance(field.dataType, (T.FloatType, T.DoubleType)):
            cleaned = F.when(c.isNull() | F.isnan(c), F.lit(None)).otherwise(c)
        elif isinstance(field.dataType, T.StringType):
            trimmed = F.trim(c)
            cleaned = F.when(c.isNull() | trimmed.isin(sentinels), F.lit(None)).otherwise(trimmed)
        else:
            cleaned = c
        out.append(cleaned.alias(field.name))
    return df.select(out)
