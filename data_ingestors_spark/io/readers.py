"""Readers for the benchmark tables and for ingestion sources.

Benchmark tables (TESTDATA.md): one parquet file per table under an
``sf`` directory. Parquet scans get predicate pushdown + column
pruning for free — callers must select/filter on the returned
DataFrame (never pre-materialize) so Catalyst can push into the scan.

Ingestion sources (CSV/JSON manifests) mirror the reference engine's
read semantics (tracebloc_ingestor/ingestors/csv_ingestor.py,
json_ingestor.py — see SURVEY.md §2.1): declared schema (no
inference), NA sentinel vocabulary, FAILFAST on ragged rows, and a
duplicate-header preflight that Spark would otherwise silently mangle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestors_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# NA sentinels for tabular-family CSV reads; mirrors the reference's
# wider sentinel set (csv_ingestor.py:62-67). Non-tabular categories
# treat only "" as NA.
TABULAR_NA_VALUES = ("", "NA", "NULL", "None")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one benchmark table; asserts UTC timestamp semantics.

    events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects — read nanos as long (legacy conf) and
    convert to a microsecond TimestampType column.
    """
    tune(spark)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if name == "events" and field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer division: ns epochs ~1.7e18 exceed double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_csv_header(spark: SparkSession, path: str) -> list[str]:
    """Driver-side probe of the raw header line (first file split) —
    also the duplicate-header fail-fast the reference has and Spark
    silently papers over (csv_ingestor.py:399-420)."""
    first_line = spark.read.text(path).limit(1).collect()
    if not first_line:
        raise ValueError(f"empty source file: {path}")
    names = [h.strip() for h in first_line[0][0].split(",")]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise ValueError(f"duplicate column headers in {path}: {dupes}")
    return names


def check_duplicate_header(spark: SparkSession, path: str) -> None:
    read_csv_header(spark, path)


def read_csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    tabular: bool = True,
    header: bool = True,
) -> DataFrame:
    """CSV manifest scan with the reference's semantics.

    - declared StructType, no inference (dtype-pinning made moot);
    - FAILFAST surfaces ragged rows / unparseable values loudly;
    - NA sentinel set per category family.
    """
    # Read every file column as string: the reference pins declared
    # string columns to str dtype to stop inference corruption
    # ("007" keeping its zeros — csv_ingestor.py:326-366), and its NA
    # sentinel set is wider than Spark's single nullValue option.
    # Null normalization (functions.nulls.normalize_nulls) and typed
    # conformance casts (functions.casts.conform_types) run as explicit
    # downstream stages shared with the JSON source, mirroring the
    # reference's cross-format consistency (json_ingestor.py:283-308).
    # The raw schema covers the FULL header (manifests legally carry
    # extra columns like the label source — projection happens later);
    # mismatched widths under FAILFAST stay a loud ragged-row error.
    header_names = read_csv_header(spark, path)
    raw_schema = T.StructType([T.StructField(n, T.StringType(), True) for n in header_names])
    return (
        spark.read.schema(raw_schema)
        .option("header", header)
        .option("mode", "FAILFAST")
        .option("encoding", "UTF-8")
        .csv(path)
    )


def read_json_source(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON manifest scan: newline-delimited or a top-level array.

    The reference peeks the first non-whitespace byte to pick a parse
    strategy (json_ingestor.py:19-56); Spark's multiLine option covers
    the array form. We probe the same way, driver-side, on the first
    bytes of the file.
    """
    with open(path, "rb") as f:
        head = f.read(65536).lstrip()
    multiline = head.startswith(b"[")
    return (
        spark.read.schema(schema)
        .option("multiLine", multiline)
        .option("mode", "FAILFAST")
        .json(path)
    )
