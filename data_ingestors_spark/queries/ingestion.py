"""Ingestion-semantics queries: the reference engine's transforms and
validators (SURVEY.md §2.2-2.4), each driven through the real package
code (functions/, validators/) and oracle-checked against DuckDB by
re-expressing the *semantics* in SQL.

Bad values are injected deterministically from lineitem/orders rows so
every rule fires on every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestors_spark.functions.casts import bool_from_vocab, cast_for_decl
from data_ingestors_spark.functions.label_policy import label_bucket_col
from data_ingestors_spark.functions.nulls import normalize_nulls
from data_ingestors_spark.queries.base import tables
from data_ingestors_spark.validators.rules import column_rule_aggs


# --- T3: privacy label bucketing ---------------------------------------
def q_label_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha256 hash-bucket label policy over customer segments —
    bit-exact with the reference (utils/label_policy.py:52-96)."""
    t = tables(spark, sf_dir, "customer")
    return (
        t["customer"]
        .select("c_custkey", label_bucket_col(F.col("c_mktsegment")).alias("label_bucket"))
    )


# mod-64 of sha256 first-8-bytes == value of hex chars 15-16 mod 64
# (SURVEY.md T3); DuckDB lacks conv(), so hex digits are decoded via
# strpos arithmetic.
O_LABEL_BUCKET = """
SELECT c_custkey,
       CAST(((strpos('0123456789abcdef', substr(sha256(trim(c_mktsegment)), 15, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(sha256(trim(c_mktsegment)), 16, 1)) - 1)) % 64
           AS INTEGER) AS label_bucket
FROM customer
"""


# --- T2: null normalization --------------------------------------------
_NULLSRC = """
CASE WHEN o_orderkey % 7 = 0 THEN 'NA'
     WHEN o_orderkey % 7 = 1 THEN ''
     WHEN o_orderkey % 7 = 2 THEN 'NULL'
     WHEN o_orderkey % 7 = 3 THEN 'None'
     WHEN o_orderkey % 7 = 4 THEN NULL
     WHEN o_orderkey % 7 = 5 THEN concat('  ', o_orderstatus, ' ')
     ELSE o_orderstatus END
"""


def q_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four null forms + sentinel vocabulary → NULL; non-null
    values stringified + trimmed (base.py:342-377 semantics), then
    aggregated to prove the normalization."""
    t = tables(spark, sf_dir, "orders")
    raw = t["orders"].select("o_orderkey", F.expr(_NULLSRC).alias("v"))
    normed = normalize_nulls(raw, columns=["v"], tabular=True)
    return normed.groupBy("v").agg(F.count("*").alias("n"))


O_NULL_NORMALIZE = f"""
WITH raw AS (SELECT o_orderkey, {_NULLSRC} AS v FROM orders),
normed AS (
  SELECT CASE WHEN v IS NULL OR trim(v) IN ('', 'NA', 'NULL', 'None') THEN NULL
              ELSE trim(v) END AS v
  FROM raw
)
SELECT v, count(*) AS n FROM normed GROUP BY v
"""


# --- T6: BOOL vocabulary cast ------------------------------------------
_BOOLSRC = """
CASE l_linenumber WHEN 1 THEN 'true' WHEN 2 THEN 'YES' WHEN 3 THEN '0'
                  WHEN 4 THEN 'no'   WHEN 5 THEN '1.0' WHEN 6 THEN 'maybe'
                  WHEN 7 THEN '1e0'  WHEN 8 THEN '00'
                  ELSE 'T' END
"""


def q_bool_vocab_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truthy/falsy vocabulary cast (csv_ingestor.py:233-247): wider
    than either engine's native boolean cast; unknown tokens → NULL."""
    t = tables(spark, sf_dir, "lineitem")
    raw = t["lineitem"].select(F.expr(_BOOLSRC).alias("v"))
    return (
        raw.select(bool_from_vocab(F.col("v")).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
    )


O_BOOL_VOCAB_CAST = f"""
WITH raw AS (SELECT {_BOOLSRC} AS v FROM lineitem),
casted AS (
  SELECT CASE WHEN lower(trim(v)) IN ('true','t','yes','y','1','1.0') THEN TRUE
              WHEN lower(trim(v)) IN ('false','f','no','n','0','0.0') THEN FALSE
              WHEN TRY_CAST(lower(trim(v)) AS DOUBLE) = 1.0 THEN TRUE
              WHEN TRY_CAST(lower(trim(v)) AS DOUBLE) = 0.0 THEN FALSE
              ELSE NULL END AS b
  FROM raw
)
SELECT b, count(*) AS n FROM casted GROUP BY b
"""


# --- T6: INT conformance (no float round-trip) -------------------------
_INTSRC = """
CASE l_linenumber WHEN 1 THEN '42' WHEN 2 THEN '3.5' WHEN 3 THEN '3.0'
                  WHEN 4 THEN 'abc' WHEN 5 THEN '' WHEN 6 THEN '-7'
                  ELSE CAST(CAST(l_quantity AS BIGINT) AS STRING) END
"""
_INTSRC_DUCK = _INTSRC.replace("AS STRING", "AS VARCHAR")


def q_int_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT cast verdicts: '3.0' → 3, '3.5'/'abc'/'' → NULL
    (csv_ingestor.py:211-221 — no float truncation)."""
    t = tables(spark, sf_dir, "lineitem")
    raw = t["lineitem"].select(F.expr(_INTSRC).alias("v"))
    return (
        raw.select(cast_for_decl(F.col("v"), "INT").cast("int").alias("i"))
        .groupBy("i")
        .agg(F.count("*").alias("n"))
    )


O_INT_CONFORMANCE = f"""
WITH raw AS (SELECT {_INTSRC_DUCK} AS v FROM lineitem),
casted AS (
  SELECT CASE WHEN try_cast(v AS DOUBLE) IS NOT NULL
                   AND try_cast(v AS DOUBLE) = floor(try_cast(v AS DOUBLE))
                   AND isfinite(try_cast(v AS DOUBLE))
              THEN CAST(try_cast(v AS DOUBLE) AS INTEGER) END AS i
  FROM raw
)
SELECT i, count(*) AS n FROM casted GROUP BY i
"""


# --- V1: single-pass validation aggregation ----------------------------
_VALSRC = """
SELECT CASE l_linenumber WHEN 1 THEN '12' WHEN 2 THEN '3.5' WHEN 3 THEN 'oops'
                         ELSE CAST(CAST(l_quantity AS BIGINT) AS {str_t}) END AS int_col,
       CASE l_linenumber WHEN 1 THEN 'x' WHEN 2 THEN 'toolongvalue!!'
                         ELSE substr(l_returnflag, 1, 1) END AS vc_col,
       CASE l_linenumber WHEN 1 THEN 'not-a-date'
                         ELSE '1995-06-17 00:00:00' END AS ts_col
FROM lineitem
"""


def q_validation_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole-file DataValidator battery as ONE
    conditional-agg pass (SURVEY.md §4: replaces ≥6 sequential source
    scans). Output: one row of per-rule offender counts."""
    tables(spark, sf_dir, "lineitem")["lineitem"].createOrReplaceTempView("lineitem")
    raw = spark.sql(_VALSRC.format(str_t="STRING"))
    aggs = {}
    aggs.update(column_rule_aggs("int_col", "INT"))
    aggs.update(column_rule_aggs("vc_col", "VARCHAR(8)"))
    aggs.update(column_rule_aggs("ts_col", "DATETIME"))
    counts = {k: v for k, v in aggs.items() if not k.endswith("__bad_samples")}
    return raw.agg(*[v.cast("long").alias(k) for k, v in counts.items()])


O_VALIDATION_AGG = f"""
WITH raw AS ({_VALSRC.format(str_t="VARCHAR")})
SELECT CAST(sum(CASE WHEN int_col IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS int_col__nulls,
       CAST(sum(CASE WHEN trim(int_col) IS NOT NULL AND trim(int_col) <> ''
                      AND (try_cast(trim(int_col) AS DOUBLE) IS NULL
                           OR NOT isfinite(try_cast(trim(int_col) AS DOUBLE))
                           OR try_cast(trim(int_col) AS DOUBLE) <> floor(try_cast(trim(int_col) AS DOUBLE)))
                THEN 1 ELSE 0 END) AS BIGINT) AS int_col__non_integer,
       CAST(sum(CASE WHEN trim(int_col) IS NOT NULL AND trim(int_col) <> ''
                      AND try_cast(trim(int_col) AS DOUBLE) IS NOT NULL
                      AND isfinite(try_cast(trim(int_col) AS DOUBLE))
                      AND try_cast(trim(int_col) AS DOUBLE) = floor(try_cast(trim(int_col) AS DOUBLE))
                      AND (CASE WHEN regexp_matches(trim(int_col), '^[+-]?[0-9]+$')
                                THEN try_cast(trim(int_col) AS INTEGER)
                                ELSE try_cast(try_cast(trim(int_col) AS DOUBLE) AS INTEGER) END) IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS int_col__overflow,
       CAST(sum(CASE WHEN vc_col IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS vc_col__nulls,
       CAST(sum(CASE WHEN vc_col IS NOT NULL AND length(vc_col) > 8 THEN 1 ELSE 0 END) AS BIGINT) AS vc_col__too_long,
       CAST(sum(CASE WHEN ts_col IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_col__nulls,
       CAST(sum(CASE WHEN trim(ts_col) IS NOT NULL AND trim(ts_col) <> ''
                      AND try_cast(trim(ts_col) AS TIMESTAMP) IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS ts_col__unparseable
FROM raw
"""


QUERIES = {
    "label_bucket": q_label_bucket,
    "null_normalize": q_null_normalize,
    "bool_vocab_cast": q_bool_vocab_cast,
    "int_conformance": q_int_conformance,
    "validation_agg": q_validation_agg,
}

ORACLES = {
    "label_bucket": O_LABEL_BUCKET,
    "null_normalize": O_NULL_NORMALIZE,
    "bool_vocab_cast": O_BOOL_VOCAB_CAST,
    "int_conformance": O_INT_CONFORMANCE,
    "validation_agg": O_VALIDATION_AGG,
}
