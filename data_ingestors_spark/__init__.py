"""data_ingestors_spark — a PySpark-native analytics / data-ingestion engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine tracebloc/data-ingestors (see SURVEY.md): declarative
sources, single-pass column validation, type conformance, null
normalization, label policies, upsert sinks — plus a general relational
operator surface and large-scale training-data pipeline operators
(dedup, similarity search, text analysis) designed for a 100 TB /
1000-executor deployment while testable on local[*].

Design rules (enforced throughout):
- DataFrame/SQL only; Catalyst owns the physical plan.
- No driver-side row loops; no .collect() inside operators.
- Python UDFs only as Arrow-batched pandas UDFs, and only where
  built-in functions cannot express the semantics.
"""

__version__ = "0.1.0"

from data_ingestors_spark.session import get_spark  # noqa: F401
