"""Privacy-preserving label transform — bit-exact with the reference.

Reference (tracebloc_ingestor/utils/label_policy.py:52-96): policy
``bucket`` maps a label to ``int.from_bytes(sha256(str(v).strip())
.digest()[:8], "big") % 64``; a missing label maps to −1; policy
``passthrough`` copies the value.

Bucket math in pure SQL (SURVEY.md T3): 64 = 2**6 divides 2**8, so the
mod-64 of the big-endian first-8-bytes integer depends only on byte 7
(hex chars 15-16) — ``conv(substring(sha2(v,256), 15, 2), 16, 10) % 64``.
Property-tested against hashlib in tests/test_label_policy.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

N_BUCKETS = 64
MISSING_BUCKET = -1


def bucket_label(value: object) -> int:
    """Python reference implementation (for property tests)."""
    if value is None or (isinstance(value, str) and value.strip() == ""):
        return MISSING_BUCKET
    digest = hashlib.sha256(str(value).strip().encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") % N_BUCKETS


def label_bucket_col(c: Column) -> Column:
    """Columnar equivalent of :func:`bucket_label` — JVM-side, no UDF.

    Python ``str.strip()`` strips every whitespace class, Spark's
    ``trim`` only spaces — use a regex strip for bit-exact parity
    (ASCII whitespace; exotic unicode spaces are out of contract).
    """
    s = F.regexp_replace(F.regexp_replace(c.cast("string"), r"^\s+", ""), r"\s+$", "")
    byte7 = F.substring(F.sha2(s, 256), 15, 2)
    bucket = (F.conv(byte7, 16, 10).cast("long") % N_BUCKETS).cast("int")
    return F.when(s.isNull() | (s == ""), F.lit(MISSING_BUCKET)).otherwise(bucket)
