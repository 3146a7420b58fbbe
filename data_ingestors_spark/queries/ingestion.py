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


# --- referential-integrity orphan audit --------------------------------

# (child table, child key, parent table, parent key) — every FK edge of
# the benchmark schema. Edge label is "child.key->parent".
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def q_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: one row per foreign-key edge with
    child row/key counts and orphan key/row counts (child keys with no
    parent) — the cross-table twin of the reference's single-table
    validator battery (V1/V7 family), and the first check a pipeline
    runs before joining fact tables at scale.

    Plan, per edge: a partial-aggregated groupBy collapses the child
    to (key, rows) — the only shuffle that sees child data, and it
    combines map-side, so a 100 TB lineitem reduces to |distinct keys|
    rows. The anti join against the parent's key column runs on that
    aggregated frame (broadcast when the parent is a dim; shuffled
    ids-only when both sides are facts). Totals and orphan aggregates
    are 1-row frames cross-joined per edge; the 7-edge union is 7 rows.
    NOT-EXISTS semantics: a NULL child key is not an orphan.
    """
    t = tables(spark, sf_dir)
    parts = []
    for child, ckey, parent, pkey in _FK_EDGES:
        keys = (
            t[child]
            .filter(F.col(ckey).isNotNull())
            .groupBy(F.col(ckey).alias("k"))
            .agg(F.count("*").cast("long").alias("rows"))
        )
        orphans = keys.join(
            t[parent].select(F.col(pkey).alias("k")), "k", "left_anti"
        )
        tot = keys.agg(
            F.sum("rows").alias("child_rows"),
            F.count("*").cast("long").alias("child_keys"),
        )
        orp = orphans.agg(
            F.coalesce(F.count("*"), F.lit(0)).cast("long").alias("orphan_keys"),
            F.coalesce(F.sum("rows"), F.lit(0)).cast("long").alias("orphan_rows"),
        )
        parts.append(
            tot.crossJoin(orp).select(
                F.lit(f"{child}.{ckey}->{parent}").alias("edge"),
                "child_rows",
                "child_keys",
                "orphan_keys",
                "orphan_rows",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("edge")


def _o_edge(child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
SELECT '{child}.{ckey}->{parent}' AS edge,
       CAST(sum(rows) AS BIGINT) AS child_rows,
       CAST(count(*) AS BIGINT) AS child_keys,
       CAST(coalesce(sum(CASE WHEN orphan THEN 1 ELSE 0 END), 0) AS BIGINT) AS orphan_keys,
       CAST(coalesce(sum(CASE WHEN orphan THEN rows ELSE 0 END), 0) AS BIGINT) AS orphan_rows
FROM (
  SELECT {ckey} AS k, count(*) AS rows,
         NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}) AS orphan
  FROM {child} c WHERE {ckey} IS NOT NULL GROUP BY 1, 3
)"""


O_ORPHAN_AUDIT = (
    "\nUNION ALL\n".join(_o_edge(*e) for e in _FK_EDGES) + "\nORDER BY edge"
)

QUERIES["orphan_audit"] = q_orphan_audit
ORACLES["orphan_audit"] = O_ORPHAN_AUDIT


# --- refresh loop: oracle-checked novelty reports ------------------------


def q_refresh_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental corpus-refresh loop's per-batch novelty
    reports, DuckDB-verified (VERDICT r11 next-round #6): documents
    split deterministically into two batches (doc_id parity), each
    run through the REAL ``ingest/refresh.py refresh_corpus`` loop
    against a fresh store — preflight fingerprint probe, bucketed
    upsert, near-dup monitor, ledger — and the stored reports read
    back. The oracle recomputes the same numbers declaratively:
    fp = md5(normalized text); batch-1 docs whose fp appeared in
    batch 0 are corpus dups; within a batch, each fingerprint family
    keeps one survivor (longest text, lowest doc_id on ties) whose
    source earns the novel credit, the rest count as in-batch dups
    attributed to their own source.

    Plan (100 TB): everything the loop does is O(|batch| + touched
    buckets) — asserted by the PartitionFilters plan proof and the
    measured flat-per-batch refresh sweep (BASELINE.md §r11); the
    report itself is a per-source handful of rows, collected driver-
    side only to decouple the result from the temp store lifetime."""
    import shutil
    import tempfile

    from data_ingestors_spark.ingest.refresh import refresh_corpus
    from data_ingestors_spark.streaming.neardup import BATCH_PART_COL

    docs = tables(spark, sf_dir, "documents")["documents"]
    tmp = tempfile.mkdtemp(prefix="refresh_report_q_")
    try:
        # r13-opt (guide §2.4, VERDICT r12 #5): ONE documents pass writes
        # both parity batches via partitionBy on the derived key (which
        # the writer drops from the files), replacing two full scans +
        # two serial write jobs. Each par=N directory holds exactly the
        # rows (and columns) the two-scan form wrote.
        docs.withColumn("par", (F.col("doc_id") % 2).cast("int")).write.partitionBy(
            "par"
        ).parquet(f"{tmp}/batches")
        b0, b1 = f"{tmp}/batches/par=0", f"{tmp}/batches/par=1"
        store = f"{tmp}/store"
        refresh_corpus(spark, store, b0, compact_every=0)
        refresh_corpus(spark, store, b1, compact_every=0)
        rows = (
            spark.read.parquet(f"{store}/reports")
            .select(
                F.col(BATCH_PART_COL).cast("int").alias("batch_id"),
                "source", "n_docs", "n_dup_corpus", "n_dup_batch",
                "n_novel", "n_chars", "chars_novel", "novel_frac",
            )
            .collect()  # bounded: batches x sources rows
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(
        rows,
        "batch_id int, source string, n_docs long, n_dup_corpus long,"
        " n_dup_batch long, n_novel long, n_chars long, chars_novel long,"
        " novel_frac double",
    )
    return out.orderBy("batch_id", "source")


O_REFRESH_REPORT = """
WITH docs AS (
  SELECT doc_id, source, CAST(doc_id % 2 AS INTEGER) AS batch_id,
         length(text) AS nc,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
flag AS (
  SELECT d.*,
         CASE WHEN d.batch_id = 1 AND EXISTS (
                SELECT 1 FROM docs p WHERE p.batch_id = 0 AND p.fp = d.fp)
              THEN 1 END AS in_corpus
  FROM docs d
),
tot AS (
  SELECT batch_id, source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN in_corpus IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_corpus,
         CAST(sum(nc) AS BIGINT) AS n_chars
  FROM flag GROUP BY 1, 2
),
scored AS (
  SELECT *, CASE WHEN row_number() OVER (
               PARTITION BY batch_id, fp ORDER BY nc DESC, doc_id ASC) = 1
            THEN 1 ELSE 0 END AS is_winner
  FROM flag WHERE in_corpus IS NULL
),
fam AS (
  SELECT batch_id, source,
         CAST(sum(is_winner) AS BIGINT) AS n_novel,
         CAST(sum(1 - is_winner) AS BIGINT) AS n_dup_batch,
         CAST(sum(CASE WHEN is_winner = 1 THEN nc ELSE 0 END) AS BIGINT) AS chars_novel
  FROM scored GROUP BY 1, 2
)
SELECT t.batch_id, t.source, t.n_docs, t.n_dup_corpus,
       coalesce(f.n_dup_batch, 0) AS n_dup_batch,
       coalesce(f.n_novel, 0) AS n_novel,
       t.n_chars, coalesce(f.chars_novel, 0) AS chars_novel,
       floor((coalesce(f.n_novel, 0) / CAST(t.n_docs AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS novel_frac
FROM tot t LEFT JOIN fam f USING (batch_id, source)
ORDER BY batch_id, source
"""

QUERIES["refresh_report"] = q_refresh_report
ORACLES["refresh_report"] = O_REFRESH_REPORT
