"""Shuffle-reduction and planner-diagnostic operators.

Three operators a 100 TB pipeline runs BEFORE (or instead of) the
expensive plan: a Bloom-prefiltered semi join that cuts big-side
shuffle volume when neither side broadcasts, a join-key skew audit
that surfaces the hot keys that will dominate a shuffle before you
pay for it, and an exact join-cardinality predictor (sum over shared
keys of count products) that prices a join from two cheap aggregates.

Registry contract as everywhere: identical output column names on the
Spark and DuckDB sides, integer aggregates cast to BIGINT, doubles
rounded engine-portably (queries/base.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestors_spark.functions.rounding import fround, o_fround
from data_ingestors_spark.operators.joins import bloom_semi_join
from data_ingestors_spark.queries.base import DEC, o_dsum, dsum, tables

QUERIES: dict = {}
ORACLES: dict = {}


# --- Bloom-prefiltered semi join ---------------------------------------

def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority mix for customers in the BUILDING segment with a
    positive balance — computed as ``orders ⋉ qualifying-customers``
    through :func:`bloom_semi_join`.

    Why the detour through a Bloom filter: at 100 TB neither orders
    nor the qualifying-customer key set fits the broadcast threshold,
    so a plain semi join shuffles the FULL orders table on o_custkey.
    The 128 Kbit filter (~16 KB serialized) broadcasts no matter how
    many keys qualify and eliminates provably-unmatched orders on the
    map side, so the shuffle carries matches + <1% false positives;
    the trailing exact semi join removes those, making the result
    bit-identical to the plain semi join (which is exactly what the
    oracle runs).
    """
    t = tables(spark, sf_dir, "orders", "customer")
    keys = (
        t["customer"]
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 0))
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    hits = bloom_semi_join(t["orders"], keys, "o_custkey")
    return hits.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


O_BLOOM_PREFILTER_JOIN = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {o_dsum("o_totalprice")} AS revenue
FROM orders
WHERE EXISTS (
  SELECT 1 FROM customer
  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING' AND c_acctbal > 0
)
GROUP BY o_orderpriority
"""

QUERIES["bloom_prefilter_join"] = q_bloom_prefilter_join
ORACLES["bloom_prefilter_join"] = O_BLOOM_PREFILTER_JOIN


# --- join-key skew audit ------------------------------------------------

_SKEW_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
)


def q_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew report for the three hottest join keys in the
    schema: rows-per-key dispersion metrics that predict whether a
    shuffle on that key needs salting / AQE skew splitting.

    Metrics chosen to be PARTIAL-AGGREGABLE — no global sort, so the
    audit stays cheap at any scale (a Gini over per-key counts would
    need a global rank; top1_share + p99/median + coefficient of
    variation carry the same signal for skew triage):
    - ``top1_share``: hottest key's fraction of all rows (the single
      reducer that AQE must split);
    - ``p99_over_median``: tail-to-typical ratio of rows/key
      (percentile's partial buffer is a value->count map over DISTINCT
      count values, which stays tiny);
    - ``cv``: stddev/mean of rows-per-key from exact integer
      sum / sum-of-squares (bit-identical across engines).
    """
    t = tables(spark, sf_dir, "lineitem", "orders")

    def audit(df: DataFrame, key: str) -> DataFrame:
        counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
        return counts.agg(
            F.lit(key).alias("join_key"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            fround(F.sum("cnt") / F.count("*"), 4).alias("avg_rows_per_key"),
            fround(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
            fround(
                F.percentile("cnt", 0.99) / F.percentile("cnt", 0.5), 4
            ).alias("p99_over_median"),
            fround(
                F.sqrt(
                    F.sum(F.col("cnt") * F.col("cnt")).cast("long")
                    / F.count("*")
                    - F.pow(F.sum("cnt").cast("long") / F.count("*"), 2)
                )
                / (F.sum("cnt").cast("long") / F.count("*")),
                4,
            ).alias("cv"),
        )

    parts = [audit(t[tbl], key) for tbl, key in _SKEW_KEYS]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _o_audit(tbl: str, key: str) -> str:
    return f"""
SELECT '{key}' AS join_key,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       {o_fround("CAST(sum(cnt) AS DOUBLE) / count(*)", 4)} AS avg_rows_per_key,
       {o_fround("CAST(max(cnt) AS DOUBLE) / sum(cnt)", 6)} AS top1_share,
       {o_fround("quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5)", 4)} AS p99_over_median,
       {o_fround("sqrt(CAST(sum(cnt*cnt) AS BIGINT) / CAST(count(*) AS DOUBLE) - pow(CAST(sum(cnt) AS BIGINT) / CAST(count(*) AS DOUBLE), 2)) / (CAST(sum(cnt) AS BIGINT) / CAST(count(*) AS DOUBLE))", 4)} AS cv
FROM (SELECT {key}, count(*) AS cnt FROM {tbl} GROUP BY 1)
"""


O_KEY_SKEW_AUDIT = " UNION ALL ".join(
    _o_audit(tbl, key) for tbl, key in _SKEW_KEYS
)

QUERIES["key_skew_audit"] = q_key_skew_audit
ORACLES["key_skew_audit"] = O_KEY_SKEW_AUDIT


# --- exact join-cardinality predictor ----------------------------------

def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price a join before running it: |A ⋈ B on k| is EXACTLY
    Σ_k cA(k)·cB(k), computable from two per-key count aggregates and
    one count-frame equi-join — never materializing the join output.
    ``top_key_out_rows`` (max single-key product) is the skew hotspot:
    if it dominates ``out_rows`` the join needs salting before anyone
    runs it.

    Audited joins: the FK join lineitem⋈orders, and the two self-join
    shapes whose output is quadratic in per-key counts (the classic
    surprise explosion).

    Scale: per-key counts are map-side-combined groupBys; the
    count-frame join shuffles one row per distinct key, not per data
    row. Products of counts stay in BIGINT — exact in both engines.
    """
    t = tables(spark, sf_dir, "lineitem", "orders", "events")

    def price(
        name: str, left: DataFrame, lkey: str, right: DataFrame, rkey: str
    ) -> DataFrame:
        cl = left.groupBy(F.col(lkey).alias("k")).agg(
            F.count("*").cast("long").alias("cl")
        )
        cr = right.groupBy(F.col(rkey).alias("k")).agg(
            F.count("*").cast("long").alias("cr")
        )
        return cl.join(cr, "k").agg(
            F.lit(name).alias("join_name"),
            F.sum("cl").cast("long").alias("n_left_matched"),
            F.sum("cr").cast("long").alias("n_right_matched"),
            F.count("*").cast("long").alias("n_keys_shared"),
            F.sum(F.col("cl") * F.col("cr")).cast("long").alias("out_rows"),
            F.max(F.col("cl") * F.col("cr")).cast("long").alias("top_key_out_rows"),
        )

    li, od, ev = t["lineitem"], t["orders"], t["events"]
    parts = [
        price("lineitem_x_orders", li, "l_orderkey", od, "o_orderkey"),
        price("lineitem_self_partkey", li, "l_partkey", li, "l_partkey"),
        price("events_self_user", ev, "user_id", ev, "user_id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _o_price(name: str, ltbl: str, lkey: str, rtbl: str, rkey: str) -> str:
    return f"""
SELECT '{name}' AS join_name,
       CAST(sum(cl) AS BIGINT) AS n_left_matched,
       CAST(sum(cr) AS BIGINT) AS n_right_matched,
       CAST(count(*) AS BIGINT) AS n_keys_shared,
       CAST(sum(cl * cr) AS BIGINT) AS out_rows,
       CAST(max(cl * cr) AS BIGINT) AS top_key_out_rows
FROM (SELECT {lkey} AS k, count(*) AS cl FROM {ltbl} GROUP BY 1) L
JOIN (SELECT {rkey} AS k, count(*) AS cr FROM {rtbl} GROUP BY 1) R USING (k)
"""


O_JOIN_CARDINALITY = " UNION ALL ".join(
    [
        _o_price("lineitem_x_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        _o_price("lineitem_self_partkey", "lineitem", "l_partkey", "lineitem", "l_partkey"),
        _o_price("events_self_user", "events", "user_id", "events", "user_id"),
    ]
)

QUERIES["join_cardinality_estimate"] = q_join_cardinality_estimate
ORACLES["join_cardinality_estimate"] = O_JOIN_CARDINALITY


# --- ANALYZE-style column statistics (CBO inputs) -----------------------

_CBO_COLS = (
    ("lineitem", "l_quantity"),
    ("lineitem", "l_discount"),
    ("orders", "o_totalprice"),
    ("documents", "n_chars"),
)


def q_cbo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics — the inputs a cost-based
    optimizer needs before it can price a plan: row/null/NDV counts,
    min/max, and EXACT equi-depth quartile boundaries (the SQL-standard
    discrete rule: smallest value whose cumulative count reaches
    ceil(q*n), spelled out explicitly so both engines apply the same
    rule instead of trusting two different percentile_disc
    interpretations).

    Plan per column: counts/min/max are one map-side-combined agg over
    the scan; boundaries run over the value->count frame (NDV rows,
    not data rows) with one cumulative window. That window is a single
    ordered task — bounded by the column's NDV, which for CBO-stats
    targets (keys, measures) is << row count; a column whose NDV
    approaches row count is exactly the column you'd sample first
    (ANALYZE samples at scale; exactness here is what makes the query
    oracle-checkable).
    """
    from pyspark.sql import Window

    frames = []
    for tbl, col in _CBO_COLS:
        df = tables(spark, sf_dir, tbl)[tbl]
        v = F.col(col).cast("double")
        vc = (
            df.filter(v.isNotNull())
            .groupBy(v.alias("v"))
            .agg(F.count("*").alias("c"))
        )
        cum = vc.withColumn(
            "cum",
            F.sum("c").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        base = df.agg(
            F.count("*").cast("long").alias("n_rows"),
            (F.count("*") - F.count(v)).cast("long").alias("n_null"),
            F.countDistinct(v).cast("long").alias("ndv"),
            fround(F.min(v), 6).alias("vmin"),
            fround(F.max(v), 6).alias("vmax"),
            F.count(v).cast("long").alias("_nn"),
        )
        bounds = cum.crossJoin(F.broadcast(base)).agg(
            F.lit(tbl).alias("tbl"),
            F.lit(col).alias("col"),
            F.first("n_rows").alias("n_rows"),
            F.first("n_null").alias("n_null"),
            F.first("ndv").alias("ndv"),
            F.first("vmin").alias("vmin"),
            F.first("vmax").alias("vmax"),
            *[
                fround(
                    F.min(
                        F.when(
                            F.col("cum") >= F.ceil(F.lit(q) * F.col("_nn")),
                            F.col("v"),
                        )
                    ),
                    6,
                ).alias(name)
                for q, name in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75"))
            ],
        )
        frames.append(bounds)
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def _o_cbo(tbl: str, col: str) -> str:
    return f"""
SELECT '{tbl}' AS tbl, '{col}' AS col, n_rows, n_null, ndv, vmin, vmax,
       {o_fround("min(CASE WHEN cum >= ceil(0.25 * nn) THEN v END)", 6)} AS q25,
       {o_fround("min(CASE WHEN cum >= ceil(0.50 * nn) THEN v END)", 6)} AS q50,
       {o_fround("min(CASE WHEN cum >= ceil(0.75 * nn) THEN v END)", 6)} AS q75
FROM (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum
  FROM (SELECT CAST({col} AS DOUBLE) AS v, count(*) AS c FROM {tbl}
        WHERE {col} IS NOT NULL GROUP BY 1)
) CROSS JOIN (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count({col}) AS BIGINT) AS n_null,
         CAST(count(DISTINCT {col}) AS BIGINT) AS ndv,
         {o_fround(f"min(CAST({col} AS DOUBLE))", 6)} AS vmin,
         {o_fround(f"max(CAST({col} AS DOUBLE))", 6)} AS vmax,
         count({col}) AS nn
  FROM {tbl}
)
GROUP BY 1, 2, 3, 4, 5, 6, 7
"""


O_CBO_STATS = " UNION ALL ".join(_o_cbo(t, c) for t, c in _CBO_COLS)

QUERIES["cbo_stats"] = q_cbo_stats
ORACLES["cbo_stats"] = O_CBO_STATS


# --- compaction bin-packing plan ---------------------------------------

_BINPACK_TARGET = 1 << 20  # 1 MiB per output file at this SF
_BINPACK_ROW_BYTES = 128


def q_file_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: bin-pack a per-supplier file
    inventory (size proxy: rows x 128 B) into ~1 MiB output groups by
    running-total fill in key order — the planning step before a
    compaction job rewrites a hot table's small files (the classic
    100 TB operational task: millions of 1-10 MB files -> 128 MB
    targets).

    Running-total fill (bin = (cum - bytes) div target) is chosen over
    first-fit-decreasing because it is deterministic, order-preserving
    (compacted files stay range-clustered on the key, so downstream
    partition pruning still works), and expressible as ONE cumulative
    window in any engine; FFD packs ~2% tighter but scrambles key
    locality and is inherently sequential.

    Scale: the window runs over the INVENTORY (one row per input
    file), not the data — a 100 TB table is ~10^6 files, a single
    sorted task; the data itself is never touched by the planner.
    """
    from pyspark.sql import Window

    t = tables(spark, sf_dir, "lineitem")
    inv = t["lineitem"].groupBy(F.col("l_suppkey").alias("file_key")).agg(
        (F.count("*") * F.lit(_BINPACK_ROW_BYTES)).cast("long").alias("bytes")
    )
    cum = inv.withColumn(
        "cum",
        F.sum("bytes").over(
            Window.orderBy("file_key").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    binned = cum.withColumn(
        "bin_id",
        F.expr(f"(cum - bytes) div {_BINPACK_TARGET}").cast("long"),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min("file_key").cast("long").alias("first_key"),
        F.max("file_key").cast("long").alias("last_key"),
    )


O_FILE_BINPACK = f"""
SELECT bin_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(min(file_key) AS BIGINT) AS first_key,
       CAST(max(file_key) AS BIGINT) AS last_key
FROM (
  SELECT file_key, bytes,
         CAST((sum(bytes) OVER (ORDER BY file_key) - bytes)
              // {_BINPACK_TARGET} AS BIGINT) AS bin_id
  FROM (SELECT l_suppkey AS file_key,
               CAST(count(*) * {_BINPACK_ROW_BYTES} AS BIGINT) AS bytes
        FROM lineitem GROUP BY 1)
)
GROUP BY 1
"""

QUERIES["file_binpack"] = q_file_binpack
ORACLES["file_binpack"] = O_FILE_BINPACK


# --- Warehouse freshness / profile-drift audits -------------------------


def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: last event age relative to the
    newest event anywhere (the watermark a scheduler would alert on),
    microsecond-exact, plus an is_stale flag at the 1-hour SLA. The
    anchor is data-derived (global max ts), never wall-clock — the
    audit is reproducible and engine-portable.

    Plan (100 TB): two partial-aggregable scans — per-type (max, min,
    count) and the 1-row global max — joined by a broadcast cross
    join; no sort, no window."""
    t = tables(spark, sf_dir, "events")
    per = t["events"].groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.min(F.unix_micros("ts")).alias("first_us"),
    )
    anchor = t["events"].agg(F.max(F.unix_micros("ts")).alias("anchor_us"))
    return (
        per.crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            "n_events",
            "last_us",
            (F.col("anchor_us") - F.col("last_us")).alias("staleness_us"),
            (F.col("anchor_us") - F.col("last_us") > 3_600_000_000)
            .cast("boolean")
            .alias("is_stale"),
            (F.col("last_us") - F.col("first_us")).alias("span_us"),
        )
        .orderBy("event_type")
    )


O_FRESHNESS_AUDIT = """
WITH per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         CAST(min(epoch_us(ts)) AS BIGINT) AS first_us
  FROM events GROUP BY 1
),
anchor AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS anchor_us FROM events)
SELECT event_type, n_events, last_us,
       anchor_us - last_us AS staleness_us,
       (anchor_us - last_us) > 3600000000 AS is_stale,
       last_us - first_us AS span_us
FROM per CROSS JOIN anchor
ORDER BY event_type
"""

def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between the first and second time halves
    of the event stream: per event type, row counts, exact decimal
    value means, and distinct-user NDV for each half plus deltas —
    the schema-level drift check that catches a silently changed
    producer before model training does (snapshot_diff is its
    row-level CDC sibling).

    The split point is the data-derived midpoint of the observed
    time range (integer microsecond midpoint — deterministic, no
    wall clock). Plan (100 TB): one 1-row min/max agg broadcast, then
    ONE conditional-aggregate scan per event type — no join between
    halves, no second scan."""
    t = tables(spark, sf_dir, "events")
    rng = t["events"].agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    ev = t["events"].crossJoin(F.broadcast(rng))
    in_a = F.unix_micros("ts") < F.col("mid_us")
    val = F.col("value")
    per = ev.groupBy("event_type").agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~in_a, 1).otherwise(0)).cast("long").alias("n_b"),
        (
            F.sum(F.when(in_a, val).otherwise(F.lit(None)).cast(DEC)).cast("double")
            / F.sum(F.when(in_a, 1).otherwise(0))
        ).alias("avg_a_raw"),
        (
            F.sum(F.when(~in_a, val).otherwise(F.lit(None)).cast(DEC)).cast("double")
            / F.sum(F.when(~in_a, 1).otherwise(0))
        ).alias("avg_b_raw"),
        F.countDistinct(F.when(in_a, F.col("user_id"))).cast("long").alias("ndv_user_a"),
        F.countDistinct(F.when(~in_a, F.col("user_id"))).cast("long").alias("ndv_user_b"),
    )
    return per.select(
        "event_type",
        "n_a",
        "n_b",
        fround(F.col("n_b") / F.col("n_a"), 6).alias("volume_ratio"),
        fround(F.col("avg_a_raw"), 4).alias("avg_value_a"),
        fround(F.col("avg_b_raw"), 4).alias("avg_value_b"),
        fround(F.col("avg_b_raw") - F.col("avg_a_raw"), 4).alias("avg_value_delta"),
        "ndv_user_a",
        "ndv_user_b",
    ).orderBy("event_type")


O_PROFILE_DRIFT = f"""
WITH rng AS (
  SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT) AS mid_us
  FROM events
),
per AS (
  SELECT event_type,
         CAST(sum(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN epoch_us(ts) < mid_us THEN CAST(value AS DECIMAL(30,10)) END) AS DOUBLE)
           / sum(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS avg_a_raw,
         CAST(sum(CASE WHEN epoch_us(ts) >= mid_us THEN CAST(value AS DECIMAL(30,10)) END) AS DOUBLE)
           / sum(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS avg_b_raw,
         CAST(count(DISTINCT CASE WHEN epoch_us(ts) < mid_us THEN user_id END) AS BIGINT) AS ndv_user_a,
         CAST(count(DISTINCT CASE WHEN epoch_us(ts) >= mid_us THEN user_id END) AS BIGINT) AS ndv_user_b
  FROM events CROSS JOIN rng
  GROUP BY 1
)
SELECT event_type, n_a, n_b,
       {o_fround("n_b / CAST(n_a AS DOUBLE)", 6)} AS volume_ratio,
       {o_fround("avg_a_raw", 4)} AS avg_value_a,
       {o_fround("avg_b_raw", 4)} AS avg_value_b,
       {o_fround("avg_b_raw - avg_a_raw", 4)} AS avg_value_delta,
       ndv_user_a, ndv_user_b
FROM per ORDER BY event_type
"""

QUERIES["freshness_audit"] = q_freshness_audit
ORACLES["freshness_audit"] = O_FRESHNESS_AUDIT
QUERIES["profile_drift"] = q_profile_drift
ORACLES["profile_drift"] = O_PROFILE_DRIFT


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second time
    halves of the event stream, per event type — THE standard model-
    monitoring drift score (PSI < 0.1 stable, > 0.25 action), next to
    [q_profile_drift]'s raw profile deltas.

    Bins are 10 equal-width slices of the GLOBAL value range (data-
    derived, engine-identical); both halves get +1 Laplace smoothing
    so empty bins never produce infinite terms, in both engines.
    ln() on identical doubles is libm-portable.

    Plan (100 TB): one 1-row min/max/mid broadcast, ONE conditional-
    aggregate scan to (type, bin) cells — |types| x 10 rows — then
    row-local PSI terms and a |types|-row sum. No join between
    halves, no sort."""
    t = tables(spark, sf_dir, "events")
    rng = t["events"].agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid_us"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    ev = t["events"].crossJoin(F.broadcast(rng))
    # degenerate-range guard (constant value column): (vmax-vmin)=0
    # would NaN the division and collapse every row into a null bin —
    # pin to bin 0 in BOTH engines instead
    bin_c = (
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor((F.col("value") - F.col("vmin")) / ((F.col("vmax") - F.col("vmin")) / 10)),
                    F.lit(0),
                ),
                F.lit(9),
            )
        )
        .cast("int")
    )
    in_a = F.unix_micros("ts") < F.col("mid_us")
    cells = ev.groupBy("event_type", bin_c.alias("bin")).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("c_a"),
        F.sum(F.when(~in_a, 1).otherwise(0)).cast("long").alias("c_b"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("c_a").cast("long").alias("t_a"),
        F.sum("c_b").cast("long").alias("t_b"),
        F.count("*").cast("long").alias("n_bins"),
    )
    terms = cells.join(tot, "event_type").select(
        "event_type",
        (
            ((F.col("c_b") + 1) / (F.col("t_b") + F.col("n_bins")))
            - ((F.col("c_a") + 1) / (F.col("t_a") + F.col("n_bins")))
        ).alias("dp"),
        F.log(
            ((F.col("c_b") + 1) / (F.col("t_b") + F.col("n_bins")))
            / ((F.col("c_a") + 1) / (F.col("t_a") + F.col("n_bins")))
        ).alias("lr"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            fround(F.sum((F.col("dp") * F.col("lr")).cast(DEC)).cast("double"), 6).alias("psi"),
        )
        .withColumn(
            "drift_band",
            F.when(F.col("psi") < 0.1, F.lit("stable"))
            .when(F.col("psi") < 0.25, F.lit("watch"))
            .otherwise(F.lit("action")),
        )
        .orderBy("event_type")
    )


O_PSI_DRIFT = f"""
WITH rng AS (
  SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT) AS mid_us,
         min(value) AS vmin, max(value) AS vmax
  FROM events
),
cells AS (
  SELECT event_type,
         CAST(CASE WHEN vmax = vmin THEN 0
              ELSE least(greatest(floor((value - vmin) / ((vmax - vmin) / 10)), 0), 9)
              END AS INTEGER) AS bin,
         CAST(sum(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM events CROSS JOIN rng
  GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(sum(c_a) AS BIGINT) AS t_a, CAST(sum(c_b) AS BIGINT) AS t_b,
         CAST(count(*) AS BIGINT) AS n_bins
  FROM cells GROUP BY 1
),
terms AS (
  SELECT cells.event_type,
         ((c_b + 1) / CAST(t_b + n_bins AS DOUBLE)) - ((c_a + 1) / CAST(t_a + n_bins AS DOUBLE)) AS dp,
         ln(((c_b + 1) / CAST(t_b + n_bins AS DOUBLE)) / ((c_a + 1) / CAST(t_a + n_bins AS DOUBLE))) AS lr
  FROM cells JOIN tot USING (event_type)
),
psi AS (
  SELECT event_type,
         {o_fround("CAST(sum(CAST(dp * lr AS DECIMAL(30,10))) AS DOUBLE)", 6)} AS psi
  FROM terms GROUP BY 1
)
SELECT event_type, psi,
       CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'watch' ELSE 'action' END AS drift_band
FROM psi ORDER BY event_type
"""

QUERIES["psi_drift"] = q_psi_drift
ORACLES["psi_drift"] = O_PSI_DRIFT


def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — the data-profiling primitive
    behind normalization and key discovery: for each candidate FD
    (determinant -> dependent), the number of determinant keys, how
    many map to MORE than one dependent value (violations), and the
    violation rate. Candidates here: l_orderkey -> l_returnflag,
    l_orderkey -> l_linestatus, l_partkey -> l_extendedprice.

    Plan (100 TB): per candidate ONE (key, dependent)-distinct
    partial agg then a key-level count — no joins, no sort; the three
    audits union into one result frame."""
    t = tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]

    def audit(det: str, dep: str) -> DataFrame:
        keys = (
            li.select(det, dep)
            .distinct()
            .groupBy(det)
            .agg(F.count("*").alias("n_dep"))
        )
        return keys.agg(
            F.lit(f"{det}->{dep}").alias("fd"),
            F.count("*").cast("long").alias("n_keys"),
            F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            fround(
                F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0)) / F.count("*"), 6
            ).alias("violation_rate"),
        )

    return (
        audit("l_orderkey", "l_returnflag")
        .unionAll(audit("l_orderkey", "l_linestatus"))
        .unionAll(audit("l_partkey", "l_extendedprice"))
        .orderBy("fd")
    )


def _o_fd(det: str, dep: str) -> str:
    return f"""
  SELECT '{det}->{dep}' AS fd,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         {o_fround("sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)} AS violation_rate
  FROM (SELECT {det}, count(*) AS n_dep
        FROM (SELECT DISTINCT {det}, {dep} FROM lineitem) GROUP BY 1)"""


O_FD_AUDIT = f"""
SELECT * FROM ({_o_fd("l_orderkey", "l_returnflag")}
UNION ALL {_o_fd("l_orderkey", "l_linestatus")}
UNION ALL {_o_fd("l_partkey", "l_extendedprice")})
ORDER BY fd
"""

QUERIES["fd_audit"] = q_fd_audit
ORACLES["fd_audit"] = O_FD_AUDIT


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the quasi-identifier pair
    (nation, market segment) on customers: per QI group size band,
    how many groups and rows, plus the minimum l-diversity of the
    account-balance sign band (the 'sensitive attribute') within the
    band — the privacy screen a dataset passes before export.

    Plan (100 TB): ONE groupBy to QI groups (partial-aggregable,
    |nations| x |segments| rows), everything after rides the tiny
    group frame."""
    t = tables(spark, sf_dir, "customer")
    sens = F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise(F.lit("nonneg"))
    groups = (
        t["customer"]
        .select("c_nationkey", "c_mktsegment", sens.alias("sv"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.countDistinct("sv").cast("long").alias("l_div"),
        )
    )
    band = (
        F.when(F.col("k") < 5, F.lit("k<5"))
        .when(F.col("k") < 25, F.lit("5<=k<25"))
        .when(F.col("k") < 100, F.lit("25<=k<100"))
        .otherwise(F.lit("k>=100"))
    )
    return (
        groups.groupBy(band.alias("k_band"))
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("k").cast("long").alias("n_rows"),
            F.min("k").cast("long").alias("min_k"),
            F.min("l_div").cast("long").alias("min_l_diversity"),
        )
        .orderBy("k_band")
    )


O_K_ANONYMITY = """
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END) AS BIGINT) AS l_div
  FROM customer GROUP BY 1, 2
)
SELECT CASE WHEN k < 5 THEN 'k<5' WHEN k < 25 THEN '5<=k<25'
            WHEN k < 100 THEN '25<=k<100' ELSE 'k>=100' END AS k_band,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(min(l_div) AS BIGINT) AS min_l_diversity
FROM groups GROUP BY 1 ORDER BY 1
"""

QUERIES["k_anonymity"] = q_k_anonymity
ORACLES["k_anonymity"] = O_K_ANONYMITY


def q_coldstart_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start coverage across a time split: training on the first
    half of order history, what fraction of second-half activity
    involves customers / parts NEVER seen in training — the number
    that bounds any ID-embedding model's reachable accuracy before
    training starts.

    Split point is the data-derived midpoint of the order-date range
    (deterministic). Plan (100 TB): per entity ONE distinct-entity
    frame per half (partial-aggregable) and one LEFT anti-style join
    on the entity key; the two audits union into a 2-row frame."""
    t = tables(spark, sf_dir, "orders", "lineitem")
    rng = t["orders"].agg(
        ((F.min(F.unix_micros("o_orderdate")) + F.max(F.unix_micros("o_orderdate"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    o = t["orders"].crossJoin(F.broadcast(rng))
    li = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .crossJoin(F.broadcast(rng))
    )

    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        in_b = F.unix_micros("o_orderdate") >= F.col("mid_us")
        train = df.filter(~in_b).select(F.col(key).alias("k")).distinct()
        test = df.filter(in_b).groupBy(F.col(key).alias("k")).agg(
            F.count("*").cast("long").alias("n_rows")
        )
        j = test.join(train.withColumn("seen", F.lit(1)), "k", "left")
        return j.agg(
            F.lit(name).alias("entity"),
            F.count("*").cast("long").alias("n_test_entities"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unseen_entities"),
            F.sum("n_rows").cast("long").alias("n_test_rows"),
            F.sum(F.when(F.col("seen").isNull(), F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("n_unseen_rows"),
            fround(
                F.sum(F.when(F.col("seen").isNull(), F.col("n_rows")).otherwise(0))
                / F.sum("n_rows"),
                6,
            ).alias("unseen_row_frac"),
        )

    return (
        audit(o, "o_custkey", "customer")
        .unionAll(audit(li, "l_partkey", "part"))
        .orderBy("entity")
    )


def _o_coldstart(src: str, key: str, name: str) -> str:
    return f"""
  SELECT '{name}' AS entity,
         CAST(count(*) AS BIGINT) AS n_test_entities,
         CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen_entities,
         CAST(sum(n_rows) AS BIGINT) AS n_test_rows,
         CAST(sum(CASE WHEN seen IS NULL THEN n_rows ELSE 0 END) AS BIGINT) AS n_unseen_rows,
         {o_fround("sum(CASE WHEN seen IS NULL THEN n_rows ELSE 0 END) / CAST(sum(n_rows) AS DOUBLE)", 6)} AS unseen_row_frac
  FROM (
    SELECT t.k, t.n_rows, tr.seen
    FROM (SELECT {key} AS k, CAST(count(*) AS BIGINT) AS n_rows
          FROM {src} CROSS JOIN rng WHERE epoch_us(o_orderdate) >= mid_us GROUP BY 1) t
    LEFT JOIN (SELECT DISTINCT {key} AS k, 1 AS seen
               FROM {src} CROSS JOIN rng WHERE epoch_us(o_orderdate) < mid_us) tr
      USING (k)
  )"""


O_COLDSTART_COVERAGE = f"""
WITH rng AS (
  SELECT CAST(floor((min(epoch_us(o_orderdate)) + max(epoch_us(o_orderdate))) / 2) AS BIGINT) AS mid_us
  FROM orders
),
li AS (
  SELECT l_partkey, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT * FROM ({_o_coldstart("orders", "o_custkey", "customer")}
UNION ALL {_o_coldstart("li", "l_partkey", "part")})
ORDER BY entity
"""

def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test sample-size table: required per-variant n for a
    two-proportion z-test at alpha=0.05 (two-sided), power 0.8/0.9,
    over a grid of baseline rates x minimum detectable effects —
    n = (z_a + z_b)^2 * (p1(1-p1) + p2(1-p2)) / delta^2. The planning
    table every experimentation pipeline pins next to its metrics
    ([q_ab_test_proportions] is the read-out side).

    Pure engine-portable math: integer grid, z constants as shared
    literals, one pow and one ceil — no corpus scan (the session is
    tuned per the registry contract)."""
    from data_ingestors_spark.session import tune

    tune(spark)
    # z_{0.975} and z_{0.8}/z_{0.9} as fixed literals (both engines
    # receive the same doubles — no inverse-CDF needed)
    powers = spark.createDataFrame(
        [(0.8, 0.8416), (0.9, 1.2816)], "power double, z_b double"
    )
    base = spark.range(1, 6).select((F.col("id") * 0.05).alias("p1"))  # 5%..25%
    mde = spark.range(1, 5).select((F.col("id") * 0.01).alias("delta"))  # +1..4pp
    grid = base.crossJoin(mde).crossJoin(F.broadcast(powers))
    p2 = F.col("p1") + F.col("delta")
    za = F.lit(1.96)
    n = F.ceil(
        F.pow(za + F.col("z_b"), 2)
        * (F.col("p1") * (1 - F.col("p1")) + p2 * (1 - p2))
        / F.pow(F.col("delta"), 2)
    ).cast("long")
    return grid.select(
        fround(F.col("p1"), 2).alias("p1"),
        fround(F.col("delta"), 2).alias("delta"),
        fround(F.col("power"), 1).alias("power"),
        n.alias("n_per_variant"),
    ).orderBy("p1", "delta", "power")


O_POWER_ANALYSIS = f"""
WITH base AS (SELECT i * 0.05 AS p1 FROM unnest(range(1, 6)) AS t(i)),
mde AS (SELECT i * 0.01 AS delta FROM unnest(range(1, 5)) AS t(i)),
powers AS (SELECT * FROM (VALUES (0.8, 0.8416), (0.9, 1.2816)) AS p(power, z_b))
SELECT {o_fround("p1", 2)} AS p1,
       {o_fround("delta", 2)} AS delta,
       {o_fround("power", 1)} AS power,
       CAST(ceil(pow(1.96 + z_b, 2) * (p1 * (1 - p1) + (p1 + delta) * (1 - (p1 + delta)))
                 / pow(delta, 2)) AS BIGINT) AS n_per_variant
FROM base CROSS JOIN mde CROSS JOIN powers
ORDER BY p1, delta, power
"""

QUERIES["coldstart_coverage"] = q_coldstart_coverage
ORACLES["coldstart_coverage"] = O_COLDSTART_COVERAGE
QUERIES["power_analysis"] = q_power_analysis
ORACLES["power_analysis"] = O_POWER_ANALYSIS
