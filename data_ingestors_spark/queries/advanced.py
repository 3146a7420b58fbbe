"""Advanced relational surface: ignore-nulls window fills, ntile /
percent_rank / cume_dist, ordered string aggregation, discrete
percentiles, posexplode with ordinality, struct comparison aggregates,
date/interval arithmetic, union-by-name, scalar subqueries, and a
skew-salted two-phase aggregation whose oracle is the plain GROUP BY.

Cross-engine hazards handled per queries/base.py conventions: decimal
accumulators for order-free sums, fround for computed doubles, unique
tiebreaker keys in every ORDER BY, BIGINT casts for integer aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.queries.base import (
    DEC,
    dsum,
    fround,
    o_dsum,
    o_fround,
    tables,
)


def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill: carry the last non-null observation forward per user
    (last_value IGNORE NULLS over a running frame) — the standard
    sensor-stream repair; one shuffle on user_id."""
    t = tables(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "click", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            F.last(v, ignorenulls=True).over(w).alias("filled_raw"),
        )
        .select("event_id", "user_id", fround(F.col("filled_raw"), 6).alias("filled"))
    )


O_WINDOW_IGNORE_NULLS = f"""
SELECT event_id, user_id,
       {o_fround("last_value(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 6)} AS filled
FROM events
"""


def q_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartiles within priority,
    percent_rank and cume_dist — per-group partitions keep every
    window bounded (no global single-partition sort)."""
    t = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        fround(F.percent_rank().over(w), 6).alias("pct_rank"),
        fround(F.cume_dist().over(w), 6).alias("cdist"),
    )


O_NTILE_CUME = f"""
SELECT o_orderkey, o_orderpriority,
       ntile(4)      OVER w AS quartile,
       {o_fround("percent_rank() OVER w", 6)} AS pct_rank,
       {o_fround("cume_dist()    OVER w", 6)} AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: deterministic because the collected
    set is sorted before concatenation (collect_set order is not)."""
    t = tables(spark, sf_dir, "orders")
    return t["orders"].groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.count("*").cast("long").alias("n"),
    )


O_STRING_AGG = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
"""


def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles: the returned value is an actual member of
    the group (vs the interpolated continuous form in `percentiles`)."""
    t = tables(spark, sf_dir, "customer")
    return t["customer"].groupBy("c_mktsegment").agg(
        F.expr(
            "round(percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal), 2)"
        ).alias("p50d"),
        F.expr(
            "round(percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal), 2)"
        ).alias("p90d"),
        F.count("*").cast("long").alias("n"),
    )


O_PERCENTILE_DISC = """
SELECT c_mktsegment,
       round(quantile_disc(c_acctbal, 0.5), 2) AS p50d,
       round(quantile_disc(c_acctbal, 0.9), 2) AS p90d,
       CAST(count(*) AS BIGINT) AS n
FROM customer GROUP BY c_mktsegment
"""


def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest with ordinality: word position inside p_type matters
    (1-based to match SQL generate_subscripts)."""
    t = tables(spark, sf_dir, "part")
    return (
        t["part"]
        .select(F.posexplode(F.split(F.col("p_type"), " ")).alias("pos0", "word"))
        .select((F.col("pos0") + 1).cast("long").alias("pos"), "word")
        .filter(F.col("word") != "")
        .groupBy("pos", "word")
        .agg(F.count("*").cast("long").alias("n"))
    )


O_POSEXPLODE = """
SELECT pos, word, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT CAST(generate_subscripts(string_split(p_type, ' '), 1) AS BIGINT) AS pos,
         unnest(string_split(p_type, ' ')) AS word
  FROM part
)
WHERE word <> ''
GROUP BY pos, word
"""


def q_struct_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-comparison aggregate: the priciest order per priority,
    picked ATOMICALLY via max over a (price, key) struct — the same
    lexicographic-struct trick the asof join uses to avoid stitching
    fields from different rows. One map-side-combined shuffle; no
    window, no join."""
    t = tables(spark, sf_dir, "orders")
    s = F.max(F.struct(F.col("o_totalprice"), F.col("o_orderkey"))).alias("s")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(s)
        .select(
            "o_orderpriority",
            F.round(F.col("s.o_totalprice"), 2).alias("top_price"),
            F.col("s.o_orderkey").alias("top_key"),
        )
    )


O_STRUCT_ARGMAX = """
SELECT o_orderpriority,
       round(max(struct_pack(p := o_totalprice, k := o_orderkey)).p, 2) AS top_price,
       max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS top_key
FROM orders GROUP BY o_orderpriority
"""


def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval battery: add_months, quarter truncation,
    last_day, day arithmetic, ISO weekday — all codegen'd column
    expressions."""
    t = tables(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return t["orders"].select(
        "o_orderkey",
        F.add_months(d, 3).cast("date").alias("plus3m"),
        F.date_trunc("quarter", d).cast("date").alias("qtr"),
        F.last_day(d).alias("eom"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_end"),
        F.weekday(d).cast("long").alias("wd_mon0"),
    )


O_INTERVAL_ARITH = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr,
       last_day(CAST(o_orderdate AS DATE)) AS eom,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_end,
       CAST(isodow(o_orderdate) - 1 AS BIGINT) AS wd_mon0
FROM orders
"""


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing-column fill: two differently-shaped
    projections align by NAME, absent columns null-filled — schema
    drift across ingest generations handled without positional bugs."""
    t = tables(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
        F.col("c_mktsegment").alias("segment"),
    )
    b = t["supplier"].select(
        F.lit("supplier").alias("kind"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.col("s_name").alias("name"),
    )
    return a.unionByName(b, allowMissingColumns=True)


O_UNION_BY_NAME = """
SELECT c_name AS name, round(c_acctbal, 2) AS acctbal,
       'customer' AS kind, c_mktsegment AS segment
FROM customer
UNION ALL BY NAME
SELECT 'supplier' AS kind, round(s_acctbal, 2) AS acctbal, s_name AS name
FROM supplier
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above 1.5× the global mean price. The threshold is an
    exact decimal mean (order-free) so the boundary comparison cannot
    flip between engines; the 1-row aggregate broadcasts."""
    t = tables(spark, sf_dir, "orders")
    o = t["orders"]
    thr = o.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)) / F.count("*")).alias("mean_price")
    )
    return (
        o.join(F.broadcast(thr))
        .filter(F.col("o_totalprice").cast(DEC) > 1.5 * F.col("mean_price"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


O_SCALAR_SUBQUERY = f"""
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(30,10)) >
      1.5 * (SELECT sum(CAST(o_totalprice AS DECIMAL(30,10))) / count(*) FROM orders)
"""


def q_salted_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: pre-aggregate on
    (key, salt16), then final-aggregate on key. A hot key's rows land
    on 16 reducers instead of one; decomposable aggregates (count,
    decimal sum) recombine exactly, so the oracle is the PLAIN
    GROUP BY. At 100 TB this is the fallback when AQE's skew handling
    can't split a single monster group."""
    t = tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    salt = F.pmod(F.xxhash64("l_orderkey"), F.lit(16)).alias("__salt")
    partial = (
        li.select("l_returnflag", salt, "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag", "__salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("pq"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("pp"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").cast("long").alias("n"),
            fround(F.sum("pq").cast("double"), 2).alias("sum_qty"),
            fround(F.sum("pp").cast("double"), 2).alias("sum_price"),
        )
    )


O_SALTED_GROUPBY = f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       {o_dsum("l_quantity", 2)} AS sum_qty,
       {o_dsum("l_extendedprice", 2)} AS sum_price
FROM lineitem GROUP BY l_returnflag
"""


QUERIES = {
    "window_ignore_nulls": q_window_ignore_nulls,
    "ntile_cume": q_ntile_cume,
    "string_agg": q_string_agg,
    "percentile_disc": q_percentile_disc,
    "posexplode": q_posexplode,
    "struct_argmax": q_struct_argmax,
    "interval_arith": q_interval_arith,
    "union_by_name": q_union_by_name,
    "scalar_subquery": q_scalar_subquery,
    "salted_groupby": q_salted_groupby,
}

ORACLES = {
    "window_ignore_nulls": O_WINDOW_IGNORE_NULLS,
    "ntile_cume": O_NTILE_CUME,
    "string_agg": O_STRING_AGG,
    "percentile_disc": O_PERCENTILE_DISC,
    "posexplode": O_POSEXPLODE,
    "struct_argmax": O_STRUCT_ARGMAX,
    "interval_arith": O_INTERVAL_ARITH,
    "union_by_name": O_UNION_BY_NAME,
    "scalar_subquery": O_SCALAR_SUBQUERY,
    "salted_groupby": O_SALTED_GROUPBY,
}


def q_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract / replace / match-flag — patterns
    restricted to the syntax subset Java regex and RE2 agree on."""
    t = tables(spark, sf_dir, "part")
    p = F.col("p_name")
    return t["part"].select(
        "p_partkey",
        F.regexp_extract(p, r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace(p, r"[aeiou]", "_").alias("devoweled"),
        F.when(p.rlike(r"(red|blue|green)"), 1).otherwise(0).cast("long").alias("has_color"),
    )


O_REGEX_BATTERY = """
SELECT p_partkey,
       coalesce(regexp_extract(p_name, '^(\\w+)', 1), '') AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CAST(CASE WHEN regexp_matches(p_name, '(red|blue|green)') THEN 1 ELSE 0 END AS BIGINT) AS has_color
FROM part
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram by fixed 100-char bins (floor division
    — portable everywhere, unlike width_bucket) + per-bin stats."""
    t = tables(spark, sf_dir, "documents")
    bin_ = F.floor(F.col("n_chars") / 100).cast("long")
    return (
        t["documents"]
        .groupBy(bin_.alias("len_bin"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("mn"),
            F.max("n_chars").cast("long").alias("mx"),
        )
    )


O_LENGTH_HISTOGRAM = """
SELECT CAST(floor(n_chars / 100) AS BIGINT) AS len_bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS mn,
       CAST(max(n_chars) AS BIGINT) AS mx
FROM documents GROUP BY 1
"""

def q_nth_value_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first_value / last_value over an explicit full-
    partition frame — the frame spec is load-bearing: last_value over
    the default frame (UNBOUNDED PRECEDING..CURRENT ROW) is just the
    current row, the classic window gotcha."""
    t = tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


O_NTH_VALUE_WINDOW = """
SELECT o_orderkey, o_orderpriority,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey) OVER w AS last_key,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe salted equi-join (operators/joins.py): fact rows
    fan out over 8 salt lanes, the dim side replicates 8x. The oracle
    is the PLAIN join — salting may only change physical routing."""
    from data_ingestors_spark.operators.joins import salted_join

    t = tables(spark, sf_dir, "lineitem", "part")
    fact = t["lineitem"].select(
        F.col("l_partkey").alias("partkey"), "l_orderkey", "l_linenumber", "l_quantity"
    )
    dim = t["part"].select(F.col("p_partkey").alias("partkey"), "p_name")
    return salted_join(fact, dim, "partkey", n_salt=8).select(
        "partkey", "l_orderkey", "l_linenumber", F.col("l_quantity").alias("qty"), "p_name"
    )


O_SALTED_JOIN = """
SELECT l_partkey AS partkey, l_orderkey, l_linenumber, l_quantity AS qty, p_name
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_recursive_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): day-over-day compounded
    balance — balance(i) = balance(i-1) * 1.01 + revenue(i) — an
    inherently sequential recurrence no windowed SQL can express.
    UNION ALL recursion over an acyclic day index (Spark does not yet
    support UNION-distinct recursion, so cyclic closures stay on the
    iterative operator path; the 60-day bound keeps recursion under
    Spark's default 100-level cap). Daily revenue uses the decimal
    order-free sum; the recurrence itself is the identical sequential
    double arithmetic in both engines."""
    from data_ingestors_spark.queries.base import views

    views(spark, sf_dir, "orders")
    return spark.sql(f"""
        WITH RECURSIVE idx AS (
          SELECT day, rev, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
          FROM (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) AS rev
            FROM orders GROUP BY 1
          )
        ),
        idx60 AS (SELECT * FROM idx WHERE i <= 60),
        bal(i, day, balance) AS (
          SELECT i, day, rev FROM idx60 WHERE i = 1
          UNION ALL
          SELECT idx60.i, idx60.day, bal.balance * 1.01 + idx60.rev
          FROM bal JOIN idx60 ON idx60.i = bal.i + 1
        )
        SELECT day, CAST({o_fround('balance', 2)} AS DOUBLE) AS balance FROM bal
    """)


O_RECURSIVE_COMPOUND = f"""
WITH RECURSIVE idx AS (
  SELECT day, rev, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
  FROM (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) AS rev
    FROM orders GROUP BY 1
  )
),
idx60 AS (SELECT * FROM idx WHERE i <= 60),
bal(i, day, balance) AS (
  SELECT i, day, rev FROM idx60 WHERE i = 1
  UNION ALL
  SELECT idx60.i, idx60.day, bal.balance * 1.01 + idx60.rev
  FROM bal JOIN idx60 ON idx60.i = bal.i + 1
)
SELECT day, {o_fround('balance', 2)} AS balance FROM bal
"""


QUERIES["recursive_compound"] = q_recursive_compound
ORACLES["recursive_compound"] = O_RECURSIVE_COMPOUND
QUERIES["salted_join"] = q_salted_join
ORACLES["salted_join"] = O_SALTED_JOIN
QUERIES["regex_battery"] = q_regex_battery
QUERIES["length_histogram"] = q_length_histogram
QUERIES["nth_value_window"] = q_nth_value_window
ORACLES["regex_battery"] = O_REGEX_BATTERY
ORACLES["length_histogram"] = O_LENGTH_HISTOGRAM
ORACLES["nth_value_window"] = O_NTH_VALUE_WINDOW


# --- correlated LATERAL subquery ---------------------------------------

def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation via a correlated LATERAL
    subquery — the SQL-surface form of per-group top-k (DuckDB/Postgres
    `, LATERAL (...) t`, Spark's `LATERAL` since 3.4). Same semantics
    as [topk_per_group]'s window form; registered separately because
    the decorrelation path is a different planner feature: Catalyst
    must rewrite the per-row dependent subquery into a join + window,
    and this query is the regression check that it does (rather than
    re-executing the inner query per outer row, which would be a
    25-scan disaster at any scale).

    Scale: after decorrelation the physical plan is the window top-k
    plan — one shuffle on the correlation key, rank inside partitions.
    """
    for name, df in tables(spark, sf_dir, "nation", "customer").items():
        df.createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 3) t
        """
    )


O_LATERAL_JOIN = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 3) t
"""

QUERIES["lateral_join"] = q_lateral_join
ORACLES["lateral_join"] = O_LATERAL_JOIN


# --- SCD Type-2 dimension build ----------------------------------------

def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build from a change feed: fold
    each customer's order-priority history into validity intervals
    [valid_from, valid_to) — consecutive identical values collapse into
    one version, the open current version has valid_to NULL. The
    standard warehouse primitive for reconstructing 'what was the
    attribute at time t' from an event log (Kimball SCD2).

    Plan (100 TB): three window passes over ONE shuffle on the
    dimension key (change-flag via lag, run-id via cumulative sum,
    valid_to via lead on the collapsed runs) — Catalyst reuses the
    (custkey)-partitioning across all three since the window specs
    share the partition key. Nothing global: per-key history lengths
    bound each task, and the output is one row per VERSION, not per
    event.
    """
    t = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        t["orders"]
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .withColumn(
            "chg",
            F.when(
                F.lag("o_orderpriority").over(w).isNull()
                | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "version",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
    )
    runs = chg.groupBy(
        F.col("o_custkey").alias("custkey"), "version", "o_orderpriority"
    ).agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    wv = Window.partitionBy("custkey").orderBy("version")
    return runs.select(
        "custkey",
        "version",
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
    )


O_SCD2_BUILD = """
WITH chg AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
                OR lag(o_orderpriority) OVER w <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
ver AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
  FROM chg
),
runs AS (
  SELECT o_custkey AS custkey, version, o_orderpriority AS priority,
         min(o_orderdate) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_events
  FROM ver GROUP BY 1, 2, 3
)
SELECT custkey, version, priority, valid_from,
       lead(valid_from) OVER (PARTITION BY custkey ORDER BY version) AS valid_to,
       n_events
FROM runs
"""

QUERIES["scd2_build"] = q_scd2_build
ORACLES["scd2_build"] = O_SCD2_BUILD
