"""Statistical analysis operators — distribution tests, power-law
fits, and multi-objective (skyline) selection over the benchmark
tables.

Each query follows the registry contract (see queries/__init__.py):
identical output column names on the Spark and DuckDB sides, decimal
accumulation + engine-portable rounding for every computed double so
reduction-order jitter cannot flip the driver's value hash.

Scale notes are per-query; the common theme is that every statistic
here reduces to partial-aggregable groupBys over the fact table plus
arithmetic on a tiny aggregate frame — no shuffle carries raw rows
beyond the first groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.functions.rounding import fround, o_fround
from data_ingestors_spark.queries.base import DEC, tables, davg, o_davg

QUERIES: dict = {}
ORACLES: dict = {}


# --- chi-square independence -------------------------------------------

def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between customer market
    segment and nation.

    Plan: ONE partial-aggregated groupBy over customer produces the
    observed contingency cells; margins derive from that tiny cell
    frame (125 rows at any scale — cardinality is |segments|x|nations|,
    data-size-independent), so the fact table is scanned once. The
    zero-observed cells matter (they still contribute `expected` to the
    statistic), hence the margin cross join rebuilds the FULL grid and
    left-joins the observed counts — all on the aggregate frame, never
    on raw rows. Terms are accumulated in DECIMAL so the 125-term sum
    is reduction-order-free.
    """
    t = tables(spark, sf_dir, "customer")
    cells = t["customer"].groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").cast("double").alias("obs")
    )
    cells = cells.persist()
    row_m = cells.groupBy("c_mktsegment").agg(F.sum("obs").alias("rt"))
    col_m = cells.groupBy("c_nationkey").agg(F.sum("obs").alias("ct"))
    tot = cells.agg(F.sum("obs").alias("n"))
    grid = (
        row_m.crossJoin(col_m)
        .join(cells, ["c_mktsegment", "c_nationkey"], "left")
        .withColumn("obs", F.coalesce("obs", F.lit(0.0)))
        .crossJoin(F.broadcast(tot))
        .withColumn("exp", F.col("rt") * F.col("ct") / F.col("n"))
        .withColumn(
            "term",
            ((F.col("obs") - F.col("exp")) * (F.col("obs") - F.col("exp")) / F.col("exp")).cast(DEC),
        )
    )
    return grid.agg(
        fround(F.sum("term").cast("double"), 6).alias("chi2"),
        (
            (F.count_distinct("c_mktsegment") - F.lit(1))
            * (F.count_distinct("c_nationkey") - F.lit(1))
        ).cast("long").alias("dof"),
        F.sum("obs").cast("long").alias("n"),
    )


O_CHI_SQUARE = f"""
WITH cells AS (
  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS DOUBLE) AS obs
  FROM customer GROUP BY 1, 2
), rm AS (SELECT c_mktsegment, sum(obs) AS rt FROM cells GROUP BY 1),
   cm AS (SELECT c_nationkey, sum(obs) AS ct FROM cells GROUP BY 1),
   tot AS (SELECT sum(obs) AS n FROM cells),
   grid AS (
  SELECT rm.c_mktsegment, cm.c_nationkey, rm.rt, cm.ct,
         COALESCE(cells.obs, 0.0) AS obs, rm.rt * cm.ct / tot.n AS exp
  FROM rm CROSS JOIN cm CROSS JOIN tot
  LEFT JOIN cells USING (c_mktsegment, c_nationkey)
)
SELECT {o_fround("CAST(sum(CAST((obs - exp) * (obs - exp) / exp AS DECIMAL(30,10))) AS DOUBLE)", 6)} AS chi2,
       CAST((count(DISTINCT c_mktsegment) - 1) * (count(DISTINCT c_nationkey) - 1) AS BIGINT) AS dof,
       CAST(sum(obs) AS BIGINT) AS n
FROM grid
"""

QUERIES["chi_square"] = q_chi_square
ORACLES["chi_square"] = O_CHI_SQUARE


# --- Zipf power-law fit -------------------------------------------------

_TOP_WORDS = 1000


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the Zipf exponent of the corpus word-frequency distribution:
    slope of ln(freq) ~ ln(rank) over the top-1000 words via least
    squares (regr_slope). A healthy natural-language corpus sits near
    -1; corrupted or template-heavy corpora drift, so this is a cheap
    corpus-health gauge alongside [gopher_quality].

    Plan: one corpus scan -> explode -> word groupBy (partial-agg
    combines before the shuffle, so the shuffle carries one row per
    distinct word per partition, not one per token). Ranking the
    top-1000 is a single-partition window over the 1000-row frame
    AFTER a top-k prune (orderBy + limit pushes a TakeOrdered, so no
    global sort of the full vocabulary). regr_slope's sums run over
    1000 values of magnitude <=~15, far inside double precision at
    6 dp.
    """
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
                " ",
            )
        ).alias("w")
    ).filter(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count("*").cast("long").alias("freq"))
    top = freq.orderBy(F.desc("freq"), F.asc("w")).limit(_TOP_WORDS)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("w"))),
    )
    return ranked.agg(
        fround(F.regr_slope(F.log(F.col("freq")), F.log(F.col("rank"))), 6).alias("zipf_slope"),
        fround(F.regr_r2(F.log(F.col("freq")), F.log(F.col("rank"))), 6).alias("r2"),
        F.count("*").cast("long").alias("n_words"),
    )


O_ZIPF_FIT = f"""
WITH words AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), freq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM words WHERE w <> '' GROUP BY w
  ORDER BY freq DESC, w LIMIT {_TOP_WORDS}
), ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, w) AS rank FROM freq
)
SELECT {o_fround("regr_slope(ln(freq), ln(rank))", 6)} AS zipf_slope,
       {o_fround("regr_r2(ln(freq), ln(rank))", 6)} AS r2,
       CAST(count(*) AS BIGINT) AS n_words
FROM ranked
"""

QUERIES["zipf_fit"] = q_zipf_fit
ORACLES["zipf_fit"] = O_ZIPF_FIT


# --- two-sample Kolmogorov-Smirnov -------------------------------------

_KS_A, _KS_B = "src0", "src1"


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic comparing the
    document-length (n_chars) distributions of two corpus sources —
    the standard drift check between a new crawl slice and a reference
    slice before mixing them into training data.

    Plan: filter to the two sources (pushed to the parquet scan),
    pre-aggregate per distinct length value (combiner-friendly; the
    shuffled frame is one row per distinct value), then one cumulative
    window over the distinct-value frame computes both empirical CDFs
    in a single pass; D = max |F_a - F_b|. The window is a single
    ordered partition over DISTINCT VALUES, not raw rows — bounded by
    value cardinality, and a merge of per-range partial maxima if that
    ever mattered. Counts are integers, so the CDFs are exact ratios
    of integers; only the final division is floating point.
    """
    t = tables(spark, sf_dir, "documents")
    two = t["documents"].filter(F.col("source").isin(_KS_A, _KS_B))
    cells = two.groupBy("n_chars").agg(
        F.sum(F.when(F.col("source") == _KS_A, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("source") == _KS_B, 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    tot = cells.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    cdf = (
        cells.withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "d",
            F.abs(
                F.col("cuma").cast("double") / F.col("na")
                - F.col("cumb").cast("double") / F.col("nb")
            ),
        )
    )
    return cdf.agg(
        fround(F.max("d"), 6).alias("ks_stat"),
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
    )


O_KS_TEST = f"""
WITH two AS (
  SELECT n_chars, source FROM documents WHERE source IN ('{_KS_A}', '{_KS_B}')
), cells AS (
  SELECT n_chars,
         sum(CASE WHEN source = '{_KS_A}' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN source = '{_KS_B}' THEN 1 ELSE 0 END) AS cb
  FROM two GROUP BY n_chars
), tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cells),
   cdf AS (
  SELECT abs(CAST(sum(ca) OVER (ORDER BY n_chars) AS DOUBLE) / tot.na
           - CAST(sum(cb) OVER (ORDER BY n_chars) AS DOUBLE) / tot.nb) AS d,
         tot.na, tot.nb
  FROM cells CROSS JOIN tot
)
SELECT {o_fround("max(d)", 6)} AS ks_stat,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b
FROM cdf
"""

QUERIES["ks_test"] = q_ks_test
ORACLES["ks_test"] = O_KS_TEST


# --- Pareto frontier (skyline) -----------------------------------------

def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not dominated on (p_retailprice low,
    p_size low) — part A dominates B when it is <= on both dimensions
    and strictly < on at least one.

    Plan: the naive skyline is an O(n^2) NOT EXISTS self-join (the
    oracle does exactly that — fine at 2k parts, fatal at 100 TB).
    The distributed form exploits 2-D structure: group to one row per
    distinct price with that price's min size (partial-aggregated),
    compute the strict-prefix running min of size over prices in ONE
    ordered window over the distinct-price frame, then join back — a
    part is on the frontier iff its size equals its price's min size
    AND beats every strictly-cheaper price's best size. Raw parts
    never enter the window; the ordered pass is bounded by distinct
    price cardinality (and would sort-merge from pre-sorted range
    partitions at scale).
    """
    t = tables(spark, sf_dir, "part")
    per_price = t["part"].groupBy("p_retailprice").agg(
        F.min("p_size").alias("min_size")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    frontier_prices = per_price.withColumn(
        "prefix_min", F.min("min_size").over(w)
    )
    return (
        t["part"]
        .join(frontier_prices, "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("min_size"))
            & (F.col("prefix_min").isNull() | (F.col("p_size") < F.col("prefix_min")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


O_PARETO_FRONTIER = """
SELECT p_partkey, p_retailprice, p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
)
"""

QUERIES["pareto_frontier"] = q_pareto_frontier
ORACLES["pareto_frontier"] = O_PARETO_FRONTIER


# --- exact heavy hitters (two-phase frequent items) ---------------------

_HH_NUM, _HH_DEN = 1, 500  # support = 0.2% of corpus tokens


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: every token carrying >= 0.2% of all
    token occurrences — the vocabulary-pruning / stopword-discovery
    primitive.

    Plan: map-side candidate generation (operators/sketches.py:
    heavy_hitter_candidates — pigeonhole-complete, <=support_den items
    per Arrow batch) followed by an exact count of the candidates
    only: a broadcast semi-join keeps the verify groupBy's keyspace at
    the candidate count instead of the vocabulary size. Threshold
    arithmetic is pure integers on both sides.
    """
    from data_ingestors_spark.operators.sketches import heavy_hitter_candidates

    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
                " ",
            )
        ).alias("w")
    ).filter(F.col("w") != "")
    words = words.persist()
    cands = heavy_hitter_candidates(words, "w", _HH_NUM, _HH_DEN)
    total = words.agg(F.count("*").alias("n"))
    return (
        words.join(F.broadcast(cands), "w", "left_semi")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_DEN >= _HH_NUM * F.col("n"))
        .select(
            "w",
            "cnt",
            fround(F.col("cnt").cast("double") / F.col("n"), 6).alias("frac"),
        )
    )


O_HEAVY_HITTERS = f"""
WITH words AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
  FROM documents
), freq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM words WHERE w <> '' GROUP BY w
), tot AS (SELECT sum(cnt) AS n FROM freq)
SELECT w, cnt, {o_fround("CAST(cnt AS DOUBLE) / n", 6)} AS frac
FROM freq CROSS JOIN tot
WHERE cnt * {_HH_DEN} >= {_HH_NUM} * n
"""

QUERIES["heavy_hitters"] = q_heavy_hitters
ORACLES["heavy_hitters"] = O_HEAVY_HITTERS


# --- EWMA (exponentially weighted moving average) -----------------------

_EWMA_ALPHA = 0.5  # (1-alpha) = 0.5: weights are exact binary powers,
#                    so pow() is bit-identical across engines
_EWMA_SPAN = 20


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values: the truncated, normalized form
    (pandas ``ewm(alpha=.5, adjust=True)`` over a 20-row window) —
    ewma_t = sum_j (1-a)^j x_(t-j) / sum_j (1-a)^j, j < min(20, t).

    Plan: one window per user (rows frame, 19 preceding) collects the
    frame values; the weighted sum is an array HOF — zero joins, zero
    extra shuffles beyond the per-user sort, and per-row state bounded
    by the 20-element frame. The closed-form denominator
    (1-(1-a)^m)/a avoids a second aggregate. Terms accumulate in
    DECIMAL inside the fold so the 20-term sum is order-exact, and
    alpha = 0.5 makes every weight an exact binary power — the whole
    computation is bit-identical to the oracle's self-join
    formulation.
    """
    t = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), 0)
    )
    half = 1.0 - _EWMA_ALPHA
    ev = t["events"].withColumn("vals", F.collect_list("value").over(w))
    num = F.expr(
        f"""CAST(aggregate(
              zip_with(vals, sequence(size(vals) - 1, 0, -1),
                       (v, e) -> v * pow({half}, e)),
              CAST(0 AS DECIMAL(30,10)),
              (acc, x) -> CAST(acc + CAST(x AS DECIMAL(30,10)) AS DECIMAL(30,10))) AS DOUBLE)"""
    )
    den = F.lit(1.0) - F.pow(F.lit(half), F.size("vals"))
    return ev.select(
        "user_id",
        "event_id",
        fround(F.lit(_EWMA_ALPHA) * num / den, 6).alias("ewma"),
    )


O_EWMA = f"""
WITH ev AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.user_id, a.event_id,
       {o_fround(
           f"{_EWMA_ALPHA} * CAST(sum(CAST(b.value * pow({1.0 - _EWMA_ALPHA}, a.rn - b.rn) AS DECIMAL(30,10))) AS DOUBLE)"
           f" / (1.0 - pow({1.0 - _EWMA_ALPHA}, least(a.rn, {_EWMA_SPAN})))", 6)} AS ewma
FROM ev a JOIN ev b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
GROUP BY a.user_id, a.event_id, a.rn
"""

QUERIES["ewma"] = q_ewma
ORACLES["ewma"] = O_EWMA


# --- linear interpolation over a time grid ------------------------------

def q_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily mean event value on a dense calendar, with
    missing days LINEARLY INTERPOLATED between the nearest observed
    days (edges carry the nearest observation flat) — the hypertable
    ``interpolate()`` analog next to [gap_fill]'s zero-fill.

    Plan: daily means are one partial-aggregated groupBy; the dense
    calendar explodes per-user spans (bounded by users x days, not
    table size); prev/next observations come from two
    last/first-ignore-nulls windows over the per-user day order — no
    self-join, state bounded by one row. Interpolation arithmetic is
    identical IEEE ops on identically-rounded inputs on both sides.
    """
    t = tables(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            fround(
                F.sum(F.col("value").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("obs")
        )
    )
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    g = cal.join(daily, ["user_id", "day"], "left")
    wp = Window.partitionBy("user_id").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("user_id").orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("obs").isNotNull(), F.col("day"))
    g = (
        g.withColumn("pv", F.last("obs", ignorenulls=True).over(wp))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("obs", ignorenulls=True).over(wn))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(wn))
    )
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * F.datediff(F.col("day"), F.col("pd")).cast("double")
            / F.datediff(F.col("nd"), F.col("pd")).cast("double")
        )
    )
    return g.select(
        "user_id",
        "day",
        fround(interp, 6).alias("val"),
        F.col("obs").isNotNull().alias("is_obs"),
    )


O_LINEAR_INTERPOLATE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         {o_fround("CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS obs
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), cal AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
), g AS (
  SELECT cal.user_id, cal.day, daily.obs,
         last_value(daily.obs IGNORE NULLS) OVER
           (PARTITION BY cal.user_id ORDER BY cal.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN daily.obs IS NOT NULL THEN cal.day END IGNORE NULLS) OVER
           (PARTITION BY cal.user_id ORDER BY cal.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(daily.obs IGNORE NULLS) OVER
           (PARTITION BY cal.user_id ORDER BY cal.day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN daily.obs IS NOT NULL THEN cal.day END IGNORE NULLS) OVER
           (PARTITION BY cal.user_id ORDER BY cal.day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
)
SELECT user_id, day,
       {o_fround(
           "CASE WHEN obs IS NOT NULL THEN obs "
           "WHEN pv IS NULL THEN nv "
           "WHEN nv IS NULL THEN pv "
           "ELSE pv + (nv - pv) * CAST(date_diff('day', pd, day) AS DOUBLE)"
           "          / CAST(date_diff('day', pd, nd) AS DOUBLE) END", 6)} AS val,
       obs IS NOT NULL AS is_obs
FROM g
"""

QUERIES["linear_interpolate"] = q_linear_interpolate
ORACLES["linear_interpolate"] = O_LINEAR_INTERPOLATE


# --- mergeable quantile digest ------------------------------------------

_DIGEST_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_quantile_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended-price quantiles from the mergeable centroid digest
    (operators/digest.py): per-partition equal-weight compression, one
    centroid-only shuffle, cumulative-weight interpolation — the
    100 TB substitute for an exact global sort, with rank error
    bounded by ~2/B (B=200). Rows-only in the oracle sweep; the sweep
    records the measured max rank error vs the exact CDF, and
    tests/test_operators.py bounds it."""
    from data_ingestors_spark.operators.digest import digest_quantiles

    t = tables(spark, sf_dir, "lineitem")
    return digest_quantiles(t["lineitem"], "l_extendedprice", _DIGEST_QS, b=200)


QUERIES["quantile_digest"] = q_quantile_digest
# no ORACLE: approximate by construction — evidence wired in
# tools/local_correctness.py (rank-accuracy probe) and unit tests.


# --- autocorrelation function -------------------------------------------

_ACF_LAGS = (1, 2, 3)


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each event type's hourly mean-value series at
    lags 1-3 — the seasonality / burstiness probe run before choosing
    rollup grains.

    Plan: the series is ONE partial-aggregated groupBy (type, hour);
    lagged pairs come from per-type window lags over the tiny series
    frame (bounded by types x hours, not events); corr() is a single
    co-moment aggregate per (type, lag). Series points are
    decimal-exact + portably rounded BEFORE the lag, so both engines
    correlate identical doubles.
    """
    t = tables(spark, sf_dir, "events")
    series = (
        t["events"]
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(
            fround(
                F.sum(F.col("value").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("x")
        )
    )
    # all lags from ONE window sort: lag(x, k) columns share the same
    # ordering pass, then an explode stacks (lag, pair) rows for a
    # single groupBy — one scan and one sort instead of one per lag
    w = Window.partitionBy("event_type").orderBy("h")
    with_lags = series
    for k in _ACF_LAGS:
        with_lags = with_lags.withColumn(f"xl{k}", F.lag("x", k).over(w))
    lagged = with_lags.select(
        "event_type",
        "x",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).cast("long").alias("lag"),
                    F.col(f"xl{k}").alias("xl"),
                )
                for k in _ACF_LAGS
            ])
        ).alias("p"),
    ).select("event_type", "x", "p.lag", "p.xl")
    return (
        lagged.filter(F.col("xl").isNotNull())
        .groupBy("event_type", "lag")
        .agg(
            fround(F.corr("x", "xl"), 6).alias("acf"),
            F.count("*").cast("long").alias("n_pairs"),
        )
        .select("event_type", "lag", "acf", "n_pairs")
    )


def _o_acf_sql() -> str:
    parts = []
    for k in _ACF_LAGS:
        parts.append(f"""
SELECT event_type, CAST({k} AS BIGINT) AS lag,
       {o_fround("corr(x, xl)", 6)} AS acf,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM (
  SELECT event_type, x,
         lag(x, {k}) OVER (PARTITION BY event_type ORDER BY h) AS xl
  FROM series
)
WHERE xl IS NOT NULL
GROUP BY event_type""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         {o_fround("CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS x
  FROM events GROUP BY 1, 2
)
{union}
"""


QUERIES["acf"] = q_acf
ORACLES["acf"] = _o_acf_sql()


# --- seasonal decomposition (additive, weekly) --------------------------

def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic additive seasonal decomposition of the daily
    total-value series with weekly period: trend = centered 7-day
    moving average (defined only where the full window exists),
    seasonal = per-day-of-week mean of the detrended series, residual
    = x - trend - seasonal.

    Plan: the daily series is one partial-aggregated groupBy; every
    window rides the series frame (days, not events) and partitions by
    series key in the general case (here: one global series, the
    degenerate single-partition window the plan doctor tolerates for
    aggregate frames). Day-of-week is computed portably as
    datediff-mod-7 from a fixed Monday so both engines bucket
    identically; every sum is decimal-accumulated.
    """
    t = tables(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(fround(F.sum(F.col("value").cast(DEC)).cast("double"), 4).alias("x"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    daily = daily.withColumn(
        "trend",
        F.when(
            F.count("*").over(w7) == 7,
            fround(F.sum(F.col("x").cast(DEC)).over(w7).cast("double") / F.lit(7.0), 6),
        ),
    ).withColumn(
        "dow", F.pmod(F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")), F.lit(7))
    )
    det = daily.withColumn("d", F.col("x") - F.col("trend"))
    seas = (
        det.filter(F.col("d").isNotNull())
        .groupBy("dow")
        .agg(
            fround(
                F.sum(F.col("d").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("seasonal")
        )
    )
    return (
        det.join(F.broadcast(seas), "dow", "left")
        .select(
            "day",
            "x",
            "trend",
            "seasonal",
            fround(F.col("x") - F.col("trend") - F.col("seasonal"), 6).alias("resid"),
        )
    )


O_SEASONAL_DECOMPOSE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         {o_fround("CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE)", 4)} AS x
  FROM events GROUP BY 1
), tr AS (
  SELECT day, x,
         CASE WHEN count(*) OVER w7 = 7
              THEN {o_fround("CAST(sum(CAST(x AS DECIMAL(30,10))) OVER w7 AS DOUBLE) / 7.0", 6)}
         END AS trend,
         mod(mod(date_diff('day', DATE '2024-01-01', day), 7) + 7, 7) AS dow
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), seas AS (
  SELECT dow,
         {o_fround("CAST(sum(CAST(x - trend AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY dow
)
SELECT day, x, trend, seasonal,
       {o_fround("x - trend - seasonal", 6)} AS resid
FROM tr LEFT JOIN seas USING (dow)
"""

QUERIES["seasonal_decompose"] = q_seasonal_decompose
ORACLES["seasonal_decompose"] = O_SEASONAL_DECOMPOSE


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles from merged per-group
    centroid digests (operators/digest.py:grouped_digest_quantiles) —
    the per-key percentile monitor whose shuffle carries centroids,
    never values. Rows-only: approximate by construction; its exact
    sibling math is oracle-checked in [winsorized_stats] (exact
    interpolated per-source p05/p95) and the rank-error bound is
    asserted in tests/test_operators.py::test_grouped_digest_quantiles."""
    from data_ingestors_spark.operators.digest import grouped_digest_quantiles

    t = tables(spark, sf_dir, "documents")
    return grouped_digest_quantiles(
        t["documents"].select("source", F.col("n_chars").cast("double").alias("n_chars")),
        "source",
        "n_chars",
        [0.5, 0.95],
        b=64,
    )


QUERIES["grouped_quantiles"] = q_grouped_quantiles
# no ORACLE: digest is approximate; exact sibling = winsorized_stats,
# bound asserted in tests (see docstring) + sweep evidence entry.


_H2D_PRICE_W, _H2D_SIZE_W = 10000.0, 10


def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (heatmap grid): part counts per (retail-price,
    size) bin with per-bin average price — the density-grid primitive
    behind scatter-heatmap dashboards and outlier maps.

    Plan: binning is pure row-local floor arithmetic (identical IEEE
    ops both engines — no width_bucket portability trap), then ONE
    partial-aggregated groupBy on the bin pair. Bin cardinality, not
    row count, bounds everything downstream."""
    t = tables(spark, sf_dir, "part")
    binned = t["part"].select(
        F.floor(F.col("p_retailprice") / _H2D_PRICE_W).cast("long").alias("price_bin"),
        F.floor(F.col("p_size") / _H2D_SIZE_W).cast("long").alias("size_bin"),
        "p_retailprice",
    )
    return binned.groupBy("price_bin", "size_bin").agg(
        F.count("*").cast("long").alias("n"),
        fround(
            F.sum(F.col("p_retailprice").cast(DEC)).cast("double") / F.count("*"), 4
        ).alias("avg_price"),
    )


O_HISTOGRAM2D = f"""
SELECT CAST(floor(p_retailprice / {_H2D_PRICE_W}) AS BIGINT) AS price_bin,
       CAST(floor(p_size / {_H2D_SIZE_W}) AS BIGINT) AS size_bin,
       CAST(count(*) AS BIGINT) AS n,
       {o_fround("CAST(sum(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS avg_price
FROM part GROUP BY 1, 2
"""

QUERIES["histogram2d"] = q_histogram2d
ORACLES["histogram2d"] = O_HISTOGRAM2D


# --- mutual information audit -------------------------------------------

def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source, plus
    both marginal entropies and the normalized MI — the one-number
    answer to "does source determine language in this corpus?" (NMI 1
    = perfectly coupled: per-source language filters are redundant
    with source filters; NMI 0 = independent: both axes carry signal
    for mixture design).

    Plan (100 TB): ONE map-side-combined groupBy over documents
    produces the (lang, source) contingency cells; margins and totals
    derive from that tiny frame (|langs|x|sources| rows, data-size-
    independent). MI/entropy terms fold in decimal so the sums are
    merge-order-exact; NMI normalizes by the smaller marginal entropy.
    """
    t = tables(spark, sf_dir, "documents")
    cells = (
        t["documents"]
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ml = cells.groupBy("lang").agg(F.sum("c").alias("cl"))
    ms = cells.groupBy("source").agg(F.sum("c").alias("cs"))
    tot = cells.agg(F.sum("c").alias("t"))
    mi = (
        cells.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (
                    (F.col("c") / F.col("t"))
                    * F.log2(
                        (F.col("c") * F.col("t"))
                        / (F.col("cl") * F.col("cs"))
                    )
                ).cast(DEC)
            )
            .cast("double")
            .alias("_mi")
        )
    )

    def entropy(margin: DataFrame, cnt: str, out: str) -> DataFrame:
        return margin.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                (
                    -(F.col(cnt) / F.col("t"))
                    * F.log2(F.col(cnt) / F.col("t"))
                ).cast(DEC)
            )
            .cast("double")
            .alias(out)
        )

    hl = entropy(ml, "cl", "_hl")
    hs = entropy(ms, "cs", "_hs")
    return (
        mi.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            fround(F.col("_mi"), 6).alias("mi_bits"),
            fround(F.col("_hl"), 6).alias("h_lang_bits"),
            fround(F.col("_hs"), 6).alias("h_source_bits"),
            fround(F.col("_mi") / F.least("_hl", "_hs"), 6).alias("nmi"),
        )
    )


O_MUTUAL_INFORMATION = f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2
), ml AS (SELECT lang, sum(c) AS cl FROM cells GROUP BY 1),
ms AS (SELECT source, sum(c) AS cs FROM cells GROUP BY 1),
tot AS (SELECT sum(c) AS t FROM cells),
mi AS (
  SELECT CAST(sum(CAST((c / CAST(t AS DOUBLE)) * log2((c * CAST(t AS DOUBLE)) / (CAST(cl AS DOUBLE) * cs)) AS DECIMAL(30,10))) AS DOUBLE) AS _mi
  FROM cells JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN tot
), hl AS (
  SELECT CAST(sum(CAST(-(cl / CAST(t AS DOUBLE)) * log2(cl / CAST(t AS DOUBLE)) AS DECIMAL(30,10))) AS DOUBLE) AS _hl
  FROM ml CROSS JOIN tot
), hs AS (
  SELECT CAST(sum(CAST(-(cs / CAST(t AS DOUBLE)) * log2(cs / CAST(t AS DOUBLE)) AS DECIMAL(30,10))) AS DOUBLE) AS _hs
  FROM ms CROSS JOIN tot
)
SELECT {o_fround("_mi", 6)} AS mi_bits,
       {o_fround("_hl", 6)} AS h_lang_bits,
       {o_fround("_hs", 6)} AS h_source_bits,
       {o_fround("_mi / least(_hl, _hs)", 6)} AS nmi
FROM mi CROSS JOIN hl CROSS JOIN hs
"""

QUERIES["mutual_information"] = q_mutual_information
ORACLES["mutual_information"] = O_MUTUAL_INFORMATION


# --- two-proportion A/B z-test ------------------------------------------

def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic 50/50 user split:
    arm = user_id mod 2, conversion = user ever fired a 'purchase'
    event. Emits per-arm sizes/rates and the pooled z statistic — the
    standard experiment-readout primitive (|z| > 1.96 ~ p < .05).

    Plan (100 TB): one map-side-combined groupBy collapses events to
    one row per user (conversion flag via max), one conditional agg
    folds users into a single row — no shuffle carries raw events
    past the first groupBy. Counts are exact BIGINTs; the z arithmetic
    runs on identical doubles in both engines.
    """
    t = tables(spark, sf_dir, "events")
    users = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchase"),
            F.count("*").alias("n_events"),
        )
        # conversion = purchase-heavy user (>= 1/5 of their events are
        # purchases) — a SHARE, not a count, so the rate doesn't drift
        # to 1.0 as events-per-user grows with data volume; integer
        # compare avoids any float boundary jitter across engines
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
            F.when(F.col("n_purchase") * 5 >= F.col("n_events"), 1)
            .otherwise(0)
            .alias("conv"),
        )
    )
    wide = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    ra = F.col("conv_a") / F.col("n_a")
    rb = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        fround(ra, 6).alias("rate_a"),
        fround(rb, 6).alias("rate_b"),
        # degenerate pools (0% / 100% conversion) have se = 0: no test
        F.when((pool == 0) | (pool == 1), F.lit(None).cast("double"))
        .otherwise(fround((ra - rb) / se, 4))
        .alias("z_stat"),
    )


O_AB_TEST = f"""
WITH per_user AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
         count(*) AS n_events
  FROM events GROUP BY user_id
), users AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN n_purchase * 5 >= n_events THEN 1 ELSE 0 END AS conv
  FROM per_user
), wide AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM users
)
SELECT n_a, conv_a, n_b, conv_b,
       {o_fround("CAST(conv_a AS DOUBLE) / n_a", 6)} AS rate_a,
       {o_fround("CAST(conv_b AS DOUBLE) / n_b", 6)} AS rate_b,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL
            ELSE {o_fround("(CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) * (1.0 / n_a + 1.0 / n_b))", 4)} END AS z_stat
FROM wide
"""

QUERIES["ab_test_proportions"] = q_ab_test_proportions
ORACLES["ab_test_proportions"] = O_AB_TEST


# --- Holt double exponential smoothing ----------------------------------

_HOLT_ALPHA = 0.3
_HOLT_BETA = 0.1


def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing of daily
    revenue, plus a 7-day-ahead forecast per day — the classic
    trend-following companion to [ewma] (which has no trend term and
    lags ramps). level_t = αx_t + (1-α)(level+trend);
    trend_t = β(level_t - level) + (1-β)trend.

    Implementation surface: the coupled recurrence is inherently
    sequential, so it runs in ONE applyInPandas group over the daily
    aggregate — safe at any data scale because the series length is
    calendar-bounded (days), not data-bounded; the 100 TB of orders
    collapse to ~thousands of rows BEFORE the Python boundary, via a
    map-side-combined groupBy. Daily revenue folds in decimal so both
    engines seed the recursion with bit-identical doubles; from there
    the float ops are the same IEEE sequence (the DuckDB oracle
    unrolls the recursion as a RECURSIVE CTE).
    """
    import pandas as pd

    t = tables(spark, sf_dir, "orders")
    daily = (
        t["orders"]
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev")
        )
    )

    schema = "day date, rev double, level double, trend double"

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        level = trend = 0.0
        levels, trends = [], []
        for i, x in enumerate(pdf["rev"].to_numpy()):
            if i == 0:
                level, trend = x, 0.0
            else:
                prev = level
                level = _HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * (level + trend)
                trend = _HOLT_BETA * (level - prev) + (1 - _HOLT_BETA) * trend
            levels.append(level)
            trends.append(trend)
        pdf["level"] = levels
        pdf["trend"] = trends
        return pdf[["day", "rev", "level", "trend"]]

    smoothed = (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _k, pdf: holt(pdf), schema)
    )
    return smoothed.select(
        "day",
        fround(F.col("rev"), 2).alias("rev"),
        fround(F.col("level"), 2).alias("level"),
        fround(F.col("trend"), 4).alias("trend"),
        fround(F.col("level") + 7 * F.col("trend"), 2).alias("forecast_7d"),
    )


O_HOLT_LINEAR = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), idx AS (
  SELECT day, rev, row_number() OVER (ORDER BY day) AS i FROM daily
), holt AS (
  SELECT i, day, rev, rev AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.i, idx.day, idx.rev,
         {_HOLT_ALPHA} * idx.rev + {1 - _HOLT_ALPHA} * (h.level + h.trend),
         {_HOLT_BETA} * ({_HOLT_ALPHA} * idx.rev + {1 - _HOLT_ALPHA} * (h.level + h.trend) - h.level)
           + {1 - _HOLT_BETA} * h.trend
  FROM holt h JOIN idx ON idx.i = h.i + 1
)
SELECT day,
       {o_fround("rev", 2)} AS rev,
       {o_fround("level", 2)} AS level,
       {o_fround("trend", 4)} AS trend,
       {o_fround("level + 7 * trend", 2)} AS forecast_7d
FROM holt
"""

QUERIES["holt_linear"] = q_holt_linear
ORACLES["holt_linear"] = O_HOLT_LINEAR


# --- STL-style residual anomalies ---------------------------------------

def q_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 anomalous days by |z-score| of the seasonal-decompose
    residual — the alerting layer on top of [seasonal_decompose]:
    remove trend (7-day centered MA) and weekly seasonality first, so
    a "spike" is measured against what the calendar predicts, not
    against a naive global mean (which flags every Saturday).

    Plan: identical skeleton to [seasonal_decompose] (series-frame
    windows over the daily aggregate, broadcast seasonal means);
    residual μ/σ fold in decimal over the ~series-length frame; top-10
    is TakeOrdered. All frames are calendar-bounded.
    """
    t = tables(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(fround(F.sum(F.col("value").cast(DEC)).cast("double"), 4).alias("x"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    daily = daily.withColumn(
        "trend",
        F.when(
            F.count("*").over(w7) == 7,
            fround(F.sum(F.col("x").cast(DEC)).over(w7).cast("double") / F.lit(7.0), 6),
        ),
    ).withColumn(
        "dow", F.pmod(F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")), F.lit(7))
    )
    det = daily.withColumn("d", F.col("x") - F.col("trend"))
    seas = (
        det.filter(F.col("d").isNotNull())
        .groupBy("dow")
        .agg(
            fround(
                F.sum(F.col("d").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("seasonal")
        )
    )
    resid = (
        det.join(F.broadcast(seas), "dow", "left")
        .select(
            "day",
            "x",
            fround(F.col("x") - F.col("trend") - F.col("seasonal"), 6).alias(
                "resid"
            ),
        )
        .filter(F.col("resid").isNotNull())
    )
    mstats = resid.agg(
        (F.sum(F.col("resid").cast(DEC)).cast("double") / F.count("*")).alias(
            "mu"
        ),
        F.count("*").alias("n"),
        F.sum((F.col("resid") * F.col("resid")).cast(DEC))
        .cast("double")
        .alias("s2"),
    ).select(
        "mu",
        F.sqrt(F.col("s2") / F.col("n") - F.col("mu") * F.col("mu")).alias(
            "sigma"
        ),
    )
    return (
        resid.crossJoin(F.broadcast(mstats))
        .select(
            "day",
            "x",
            "resid",
            fround((F.col("resid") - F.col("mu")) / F.col("sigma"), 4).alias(
                "z"
            ),
        )
        .orderBy(F.desc(F.abs(F.col("z"))), F.asc("day"))
        .limit(10)
    )


O_STL_ANOMALY = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         {o_fround("CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE)", 4)} AS x
  FROM events GROUP BY 1
), tr AS (
  SELECT day, x,
         CASE WHEN count(*) OVER w7 = 7
              THEN {o_fround("CAST(sum(CAST(x AS DECIMAL(30,10))) OVER w7 AS DOUBLE) / 7.0", 6)}
         END AS trend,
         mod(mod(date_diff('day', DATE '2024-01-01', day), 7) + 7, 7) AS dow
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), seas AS (
  SELECT dow,
         {o_fround("CAST(sum(CAST(x - trend AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY dow
), resid AS (
  SELECT day, x, {o_fround("x - trend - seasonal", 6)} AS resid
  FROM tr LEFT JOIN seas USING (dow)
  WHERE trend IS NOT NULL AND seasonal IS NOT NULL
), mstats AS (
  SELECT CAST(sum(CAST(resid AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mu,
         sqrt(CAST(sum(CAST(resid * resid AS DECIMAL(30,10))) AS DOUBLE) / count(*)
              - pow(CAST(sum(CAST(resid AS DECIMAL(30,10))) AS DOUBLE) / count(*), 2)) AS sigma
  FROM resid
)
SELECT day, x, resid, z FROM (
  SELECT day, x, resid,
         {o_fround("(resid - mu) / sigma", 4)} AS z
  FROM resid CROSS JOIN mstats
)
ORDER BY abs(z) DESC, day ASC
LIMIT 10
"""

QUERIES["stl_anomaly"] = q_stl_anomaly
ORACLES["stl_anomaly"] = O_STL_ANOMALY


# --- exact weighted median ----------------------------------------------

def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median of extended price per return
    flag — "the price point where half the shipped UNITS sit below" —
    using the lower-weighted-median rule (smallest value whose
    cumulative weight reaches half the total), which needs no
    interpolation and is engine-portable by construction.

    Plan (100 TB): weights pre-aggregate per (flag, price) — the
    cumulative window then runs over DISTINCT price points per flag,
    not raw rows, and groups are few. Weights fold in decimal; the
    reach-half test compares exact decimals (2*cum >= total), so no
    float boundary can flip the selected row.
    """
    t = tables(spark, sf_dir, "lineitem")
    per = t["lineitem"].groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum(F.col("l_quantity").cast(DEC)).alias("w"))
    wcum = Window.partitionBy("l_returnflag").orderBy("price")
    tot = Window.partitionBy("l_returnflag")
    ranked = per.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(tot).alias("total"),
    )
    return (
        ranked.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            fround(F.min("price"), 2).alias("weighted_median"),
            fround(F.max(F.col("total").cast("double")), 2).alias(
                "total_weight"
            ),
        )
    )


O_WEIGHTED_MEDIAN = f"""
WITH per AS (
  SELECT l_returnflag, l_extendedprice AS price,
         sum(CAST(l_quantity AS DECIMAL(30,10))) AS w
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT l_returnflag, price,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS total
  FROM per
)
SELECT l_returnflag,
       {o_fround("min(price)", 2)} AS weighted_median,
       {o_fround("max(CAST(total AS DOUBLE))", 2)} AS total_weight
FROM ranked
WHERE 2 * cum >= total
GROUP BY l_returnflag
"""

QUERIES["weighted_median"] = q_weighted_median
ORACLES["weighted_median"] = O_WEIGHTED_MEDIAN


# --- Theil-Sen robust trend --------------------------------------------

def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over the monthly revenue
    series: slope = lower median of all pairwise slopes, intercept =
    lower median of (y_i - slope * x_i). Unlike the OLS line (fit
    elsewhere as forecast_revenue), a single anomalous month cannot
    move this estimate — the robust-regression counterpart to
    [winsorized_stats].

    Plan (100 TB): the fact table collapses to one MONTHLY aggregate
    first (map-side-combined groupBy; the frame is calendar-bounded,
    ~84 rows/7 years REGARDLESS of data size), so the O(m²) pairwise
    self-join runs on months, not data — ~3.5k pair rows. Medians use
    the explicit SQL-standard discrete rule (smallest value with
    2*cum >= n) over value-count frames, so both engines pick the
    identical element instead of interpolating in engine-specific
    float order.
    """
    t = tables(spark, sf_dir, "orders")
    monthly = (
        t["orders"]
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("x")
        )
        .agg(
            fround(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2).alias("y")
        )
    )
    a = monthly.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = monthly.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (
        a.join(b, F.col("xa") < F.col("xb"))
        .select(
            fround(
                (F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa")), 6
            ).alias("s")
        )
    )

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        """Smallest value v with 2 * cum_count(v) >= n (1-row frame)."""
        vc = df.groupBy(col).agg(F.count("*").alias("c"))
        cum = vc.withColumn(
            "cum",
            F.sum("c").over(
                Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).withColumn("n", F.sum("c").over(Window.partitionBy()))
        return cum.agg(
            F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col(col))).alias(col)
        )

    slope = lower_median(slopes, "s")
    resid = monthly.crossJoin(F.broadcast(slope)).select(
        fround(F.col("y") - F.col("s") * F.col("x"), 6).alias("r")
    )
    icept = lower_median(resid, "r")
    stats = monthly.agg(
        F.count("*").cast("long").alias("n_months"),
        (F.count("*") * (F.count("*") - 1) / 2).cast("long").alias("n_pairs"),
    )
    return (
        stats.crossJoin(F.broadcast(slope))
        .crossJoin(F.broadcast(icept))
        .select(
            "n_months",
            "n_pairs",
            F.col("s").alias("slope"),
            F.col("r").alias("intercept"),
        )
    )


O_THEIL_SEN = f"""
WITH monthly AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS x,
         {o_fround("CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)", 2)} AS y
  FROM orders GROUP BY 1
),
slopes AS (
  SELECT {o_fround("(b.y - a.y) / (b.x - a.x)", 6)} AS s
  FROM monthly a JOIN monthly b ON a.x < b.x
),
slope AS (
  SELECT min(CASE WHEN 2 * cum >= n THEN s END) AS s FROM (
    SELECT s, sum(c) OVER (ORDER BY s) AS cum, sum(c) OVER () AS n
    FROM (SELECT s, count(*) AS c FROM slopes GROUP BY 1)
  )
),
resid AS (
  SELECT {o_fround("m.y - slope.s * m.x", 6)} AS r FROM monthly m CROSS JOIN slope
),
icept AS (
  SELECT min(CASE WHEN 2 * cum >= n THEN r END) AS r FROM (
    SELECT r, sum(c) OVER (ORDER BY r) AS cum, sum(c) OVER () AS n
    FROM (SELECT r, count(*) AS c FROM resid GROUP BY 1)
  )
)
SELECT CAST(count(*) AS BIGINT) AS n_months,
       CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs,
       min(slope.s) AS slope, min(icept.r) AS intercept
FROM monthly CROSS JOIN slope CROSS JOIN icept
"""

QUERIES["theil_sen"] = q_theil_sen
ORACLES["theil_sen"] = O_THEIL_SEN


# --- rolling-origin forecast backtest ----------------------------------

def q_mape_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the two standard forecasting
    baselines on monthly revenue — naive (previous month) and
    seasonal-naive (same month last year) — reporting MAE and MAPE per
    model over every month where BOTH predictions exist. The honest
    floor any real forecast model must beat before it ships
    (Hyndman's M-competition protocol).

    Plan (100 TB): like [theil_sen], all work after the first groupBy
    runs on the calendar-bounded monthly frame; the lag features are
    two window lags over ONE ordered pass, and the error aggregation
    accumulates in decimal so the reported means are reduction-order
    free.
    """
    t = tables(spark, sf_dir, "orders")
    monthly = (
        t["orders"]
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"))
        .agg(
            fround(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2).alias("y")
        )
    )
    w = Window.orderBy("m")
    feat = monthly.select(
        "m",
        "y",
        F.lag("y", 1).over(w).alias("p_naive"),
        F.lag("y", 12).over(w).alias("p_snaive"),
    ).filter(F.col("p_naive").isNotNull() & F.col("p_snaive").isNotNull())

    def err(pred: str, name: str) -> DataFrame:
        ae = F.abs(F.col("y") - F.col(pred))
        return feat.agg(
            F.lit(name).alias("model"),
            F.count("*").cast("long").alias("n_evals"),
            fround(F.sum(ae.cast(DEC)).cast("double") / F.count("*"), 4).alias("mae"),
            fround(
                F.sum((ae / F.col("y")).cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("mape"),
        )

    return err("p_naive", "naive").unionByName(err("p_snaive", "seasonal_naive"))


O_MAPE_BACKTEST = f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         {o_fround("CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)", 2)} AS y
  FROM orders GROUP BY 1
),
feat AS (
  SELECT m, y,
         lag(y, 1) OVER (ORDER BY m) AS p_naive,
         lag(y, 12) OVER (ORDER BY m) AS p_snaive
  FROM monthly
  QUALIFY p_naive IS NOT NULL AND p_snaive IS NOT NULL
)
SELECT 'naive' AS model, CAST(count(*) AS BIGINT) AS n_evals,
       {o_fround("CAST(sum(CAST(abs(y - p_naive) AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS mae,
       {o_fround("CAST(sum(CAST(abs(y - p_naive) / y AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS mape
FROM feat
UNION ALL
SELECT 'seasonal_naive' AS model, CAST(count(*) AS BIGINT) AS n_evals,
       {o_fround("CAST(sum(CAST(abs(y - p_snaive) AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS mae,
       {o_fround("CAST(sum(CAST(abs(y - p_snaive) / y AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 6)} AS mape
FROM feat
"""

QUERIES["mape_backtest"] = q_mape_backtest
ORACLES["mape_backtest"] = O_MAPE_BACKTEST


# ------------------------------------------ quantile normalization

def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document length and compare sources: each
    n_chars maps to its mid-rank corpus CDF value q = (cum - cnt/2)/N
    (the rank transform feature pipelines use to kill scale/outlier
    sensitivity before modeling), then per source the mean and exact
    median of q — 0.5 everywhere means identically-distributed
    lengths; a source skewing long shows mean_qnorm > 0.5.

    Scale shape: the CDF is computed on the VALUE-COUNT frame (one row
    per distinct n_chars — NDV-bounded, the same frame [cbo_stats]
    uses), not on documents; its single ordered window is over that
    bounded frame and the 1-row total rides a broadcast scalar cross
    join. Documents are touched by exactly one broadcast join against
    the (value -> q) lookup, then one map-side-combinable groupBy.
    """
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    vc = docs.groupBy("n_chars").agg(F.count("*").cast("long").alias("cnt"))
    wv = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    total = vc.agg(F.sum("cnt").cast("double").alias("n_total"))
    cdf = (
        vc.withColumn("cum", F.sum("cnt").over(wv))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "q", (F.col("cum").cast("double") - F.col("cnt") / 2.0) / F.col("n_total")
        )
    )
    return (
        docs.join(F.broadcast(cdf.select("n_chars", "q")), "n_chars")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            davg(F.col("q"), 6).alias("mean_qnorm"),
            fround(F.percentile("q", 0.5), 6).alias("p50_qnorm"),
        )
        .orderBy("source")
    )


O_QUANTILE_NORMALIZE = f"""
WITH vc AS (SELECT n_chars, count(*) AS cnt FROM documents GROUP BY 1),
cdf AS (
  SELECT n_chars,
         (CAST(sum(cnt) OVER (ORDER BY n_chars) AS DOUBLE) - cnt / 2.0)
           / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS q
  FROM vc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {o_davg("q", 6)} AS mean_qnorm,
       {o_fround("quantile_cont(q, 0.5)", 6)} AS p50_qnorm
FROM documents d JOIN cdf USING (n_chars)
GROUP BY 1 ORDER BY 1
"""

QUERIES["quantile_normalize"] = q_quantile_normalize
ORACLES["quantile_normalize"] = O_QUANTILE_NORMALIZE


# --- ROC AUC / Mann-Whitney U ------------------------------------------

def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based ROC AUC + tie-corrected Mann-Whitney U/z for a score
    (document length) against a binary label (``lang = 'en'``) — the
    standard separability check a pipeline runs before trusting any
    quality score as a filter signal.

    Plan: ONE partial-aggregated groupBy(score) collapses the corpus to
    its distinct score values with (n, n_pos) counts; everything after
    runs on that NDV-bounded frame. The cumulative-rank window orders
    that aggregate frame, not raw rows, so the single-partition window
    holds |distinct scores| rows at any data scale. Average ranks make
    the AUC exact under ties; the z statistic carries the matching
    sum(t^3 - t) tie correction. Rank/tie sums accumulate in DECIMAL —
    order-free and exact past the 2^53 double ceiling a 100 TB rank sum
    would cross.
    """
    t = tables(spark, sf_dir, "documents")
    g = (
        t["documents"]
        .groupBy(F.col("n_chars").alias("score"))
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double").alias("np"),
        )
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = g.withColumn(
        "avg_rank", F.sum("n").over(w) - F.col("n") + (F.col("n") + F.lit(1.0)) / 2
    )
    agg = g.agg(
        F.sum(F.col("np").cast(DEC)).cast("double").alias("n1"),
        F.sum((F.col("n") - F.col("np")).cast(DEC)).cast("double").alias("n2"),
        F.sum((F.col("np") * F.col("avg_rank")).cast(DEC)).cast("double").alias("rpos"),
        F.sum((F.col("n") * F.col("n") * F.col("n") - F.col("n")).cast(DEC))
        .cast("double")
        .alias("ties"),
    )
    nn = F.col("n1") + F.col("n2")
    u = F.col("rpos") - F.col("n1") * (F.col("n1") + 1) / 2
    sigma = F.sqrt(
        F.col("n1") * F.col("n2") / 12
        * ((nn + 1) - F.col("ties") / (nn * (nn - 1)))
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n2").cast("long").alias("n_neg"),
        fround(u, 2).alias("u_stat"),
        fround(u / (F.col("n1") * F.col("n2")), 6).alias("auc"),
        fround((u - F.col("n1") * F.col("n2") / 2) / sigma, 6).alias("z_value"),
    )


O_ROC_AUC = f"""
WITH g AS (
  SELECT n_chars AS score, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS np
  FROM documents GROUP BY 1
),
r AS (
  SELECT *, sum(n) OVER (ORDER BY score) - n + (n + 1.0) / 2 AS avg_rank FROM g
),
a AS (
  SELECT CAST(sum(CAST(np AS DECIMAL(30,10))) AS DOUBLE) AS n1,
         CAST(sum(CAST(n - np AS DECIMAL(30,10))) AS DOUBLE) AS n2,
         CAST(sum(CAST(np * avg_rank AS DECIMAL(30,10))) AS DOUBLE) AS rpos,
         CAST(sum(CAST(n * n * n - n AS DECIMAL(30,10))) AS DOUBLE) AS ties
  FROM r
)
SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n2 AS BIGINT) AS n_neg,
       {o_fround("rpos - n1 * (n1 + 1) / 2", 2)} AS u_stat,
       {o_fround("(rpos - n1 * (n1 + 1) / 2) / (n1 * n2)", 6)} AS auc,
       {o_fround('''(rpos - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
         / sqrt(n1 * n2 / 12 * ((n1 + n2 + 1) - ties / ((n1 + n2) * (n1 + n2 - 1))))''', 6)} AS z_value
FROM a
"""

QUERIES["roc_auc"] = q_roc_auc
ORACLES["roc_auc"] = O_ROC_AUC


# --- calibration / reliability bins ------------------------------------

def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: min-max-normalize the score (document
    length), split [0,1] into 10 equal-width bins, and compare each
    bin's mean normalized score against its empirical positive rate
    (``lang = 'en'``) — the calibration readout for any score used as
    a sampling weight or filter threshold.

    Plan: a 1-row min/max scalar frame broadcast onto the scan, then
    one partial-aggregated groupBy(bin) — two scans of the fact table
    total (the scalar agg and the binned agg), no raw-row shuffle
    beyond the 10-row bin frame. Means accumulate in DECIMAL via
    davg so reduction order cannot move the 6-dp rounding.
    """
    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    mm = docs.agg(
        F.min("n_chars").cast("double").alias("lo"),
        F.max("n_chars").cast("double").alias("hi"),
    )
    norm = (F.col("n_chars") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    return (
        docs.crossJoin(F.broadcast(mm))
        .withColumn("s", norm)
        .withColumn("bin", F.least(F.lit(9), F.floor(F.col("s") * 10)).cast("long"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            davg(F.col("s"), 6).alias("mean_score"),
            davg(F.when(F.col("lang") == "en", 1.0).otherwise(0.0), 6).alias("pos_rate"),
        )
        .orderBy("bin")
    )


O_CALIBRATION_BINS = f"""
WITH mm AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo, CAST(max(n_chars) AS DOUBLE) AS hi FROM documents),
s AS (
  SELECT (n_chars - lo) / (hi - lo) AS s, lang FROM documents CROSS JOIN mm
)
SELECT CAST(least(9, floor(s * 10)) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       {o_davg("s", 6)} AS mean_score,
       {o_davg("CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END", 6)} AS pos_rate
FROM s GROUP BY 1 ORDER BY 1
"""

QUERIES["calibration_bins"] = q_calibration_bins
ORACLES["calibration_bins"] = O_CALIBRATION_BINS


# --- Benjamini-Hochberg multiple-testing correction ----------------------

def q_multi_test_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source one-sample proportion z-tests (each source's English
    rate against the pooled corpus rate) with Benjamini-Hochberg FDR
    correction — the guard against the 20-sources-so-one-looks-
    significant trap that raw per-source p-values fall into.

    The normal CDF uses the logistic approximation
    Phi(x) ~= 1 / (1 + exp(-1.702 x)) (Page 1977) so both engines run
    the same closed-form exp() on identical doubles — no erf()
    dependency, and the |error| < 0.01 of the approximation is
    irrelevant to the RANKING that BH consumes (it is monotone).

    Scale shape: one partial-aggregated groupBy(source) collapses the
    corpus; the pooled rate is a 1-row broadcast; the BH rank and the
    backwards running-min windows order the |sources|-row aggregate
    frame only — single-partition windows over a frame whose size is
    the source cardinality, never the document count. z divides exact
    integer-derived doubles; q = min_{j>=i}(p_j * m / j) capped at 1.
    """
    t = tables(spark, sf_dir, "documents")
    g = t["documents"].groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("np"),
    )
    tot = g.agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum("np").cast("double").alias("nnp"),
    )
    p0 = F.col("nnp") / F.col("nn")
    z = (F.col("np") / F.col("n") - p0) / F.sqrt(p0 * (1 - p0) / F.col("n"))
    scored = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("z_raw", z)
        .withColumn("p_raw", F.lit(2.0) / (F.lit(1.0) + F.exp(F.lit(1.702) * F.abs(F.col("z_raw")))))
    )
    wr = Window.orderBy("p_raw", "source")
    wm = Window.orderBy(F.desc("rnk")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        scored.withColumn("rnk", F.row_number().over(wr))
        .withColumn("m", F.count("*").over(Window.partitionBy()))
        .withColumn("bh", F.col("p_raw") * F.col("m") / F.col("rnk"))
        .withColumn("q_raw", F.least(F.lit(1.0), F.min("bh").over(wm)))
    )
    return ranked.select(
        "source",
        F.col("n").alias("n_docs"),
        fround(F.col("np").cast("double") / F.col("n"), 6).alias("en_rate"),
        fround(F.col("z_raw"), 4).alias("z_value"),
        fround(F.col("p_raw"), 6).alias("p_value"),
        fround(F.col("q_raw"), 6).alias("q_value"),
        F.when(F.col("q_raw") <= 0.05, 1).otherwise(0).cast("long").alias("significant"),
    ).orderBy("source")


O_MULTI_TEST_FDR = f"""
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS np
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(np) AS DOUBLE) AS nnp FROM g),
scored AS (
  SELECT source, n, np,
         (np / CAST(n AS DOUBLE) - nnp / nn)
           / sqrt((nnp / nn) * (1 - nnp / nn) / n) AS z_raw,
         2.0 / (1.0 + exp(1.702 * abs(
           (np / CAST(n AS DOUBLE) - nnp / nn)
             / sqrt((nnp / nn) * (1 - nnp / nn) / n)))) AS p_raw
  FROM g CROSS JOIN tot
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_raw, source) AS rnk,
         count(*) OVER () AS m
  FROM scored
),
bh AS (
  SELECT *, least(1.0, min(p_raw * m / rnk) OVER (ORDER BY rnk DESC
              ROWS UNBOUNDED PRECEDING)) AS q_raw
  FROM ranked
)
SELECT source, n AS n_docs,
       {o_fround("np / CAST(n AS DOUBLE)", 6)} AS en_rate,
       {o_fround("z_raw", 4)} AS z_value,
       {o_fround("p_raw", 6)} AS p_value,
       {o_fround("q_raw", 6)} AS q_value,
       CAST(CASE WHEN q_raw <= 0.05 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM bh ORDER BY source
"""

QUERIES["multi_test_fdr"] = q_multi_test_fdr
ORACLES["multi_test_fdr"] = O_MULTI_TEST_FDR


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between quantity and price on a deterministic
    order-key sample — the concordance companion to [q_spearman_corr]
    (tau's pairwise form is robust to the heavy ties both columns
    carry; the tie-adjusted tau-b denominator handles them exactly).

    Sampling: l_orderkey % 97 == 0 — modulo, never RNG (the bounded-
    audit rule), keeping the O(m²) pair enumeration a few-million-row
    job at any SF (raise the modulus at scale, same contract as
    [q_blocking_audit]).

    Exactness: concordant / discordant / tie counts are pure integer
    aggregates; tau-b is one double expression over them — engine-
    identical before rounding.

    Plan (100 TB): the sampled frame self-joins on a constant (it is
    deliberately tiny); everything else is one count aggregation."""
    t = tables(spark, sf_dir, "lineitem")
    s = (
        t["lineitem"]
        .filter(F.col("l_orderkey") % 97 == 0)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
            F.col("l_quantity").alias("x"),
            F.col("l_extendedprice").alias("y"),
        )
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, F.col("a.rid") < F.col("b.rid"))
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when((dx != 0) & (dy != 0) & (dx * dy > 0), 1).otherwise(0))
        .cast("long")
        .alias("concordant"),
        F.sum(F.when((dx != 0) & (dy != 0) & (dx * dy < 0), 1).otherwise(0))
        .cast("long")
        .alias("discordant"),
        F.sum(F.when(dx == 0, 1).otherwise(0)).cast("long").alias("tied_x"),
        F.sum(F.when(dy == 0, 1).otherwise(0)).cast("long").alias("tied_y"),
    )
    n = s.agg(F.count("*").cast("long").alias("n_sampled"))
    tau = (F.col("concordant") - F.col("discordant")) / F.sqrt(
        (F.col("n_pairs") - F.col("tied_x")).cast("double")
        * (F.col("n_pairs") - F.col("tied_y"))
    )
    return (
        agg.crossJoin(F.broadcast(n))
        .select(
            "n_sampled",
            "n_pairs",
            "concordant",
            "discordant",
            "tied_x",
            "tied_y",
            fround(tau, 6).alias("tau_b"),
        )
    )


O_KENDALL_TAU = f"""
WITH s AS (
  SELECT l_orderkey * 10 + l_linenumber AS rid,
         l_quantity AS x, l_extendedprice AS y
  FROM lineitem WHERE l_orderkey % 97 = 0
),
pairs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN a.x <> b.x AND a.y <> b.y AND (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(sum(CASE WHEN a.x <> b.x AND a.y <> b.y AND (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tied_x,
         CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS tied_y
  FROM s a JOIN s b ON a.rid < b.rid
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled FROM s)
SELECT n_sampled, n_pairs, concordant, discordant, tied_x, tied_y,
       {o_fround("(concordant - discordant) / sqrt(CAST(n_pairs - tied_x AS DOUBLE) * (n_pairs - tied_y))", 6)} AS tau_b
FROM pairs CROSS JOIN n
"""

QUERIES["kendall_tau"] = q_kendall_tau
ORACLES["kendall_tau"] = O_KENDALL_TAU


def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test across event types:
    the W statistic over |value − group median| deviations — the
    gatekeeper assumption check before pooled-variance comparisons
    ([q_seasonality_strength]'s ANOVA assumes it; this audits it).
    Median-centered (Brown–Forsythe) rather than mean-centered
    (classic Levene) for heavy-tail robustness.

    Exactness: group medians are quantile_cont twins (proven
    portable); per-group z sums fold in decimal; the k-term and
    group-term reductions also fold in decimal so the F ratio is
    engine-identical before rounding.

    Plan (100 TB): one percentile groupBy (|types| rows, broadcast
    back), one conditional-aggregate scan for per-group z stats, then
    arithmetic over a |types|-row frame with a 1-row grand cross
    join. Nothing sorts."""
    t = tables(spark, sf_dir, "events")
    med = t["events"].groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    z = t["events"].join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_j"),
        F.sum(F.col("z").cast(DEC)).alias("sz"),
        F.sum((F.col("z") * F.col("z")).cast(DEC)).alias("szz"),
    )
    grand = g.agg(
        F.sum("n_j").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("k_groups"),
        F.sum("sz").alias("sz_all"),
    )
    zbar_j = F.col("sz").cast("double") / F.col("n_j")
    zbar = F.col("sz_all").cast("double") / F.col("n_total")
    num_term = (F.col("n_j") * (zbar_j - zbar) * (zbar_j - zbar)).cast(DEC)
    den_term = (
        F.col("szz").cast("double") - F.col("n_j") * zbar_j * zbar_j
    ).cast(DEC)
    parts = g.crossJoin(F.broadcast(grand)).agg(
        F.first("n_total").alias("n_total"),
        F.first("k_groups").alias("k_groups"),
        F.sum(num_term).cast("double").alias("num"),
        F.sum(den_term).cast("double").alias("den"),
    )
    w = (
        (F.col("n_total") - F.col("k_groups"))
        / (F.col("k_groups") - 1)
        * F.col("num")
        / F.col("den")
    )
    return parts.select(
        "k_groups",
        "n_total",
        (F.col("k_groups") - 1).cast("long").alias("df1"),
        (F.col("n_total") - F.col("k_groups")).cast("long").alias("df2"),
        fround(w, 6).alias("bf_stat"),
    )


O_LEVENE_TEST = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
z AS (
  SELECT e.event_type, abs(e.value - m.med) AS z
  FROM events e JOIN med m USING (event_type)
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_j,
         sum(CAST(z AS DECIMAL(30,10))) AS sz,
         sum(CAST(z * z AS DECIMAL(30,10))) AS szz
  FROM z GROUP BY 1
),
grand AS (
  SELECT CAST(sum(n_j) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS k_groups,
         sum(sz) AS sz_all
  FROM g
),
parts AS (
  SELECT any_value(n_total) AS n_total, any_value(k_groups) AS k_groups,
         CAST(sum(CAST(n_j * pow(CAST(sz AS DOUBLE) / n_j - CAST(sz_all AS DOUBLE) / n_total, 2) AS DECIMAL(30,10))) AS DOUBLE) AS num,
         CAST(sum(CAST(CAST(szz AS DOUBLE) - n_j * pow(CAST(sz AS DOUBLE) / n_j, 2) AS DECIMAL(30,10))) AS DOUBLE) AS den
  FROM g CROSS JOIN grand
)
SELECT k_groups, n_total,
       CAST(k_groups - 1 AS BIGINT) AS df1,
       CAST(n_total - k_groups AS BIGINT) AS df2,
       {o_fround("(n_total - k_groups) / CAST(k_groups - 1 AS DOUBLE) * num / den", 6)} AS bf_stat
FROM parts
"""

QUERIES["levene_test"] = q_levene_test
ORACLES["levene_test"] = O_LEVENE_TEST


def q_info_gain_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump feature screen over the embedding table: the
    information gain of each of the first 8 dimensions' SIGN bit for
    predicting the label — the 30-second 'is there any signal here'
    triage before anyone trains a probe ([q_mutual_information] is
    its categorical-pair sibling; this screens continuous dims via
    the cheapest binarization).

    Exactness: every probability is an exact integer ratio; entropy
    terms use libm log2 on identical doubles and fold in decimal.

    Plan (100 TB): the 8-dim slice explodes to 8 rows per vector and
    immediately collapses into (dim, bit, label) cells — 8 x 2 x
    |labels| rows; everything after is arithmetic on that tiny frame.
    One scan, one shuffle."""
    t = tables(spark, sf_dir, "embeddings")
    cells = (
        t["embeddings"]
        .select(
            "label",
            F.posexplode(F.slice("embedding", 1, 8)).alias("dim", "v"),
        )
        .groupBy("dim", (F.col("v") > 0).cast("int").alias("bit"), "label")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per_bit = cells.groupBy("dim", "bit").agg(
        F.sum("c").cast("long").alias("n_b")
    )
    # conditional entropy per (dim, bit) from exact cell fractions
    ent_b = (
        cells.join(per_bit.select("dim", "bit", "n_b"), ["dim", "bit"])
        .groupBy("dim", "bit", "n_b")
        .agg(
            F.sum(
                (
                    -(F.col("c") / F.col("n_b"))
                    * F.log2(F.col("c") / F.col("n_b"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("h_b")
        )
    )
    # global label entropy (same for every dim): from dim 0's cells
    lbl = (
        cells.filter(F.col("dim") == 0)
        .groupBy("label")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    n_tot = lbl.agg(F.sum("c").cast("long").alias("n"))
    h_label = (
        lbl.crossJoin(F.broadcast(n_tot))
        .agg(
            F.sum(
                (
                    -(F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("h_label"),
            F.first("n").alias("n"),
        )
    )
    gain = (
        ent_b.crossJoin(F.broadcast(h_label))
        .groupBy("dim")
        .agg(
            F.first("h_label").alias("h_lbl"),
            F.sum(((F.col("n_b") / F.col("n")) * F.col("h_b")).cast(DEC))
            .cast("double")
            .alias("h_cond"),
        )
    )
    return gain.select(
        F.col("dim").cast("int").alias("dim"),
        fround(F.col("h_lbl"), 6).alias("h_label"),
        fround(F.col("h_cond"), 6).alias("h_conditional"),
        fround(F.col("h_lbl") - F.col("h_cond"), 6).alias("info_gain"),
    ).orderBy("dim")


O_INFO_GAIN_SCREEN = f"""
WITH cells AS (
  SELECT d.dim, CAST(embedding[d.dim + 1] > 0 AS INTEGER) AS bit, label,
         CAST(count(*) AS BIGINT) AS c
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) AS dim) d
  GROUP BY 1, 2, 3
),
per_bit AS (
  SELECT dim, bit, CAST(sum(c) AS BIGINT) AS n_b FROM cells GROUP BY 1, 2
),
ent_b AS (
  SELECT c.dim, c.bit, p.n_b,
         CAST(sum(CAST(-(c.c / CAST(p.n_b AS DOUBLE)) * log2(c.c / CAST(p.n_b AS DOUBLE)) AS DECIMAL(30,10))) AS DOUBLE) AS h_b
  FROM cells c JOIN per_bit p USING (dim, bit)
  GROUP BY 1, 2, 3
),
lbl AS (
  SELECT label, CAST(sum(c) AS BIGINT) AS c FROM cells WHERE dim = 0 GROUP BY 1
),
n_tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lbl),
h_label AS (
  SELECT CAST(sum(CAST(-(c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE)) AS DECIMAL(30,10))) AS DOUBLE) AS h_label,
         any_value(n) AS n
  FROM lbl CROSS JOIN n_tot
),
gain AS (
  SELECT dim, any_value(h_label) AS h_lbl,
         CAST(sum(CAST((n_b / CAST(n AS DOUBLE)) * h_b AS DECIMAL(30,10))) AS DOUBLE) AS h_cond
  FROM ent_b CROSS JOIN h_label
  GROUP BY 1
)
SELECT CAST(dim AS INTEGER) AS dim,
       {o_fround("h_lbl", 6)} AS h_label,
       {o_fround("h_cond", 6)} AS h_conditional,
       {o_fround("h_lbl - h_cond", 6)} AS info_gain
FROM gain ORDER BY dim
"""

QUERIES["info_gain_screen"] = q_info_gain_screen
ORACLES["info_gain_screen"] = O_INFO_GAIN_SCREEN


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the first and second time halves of
    each event type's value distribution — the nonparametric
    complement to [q_profile_drift]'s mean deltas (a median shift
    registers here even when means agree). Average ranks handle ties
    (the fractional-rank treatment proven portable in
    [q_spearman_corr]); the normal approximation z is reported
    without tie correction — identical formula both engines.

    Plan (100 TB): one 1-row midpoint broadcast; ranks are one window
    pass partitioned BY EVENT TYPE (the same key every other
    per-type statistic shuffles on); one conditional aggregate ends
    it. Rank sums fold in decimal."""
    t = tables(spark, sf_dir, "events")
    rng = t["events"].agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    ev = t["events"].crossJoin(F.broadcast(rng)).select(
        "event_type",
        "value",
        (F.unix_micros("ts") < F.col("mid_us")).alias("in_a"),
    )
    wv = Window.partitionBy("event_type").orderBy("value")
    wg = Window.partitionBy("event_type", "value")
    ranked = ev.select(
        "event_type",
        "in_a",
        (F.rank().over(wv) + (F.count("*").over(wg) - 1) / 2.0).alias("arank"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("arank")).otherwise(0).cast(DEC))
        .cast("double")
        .alias("r_a"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    u = F.col("r_a") - na * (na + 1) / 2
    z = (u - na * nb / 2) / F.sqrt(na * nb * (na + nb + 1) / 12)
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        fround(u, 4).alias("u_stat"),
        fround(z, 6).alias("z_score"),
    ).orderBy("event_type")


O_MANN_WHITNEY = f"""
WITH rng AS (
  SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT) AS mid_us
  FROM events
),
ranked AS (
  SELECT event_type,
         epoch_us(ts) < mid_us AS in_a,
         rank() OVER (PARTITION BY event_type ORDER BY value)
           + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS arank
  FROM events CROSS JOIN rng
),
agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CAST(CASE WHEN in_a THEN arank ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE) AS r_a
  FROM ranked GROUP BY 1
)
SELECT event_type, n_a, n_b,
       {o_fround("r_a - n_a * (n_a + 1.0) / 2", 4)} AS u_stat,
       {o_fround("(r_a - n_a * (n_a + 1.0) / 2 - CAST(n_a AS DOUBLE) * n_b / 2) / sqrt(CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1) / 12)", 6)} AS z_score
FROM agg ORDER BY event_type
"""

QUERIES["mann_whitney"] = q_mann_whitney
ORACLES["mann_whitney"] = O_MANN_WHITNEY


def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-half volume share per event type with its Wilson 95%
    confidence interval — is the apparent growth/decline of each
    stream statistically distinguishable from a 50/50 split? The
    interval-bearing companion to [q_profile_drift]'s point
    volume_ratio (Wilson, not Wald: correct coverage at extreme
    shares and small n).

    Exactness: p-hat is an exact integer ratio; the Wilson bounds are
    one closed-form double expression with z = 1.96 — identical libm
    sqrt both engines.

    Plan (100 TB): one 1-row midpoint broadcast, ONE conditional
    aggregate to |types| rows, row-local arithmetic."""
    t = tables(spark, sf_dir, "events")
    rng = t["events"].agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    agg = (
        t["events"]
        .crossJoin(F.broadcast(rng))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.unix_micros("ts") >= F.col("mid_us"), 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
    )
    z = F.lit(1.96)
    n, x = F.col("n").cast("double"), F.col("x").cast("double")
    p = x / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return agg.select(
        "event_type",
        "n",
        "x",
        fround(p, 6).alias("p_hat"),
        fround(center - half, 6).alias("wilson_lo"),
        fround(center + half, 6).alias("wilson_hi"),
    ).orderBy("event_type")


O_WILSON_CI = f"""
WITH rng AS (
  SELECT CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2) AS BIGINT) AS mid_us
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM events CROSS JOIN rng GROUP BY 1
)
SELECT event_type, n, x,
       {o_fround("x / CAST(n AS DOUBLE)", 6)} AS p_hat,
       {o_fround("((x / CAST(n AS DOUBLE)) + 1.96 * 1.96 / (2 * n)) / (1 + 1.96 * 1.96 / n) - (1.96 / (1 + 1.96 * 1.96 / n)) * sqrt((x / CAST(n AS DOUBLE)) * (1 - x / CAST(n AS DOUBLE)) / n + 1.96 * 1.96 / (4 * CAST(n AS DOUBLE) * n))", 6)} AS wilson_lo,
       {o_fround("((x / CAST(n AS DOUBLE)) + 1.96 * 1.96 / (2 * n)) / (1 + 1.96 * 1.96 / n) + (1.96 / (1 + 1.96 * 1.96 / n)) * sqrt((x / CAST(n AS DOUBLE)) * (1 - x / CAST(n AS DOUBLE)) / n + 1.96 * 1.96 / (4 * CAST(n AS DOUBLE) * n))", 6)} AS wilson_hi
FROM agg ORDER BY event_type
"""

QUERIES["wilson_ci"] = q_wilson_ci
ORACLES["wilson_ci"] = O_WILSON_CI
