"""Skew-safe join utilities.

AQE's skew-join split (asserted live in tests/test_plans.py) handles
most hot keys at runtime by splitting oversized partitions. Salting is
the explicit fallback when a SINGLE key is so hot that even a split
partition is one reducer's worth of the same key — the fact side gets
a random per-row salt and the dimension side is replicated once per
salt value, so one hot key fans out over ``n_salt`` reducers.

Cost model (why this is not the default): the dim side is replicated
``n_salt``-fold through the shuffle, so use it only when dim is small
relative to the hot key's row count — which is exactly the regime
where a hot key hurts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with the fact side salted
    over ``n_salt`` shuffle lanes. Result set is identical to the
    plain join (salting only changes the physical row routing)."""
    if SALT_COL in fact.columns or SALT_COL in dim.columns:
        raise ValueError(f"{SALT_COL} collides with an input column")
    fact_s = fact.withColumn(SALT_COL, F.floor(F.rand(seed) * n_salt).cast("int"))
    dim_s = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    return fact_s.join(dim_s, [key, SALT_COL], how).drop(SALT_COL)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    start_col: str = "s",
    end_col: str = "e",
    bin_size: int = 256,
    block_cols: tuple[str, ...] = (),
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Overlap join of two LARGE interval sets — the binned equi-join
    form of ``l.start <= r.end AND r.start <= l.end``.

    The existing range_join broadcasts one side (fine for a dim table,
    impossible when both sides are fact-scale). Here each interval
    explodes to the ``bin_size``-wide buckets it covers, the join is a
    plain shuffled EQUI-join on (block, bin) — Catalyst gets hash
    partitioning, AQE gets skew splitting — and the true overlap
    predicate is a residual filter.

    Duplicate-free by construction, no dropDuplicates shuffle: a pair
    overlapping across several shared bins is kept only in the bin
    containing the LATER of the two starts (that instant lies inside
    both intervals, so both sides exploded it; any other shared bin
    fails the guard). Cost scales with Σ interval_len/bin_size rows
    per side and per-bin occupancy — never |L|·|R|.

    Columns come back prefixed (``l_``/``r_``); intervals must be
    integers (epoch seconds or any monotone unit).
    """
    lb = F.floor(F.col(start_col) / bin_size)
    ub = F.floor(F.col(end_col) / bin_size)
    def binned(df: DataFrame, prefix: str) -> DataFrame:
        out = df.select(
            *[F.col(c).alias(prefix + c) for c in df.columns],
            F.explode(F.sequence(lb.cast("long"), ub.cast("long"))).alias("__bin"),
        )
        return out

    l = binned(left, left_prefix)
    r = binned(right, right_prefix)
    ls, le = F.col(left_prefix + start_col), F.col(left_prefix + end_col)
    rs, re_ = F.col(right_prefix + start_col), F.col(right_prefix + end_col)
    cond = F.col("__bin") == F.col("__bin_r")
    for c in block_cols:
        cond = cond & (F.col(left_prefix + c) == F.col(right_prefix + c))
    r = r.withColumnRenamed("__bin", "__bin_r")
    later_start_bin = F.floor(F.greatest(ls, rs) / bin_size).cast("long")
    return (
        l.join(r, cond)
        .filter((ls <= re_) & (rs <= le))
        .filter(F.col("__bin") == later_start_bin)  # exactly-once bin guard
        .drop("__bin", "__bin_r")
    )


def keyed_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style snapshot diff: classify every key as added / removed /
    modified / unchanged between two keyed snapshots.

    One full outer join on the key columns; change detection is a
    null-safe inequality over the compare columns (null-safe so a
    value turning NULL counts as a modification, not a match). At
    scale both snapshots shuffle once on the same key — co-locate by
    writing snapshots bucketed on the key and the join is
    exchange-free. Output: keys + status + old_/new_ compare columns.
    """
    # presence probes: any old/new side column non-null is not enough
    # (legit NULL values) — use a sentinel literal carried per side
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__old", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__new", F.lit(1))
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(changed, F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )


# --- Bloom-filter semi-join prefilter ----------------------------------

BLOOM_COL = "__bf"


def _bloom_hash_sql(key_sql: str, m_bits: int, k: int) -> list[str]:
    """k bit positions for ``key_sql``: k independently-seeded
    xxhash64 draws reduced mod m. (Kirsch-Mitzenmacher double hashing
    would save k-2 hash evaluations but its h1 + i*h2 combine
    overflows long under ANSI mode; xxhash64 is cheap enough that k
    draws stay inside one codegen stage.)"""
    return [f"pmod(xxhash64({key_sql}, {1000003 + i}), {m_bits})" for i in range(k)]


def bloom_build(
    keys: DataFrame, key: str, *, m_bits: int = 1 << 17, k: int = 5
) -> DataFrame:
    """Build a Bloom filter over ``keys[key]`` as a 1-row DataFrame
    holding ``map<long,long>``: word-index -> 64-bit mask (only words
    with at least one set bit are materialized, so a sparse filter is
    sparse in memory too).

    Fully distributed build: each row emits its k bit positions, a
    map-side-combined groupBy ORs the per-word masks, and a final
    1-row collect_list assembles the map — the only single-point data
    is the <= m_bits/64-entry mask list (2048 longs at the default
    128 Kbit), which is exactly what gets broadcast.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*[F.expr(h) for h in _bloom_hash_sql(key, m_bits, k)])
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("mask"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("word", "mask")))
            ).alias(BLOOM_COL)
        )
    )


def bloom_might_contain_sql(key_sql: str, m_bits: int, k: int) -> str:
    """SQL predicate: all k bits for ``key_sql`` set in ``__bf``."""
    checks = []
    for h in _bloom_hash_sql(key_sql, m_bits, k):
        word = f"CAST(shiftright({h}, 6) AS BIGINT)"
        bit = f"shiftleft(CAST(1 AS BIGINT), CAST(({h}) % 64 AS INT))"
        checks.append(
            f"((coalesce({BLOOM_COL}[{word}], CAST(0 AS BIGINT)) & {bit}) != 0)"
        )
    return " AND ".join(checks)


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    key: str,
    *,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Exact left-semi join ``big ⋉ keys`` on ``key`` with a broadcast
    Bloom prefilter on the big side.

    Why this exists (100 TB): when BOTH sides exceed the broadcast
    threshold, a semi join shuffles the full big side on the key. The
    Bloom filter of the key set is ~16 KB at the default 128 Kbit —
    always broadcastable no matter how large the key set — and drops
    every big-side row whose key is provably absent BEFORE the
    shuffle, so the exchange carries only plausible matches (true
    matches + ~0.6% false positives at k=5, m/n >= 10). The trailing
    exact semi join removes the false positives, so the result is
    bit-identical to the plain semi join. This is the manual form of
    Spark's runtime row-group/bloom filtering, usable when the key set
    is itself the output of an arbitrary subquery.
    """
    bf = bloom_build(keys, key, m_bits=m_bits, k=k)
    pred = bloom_might_contain_sql(key, m_bits, k)
    filtered = (
        big.crossJoin(F.broadcast(bf)).where(F.expr(pred)).drop(BLOOM_COL)
    )
    return filtered.join(keys.select(key).distinct(), key, "left_semi")
