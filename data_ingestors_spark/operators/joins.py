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
