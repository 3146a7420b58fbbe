"""Engine-portable rounding for computed doubles.

Spark's ``round(double, n)`` rounds the value's shortest *decimal
repr* (HALF_UP on ``BigDecimal.valueOf``), DuckDB rounds the *binary*
value — they disagree whenever the repr sits exactly on a half
boundary (systematic for averages over power-of-two-sized groups).
``floor(x*10^n + 0.5)/10^n`` performs identical IEEE operations on
identical doubles in both engines, so every rounded computed double in
the query surface goes through ``fround`` (Spark side) and
``o_fround`` (oracle SQL side). Raw stored values that already carry
the target precision (e.g. 2-dp money columns rounded to 2 dp) may
keep the native round — it is the identity there.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def fround(c: "F.Column", nd: int) -> "F.Column":
    """Engine-portable rounding: floor(x*10^nd + 0.5) / 10^nd."""
    p = float(10**nd)
    return F.floor(c.cast("double") * F.lit(p) + F.lit(0.5)).cast("double") / F.lit(p)


def o_fround(sql_expr: str, nd: int) -> str:
    """The same rounding as ANSI SQL text for the DuckDB oracle."""
    p = float(10**nd)
    return f"floor(({sql_expr}) * {p} + 0.5) / {p}"
