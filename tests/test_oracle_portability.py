"""Cross-box portability guards for the oracle registry.

Two failure classes the r11 driver rotation surfaced (the
``survival_km`` hash-red row — rows/schema matched, values diverged
on the driver box only):

1. **Exotic oracle output types.** A bare DuckDB window ``sum(BIGINT)``
   is HUGEINT (int128); ``fetchall()`` converts it to a lossless
   Python int, but pandas/arrow conversion paths turn it into
   float64 / object — so the SAME result hashes differently depending
   on which client path the comparing harness uses. The guard here
   DESCRIBEs every registered oracle and rejects any output column
   whose type is not in the portable set (the fix is a ``CAST`` in
   the oracle, which is semantically free).

2. **Transcendental → DECIMAL knife edges.** ``ln``/``exp``/``log2``
   are not correctly-rounded, so their outputs can differ by ±1 ulp
   across libm/JVM-intrinsic implementations (i.e. across boxes), and
   a raw ``CAST(double AS DECIMAL)`` can quantize the two results
   differently. Every such fold now goes through the engine-portable
   ``fround(term, 8)`` BEFORE the decimal cast
   (``functions/rounding.py``); the perturbation tests here assert
   that on the real sf0.01 data, a ±1-ulp shift of every
   transcendental input leaves the rounded outputs bit-identical —
   i.e. no term sits on a quantization boundary.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE

# DuckDB logical types whose Python/pandas/arrow conversions all agree
# with the Spark-side value (no int128, no fixed-point decimal, no
# interval/enum surprises in a value-hash).
_PORTABLE_TYPES = (
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "UBIGINT",
    "UINTEGER",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "BOOLEAN",
    "TIMESTAMP",
)


def _is_portable(duck_type: str) -> bool:
    t = duck_type.strip()
    while t.endswith("[]"):  # list element types must be portable too
        t = t[:-2].strip()
    return t.startswith(_PORTABLE_TYPES)


def test_no_exotic_types_in_any_oracle_output():
    """DESCRIBE all registered oracles; reject HUGEINT/DECIMAL/etc.

    This is the structural guard for the r11 `survival_km` failure:
    its `n_risk` column was the single HUGEINT output in the whole
    316-query registry, and the single driver-hash-red row.
    """
    import __spark_entry__ as entry
    from data_ingestors_spark.io.readers import TABLES

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
            )
        offenders: dict[str, list[tuple[str, str]]] = {}
        for name, sql in oracles.items():
            cols = con.execute(f"DESCRIBE ({sql})").fetchall()
            bad = [(c[0], c[1]) for c in cols if not _is_portable(c[1])]
            if bad:
                offenders[name] = bad
    finally:
        con.close()
    assert not offenders, f"non-portable oracle output types: {offenders}"


def _ulp_neighbors(x: float) -> tuple[float, float]:
    return math.nextafter(x, -math.inf), math.nextafter(x, math.inf)


def _fround(x: float, nd: int) -> float:
    p = float(10**nd)
    return math.floor(x * p + 0.5) / p


@pytest.fixture(scope="module")
def km_table():
    """The survival_km by-duration table (d, n_risk) from real sf0.01
    orders, computed by DuckDB exactly as the oracle CTEs do."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"'{SF_ORACLE}/orders.parquet'"
        )
        rows = con.execute(
            """
WITH horizon AS (
  SELECT max(CAST(o_orderdate AS DATE)) - 90 AS cutoff FROM orders
), per_cust AS (
  SELECT date_diff('day', min(CAST(o_orderdate AS DATE)),
                   max(CAST(o_orderdate AS DATE))) AS dur,
         CASE WHEN max(CAST(o_orderdate AS DATE)) < (SELECT cutoff FROM horizon)
              THEN 1 ELSE 0 END AS event
  FROM orders GROUP BY o_custkey
), by_dur AS (
  SELECT dur, CAST(sum(event) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS m
  FROM per_cust GROUP BY dur
), total AS (SELECT CAST(sum(m) AS BIGINT) AS tot FROM by_dur)
SELECT dur, d,
  CAST(tot - coalesce(sum(m) OVER (ORDER BY dur
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
FROM by_dur CROSS JOIN total ORDER BY dur
"""
        ).fetchall()
    finally:
        con.close()
    return rows


def test_survival_km_term_rounding_is_ulp_invariant(km_table):
    """±1-ulp perturbation of every ln term leaves fround(term, 8)
    bit-identical — i.e. cross-box libm jitter cannot change the
    quantized decimal fold on the real data."""
    from decimal import ROUND_HALF_UP, Decimal

    assert len(km_table) > 100
    cum = Decimal(0)
    survivals: list[float] = []
    for _dur, d, n in km_table:
        assert 0 <= d < n, "d == n_risk would be ln(0): new data edge"
        t = math.log(1.0 - d / float(n))
        q = _fround(t, 8)
        for tp in _ulp_neighbors(t):
            assert _fround(tp, 8) == q, (
                f"ln term {t!r} sits on a fround(8) boundary"
            )
        # the decimal cast of the fround(8) double is exact on both
        # engines: the double is within ~1e-15 of k/1e8, far inside
        # the DECIMAL(30,10) half-quantum (5e-11)
        dec = Decimal(repr(q)).quantize(
            Decimal("1e-10"), rounding=ROUND_HALF_UP
        )
        assert float(dec) == q or abs(float(dec) - q) < 1e-12
        cum += dec
        if d > 0:
            survivals.append(math.exp(float(cum)))

    # final fround(6) of exp(log_s): ±1 ulp of exp never flips it
    for s in survivals:
        r = _fround(s, 6)
        for sp in _ulp_neighbors(s):
            assert _fround(sp, 6) == r, (
                f"survival {s!r} sits on a fround(6) boundary"
            )


def test_sibling_transcendental_folds_are_ulp_invariant():
    """The other fround(8)-hardened transcendental terms: Adamic-Adar
    1/log2(deg) (deg in the AA band), nDCG 1/log2(rnk+1) (rnk 1..10)
    — closed input families, checked exhaustively."""
    for deg in range(2, 513):
        t = 1.0 / math.log2(deg)
        q = _fround(t, 8)
        for tp in _ulp_neighbors(t):
            assert _fround(tp, 8) == q, f"AA term deg={deg} on boundary"
    for rnk in range(1, 11):
        t = 1.0 / math.log2(rnk + 1)
        q = _fround(t, 8)
        for tp in _ulp_neighbors(t):
            assert _fround(tp, 8) == q, f"DCG term rnk={rnk} on boundary"
