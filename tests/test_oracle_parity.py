"""Every oracle-declared query must hash-match DuckDB at smoke scale.

This is a local replica of the driver's CORRECTNESS gate (sf0.01);
running at sf0.001 keeps the suite fast. Set SPARK_GRAFT_PARITY_SF
to point at a bigger scale for a full pre-flight.
"""

from __future__ import annotations

import os

import pytest

from data_ingestors_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, name):
    problems = compare(spark, SF, name, _QUERIES[name], _ORACLES[name])
    assert not problems, "\n".join(problems)


def test_every_query_runs(spark):
    """Queries without oracles (hash-seeded ops) must still execute
    and return a stable schema."""
    for name, fn in _QUERIES.items():
        if name in _ORACLES:
            continue
        df = fn(spark, SF)
        assert df.columns, name
        df.limit(5).collect()
