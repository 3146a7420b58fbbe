"""Query registry — every operator declared in SURVEY.md §2 gets a
``queries()`` entry (Spark) and, when SQL-expressible, an
``oracle_sql()`` entry (DuckDB) with **identical output column names**
(the driver's compare sorts columns by name before hashing values).

Conventions (load-bearing):
- every aggregate / computed column is aliased identically on both sides;
- integer-valued aggregates are cast to BIGINT on both sides (DuckDB's
  sum(int) returns HUGEINT, Spark returns long);
- floating-point aggregates are rounded (2 dp for money, 4-6 dp for
  ratios) on both sides so reduction-order jitter cannot flip the hash;
- queries with LIMIT/top-k order by a unique key chain so the selected
  row *set* is deterministic;
- session timezone is pinned to UTC before any timestamp math.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestors_spark.queries import (
    relational,
    tpch,
    windows,
    text_llm,
    text_corpus,
    text_audits,
    events,
    ingestion,
    extras,
    advanced,
    sampling,
    analytics,
    analytics_stats,
    analytics_trade,
    statistics,
    graph,
    planning,
)

_MODULES = (
    relational, tpch, windows,
    text_llm, text_corpus, text_audits,
    events, ingestion, extras, advanced, sampling,
    analytics, analytics_stats, analytics_trade,
    statistics, graph, planning,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        q.update(mod.QUERIES)
    return q


def all_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    for mod in _MODULES:
        o.update(mod.ORACLES)
    return o
