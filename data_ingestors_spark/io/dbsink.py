"""K1 database sink: distributed DBAPI upsert with the reference's
failure semantics, Spark-first.

The reference upserts each batch into MySQL with
``INSERT ... ON DUPLICATE KEY UPDATE`` keyed on ``data_id``
(database.py:337-478), retrying transient errors with exponential
backoff (database.py:44-98) and, when a whole batch fails permanently,
falling back to per-record execution so one bad row cannot sink its
999 neighbours.

Spark-first shape:

- the writer runs as ``mapInPandas`` — Arrow-batched, one DBAPI
  connection per *partition* (not per row, not per batch), rows
  streamed through ``executemany`` in ``batch_size`` slices. On a
  1000-executor cluster each partition holds its own connection and
  the driver never sees a row;
- the per-partition outcome (upserted / failed counts + sample
  offending keys) is returned as a tiny counts DataFrame and reduced
  with ONE aggregation — accounting without accumulators or collects;
- error classification is by DBAPI exception *class name*
  (``OperationalError`` / ``InterfaceError`` → transient, retried;
  ``IntegrityError`` / ``ProgrammingError`` / ``DataError`` →
  permanent, no retry) so any driver module (sqlite3, MySQLdb,
  psycopg2) classifies identically without importing it;
- backoff is deterministic (``base * 2**attempt``) — no randomness,
  reproducible runs;
- identifier quoting doubles the quote char inside names, so exotic
  headers like ``P01033|TIMP1`` round-trip (csv_ingestor's backtick
  escape, database.py:360-368).

The connection factory must be a picklable zero-arg callable (a
top-level function or ``functools.partial``) — it is shipped to
executors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSIENT_ERRORS = frozenset({"OperationalError", "InterfaceError", "InternalError"})

_COUNTS_SCHEMA = (
    "n_rows long, n_upserted long, n_failed long, failed_keys array<string>"
)


@dataclass(frozen=True)
class Dialect:
    """Upsert SQL + identifier quoting for one DBAPI dialect."""

    name: str
    quote_char: str
    paramstyle: str  # "qmark" -> ?, "format" -> %s

    def quote(self, ident: str) -> str:
        q = self.quote_char
        return f"{q}{ident.replace(q, q * 2)}{q}"

    def placeholder(self) -> str:
        return "?" if self.paramstyle == "qmark" else "%s"

    def upsert_sql(self, table: str, cols: list[str], key: str) -> str:
        qcols = ", ".join(self.quote(c) for c in cols)
        ph = ", ".join([self.placeholder()] * len(cols))
        updates = [c for c in cols if c != key]
        if self.name == "mysql":
            # INSERT ... ON DUPLICATE KEY UPDATE `c`=VALUES(`c`)
            setc = ", ".join(f"{self.quote(c)}=VALUES({self.quote(c)})" for c in updates)
            return (
                f"INSERT INTO {self.quote(table)} ({qcols}) VALUES ({ph}) "
                f"ON DUPLICATE KEY UPDATE {setc}"
            )
        # sqlite / postgres: INSERT ... ON CONFLICT(key) DO UPDATE
        setc = ", ".join(f"{self.quote(c)}=excluded.{self.quote(c)}" for c in updates)
        return (
            f"INSERT INTO {self.quote(table)} ({qcols}) VALUES ({ph}) "
            f"ON CONFLICT({self.quote(key)}) DO UPDATE SET {setc}"
        )


DIALECTS = {
    "sqlite": Dialect("sqlite", '"', "qmark"),
    "postgres": Dialect("postgres", '"', "format"),
    "mysql": Dialect("mysql", "`", "format"),
}


def _classify(exc: BaseException) -> str:
    return "transient" if type(exc).__name__ in TRANSIENT_ERRORS else "permanent"


def _execute_with_retry(
    cur,
    conn,
    sql: str,
    rows: list[tuple],
    *,
    max_retries: int,
    backoff_s: float,
) -> None:
    """executemany with transient retry (database.py:44-98 semantics):
    rollback between attempts, deterministic exponential backoff,
    permanent errors re-raised immediately."""
    for attempt in range(max_retries):
        try:
            cur.executemany(sql, rows)
            return
        except Exception as exc:  # noqa: BLE001 — classified below
            try:
                conn.rollback()
            except Exception:  # noqa: BLE001 — rollback is best-effort
                pass
            if _classify(exc) == "permanent" or attempt == max_retries - 1:
                raise
            time.sleep(backoff_s * (2**attempt))


def dbapi_upsert(
    df: DataFrame,
    *,
    table: str,
    key: str,
    connection_factory: Callable[[], object],
    dialect: str = "sqlite",
    batch_size: int = 1000,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    max_failed_samples: int = 20,
) -> dict:
    """Distributed upsert of ``df`` into a DBAPI table keyed on ``key``.

    Returns ``{"n_rows", "n_upserted", "n_failed", "failed_keys"}``
    (failed_keys capped at ``max_failed_samples``). A batch that fails
    permanently falls back to per-record execution so only the
    offending rows are counted failed (database.py:440-478).
    """
    d = DIALECTS[dialect]
    cols = df.columns
    if key not in cols:
        raise ValueError(f"upsert key {key!r} not in DataFrame columns {cols}")
    sql = d.upsert_sql(table, cols, key)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conn = connection_factory()
        n_rows = n_ok = n_failed = 0
        failed: list[str] = []
        try:
            cur = conn.cursor()
            for pdf in batches:
                # Arrow → python scalars; NaN/NaT → None for the driver
                records = [
                    tuple(None if pd.isna(v) else v for v in row)
                    for row in pdf.itertuples(index=False, name=None)
                ]
                n_rows += len(records)
                for i in range(0, len(records), batch_size):
                    chunk = records[i : i + batch_size]
                    try:
                        _execute_with_retry(
                            cur, conn, sql, chunk,
                            max_retries=max_retries, backoff_s=backoff_s,
                        )
                        conn.commit()  # commit per chunk: a later failed
                        # chunk's rollback must not undo this one
                        n_ok += len(chunk)
                    except Exception:  # noqa: BLE001 — isolate per record
                        # per-record fallback commits each success
                        # individually (database.py:440-478) — the
                        # offender's rollback must not take its
                        # neighbours with it
                        for rec, k in zip(
                            chunk, pdf[key].iloc[i : i + batch_size].tolist()
                        ):
                            try:
                                _execute_with_retry(
                                    cur, conn, sql, [rec],
                                    max_retries=max_retries, backoff_s=backoff_s,
                                )
                                conn.commit()
                                n_ok += 1
                            except Exception:  # noqa: BLE001 — counted
                                n_failed += 1
                                if len(failed) < max_failed_samples:
                                    failed.append(str(k))
        finally:
            conn.close()
        yield pd.DataFrame(
            {
                "n_rows": [n_rows],
                "n_upserted": [n_ok],
                "n_failed": [n_failed],
                "failed_keys": [failed],
            }
        )

    counts = df.mapInPandas(write_partition, schema=_COUNTS_SCHEMA)
    row = counts.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_upserted").alias("n_upserted"),
        F.sum("n_failed").alias("n_failed"),
        F.slice(F.flatten(F.collect_list("failed_keys")), 1, max_failed_samples).alias(
            "failed_keys"
        ),
    ).collect()[0]
    return {
        "n_rows": int(row.n_rows or 0),
        "n_upserted": int(row.n_upserted or 0),
        "n_failed": int(row.n_failed or 0),
        "failed_keys": list(row.failed_keys or []),
    }


# --- K2: DDL with guards (database.py:184-335) ---------------------------

# declared-type → sqlite storage affinity; other dialects take the
# declared type verbatim (MySQL/Postgres understand the MySQL-ish
# vocabulary the schema uses)
_SQLITE_AFFINITY = {
    "INT": "INTEGER", "INTEGER": "INTEGER", "TINYINT": "INTEGER",
    "SMALLINT": "INTEGER", "MEDIUMINT": "INTEGER", "BIGINT": "INTEGER",
    "FLOAT": "REAL", "DOUBLE": "REAL", "DECIMAL": "REAL", "NUMERIC": "REAL",
    "BOOL": "INTEGER", "BOOLEAN": "INTEGER",
    "VARCHAR": "TEXT", "CHAR": "TEXT", "TEXT": "TEXT",
    "DATE": "TEXT", "DATETIME": "TEXT", "TIMESTAMP": "TEXT", "TIME": "TEXT",
    "BLOB": "BLOB", "LONGBLOB": "BLOB",
}


def _ddl_type(decl: str, dialect: str) -> str:
    if dialect != "sqlite":
        return decl
    from data_ingestors_spark.functions.casts import parse_decl

    base, _ = parse_decl(decl)
    return _SQLITE_AFFINITY.get(base, "TEXT")


def existing_columns(conn, table: str, d: Dialect) -> "list[str] | None":
    """Column names of an existing table via a zero-row probe
    (DBAPI-standard cursor.description) — None if the table is absent."""
    cur = conn.cursor()
    try:
        cur.execute(f"SELECT * FROM {d.quote(table)} WHERE 1=0")
    except Exception:  # noqa: BLE001 — absent table: driver-specific class
        try:
            conn.rollback()
        except Exception:  # noqa: BLE001
            pass
        return None
    return [c[0] for c in cur.description]


def ensure_table(
    connection_factory: Callable[[], object],
    *,
    table: str,
    schema: dict[str, str],
    key: str,
    dialect: str = "sqlite",
) -> bool:
    """Create the target table if absent; if present, verify its
    feature columns match the declared schema and fail with an
    actionable drift error otherwise (reference reflect-existing +
    drift detection, database.py:272-297). Returns True if created.

    Driver-side, one connection — DDL is a control-plane operation.
    """
    d = DIALECTS[dialect]
    cols = dict(schema)
    if key not in cols:
        cols = {key: "VARCHAR(64)", **cols}
    conn = connection_factory()
    try:
        actual = existing_columns(conn, table, d)
        if actual is not None:
            declared, got = set(cols), set(actual)
            missing, extra = sorted(declared - got), sorted(got - declared)
            if missing or extra:
                raise ValueError(
                    f"table {table!r} exists with a different schema: "
                    f"missing columns {missing}, unexpected columns {extra}. "
                    "Drop the table or align the declared schema before "
                    "ingesting."
                )
            return False
        defs = ", ".join(
            f"{d.quote(c)} {_ddl_type(t, dialect)}"
            + (" PRIMARY KEY" if c == key else "")
            for c, t in cols.items()
        )
        cur = conn.cursor()
        cur.execute(f"CREATE TABLE {d.quote(table)} ({defs})")
        conn.commit()
        return True
    finally:
        conn.close()
