"""K1 DBAPI sink: distributed upsert against a real sqlite3 database —
the in-container stand-in for the reference's MySQL upsert
(database.py:337-478). Covers insert+update accounting, per-record
fallback isolation of permanent failures, exotic-identifier quoting,
and transient-retry classification."""

from __future__ import annotations

import functools
import sqlite3

import pytest

from data_ingestors_spark.io.dbsink import (
    DIALECTS,
    TRANSIENT_ERRORS,
    _classify,
    _execute_with_retry,
    dbapi_upsert,
)


def factory(path: str):
    # top-level + partial => picklable for executors
    return functools.partial(sqlite3.connect, path, timeout=30)


def make_db(tmp_path, ddl: str):
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as c:
        c.execute(ddl)
    return db


def fetch(db, sql):
    with sqlite3.connect(db) as c:
        return sorted(c.execute(sql).fetchall())


def test_upsert_insert_then_update(spark, tmp_path):
    db = make_db(tmp_path, "CREATE TABLE t (data_id TEXT PRIMARY KEY, label TEXT, n INT)")
    df = spark.createDataFrame(
        [("a", "cat", 1), ("b", "dog", 2), ("c", "owl", 3)],
        "data_id string, label string, n int",
    ).repartition(2)
    out = dbapi_upsert(df, table="t", key="data_id", connection_factory=factory(db))
    assert out == {"n_rows": 3, "n_upserted": 3, "n_failed": 0, "failed_keys": []}

    df2 = spark.createDataFrame(
        [("b", "DOG", 20), ("d", "eel", 4)], "data_id string, label string, n int"
    )
    out2 = dbapi_upsert(df2, table="t", key="data_id", connection_factory=factory(db))
    assert out2["n_upserted"] == 2 and out2["n_failed"] == 0
    assert fetch(db, "SELECT data_id, label, n FROM t") == [
        ("a", "cat", 1), ("b", "DOG", 20), ("c", "owl", 3), ("d", "eel", 4),
    ]


def test_per_record_fallback_isolates_offender(spark, tmp_path):
    db = make_db(
        tmp_path,
        "CREATE TABLE t (data_id TEXT PRIMARY KEY, n INT NOT NULL CHECK (n >= 0))",
    )
    df = spark.createDataFrame(
        [("ok1", 1), ("bad", -5), ("ok2", 2)], "data_id string, n int"
    ).coalesce(1)
    out = dbapi_upsert(df, table="t", key="data_id", connection_factory=factory(db))
    assert out["n_rows"] == 3 and out["n_upserted"] == 2 and out["n_failed"] == 1
    assert out["failed_keys"] == ["bad"]
    assert fetch(db, "SELECT data_id FROM t") == [("ok1",), ("ok2",)]


def test_exotic_identifiers_roundtrip(spark, tmp_path):
    # the reference survives P01033|TIMP1-style protein headers
    db = make_db(
        tmp_path, 'CREATE TABLE "ex" (data_id TEXT PRIMARY KEY, "P01033|TIMP1" REAL)'
    )
    df = spark.createDataFrame([("r1", 0.5)], ["data_id", "P01033|TIMP1"])
    out = dbapi_upsert(df, table="ex", key="data_id", connection_factory=factory(db))
    assert out["n_upserted"] == 1
    assert fetch(db, 'SELECT "P01033|TIMP1" FROM ex') == [(0.5,)]


def test_null_handling(spark, tmp_path):
    db = make_db(tmp_path, "CREATE TABLE t (data_id TEXT PRIMARY KEY, v REAL)")
    df = spark.createDataFrame([("a", None), ("b", 1.5)], "data_id string, v double")
    out = dbapi_upsert(df, table="t", key="data_id", connection_factory=factory(db))
    assert out["n_upserted"] == 2
    assert fetch(db, "SELECT data_id, v FROM t") == [("a", None), ("b", 1.5)]


def test_mysql_dialect_sql_shape():
    sql = DIALECTS["mysql"].upsert_sql("t", ["data_id", "a`b"], "data_id")
    assert "INSERT INTO `t` (`data_id`, `a``b`) VALUES (%s, %s)" in sql
    assert "ON DUPLICATE KEY UPDATE `a``b`=VALUES(`a``b`)" in sql
    assert "`data_id`=VALUES" not in sql  # key never self-updates


def test_sqlite_dialect_sql_shape():
    sql = DIALECTS["sqlite"].upsert_sql("t", ["data_id", "x"], "data_id")
    assert 'ON CONFLICT("data_id") DO UPDATE SET "x"=excluded."x"' in sql


class _FlakyCursor:
    def __init__(self, failures: int, exc_cls):
        self.failures, self.exc_cls, self.calls = failures, exc_cls, 0

    def executemany(self, sql, rows):
        self.calls += 1
        if self.calls <= self.failures:
            raise self.exc_cls("boom")


class _NoopConn:
    def rollback(self):
        pass


def test_transient_retry_then_success():
    cur = _FlakyCursor(2, sqlite3.OperationalError)
    _execute_with_retry(cur, _NoopConn(), "sql", [()], max_retries=3, backoff_s=0)
    assert cur.calls == 3


def test_permanent_error_no_retry():
    cur = _FlakyCursor(99, sqlite3.IntegrityError)
    with pytest.raises(sqlite3.IntegrityError):
        _execute_with_retry(cur, _NoopConn(), "sql", [()], max_retries=3, backoff_s=0)
    assert cur.calls == 1  # permanent: exactly one attempt


def test_classification_table():
    assert _classify(sqlite3.OperationalError()) == "transient"
    assert _classify(sqlite3.IntegrityError()) == "permanent"
    assert "InterfaceError" in TRANSIENT_ERRORS


def test_ensure_table_creates_and_upserts(spark, tmp_path):
    db = str(tmp_path / "new.db")
    from data_ingestors_spark.io.dbsink import ensure_table

    created = ensure_table(
        factory(db), table="t", key="data_id",
        schema={"n": "INT", "v": "VARCHAR(16)"},
    )
    assert created is True
    df = spark.createDataFrame([("a", 1, "x")], "data_id string, n int, v string")
    out = dbapi_upsert(df, table="t", key="data_id", connection_factory=factory(db))
    assert out["n_upserted"] == 1
    # second call: table exists with matching schema -> no-op
    assert ensure_table(
        factory(db), table="t", key="data_id",
        schema={"n": "INT", "v": "VARCHAR(16)"},
    ) is False


def test_ensure_table_drift_is_actionable(tmp_path):
    from data_ingestors_spark.io.dbsink import ensure_table

    db = make_db(tmp_path, "CREATE TABLE t (data_id TEXT PRIMARY KEY, old_col INT)")
    with pytest.raises(ValueError, match=r"missing columns \['n'\].*unexpected columns \['old_col'\]"):
        ensure_table(factory(db), table="t", key="data_id", schema={"n": "INT"})
