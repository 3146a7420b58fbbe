"""E2E: one tabular and one image category through the REAL pipeline
and then ``dbapi_upsert`` into a REAL MySQL with the mysql dialect —
backtick quoting, ``INSERT ... ON DUPLICATE KEY UPDATE``, per-partition
connections (reference: e2e/test_ingest_e2e.py:30-160 +
database.py:337-478).

Collected only when MYSQL_HOST is reachable and a DBAPI driver exists
(see conftest.py). The connection factory is a top-level function so it
pickles to executors.
"""

from __future__ import annotations

import os

import yaml

from data_ingestors_spark.cli.frontend import run_from_yaml
from data_ingestors_spark.io.dbsink import dbapi_upsert, ensure_table

DB_NAME = os.environ.get("DB_NAME", "ingest_e2e")


def _connect_raw(database: str | None):
    host = os.environ.get("MYSQL_HOST", "127.0.0.1")
    port = int(os.environ.get("MYSQL_PORT", "3306"))
    user = os.environ.get("DB_USER", "root")
    password = os.environ.get("DB_PASSWORD", "root")
    try:
        import pymysql

        return pymysql.connect(
            host=host, port=port, user=user, password=password, database=database
        )
    except ImportError:
        pass
    try:
        import MySQLdb

        kw = {"host": host, "port": port, "user": user, "passwd": password}
        if database:
            kw["db"] = database
        return MySQLdb.connect(**kw)
    except ImportError:
        pass
    import mysql.connector

    return mysql.connector.connect(
        host=host, port=port, user=user, password=password, database=database
    )


def connect():  # top-level: pickles into the executor closure
    return _connect_raw(DB_NAME)


def _fresh_database():
    conn = _connect_raw(None)
    try:
        cur = conn.cursor()
        cur.execute(f"DROP DATABASE IF EXISTS `{DB_NAME}`")
        cur.execute(f"CREATE DATABASE `{DB_NAME}`")
        conn.commit()
    finally:
        conn.close()


def _table_rows(table: str) -> list[tuple]:
    conn = connect()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT * FROM `{table}` ORDER BY 1")
        return list(cur.fetchall())
    finally:
        conn.close()


def _run_yaml(spark, tmp_path, cfg: dict):
    cfg = {"apiVersion": "spark-ingest/v1", "kind": "IngestConfig", "intent": "train", **cfg}
    cfg.setdefault("warehouse", str(tmp_path / "warehouse"))
    p = tmp_path / "ingest.yaml"
    p.write_text(yaml.safe_dump(cfg))
    summary = run_from_yaml(spark, str(p))
    table = spark.read.parquet(str(tmp_path / "warehouse" / cfg["table"]))
    return summary, table


def test_tabular_ingest_to_mysql(spark, tmp_path):
    """CSV → validate → conform → parquet warehouse → MySQL upsert.
    Exotic ``P01033|TIMP1`` column exercises backtick quoting;
    re-upserting the same frame exercises ON DUPLICATE KEY UPDATE:
    row count stays fixed."""
    _fresh_database()
    csv = tmp_path / "data.csv"
    csv.write_text(
        "feat_a,P01033|TIMP1,target\n1.5,0.25,yes\n2.5,0.75,no\n3.5,1.25,yes\n"
    )
    summary, table = _run_yaml(
        spark,
        tmp_path,
        {
            "table": "e2e_tabular",
            "category": "tabular_classification",
            "csv": str(csv),
            "schema": {"feat_a": "DOUBLE", "P01033|TIMP1": "DOUBLE", "target": "VARCHAR(8)"},
            "label": "target",
        },
    )
    assert not summary.has_failures, summary.report()

    out = table.select("data_id", "feat_a", "`P01033|TIMP1`", "label")
    ensure_table(
        connect,
        table="e2e_tabular",
        schema={"feat_a": "DOUBLE", "P01033|TIMP1": "DOUBLE", "label": "VARCHAR(64)"},
        key="data_id",
        dialect="mysql",
    )
    res = dbapi_upsert(
        out, table="e2e_tabular", key="data_id", connection_factory=connect, dialect="mysql"
    )
    assert res["n_failed"] == 0 and res["n_upserted"] == 3
    assert len(_table_rows("e2e_tabular")) == 3

    # idempotent re-upsert: ON DUPLICATE KEY UPDATE path, no growth
    res2 = dbapi_upsert(
        out, table="e2e_tabular", key="data_id", connection_factory=connect, dialect="mysql"
    )
    assert res2["n_failed"] == 0
    assert len(_table_rows("e2e_tabular")) == 3


def test_image_category_ingest_to_mysql(spark, tmp_path):
    """Image-classification fixture tree → pipeline (resolution check,
    sidecar copy) → metadata upsert into MySQL. The reference lands
    image rows as filename + metadata records; binaries move via the
    file copier, never through the database."""
    _fresh_database()
    src = tmp_path / "src" / "images"
    src.mkdir(parents=True)
    names = []
    for lbl in ("cat", "dog"):
        for i in range(3):
            name = f"{lbl}_{i}"
            (src / f"{name}.jpg").write_bytes(b"FAKEIMG:64x64:payload")
            names.append((name, lbl))
    dest = tmp_path / "dest"
    dest.mkdir()
    csv = tmp_path / "labels.csv"
    csv.write_text("filename,label\n" + "\n".join(f"{n},{l}" for n, l in names) + "\n")

    summary, table = _run_yaml(
        spark,
        tmp_path,
        {
            "table": "e2e_images",
            "category": "image_classification",
            "csv": str(csv),
            "label": "label",
            "src": str(tmp_path / "src"),
            "dest": str(dest),
            "extension": ".jpg",
            "target_size": [64, 64],
        },
    )
    assert not summary.has_failures, summary.report()

    out = table.select("data_id", "filename", "label", "extension")
    ensure_table(
        connect,
        table="e2e_images",
        schema={
            "filename": "VARCHAR(128)",
            "label": "VARCHAR(64)",
            "extension": "VARCHAR(16)",
        },
        key="data_id",
        dialect="mysql",
    )
    res = dbapi_upsert(
        out, table="e2e_images", key="data_id", connection_factory=connect, dialect="mysql"
    )
    assert res["n_failed"] == 0 and res["n_upserted"] == 6
    assert len(_table_rows("e2e_images")) == 6
    assert all((dest / f"{n}.jpg").exists() for n, _ in names)
