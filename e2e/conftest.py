"""Optional end-to-end suite against a REAL MySQL/MariaDB.

Mirrors the reference's collect-skip harness
(/root/reference/e2e/conftest.py:36-38): the tests are not even
COLLECTED unless a MySQL is reachable (``MYSQL_HOST``/``MYSQL_PORT``)
and a DBAPI driver for it is importable — so the default unit
``pytest tests/`` run, and a bare ``pytest`` without a database, stay
green and silent.

Local run::

    docker run -d -p 3306:3306 -e MYSQL_ROOT_PASSWORD=root mysql:8
    pip install pymysql
    MYSQL_HOST=127.0.0.1 DB_USER=root DB_PASSWORD=root python -m pytest e2e/ -v
"""

from __future__ import annotations

import os
import socket
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mysql_driver() -> str | None:
    for mod in ("pymysql", "MySQLdb", "mysql.connector"):
        try:
            __import__(mod)
            return mod
        except ImportError:
            continue
    return None


def _mysql_reachable() -> bool:
    host = os.environ.get("MYSQL_HOST", "127.0.0.1")
    port = int(os.environ.get("MYSQL_PORT", "3306"))
    try:
        with socket.create_connection((host, port), timeout=2):
            return True
    except OSError:
        return False


# Don't even collect unless the database AND a driver are present.
collect_ignore_glob = (
    [] if (_mysql_driver() and _mysql_reachable()) else ["test_*.py"]
)


@pytest.fixture(scope="session")
def spark():
    from data_ingestors_spark.session import get_spark

    yield get_spark("e2e-mysql", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
