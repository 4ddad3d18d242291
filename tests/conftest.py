"""Shared fixtures: one SparkSession per test run, sf0.001 tables, DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pytest

from scardina_spark.catalog import load_table
from scardina_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    """Mark the node ids listed in tests/slow_tests.txt as `slow`.

    pytest.ini defaults to `-m "not slow"` so the driver's budgeted run
    (`python -m pytest tests/ -x -q`) finishes quickly; the full suite
    still runs with `-m "slow or not slow"`.  The list is generated from
    a measured `--durations=0` run (call time >= ~5 s); a stale entry
    that no longer matches any test is harmless.
    """
    try:
        with open(_SLOW_LIST) as f:
            slow = {ln.strip() for ln in f if ln.strip() and not ln.startswith("#")}
    except OSError:
        return
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if nodeid in slow or f"tests/{nodeid}" in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("scardina-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    out = {}
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            out[t] = load_table(spark, sf_dir, t)
    return out


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")
    yield con
    con.close()
