"""Mimics the driver's correctness gate: every queries() entry runs at the
test scale factor and matches its oracle_sql() on row count, column names,
and values (order-insensitive, rounded floats)."""

import math
import os

import duckdb
import pytest

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    df = q(spark, SF_DIR)
    cols = df.columns
    got = _canon([r.asDict() for r in df.collect()], cols)

    res = duck.sql(ORACLES[name])
    oc = [d[0] for d in res.description]
    assert sorted(oc) == sorted(cols), (name, oc, cols)
    want_rows = [dict(zip(oc, r)) for r in res.fetchall()]
    want = _canon(want_rows, cols)

    assert len(got) == len(want), (name, len(got), len(want))
    mismatches = [
        (g, w) for g, w in zip(got, want)
        if not _rows_close(g, w)
    ]
    assert not mismatches, (name, mismatches[:5])


def _rows_close(g, w):
    for a, b in zip(g, w):
        if isinstance(a, float) and isinstance(b, float):
            if not math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6):
                return False
        elif a != b:
            return False
    return True


def test_rows_only_queries_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == len(entry_mod.Q.BENCH_QUERIES)
    assert all(r["ok"] for r in rows)
    assert all(r["truth"] >= 0 for r in rows)
