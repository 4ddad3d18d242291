"""Localized (driver-side numpy) sample evaluation must agree with the
distributed Spark aggregate on the same sample."""

import time

import pytest

from scardina_spark.catalog import build_tpch_schema
from scardina_spark.estimators import SampleEstimator, prepare_tree_sample
from scardina_spark.estimators.sample import spanning_tree


@pytest.fixture(scope="module")
def both(tables):
    sg = build_tpch_schema()
    ts = prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                             "lineitem", n_min=20_000, seed=21)
    dist = SampleEstimator()
    dist.add(ts)
    loc = SampleEstimator()
    loc.add(prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                                "lineitem", n_min=20_000, seed=21).localize())
    return dist, loc


QUERIES = [
    "SELECT COUNT(*) FROM lineitem WHERE l_quantity > 30",
    "SELECT COUNT(*) FROM lineitem WHERE l_returnflag IN ('R', 'A') "
    "AND l_discount BETWEEN 0.01 AND 0.05",
    "SELECT COUNT(*) FROM orders WHERE o_orderpriority LIKE '%URGENT'",
    "SELECT COUNT(*) FROM lineitem l, orders o "
    "WHERE l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'",
    "SELECT COUNT(*) FROM customer",
    "SELECT COUNT(*) FROM orders WHERE o_orderdate >= '2023-06-01'",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_local_matches_distributed(both, sql):
    dist, loc = both
    a = dist.estimate(sql)
    b = loc.estimate(sql)
    assert a == pytest.approx(b, rel=1e-9), (sql, a, b)


def test_local_is_fast(both):
    _, loc = both
    loc.estimate(QUERIES[0])  # warm
    t0 = time.perf_counter()
    for sql in QUERIES:
        loc.estimate(sql)
    per_q = (time.perf_counter() - t0) / len(QUERIES) * 1000
    assert per_q < 50, f"{per_q:.1f} ms/query"
