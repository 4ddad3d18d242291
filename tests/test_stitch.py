"""Cross-subschema stitched estimation vs exact truth."""

import pytest

from scardina_spark.catalog import build_tpch_schema
from scardina_spark.estimators import (
    ExactEstimator, StitchedEstimator, prepare_tree_sample)
from scardina_spark.estimators.sample import (
    UnsupportedQueryError, cin_tree)


def qerr(est, true):
    if true == 0 and est == 0:
        return 1.0
    if true == 0 or est == 0:
        return float("inf")
    return max(est / true, true / est)


@pytest.fixture(scope="module")
def stitched(tables):
    sg = build_tpch_schema()
    est = StitchedEstimator()
    for center, root in [("customer", "customer"), ("nation", "nation"),
                         ("supplier", "supplier")]:
        est.add(prepare_tree_sample(cin_tree(sg, center), tables, root,
                                    n_min=30_000, seed=13))
    return est


@pytest.fixture(scope="module")
def exact(tables):
    return ExactEstimator(build_tpch_schema(), tables)


SINGLE = (
    "SELECT COUNT(*) FROM customer c, nation n "
    "WHERE c.c_nationkey = n.n_nationkey AND n.n_name LIKE 'NATION_1%'")

STITCHED_2 = (
    "SELECT COUNT(*) FROM customer c, nation n, region r "
    "WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey "
    "AND r.r_name = 'ASIA'")

STITCHED_SUPPLIER = (
    "SELECT COUNT(*) FROM supplier s, nation n, region r "
    "WHERE s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey "
    "AND r.r_name IN ('ASIA', 'EUROPE') AND s.s_acctbal > 0")


def test_single_sample_path_still_works(stitched, exact):
    assert qerr(stitched.estimate(SINGLE), exact.estimate(SINGLE)) < 1.3


@pytest.mark.parametrize("sql", [STITCHED_2, STITCHED_SUPPLIER])
def test_stitched_chain(stitched, exact, sql):
    got = stitched.estimate(sql)
    want = exact.estimate(sql)
    assert qerr(got, want) < 1.5, (got, want)


def test_uncoverable_raises(stitched):
    with pytest.raises(UnsupportedQueryError):
        stitched.estimate(
            "SELECT COUNT(*) FROM lineitem l, part p "
            "WHERE l.l_partkey = p.p_partkey")
