"""OR-disjunction support (beyond the reference's AND-only language):
parser, exact executor, HT sample estimator, learned estimators."""

from __future__ import annotations

import numpy as np
import pytest

from scardina_spark.catalog import build_tpch_schema
from scardina_spark.estimators import (
    ExactEstimator, SampleEstimator, prepare_tree_sample)
from scardina_spark.estimators.sample import (
    UnsupportedQueryError, spanning_tree)
from scardina_spark.plans.parse import parse_query


def qerr(e, t):
    return max(e / t, t / e) if e > 0 and t > 0 else float("inf")


# -- parser ----------------------------------------------------------------

def test_parse_or_group():
    pq = parse_query("SELECT COUNT(*) FROM lineitem WHERE "
                     "(l_quantity < 5 OR l_quantity > 45) AND l_discount = 0")
    assert len(pq.filters) == 2
    g = pq.filters[0]
    assert g.o == "OR" and len(g.branches) == 2
    assert g.branches[0].o == "<" and g.branches[1].o == ">"
    assert pq.filters[1].o == "="


def test_parse_or_three_branches_mixed_ops():
    pq = parse_query(
        "SELECT COUNT(*) FROM orders o WHERE "
        "(o.o_orderpriority = '1-URGENT' OR o.o_totalprice > 100000 "
        "OR o.o_orderdate IS NULL)")
    (g,) = pq.filters
    assert [b.o for b in g.branches] == ["=", ">", "IS"]


def test_parse_top_level_or_rejected():
    with pytest.raises(ValueError, match="parenthesize"):
        parse_query("SELECT COUNT(*) FROM lineitem "
                    "WHERE l_quantity < 5 OR l_quantity > 45")


def test_parse_join_inside_or_rejected():
    with pytest.raises(ValueError, match="join conditions"):
        parse_query("SELECT COUNT(*) FROM lineitem l, orders o WHERE "
                    "(l.l_orderkey = o.o_orderkey OR l.l_quantity = 1)")


def test_parse_and_inside_group_rejected():
    with pytest.raises(ValueError, match="OR only"):
        parse_query("SELECT COUNT(*) FROM lineitem WHERE "
                    "(l_quantity < 5 AND l_discount = 0)")


# -- exact executor vs DuckDB ---------------------------------------------

OR_QUERIES = {
    "same_col": ("SELECT COUNT(*) FROM lineitem WHERE "
                 "(l_quantity < 5 OR l_quantity > 45)"),
    "with_between": ("SELECT COUNT(*) FROM orders WHERE "
                     "(o_totalprice BETWEEN 1000 AND 50000 "
                     "OR o_orderpriority = '1-URGENT')"),
    "cross_table": ("SELECT COUNT(*) FROM lineitem l, orders o, customer c "
                    "WHERE l.l_orderkey = o.o_orderkey "
                    "AND o.o_custkey = c.c_custkey AND "
                    "(c.c_mktsegment = 'BUILDING' OR l.l_quantity > 40)"),
    "or_like_in": ("SELECT COUNT(*) FROM orders WHERE "
                   "(o_orderpriority LIKE '%URGENT' "
                   "OR o_orderpriority IN ('5-LOW'))"),
}


@pytest.mark.parametrize("name", sorted(OR_QUERIES))
def test_exact_or_matches_duckdb(tables, duck, name):
    exact = ExactEstimator(build_tpch_schema(), tables)
    got = exact.estimate(OR_QUERIES[name])
    want = duck.sql(OR_QUERIES[name]).fetchone()[0]
    assert got == want


# -- HT sample estimator ---------------------------------------------------

@pytest.fixture(scope="module")
def ur_sample(tables):
    sg = build_tpch_schema()
    return prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                               "lineitem", seed=3)


@pytest.mark.parametrize("localized", [False, True])
def test_sample_estimator_or(tables, duck, ur_sample, localized):
    est = SampleEstimator()
    est.add(ur_sample.localize() if localized else ur_sample)
    for name, sql in OR_QUERIES.items():
        want = duck.sql(sql).fetchone()[0]
        got = est.estimate(sql)
        assert qerr(got, want) < 1.5, (name, got, want)


def test_sample_estimator_or_batch(duck, ur_sample):
    est = SampleEstimator()
    est.add(ur_sample)
    got = est.estimate_many(OR_QUERIES)
    for name, sql in OR_QUERIES.items():
        want = duck.sql(sql).fetchone()[0]
        assert qerr(got[name], want) < 1.5, name


# -- learned estimators -----------------------------------------------------

def test_nar_single_table_same_column_or(tables):
    from scardina_spark.model import TrainConfig
    from scardina_spark.model.bridge import train_single_table

    li = tables["lineitem"]
    nar = train_single_table(
        li, ["l_returnflag", "l_quantity"],
        TrainConfig(epochs=12, d_word=12, d_ff=48, seed=5),
        sample_size=1500)
    sql = ("SELECT COUNT(*) FROM lineitem WHERE "
           "(l_quantity < 5 OR l_quantity > 45) AND l_returnflag = 'R'")
    truth = li.where("(l_quantity < 5 OR l_quantity > 45) "
                     "AND l_returnflag = 'R'").count()
    assert qerr(nar.estimate(sql), truth) < 2.5

    with pytest.raises(ValueError, match="OR across different columns"):
        nar.estimate("SELECT COUNT(*) FROM lineitem WHERE "
                     "(l_quantity < 5 OR l_returnflag = 'R')")


def test_valid_mask_or_with_null():
    from scardina_spark.model.progressive import (
        ColumnDomain, valid_mask)
    from scardina_spark.plans.predicates import Predicate

    dom = ColumnDomain("x", np.array([10, 20, 30, 40]))
    g = Predicate("x", "OR", (Predicate("x", ">", 25),
                              Predicate("x", "IS", None)))
    m = valid_mask(dom, [g])
    # MASK=0, NULL allowed, values {30, 40}
    assert m.tolist() == [0.0, 1.0, 0.0, 0.0, 1.0, 1.0]


def test_nar_join_cross_column_or_unsupported(tables):
    from scardina_spark.model import TrainConfig
    from scardina_spark.model.join_bridge import train_join_estimator

    sg = build_tpch_schema()
    ts = prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                             "lineitem", n_min=20_000, seed=5)
    est = train_join_estimator(
        ts, ["lineitem.l_quantity", "orders.o_orderpriority"],
        TrainConfig(epochs=2, d_word=8, d_ff=24, seed=5), sample_size=200)
    with pytest.raises(UnsupportedQueryError, match="OR across"):
        est.estimate(
            "SELECT COUNT(*) FROM lineitem l, orders o WHERE "
            "l.l_orderkey = o.o_orderkey AND "
            "(l.l_quantity > 40 OR o.o_orderpriority = '1-URGENT')")
    # same-column OR works through valid masks
    sql = ("SELECT COUNT(*) FROM lineitem l, orders o WHERE "
           "l.l_orderkey = o.o_orderkey AND "
           "(l.l_quantity < 5 OR l.l_quantity > 45)")
    assert est.estimate(sql) > 0
