"""Plan-quality (p-error) evaluation: cost model, plan space, end-to-end."""

import pytest

from scardina_spark.benchmarks import duckdb_connection
from scardina_spark.estimators.perror import (
    connected_subsets, fragment, left_deep_plans, p_error, plan_cost, to_sql)
from scardina_spark.plans.parse import parse_query

SQL3 = ("SELECT COUNT(*) FROM lineitem l, orders o, customer c "
        "WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey "
        "AND c.c_mktsegment = 'BUILDING'")


def test_connected_subsets_and_plans():
    pq = parse_query(SQL3)
    subs = {tuple(sorted(s)) for s in connected_subsets(pq)}
    assert subs == {("c",), ("l",), ("o",), ("l", "o"), ("c", "o"),
                    ("c", "l", "o")}  # l-c is NOT an edge
    plans = left_deep_plans(pq)
    assert ("l", "o", "c") in plans and ("c", "o", "l") in plans
    assert all(len(p) == 3 for p in plans)


def test_perfect_estimates_give_perror_one():
    pq = parse_query(SQL3)
    cards = {frozenset(s): c for s, c in [
        (("l",), 6000), (("o",), 1500), (("c",), 30),
        (("l", "o"), 6000), (("c", "o"), 300), (("c", "l", "o"), 1200)]}
    fn = lambda frag: cards[frozenset(frag.tables)]  # noqa: E731
    assert p_error(pq, fn, fn) == 1.0


def test_misleading_estimates_raise_perror():
    pq = parse_query(SQL3)
    cards = {frozenset(s): c for s, c in [
        (("l",), 6000), (("o",), 1500), (("c",), 30),
        (("l", "o"), 6000), (("c", "o"), 300), (("c", "l", "o"), 1200)]}
    bad = dict(cards)
    bad[frozenset(("l", "o"))] = 1.0  # lures the planner through l JOIN o
    tfn = lambda frag: cards[frozenset(frag.tables)]  # noqa: E731
    bfn = lambda frag: bad[frozenset(frag.tables)]    # noqa: E731
    pe = p_error(pq, bfn, tfn)
    assert pe == plan_cost(("l", "o", "c"), cards) / \
        plan_cost(("c", "o", "l"), cards)
    assert pe > 1.0


def test_two_table_queries_are_trivially_optimal():
    assert p_error("SELECT COUNT(*) FROM lineitem l, orders o "
                   "WHERE l.l_orderkey = o.o_orderkey",
                   lambda f: 1.0, lambda f: 99.0) == 1.0


def test_fragment_sql_matches_duckdb(sf_dir, duck):
    """to_sql renders fragments DuckDB can run; filters stay attached to
    their fragment."""
    pq = parse_query(SQL3)
    frag = fragment(pq, frozenset(["c", "o"]))
    sql = to_sql(frag)
    assert "c_mktsegment = 'BUILDING'" in sql
    n = duck.sql(sql).fetchone()[0]
    want = duck.sql(
        "SELECT COUNT(*) FROM orders o, customer c WHERE "
        "o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'"
    ).fetchone()[0]
    assert n == want


def test_ht_estimator_perror_near_one(tables, sf_dir):
    """The sample-backed estimator's cards are near-exact at this scale,
    so its plan choices must match the true-cost optimum."""
    from scardina_spark.catalog import build_tpch_schema
    from scardina_spark.estimators import SampleEstimator, prepare_tree_sample
    from scardina_spark.estimators.sample import spanning_tree
    sg = build_tpch_schema()
    est = SampleEstimator()
    est.add(prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                                "lineitem", n_min=30_000, seed=42).localize())
    con = duckdb_connection(sf_dir)
    true_fn = lambda frag: con.sql(to_sql(frag)).fetchone()[0]  # noqa: E731
    pe = p_error(SQL3, est.estimate, true_fn)
    assert pe < 1.5, pe


def test_unqualified_filters_rejected():
    """Bare column names cannot be routed to one fragment — reject rather
    than attach them to the wrong sub-query."""
    from scardina_spark.estimators.sample import UnsupportedQueryError
    with pytest.raises(UnsupportedQueryError):
        p_error("SELECT COUNT(*) FROM lineitem l, orders o, customer c "
                "WHERE l.l_orderkey = o.o_orderkey AND "
                "o.o_custkey = c.c_custkey AND o_totalprice > 100",
                lambda f: 1.0, lambda f: 1.0)


def test_disconnected_join_graph_rejected():
    from scardina_spark.estimators.sample import UnsupportedQueryError
    with pytest.raises(UnsupportedQueryError):
        p_error("SELECT COUNT(*) FROM lineitem l, orders o, customer c "
                "WHERE l.l_orderkey = o.o_orderkey",
                lambda f: 1.0, lambda f: 1.0)


def test_estimator_bugs_surface_not_masked():
    """Only the estimators' documented rejection types fall back to the
    true cardinality; a buggy estimator must raise, not score p-error 1."""
    with pytest.raises(TypeError):
        p_error(SQL3, lambda f: (_ for _ in ()).throw(TypeError("bug")),
                lambda f: 10.0)


def test_smj_cost_model_hand_computed():
    """C_smj = per join: x*log2(x) sorts of both inputs + output size."""
    import math
    cards = {frozenset(s): c for s, c in [
        (("l",), 6000.0), (("o",), 1500.0), (("c",), 30.0),
        (("l", "o"), 6000.0), (("c", "o"), 300.0),
        (("c", "l", "o"), 1200.0)]}
    srt = lambda x: x * math.log2(x)  # noqa: E731
    want = (srt(30) + srt(1500) + 300) + (srt(300) + srt(6000) + 1200)
    got = plan_cost(("c", "o", "l"), cards, cost_model="smj")
    assert abs(got - want) < 1e-9
    # C_out for comparison reads only the intermediates
    assert plan_cost(("c", "o", "l"), cards) == 300 + 1200


SQL4 = ("SELECT COUNT(*) FROM supplier s, lineitem l, orders o, customer c "
        "WHERE s.s_suppkey = l.l_suppkey AND l.l_orderkey = o.o_orderkey "
        "AND o.o_custkey = c.c_custkey")


def test_smj_model_can_disagree_with_out_on_plan_choice():
    """The log2 sort terms are convex, so smj prefers balanced
    intermediates where out prefers a smaller skewed sum — a genuine
    second opinion, not a monotone transform of C_out."""
    pq = parse_query(SQL4)
    cards = {frozenset(s): c for s, c in [
        (("s",), 100.0), (("l",), 6000.0), (("o",), 1500.0), (("c",), 30.0),
        (("s", "l"), 550.0), (("l", "o"), 5000.0), (("c", "o"), 20.0),
        (("l", "o", "s"), 550.0), (("c", "l", "o"), 1050.0),
        (("c", "l", "o", "s"), 400.0)]}
    fn = lambda frag: cards[frozenset(frag.tables)]  # noqa: E731
    out_best = min(left_deep_plans(pq), key=lambda p: plan_cost(p, cards))
    smj_best = min(left_deep_plans(pq),
                   key=lambda p: plan_cost(p, cards, cost_model="smj"))
    # out: intermediates (20, 1050) sum 1070 beat (550, 550) sum 1100
    assert set(out_best[:2]) == {"c", "o"}
    # smj: sorting the 1050-row intermediate costs more than two 550s
    assert set(smj_best[:2]) == {"s", "l"}
    # perfect estimates are optimal under EITHER model
    assert p_error(pq, fn, fn) == 1.0
    assert p_error(pq, fn, fn, cost_model="smj") == 1.0


def test_ht_estimator_perror_one_under_both_models(tables, sf_dir):
    from scardina_spark.estimators import SampleEstimator, prepare_tree_sample
    from scardina_spark.estimators.sample import spanning_tree
    from scardina_spark.catalog import build_tpch_schema

    sg = build_tpch_schema()
    est = SampleEstimator()
    est.add(prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                                "lineitem", n_min=20_000, seed=42).localize())
    con = duckdb_connection(sf_dir)
    true_fn = lambda frag: con.sql(to_sql(frag)).fetchone()[0]  # noqa: E731
    for model in ("out", "smj"):
        pe = p_error(SQL3, est.estimate, true_fn, cost_model=model)
        assert pe < 1.5, (model, pe)
