"""JOB-light-style generated suite: determinism, shape, parseability, and
end-to-end q-error sanity on sf0.001."""

from scardina_spark.benchmarks import duckdb_truths, job_light_suite
from scardina_spark.catalog import build_tpch_schema
from scardina_spark.estimators import SampleEstimator, prepare_tree_sample
from scardina_spark.estimators.sample import spanning_tree
from scardina_spark.plans.parse import parse_query
from scardina_spark.runner import run_benchmark

SF = "/root/testdata/sf0.001"


def test_suite_deterministic_and_job_light_sized():
    a, b = job_light_suite(), job_light_suite()
    assert a == b
    assert len(a) >= 70  # job-light is 70 queries (reference README.md:86-91)
    # every query parses under the front-end grammar
    n_joins = 0
    for sql in a.values():
        pq = parse_query(sql)
        n_joins += bool(pq.joins)
        assert pq.tables
    assert n_joins >= 40  # mostly join queries, like job-light


def test_suite_truths_match_exact_estimator(spark, tables):
    from scardina_spark.estimators import ExactEstimator
    suite = dict(list(job_light_suite().items())[:6])
    truths = duckdb_truths(SF, suite)
    exact = ExactEstimator(build_tpch_schema(), tables)
    for name, sql in suite.items():
        assert exact.estimate(sql) == truths[name], sql


def test_suite_sample_estimator_qerror(spark, tables):
    suite = job_light_suite()
    truths = duckdb_truths(SF, suite)
    sg = build_tpch_schema()
    ts = prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                             "lineitem", seed=42).localize()
    est = SampleEstimator()
    est.add(ts)
    rep = run_benchmark(est, suite, truths=truths)
    s = rep.summary
    assert s["n_queries"] == len(suite)
    # the sample is >= the full join at sf0.001, so errors are tiny; the
    # bound is loose to stay seed-robust
    assert s["q_p50"] < 1.25
    assert s["q_p100"] < 5.0


def test_or_suite_deterministic_and_supported(tables, duck):
    from scardina_spark.benchmarks import or_suite
    from scardina_spark.estimators import SampleEstimator, prepare_tree_sample
    from scardina_spark.estimators.sample import spanning_tree

    a, b = or_suite(), or_suite()
    assert a == b and len(a) == 20
    assert all("OR" in sql for sql in a.values())
    sg = build_tpch_schema()
    est = SampleEstimator()
    est.add(prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                                "lineitem", seed=1).localize())
    for name, sql in a.items():
        got = est.estimate(sql)        # every query must be supported
        want = duck.sql(sql).fetchone()[0]
        if want > 50:                  # sampling noise on tiny truths
            assert max(got / want, want / got) < 1.6, (name, got, want)
