"""Per-subquery benchmark artifact (reference protocol run.py:980-990 +
benchmarks/imdb/*_subqueries.csv format): integrity, recorded-truth
re-verification, and the recorded-truth p-error path with the
independence baseline."""

import os

import pytest

from scardina_spark.benchmarks import duckdb_connection, job_light_suite
from scardina_spark.estimators.perror import p_error, parse_query, to_sql
from scardina_spark.estimators.subqueries import (
    IndependenceEstimator, enumerate_subqueries, load_subqueries_csv,
    recorded_truth_fn, subqueries_csv_path)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def rows():
    return load_subqueries_csv(subqueries_csv_path(SF_DIR, "job-light"))


def test_artifact_covers_every_connected_subquery(rows):
    suite = job_light_suite()
    expect = enumerate_subqueries(suite)
    assert len(rows) == len(expect)
    got = {(r["name"], r["node"]) for r in rows}
    assert got == {(n, node) for n, node, _ in expect}
    # every suite query contributes its full-query node
    for name, sql in suite.items():
        pq = parse_query(sql)
        full = " ".join(sorted(pq.tables))
        assert (name, full) in got


def test_recorded_truths_match_duckdb(rows):
    """Spot re-verification: every 10th row's recorded truth equals a
    fresh DuckDB evaluation at the same SF (the artifact's exactness
    claim, not just its shape)."""
    con = duckdb_connection(SF_DIR)
    for r in rows[::10]:
        assert con.sql(r["sql"]).fetchone()[0] == r["card"], r["node"]


def test_jm_artifact_matches_duckdb(spark):
    from scardina_spark.jobm import derive_shipments, jobm_duckdb_connection
    rows = load_subqueries_csv(subqueries_csv_path(SF_DIR, "job-m"))
    assert len(rows) > 200
    # the derived table is deterministic (xxhash64 off spark.range), so
    # materializing here yields the exact relation the artifact was
    # recorded against — keeps the test order- and /tmp-lifetime-free
    derive_shipments(spark, SF_DIR)
    con = jobm_duckdb_connection(SF_DIR)
    for r in rows[::10]:
        assert con.sql(r["sql"]).fetchone()[0] == r["card"], r["node"]


def test_recorded_truth_fn_keys_on_fragment_sql(rows):
    fn = recorded_truth_fn(rows)
    pq = parse_query(next(iter(job_light_suite().values())))
    assert fn(pq) == float(
        next(r["card"] for r in rows
             if r["sql"] == to_sql(pq)))
    with pytest.raises(KeyError):
        fn(parse_query("SELECT COUNT(*) FROM region zz"))


def test_independence_estimator_exact_on_single_tables(rows):
    con = duckdb_connection(SF_DIR)
    est = IndependenceEstimator(rows, con)
    for r in rows[:20]:
        if " " not in r["node"]:
            assert est.estimate(parse_query(r["sql"])) == r["card"]


def test_independence_estimator_errs_on_joins_but_same_magnitude(rows):
    """On PK-FK joins the System-R formula is the right order of
    magnitude (it is exact under uniform fanout) but not exact on the
    skewed synthetic data — that gap is what makes it a discriminating
    p-error baseline."""
    con = duckdb_connection(SF_DIR)
    est = IndependenceEstimator(rows, con)
    qerrs = []
    for r in rows:
        if len(r["node"].split()) >= 2 and r["card"] > 0:
            e = est.estimate(parse_query(r["sql"]))
            qerrs.append(max(e, r["card"]) / max(min(e, r["card"]), 1e-9))
    assert qerrs, "no multi-table rows"
    assert max(qerrs) < 1000        # same order of magnitude, not garbage
    assert max(qerrs) > 1.05        # and genuinely not exact


def test_ext_artifact_matches_duckdb():
    from scardina_spark.benchmarks import perror_suite
    rows = load_subqueries_csv(
        subqueries_csv_path(SF_DIR, "job-light-ext"))
    assert len(rows) == len(enumerate_subqueries(perror_suite()))
    con = duckdb_connection(SF_DIR)
    for r in rows[::17]:
        assert con.sql(r["sql"]).fetchone()[0] == r["card"], r["node"]


def test_heuristic_baseline_flips_plans_on_ext_suite():
    """The plan-quality harness discriminates: the System-R
    magic-constant baseline (Selinger 1979) must flip the chosen join
    order on at least one 6-7-table query (p-error > 1), while feeding
    the truths back gives exactly 1.0 everywhere.  This is the evidence
    that the learned estimators' 1.0 rows are earned, not vacuous."""
    from scardina_spark.benchmarks import perror_suite
    from scardina_spark.estimators.subqueries import (
        HeuristicSystemREstimator)
    rows = load_subqueries_csv(
        subqueries_csv_path(SF_DIR, "job-light-ext"))
    con = duckdb_connection(SF_DIR)
    heur = HeuristicSystemREstimator(con)
    true_fn = recorded_truth_fn(rows)
    pes = []
    for name, sql in perror_suite().items():
        pq = parse_query(sql)
        assert p_error(pq, true_fn, true_fn) == 1.0
        pes.append(max(p_error(pq, heur.estimate, true_fn),
                       p_error(pq, heur.estimate, true_fn,
                               cost_model="smj")))
    assert sum(1 for x in pes if x > 1.0001) >= 1, max(pes)


def test_ppc_injection_roundtrip_and_planning(spark):
    """The PPC loop end to end: cards write through Derby JDBC, read
    back partitioned, planner consumes them.  Injecting truths scores
    1.0; injecting the System-R heuristic's cards gives exactly the
    directly-computed p-error — the external store neither fixes nor
    hides estimator quality."""
    from scardina_spark.benchmarks import perror_suite
    from scardina_spark.estimators.ppc import (
        inject_cards, plan_with_injected)
    from scardina_spark.estimators.subqueries import (
        HeuristicSystemREstimator)
    ext = load_subqueries_csv(subqueries_csv_path(SF_DIR, "job-light-ext"))
    suite = perror_suite()
    con = duckdb_connection(SF_DIR)
    heur = HeuristicSystemREstimator(con)
    flipped = 0
    for name in [n for n in suite if n.startswith("px_7t")][:3]:
        qrows = [r for r in ext if r["name"] == name]
        truths = {r["node"]: r["card"] for r in qrows}
        # truths through the store: perfect plans
        back = inject_cards(spark, qrows, table=f"t_{name[-1]}")
        assert back == truths                      # exact roundtrip
        pe = plan_with_injected(suite[name], back, truths)
        assert pe["pe_out"] == 1.0 and pe["pe_smj"] == 1.0
        # heuristic cards through the store: same p-error as computed
        # directly (the store is transparent)
        hrows = [{"node": r["node"],
                  "card": int(max(heur.estimate(parse_query(r["sql"])), 1))}
                 for r in qrows]
        hback = inject_cards(spark, hrows, table=f"h_{name[-1]}")
        assert hback == {r["node"]: r["card"] for r in hrows}
        hpe = plan_with_injected(suite[name], hback, truths)
        assert hpe["pe_out"] >= 1.0 and hpe["pe_smj"] >= 1.0
        flipped += hpe["pe_out"] > 1.0001 or hpe["pe_smj"] > 1.0001
    # which queries flip depends on the SF's stats; the roundtrip and
    # planner invariants above are the hard assertions


def test_perror_with_recorded_truths(rows):
    """p-error over recorded truths runs for every 3+-table query under
    both cost models; truth-fed estimates give exactly 1.0 and the
    independence baseline stays finite."""
    con = duckdb_connection(SF_DIR)
    indep = IndependenceEstimator(rows, con)
    true_fn = recorded_truth_fn(rows)
    n = 0
    for name, sql in job_light_suite().items():
        pq = parse_query(sql)
        if len(pq.tables) < 3:
            continue
        n += 1
        assert p_error(pq, true_fn, true_fn) == 1.0
        for cm in ("out", "smj"):
            pe = p_error(pq, indep.estimate, true_fn, cost_model=cm)
            assert pe >= 1.0
    assert n == 36
