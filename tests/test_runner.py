"""Benchmark runner: q-error conventions, percentile reporting, sinks."""

import csv
import json
import math

import pytest

from scardina_spark.catalog import build_tpch_schema
from scardina_spark.estimators import ExactEstimator, SampleEstimator, prepare_tree_sample
from scardina_spark.estimators.sample import spanning_tree
from scardina_spark.queries import BENCH_QUERIES
from scardina_spark.runner import (
    BenchmarkReport, load_benchmark_csv, pct_nearest, q_error, run_benchmark)


def test_q_error_conventions():
    # reference calc_q_err (scardina/run.py:60-67): truth 0 -> q = est,
    # est 0 -> q = truth, both 0 -> 1
    assert q_error(0, 0) == 1.0
    assert q_error(5, 0) == 5.0
    assert q_error(0, 5) == 5.0
    assert q_error(10, 100) == 10.0
    assert q_error(100, 10) == 10.0


def test_pct_nearest():
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    assert pct_nearest(xs, 0.5) == 3.0
    assert pct_nearest(xs, 1.0) == 5.0
    assert pct_nearest(xs, 0.0) == 1.0


def test_runner_end_to_end(tables, tmp_path):
    sg = build_tpch_schema()
    est = SampleEstimator()
    est.add(prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                                "lineitem", n_min=20_000, seed=5).localize())
    exact = ExactEstimator(sg, tables)
    rep = run_benchmark(est, BENCH_QUERIES, truth_fn=exact.estimate)
    assert rep.summary["n_queries"] == len(BENCH_QUERIES)
    assert rep.summary["q_p100"] < 1.5
    assert rep.summary["mean_ms"] < 1000

    csv_path = str(tmp_path / "results.csv")
    json_path = str(tmp_path / "results.json")
    rep.to_csv(csv_path)
    rep.to_json(json_path)
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert len(rows) == len(BENCH_QUERIES) + 1
    with open(json_path) as f:
        j = json.load(f)
    assert j["estimator"] == "sample"
    assert "q_p95" in j["summary"]


def test_benchmark_csv_source(tmp_path):
    p = str(tmp_path / "bench.csv")
    with open(p, "w") as f:
        f.write('100,"SELECT COUNT(*) FROM t WHERE a = 1"\n')
        f.write(',"SELECT COUNT(*) FROM t WHERE b = 2"\n')
    rows = load_benchmark_csv(p)
    assert rows[0] == (100.0, "SELECT COUNT(*) FROM t WHERE a = 1")
    assert rows[1][0] is None


def test_runner_with_golden_truths():
    class Fake:
        name = "fake"

        def estimate(self, sql):
            return 50.0

    rep = run_benchmark(Fake(), {"a": "SELECT 1"}, truths={"a": 100.0})
    assert rep.results[0].q_error == 2.0


def test_run_benchmark_skips_unsupported_when_asked():
    from scardina_spark.estimators.sample import UnsupportedQueryError
    from scardina_spark.runner import run_benchmark

    class Flaky:
        name = "flaky"

        def estimate(self, sql):
            if "orders" in sql:
                raise UnsupportedQueryError("off-tree")
            return 10.0

    queries = {"ok": "SELECT COUNT(*) FROM lineitem",
               "bad": "SELECT COUNT(*) FROM orders"}
    rep = run_benchmark(Flaky(), queries, truths={"ok": 10.0, "bad": 1.0},
                        skip_unsupported=True)
    assert rep.summary["n_queries"] == 1
    assert rep.summary["n_skipped"] == 1
    assert rep.skipped[0][0] == "bad"


def test_shipped_benchmark_csvs_parse():
    """The repo ships reference-format benchmark CSVs
    (benchmarks/tpch/job-light-sf*.csv, the layout of Scardina's
    benchmarks/<ds>/<bench>.csv) with exact truths; they must parse and
    stay in sync with the generated suite size."""
    import os

    from scardina_spark.runner import load_benchmark_csv

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "tpch")
    for sf in ["0.001", "0.01"]:
        rows = load_benchmark_csv(os.path.join(root, f"job-light-sf{sf}.csv"))
        assert len(rows) == 82
        assert all(t is not None and t >= 0 for t, _ in rows)
        assert all(s.upper().startswith("SELECT COUNT(*)") for _, s in rows)
