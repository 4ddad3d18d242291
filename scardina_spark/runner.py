"""Benchmark runner: evaluate estimators against exact truth and report
q-error percentiles + latency, with CSV/JSON result sinks.

Reference semantics (NOT code): scardina/run.py:60-67 (q-error with zero
conventions), 945-990 (per-query results + percentile summary at
[0.5, 0.9, 0.95, 0.99, 1.0] with nearest interpolation, dumped to
CSV/JSON).  The benchmark *source* here is a list of SQL strings or a CSV
with ``true_cardinality,sql`` rows (S3, scardina/run.py:791-794).
"""

from __future__ import annotations

import csv
import json
import math
import os
import time
from dataclasses import dataclass, field

PERCENTILES = (0.5, 0.9, 0.95, 0.99, 1.0)


def q_error(est: float, true: float) -> float:
    """max(est/true, true/est) with the reference's zero conventions
    (scardina/run.py:60-67, calc_q_err): truth 0 → q = est; est 0 →
    q = truth; both 0 → 1."""
    if true == 0 and est != 0:
        return float(est)
    if true != 0 and est == 0:
        return float(true)
    if true == 0 and est == 0:
        return 1.0
    return max(est / true, true / est)


def pct_nearest(xs: list[float], p: float) -> float:
    """'nearest' interpolation, matching the reference's reporting."""
    if not xs:
        return float("nan")
    s = sorted(xs)
    idx = min(len(s) - 1, max(0, round(p * (len(s) - 1))))
    return s[int(idx)]


def load_benchmark_csv(path: str) -> list[tuple[float | None, str]]:
    """``true_cardinality,sql`` rows (S3); truth may be empty → computed.
    The reference's shipped benchmarks (imdb/job-light.csv, job-m.csv)
    lead with a ``true_cardinality,sql`` header row — skipped here so
    those files load verbatim."""
    out = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            if row[0].strip().lower() == "true_cardinality":
                continue  # reference header row
            truth = float(row[0]) if row[0].strip() else None
            out.append((truth, row[1]))
    return out


@dataclass
class QueryResult:
    name: str
    sql: str
    est: float
    truth: float
    q_error: float
    elapsed_ms: float


@dataclass
class BenchmarkReport:
    estimator: str
    results: list[QueryResult] = field(default_factory=list)
    n_skipped: int = 0
    skipped: list[tuple[str, str]] = field(default_factory=list)

    @property
    def summary(self) -> dict[str, float]:
        qs = [r.q_error for r in self.results]
        lat = [r.elapsed_ms for r in self.results]
        out = {f"q_p{int(p * 100)}": pct_nearest(qs, p) for p in PERCENTILES}
        out["mean_ms"] = sum(lat) / len(lat) if lat else float("nan")
        out["n_queries"] = len(self.results)
        if self.n_skipped:
            out["n_skipped"] = self.n_skipped
        return out

    def to_csv(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "est", "truth", "q_error", "elapsed_ms", "sql"])
            for r in self.results:
                w.writerow([r.name, r.est, r.truth, r.q_error,
                            round(r.elapsed_ms, 3), r.sql])

    def to_json(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({
                "estimator": self.estimator,
                "summary": self.summary,
                "results": [r.__dict__ for r in self.results],
            }, f, indent=2, default=str)


def run_benchmark(estimator, queries: dict[str, str] | list[str],
                  truth_fn=None, truths: dict[str, float] | None = None,
                  skip_unsupported: bool = False) -> BenchmarkReport:
    """Run ``estimator.estimate`` over the benchmark; truth comes from
    ``truths`` (golden, reference-style) or ``truth_fn`` (live exact
    counts — we can compute truth instead of shipping golden files).

    ``skip_unsupported``: queries the estimator rejects are counted in
    ``report.n_skipped`` instead of aborting the run — for external
    workloads (reference-format CSVs) that may exceed the estimator's
    query language."""
    if isinstance(queries, list):
        queries = {f"q{i}": sql for i, sql in enumerate(queries)}
    rep = BenchmarkReport(getattr(estimator, "name", type(estimator).__name__))
    for name, sql in queries.items():
        t0 = time.perf_counter()
        # ceil to an integer cardinality, as the reference's estimators do
        # (scardina/estimators.py:1467: np.ceil(card))
        try:
            est = math.ceil(estimator.estimate(sql))
        except Exception as ex:
            if skip_unsupported:
                rep.n_skipped += 1
                rep.skipped.append((name, str(ex)))
                continue
            raise
        ms = (time.perf_counter() - t0) * 1000
        if truths and name in truths:
            truth = truths[name]
        elif truth_fn is not None:
            truth = truth_fn(sql)
        else:
            raise ValueError("provide truths or truth_fn")
        rep.results.append(QueryResult(
            name, sql, float(est), float(truth), q_error(est, truth), ms))
    return rep
