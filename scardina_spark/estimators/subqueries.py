"""Per-subquery cardinality benchmark artifact + evaluation.

The reference evaluates estimators not only on whole queries but on every
connected sub-join of each query: it ships recorded per-subquery truths
(benchmarks/imdb/job-light_subqueries.csv — 694 rows for 70 queries,
format ``true_cardinality,sql,name,node``) and exports one prediction per
distinct subquery node for the plan-cost harness (scardina/run.py:980-990
— protocol, NOT code).  This module generates the same artifact for the
generated TPC-H-ish suites, loads it back, and evaluates recorded-truth
p-error plus a classic independence baseline against it.

Why a baseline: on whole-suite p-error the learned estimators saturate at
1.0 (their errors never flip a plan), so the benchmark alone cannot show
it *can* discriminate.  The independence estimator — perfect single-table
cardinalities combined with the System-R join-uniformity formula
|R join S| = |R|·|S| / max(V(R.a), V(S.b)) (Selinger et al. 1979; the
"cardinality estimation is the root evil" baseline of Leis et al., "How
Good Are Query Optimizers, Really?", VLDB 2015) — is the standard
reference point: its compounding errors DO flip plans, so its p-error
rows certify the harness is discriminating while the learned rows stay
at 1.0 on merit.
"""

from __future__ import annotations

import csv
import os

from ..plans.parse import ParsedQuery, parse_query
from .perror import connected_subsets, fragment, to_sql


def subqueries_csv_path(sf_dir: str, bench: str = "job-light") -> str:
    """benchmarks/tpch/<bench>-subqueries-<sf>.csv next to the suite CSVs."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.normpath(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", "benchmarks", "tpch", f"{bench}-subqueries-{tag}.csv"))


def enumerate_subqueries(suite: dict[str, str]
                         ) -> list[tuple[str, str, str]]:
    """``(name, node, sql)`` for every connected alias subset of every
    suite query, sizes 1..n — the reference's node enumeration
    (run.py:980-990: one prediction per connected sub-plan).  ``node``
    is the space-joined sorted alias set, as in the reference CSV."""
    out: list[tuple[str, str, str]] = []
    for name, sql in suite.items():
        pq = parse_query(sql)
        for s in connected_subsets(pq):
            out.append((name, " ".join(sorted(s)),
                        to_sql(fragment(pq, s))))
    return out


def export_subqueries_csv(suite: dict[str, str], con, out_path: str
                          ) -> int:
    """Record exact truths for every subquery of ``suite`` through the
    DuckDB connection ``con`` (same oracle as the driver's correctness
    gate).  Returns the number of rows written.  Truths are memoized on
    the fragment SQL — shared join prefixes across the suite repeat."""
    rows = enumerate_subqueries(suite)
    cache: dict[str, int] = {}
    parent = os.path.dirname(out_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_NONNUMERIC)
        w.writerow(["true_cardinality", "sql", "name", "node"])
        for name, node, sql in rows:
            if sql not in cache:
                cache[sql] = int(con.sql(sql).fetchone()[0])
            w.writerow([cache[sql], sql, name, node])
    return len(rows)


def load_subqueries_csv(path: str) -> list[dict]:
    """Rows of ``{card, sql, name, node}`` from a recorded artifact."""
    out = []
    with open(path, newline="") as f:
        for r in csv.DictReader(f):
            out.append({"card": int(float(r["true_cardinality"])),
                        "sql": r["sql"], "name": r["name"],
                        "node": r["node"]})
    return out


def recorded_truth_fn(rows: list[dict]):
    """``frag -> truth`` lookup over recorded rows, keyed on the
    fragment's canonical SQL (the same to_sql both the exporter and
    p_error's enumeration use, so keys match exactly).  Raises KeyError
    on an unrecorded fragment — silence would un-pin the artifact."""
    truths = {r["sql"]: float(r["card"]) for r in rows}

    def fn(frag: ParsedQuery) -> float:
        return truths[to_sql(frag)]
    return fn


class JoinKeyStats:
    """Exact ``COUNT(DISTINCT col)`` per (table, column) through a DuckDB
    connection, memoized.  Shared by both baseline estimators so the same
    join-key distinct count is queried once per bench run, not once per
    estimator."""

    def __init__(self, con):
        self._con = con
        self._v: dict[tuple[str, str], float] = {}

    def distinct(self, table: str, col: str) -> float:
        key = (table, col)
        if key not in self._v:
            self._v[key] = float(self._con.sql(
                f"SELECT COUNT(DISTINCT {col}) FROM {table}"
            ).fetchone()[0])
        return self._v[key]


class HeuristicSystemREstimator:
    """The full textbook baseline: System-R magic-constant selectivities
    AND join uniformity (Selinger et al., "Access Path Selection in a
    Relational Database Management System", SIGMOD 1979, §4) — no
    per-query statistics at all, only table counts and distinct counts.

    sel(col = v)       = 1 / V(col)          sel(col IN list) = |list|/V
    sel(range)         = 1/3                 sel(BETWEEN)     = 1/4
    sel(LIKE)          = 1/10                sel(IS NULL)     = 1/100
    |R join S| factor  = 1 / max(V(R.a), V(S.b))

    Unlike :class:`IndependenceEstimator` (perfect single-table stats),
    its per-table errors differ in DIRECTION across tables, so they do
    not cancel in plan-cost ratios — measured on the 6-7-table p-error
    suite it flips the chosen join order on a sizable fraction of
    queries (p-error up to ~2.6), which is exactly what makes it the
    discriminating baseline the harness is validated against."""

    def __init__(self, con, stats: JoinKeyStats | None = None):
        self._con = con
        self._cnt: dict[str, float] = {}
        self._stats = stats if stats is not None else JoinKeyStats(con)

    def _count(self, table: str) -> float:
        if table not in self._cnt:
            self._cnt[table] = float(self._con.sql(
                f"SELECT COUNT(*) FROM {table}").fetchone()[0])
        return self._cnt[table]

    def _distinct(self, table: str, col: str) -> float:
        return self._stats.distinct(table, col)

    def _sel(self, p, table: str) -> float:
        o = p.o.upper()
        col = p.c.split(".", 1)[1]
        if o == "=":
            return 1.0 / max(self._distinct(table, col), 1.0)
        if o in ("!=", "<>"):
            return 1.0 - 1.0 / max(self._distinct(table, col), 1.0)
        if o in ("<", "<=", ">", ">="):
            return 1.0 / 3.0
        if o == "BETWEEN":
            return 1.0 / 4.0
        if o == "IN":
            return min(1.0, len(p.v) / max(self._distinct(table, col), 1.0))
        if o == "LIKE":
            return 1.0 / 10.0
        if o == "NOT LIKE":
            return 9.0 / 10.0
        if o == "IS":
            return 1.0 / 100.0
        if o == "IS NOT":
            return 99.0 / 100.0
        if o == "OR":
            return min(1.0, sum(self._sel(b, table) for b in p.v))
        return 0.3

    def estimate(self, frag: ParsedQuery) -> float:
        from ..plans.predicates import pred_tables
        est = 1.0
        for table in frag.tables.values():
            est *= self._count(table)
        for p in frag.filters:
            alias = next(iter(pred_tables(p)))
            est *= self._sel(p, frag.tables[alias])
        for a, b in frag.joins:
            al_a, col_a = a.split(".", 1)
            al_b, col_b = b.split(".", 1)
            est /= max(self._distinct(frag.tables[al_a], col_a),
                       self._distinct(frag.tables[al_b], col_b), 1.0)
        return est


class IndependenceEstimator:
    """Perfect single-table stats + System-R join uniformity.

    est(S) = prod_t |sigma(t)| * prod_{(a,b) in joins(S)}
             1 / max(V(table_a, col_a), V(table_b, col_b))

    Single-table filtered cardinalities come from the recorded artifact
    (size-1 nodes), i.e. the estimator is granted PERFECT base-table
    statistics; every error is attributable to the independence /
    uniformity assumptions across joins — the Leis et al. VLDB 2015
    protocol.  Distinct join-key counts V are exact, computed once per
    column through the DuckDB connection."""

    def __init__(self, rows: list[dict], con, stats: JoinKeyStats | None = None):
        # size-1 nodes (no space in the alias set) are the base-table rows
        self._single = {r["sql"]: float(r["card"]) for r in rows
                        if " " not in r["node"]}
        self._stats = stats if stats is not None else JoinKeyStats(con)

    def _distinct(self, table: str, col: str) -> float:
        return self._stats.distinct(table, col)

    def estimate(self, frag: ParsedQuery) -> float:
        est = 1.0
        for alias in frag.tables:
            sub = fragment(frag, frozenset([alias]))
            est *= self._single[to_sql(sub)]
        for a, b in frag.joins:
            al_a, col_a = a.split(".", 1)
            al_b, col_b = b.split(".", 1)
            v = max(self._distinct(frag.tables[al_a], col_a),
                    self._distinct(frag.tables[al_b], col_b))
            est /= max(v, 1.0)
        return est
