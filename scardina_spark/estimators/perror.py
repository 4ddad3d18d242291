"""Plan-quality (p-error) evaluation, self-contained.

The reference measures p-error by injecting estimated cardinalities into
a live Postgres planner via the external CEB harness and comparing the
chosen plan's cost under TRUE cardinalities against the optimal plan
(scardina/run.py:1011-1127).  No Postgres exists in this environment, so
this module implements the same protocol with an explicit cost model:

* plan space — left-deep join orders whose every prefix is connected in
  the query's join graph (the space Postgres's DP explores for these
  tree queries);
* cost model — C_out: the sum of intermediate join result sizes, the
  standard planner-cost proxy in the join-ordering literature (Leis et
  al., "How Good Are Query Optimizers, Really?", VLDB 2015);
* p-error — cost under TRUE cards of the plan chosen with ESTIMATED
  cards, divided by the optimal true-card plan cost.  1.0 means the
  estimator's errors did not change the chosen plan (or changed it to an
  equally good one).

Sub-plan cardinalities come from answering each connected sub-query with
the estimator under test — exactly the per-subquery predictions the
reference exports for CEB (run.py:980-990).
"""

from __future__ import annotations

from itertools import combinations

from ..plans.parse import ParsedQuery, parse_query
from ..plans.predicates import pred_tables
from .sample import UnsupportedQueryError


def _join_graph(pq: ParsedQuery) -> dict[str, set[str]]:
    adj: dict[str, set[str]] = {a: set() for a in pq.tables}
    for a, b in pq.joins:
        aa, bb = a.split(".", 1)[0], b.split(".", 1)[0]
        adj[aa].add(bb)
        adj[bb].add(aa)
    return adj


def _connected(aliases: frozenset, adj: dict[str, set[str]]) -> bool:
    seen = {next(iter(aliases))}
    frontier = list(seen)
    while frontier:
        nxt = [b for a in frontier for b in adj[a] & aliases - seen]
        seen.update(nxt)
        frontier = nxt
    return seen == set(aliases)


def fragment(pq: ParsedQuery, aliases: frozenset) -> ParsedQuery:
    """The sub-query induced by ``aliases``: its joins and its filters."""
    return ParsedQuery(
        tables={a: t for a, t in pq.tables.items() if a in aliases},
        joins=[(a, b) for a, b in pq.joins
               if a.split(".", 1)[0] in aliases
               and b.split(".", 1)[0] in aliases],
        filters=[p for p in pq.filters
                 if pred_tables(p) <= aliases
                 or (pred_tables(p) == {None} and len(aliases) == 1)],
        sql=pq.sql)


def connected_subsets(pq: ParsedQuery) -> list[frozenset]:
    adj = _join_graph(pq)
    names = sorted(pq.tables)
    out = []
    for k in range(1, len(names) + 1):
        for combo in combinations(names, k):
            s = frozenset(combo)
            if _connected(s, adj):
                out.append(s)
    return out


def left_deep_plans(pq: ParsedQuery) -> list[tuple[str, ...]]:
    """Left-deep orders with connected prefixes."""
    adj = _join_graph(pq)
    names = sorted(pq.tables)
    plans: list[tuple[str, ...]] = []

    def extend(prefix: tuple[str, ...], remaining: set[str]) -> None:
        if not remaining:
            plans.append(prefix)
            return
        for nxt in sorted(remaining):
            if not prefix or adj[nxt] & set(prefix):
                extend(prefix + (nxt,), remaining - {nxt})

    extend((), set(names))
    return plans


def plan_cost(plan: tuple[str, ...], cards: dict[frozenset, float],
              cost_model: str = "out") -> float:
    """Cost of a left-deep join order under ``cards``.

    * ``out`` — C_out: sum of intermediate (prefix-join) sizes,
      excluding base-table scans, counting the final result once — the
      standard planner-cost proxy (Leis et al., VLDB 2015).
    * ``smj`` — sort-merge cost: per join, ``x·log2(x)`` sort terms for
      both inputs plus the output size (the C_smj shape of Leis et al.
      §5).  A genuinely SECOND cost model — the log terms are nonlinear
      in the intermediate sizes, so its argmin plan can differ from
      C_out's (a simple per-join linear input+output model cannot: for
      left-deep plans it reduces to 2·C_out + an order-invariant
      constant).  If estimates never change the chosen plan under
      either model, the "planner would pick the same plan" claim is
      cost-model-robust.
    """
    if cost_model == "out":
        return sum(max(cards[frozenset(plan[:k])], 1.0)
                   for k in range(2, len(plan) + 1))
    if cost_model == "smj":
        import math

        def srt(x: float) -> float:
            x = max(x, 2.0)
            return x * math.log2(x)

        total = 0.0
        for k in range(2, len(plan) + 1):
            total += (srt(cards[frozenset(plan[:k - 1])])        # sort probe
                      + srt(cards[frozenset((plan[k - 1],))])    # sort build
                      + max(cards[frozenset(plan[:k])], 1.0))    # output
        return total
    raise ValueError(f"unknown cost_model: {cost_model}")


def p_error(query: ParsedQuery | str, est_fn, true_fn,
            cost_model: str = "out") -> float:
    """p-error of ``est_fn``'s cardinalities on ``query`` under the
    given cost model.

    ``est_fn`` / ``true_fn``: ParsedQuery -> cardinality.  Sub-queries
    the estimator cannot answer fall back to the true value (matching
    the reference harness, which only injects the cards the model
    produced)."""
    pq = parse_query(query) if isinstance(query, str) else query
    if len(pq.tables) < 3:
        return 1.0  # a single join order; estimates cannot change it
    if any(None in pred_tables(p) for p in pq.filters):
        # a bare column name cannot be routed to one fragment
        raise UnsupportedQueryError(
            "p_error requires alias-qualified filter columns")
    plans = left_deep_plans(pq)
    if not plans:
        raise UnsupportedQueryError(
            "disconnected join graph (cartesian product) has no "
            "left-deep join orders")
    # size-1 subsets are base-table scans — C_out never reads them, the
    # smj model charges their sort as a build input
    min_size = 1 if cost_model == "smj" else 2
    subsets = [s for s in connected_subsets(pq) if len(s) >= min_size]
    true_cards: dict[frozenset, float] = {}
    est_cards: dict[frozenset, float] = {}
    for s in subsets:
        frag = fragment(pq, s)
        true_cards[s] = float(true_fn(frag))
        try:
            est_cards[s] = float(est_fn(frag))
        except (UnsupportedQueryError, ValueError):
            # only the estimators' documented rejection types fall back to
            # truth (the reference injects just the cards the model
            # produced); anything else is a bug and must surface
            est_cards[s] = true_cards[s]
    plan_est = min(plans, key=lambda p: plan_cost(p, est_cards, cost_model))
    best_true = min(plan_cost(p, true_cards, cost_model) for p in plans)
    chosen_true = plan_cost(plan_est, true_cards, cost_model)
    return chosen_true / max(best_true, 1e-12)


def _lit(v) -> str:
    import datetime
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (tuple, list)):
        return "(" + ", ".join(_lit(x) for x in v) + ")"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"TIMESTAMP '{v}'"
    return str(v)


def _pred_sql(p) -> str:
    o = p.o.upper()
    if o == "OR":
        return "(" + " OR ".join(_pred_sql(b) for b in p.v) + ")"
    if o == "IS":
        return f"{p.c} IS NULL"
    if o == "IS NOT":
        return f"{p.c} IS NOT NULL"
    if o == "BETWEEN":
        lo, hi = p.v
        return f"{p.c} BETWEEN {_lit(lo)} AND {_lit(hi)}"
    return f"{p.c} {o} {_lit(p.v)}"


def to_sql(pq: ParsedQuery) -> str:
    """ANSI COUNT(*) SQL for a (fragment) query — runnable by both the
    exact executor and a DuckDB oracle."""
    frm = ", ".join(f"{t} {a}" for a, t in sorted(pq.tables.items()))
    conds = [f"{a} = {b}" for a, b in pq.joins]
    conds += [_pred_sql(p) for p in pq.filters]
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    return f"SELECT COUNT(*) FROM {frm}{where}"
