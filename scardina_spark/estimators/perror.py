"""Plan-quality (p-error) evaluation, self-contained.

The reference measures p-error by injecting estimated cardinalities into
a live Postgres planner via the external CEB harness and comparing the
chosen plan's cost under TRUE cardinalities against the optimal plan
(scardina/run.py:1011-1127).  No Postgres exists in this environment, so
this module implements the same protocol with an explicit cost model:

* plan space — BUSHY join trees over connected subsets (DPccp-style
  enumeration: every internal node joins two connected, edge-adjacent
  sub-plans — the System-R/Postgres dynamic-programming space with full
  planner freedom, matching the reference protocol which scores the
  planner's whole space, not a left-deep slice).  ``plan_space=
  "left_deep"`` restricts to left-deep orders (the r1-r6 behavior,
  kept for comparison: left-deep trees are a subset of bushy);
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


def connected_splits(s: frozenset, adj: dict[str, set[str]]
                     ) -> list[tuple[frozenset, frozenset]]:
    """Every unordered partition of connected set ``s`` into two
    CONNECTED halves with at least one join edge between them — the
    csg-cmp pairs of the DPccp join-enumeration literature (Moerkotte &
    Neumann, VLDB 2006).  The anchor (min element) always lands in the
    first half, so each partition is produced exactly once."""
    members = sorted(s)
    anchor, rest = members[0], members[1:]
    out: list[tuple[frozenset, frozenset]] = []
    for mask in range(1 << len(rest)):
        s1 = frozenset([anchor] + [rest[i] for i in range(len(rest))
                                   if mask >> i & 1])
        if len(s1) == len(s):
            continue
        s2 = s - s1
        if not _connected(s1, adj) or not _connected(s2, adj):
            continue
        if not any(adj[a] & s2 for a in s1):
            continue
        out.append((s1, s2))
    return out


def tree_aliases(tree) -> frozenset:
    """Leaf-alias set of a plan tree (str leaf | (left, right) node)."""
    if isinstance(tree, str):
        return frozenset([tree])
    return tree_aliases(tree[0]) | tree_aliases(tree[1])


def tree_join_sets(tree) -> list[frozenset]:
    """Alias set of every INTERNAL node — the structural signature a
    forced plan must reproduce (pg.tree_respected compares these
    against EXPLAIN's join nodes)."""
    if isinstance(tree, str):
        return []
    left, right = tree
    return (tree_join_sets(left) + tree_join_sets(right)
            + [tree_aliases(tree)])


def _srt(x: float) -> float:
    import math
    x = max(x, 2.0)
    return x * math.log2(x)


def _node_cost(s1: frozenset, s2: frozenset, s: frozenset,
               cards: dict[frozenset, float], cost_model: str) -> float:
    """Cost charged at one join node: C_out reads only the output size;
    C_smj adds both inputs' sort terms (same formulas as the left-deep
    ``plan_cost``, so the two enumerations price identical shapes
    identically)."""
    out = max(cards[s], 1.0)
    if cost_model == "out":
        return out
    if cost_model == "smj":
        return _srt(cards[s1]) + _srt(cards[s2]) + out
    raise ValueError(f"unknown cost_model: {cost_model}")


def tree_cost(tree, cards: dict[frozenset, float],
              cost_model: str = "out") -> float:
    """Cost of an explicit bushy plan tree under ``cards`` (leaves are
    free scans under C_out; C_smj charges their sort at the join that
    consumes them, via ``_node_cost``)."""
    if isinstance(tree, str):
        return 0.0
    left, right = tree
    s1, s2 = tree_aliases(left), tree_aliases(right)
    return (tree_cost(left, cards, cost_model)
            + tree_cost(right, cards, cost_model)
            + _node_cost(s1, s2, s1 | s2, cards, cost_model))


def bushy_best_plan(pq: ParsedQuery, cards: dict[frozenset, float],
                    cost_model: str = "out"):
    """(tree, cost) minimizing ``cost_model`` over the FULL bushy plan
    space — dynamic programming over connected subsets, smallest first
    (each subset's best plan combines two already-solved halves).  Ties
    break by enumeration order (subsets sorted, splits in mask order),
    so the chosen tree is deterministic."""
    adj = _join_graph(pq)
    if not _connected(frozenset(pq.tables), adj):
        raise UnsupportedQueryError(
            "disconnected join graph (cartesian product) has no "
            "connected join trees")
    subsets = sorted(connected_subsets(pq), key=lambda s: (len(s),
                                                           sorted(s)))
    best: dict[frozenset, tuple[float, object]] = {}
    for s in subsets:
        if len(s) == 1:
            best[s] = (0.0, next(iter(s)))
            continue
        chosen: tuple[float, object] | None = None
        for s1, s2 in connected_splits(s, adj):
            c1, t1 = best[s1]
            c2, t2 = best[s2]
            c = c1 + c2 + _node_cost(s1, s2, s, cards, cost_model)
            if chosen is None or c < chosen[0]:
                chosen = (c, (t1, t2))
        if chosen is None:
            raise UnsupportedQueryError(
                "disconnected join graph (cartesian product)")
        best[s] = chosen
    cost, tree = best[frozenset(pq.tables)]
    return tree, cost


def plan_space_size(pq: ParsedQuery | str,
                    plan_space: str = "bushy") -> int:
    """Number of distinct plans the enumeration scores — counted by DP
    (``cnt[S] = Σ cnt[S1]·cnt[S2]`` over connected splits), never by
    materializing the trees, so the size is reportable even where the
    space is large."""
    pq = parse_query(pq) if isinstance(pq, str) else pq
    if plan_space == "left_deep":
        return len(left_deep_plans(pq))
    if plan_space != "bushy":
        raise ValueError(f"unknown plan_space: {plan_space}")
    adj = _join_graph(pq)
    subsets = sorted(connected_subsets(pq), key=len)
    cnt: dict[frozenset, int] = {}
    for s in subsets:
        if len(s) == 1:
            cnt[s] = 1
            continue
        cnt[s] = sum(cnt[s1] * cnt[s2]
                     for s1, s2 in connected_splits(s, adj))
    return cnt[frozenset(pq.tables)]


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
            cost_model: str = "out", plan_space: str = "bushy") -> float:
    """p-error of ``est_fn``'s cardinalities on ``query`` under the
    given cost model and plan space (default: the FULL bushy space —
    the reference's planner-freedom protocol; ``"left_deep"`` restricts
    to left-deep orders for comparison).

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
    if plan_space not in ("bushy", "left_deep"):
        raise ValueError(f"unknown plan_space: {plan_space}")
    if plan_space == "left_deep" and not left_deep_plans(pq):
        raise UnsupportedQueryError(
            "disconnected join graph (cartesian product) has no "
            "left-deep join orders")
    if not _connected(frozenset(pq.tables), _join_graph(pq)):
        raise UnsupportedQueryError(
            "disconnected join graph (cartesian product) has no "
            "connected join trees")
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
    if plan_space == "bushy":
        tree_est, _ = bushy_best_plan(pq, est_cards, cost_model)
        _, best_true = bushy_best_plan(pq, true_cards, cost_model)
        chosen_true = tree_cost(tree_est, true_cards, cost_model)
        return chosen_true / max(best_true, 1e-12)
    plans = left_deep_plans(pq)
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
