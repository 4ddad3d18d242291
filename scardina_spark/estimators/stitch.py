"""Cross-subschema estimation: stitch multiple prepared samples.

Reference semantics (NOT code): scardina/estimators.py:1196-1232 (subschema
cover selection over the hypergraph; root = the subschema covering most of
the query; BFS over the sub-join tree) and 1309-1423 (cross-model
stitching: shared columns are sampled once and inherited; each model
contributes its conditional selectivity; the total is the product).

Sample-backed analog: for a chain of covering samples S_1..S_m where S_k
shares table set B_k with the already-covered part,

    card = HT_1(frag_1) × Π_k  HT_k(frag_k) / HT_k(frag_k ∩ B_k)

where HT_k(·) is the Horvitz-Thompson aggregate on sample k (sample.py)
and frag_k is the query restricted to S_k's tables.  The ratio is the
conditional selectivity of S_k's new predicates given the shared tables —
the same conditional-chaining the reference does with inherited model
samples, taken at expectation level instead of per-sample-row.  Exact when
fragments overlap on the conditioning tables; an approximation (uniformity
across the boundary) otherwise, exactly like the reference.

Every HT(·) is one aggregate over a cached sample: a stitched query over m
subschemas costs 2m-1 small Spark jobs and touches no base table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import networkx as nx

from ..plans.parse import ParsedQuery, parse_query
from ..plans.predicates import Predicate, pred_tables
from .sample import SampleEstimator, TreeSample, UnsupportedQueryError


@dataclass
class StitchedEstimator(SampleEstimator):
    """SampleEstimator that falls back to multi-sample stitching when no
    single prepared sample covers the query."""

    name: str = "sample+stitch"

    def estimate(self, query: ParsedQuery | str) -> float:
        pq = parse_query(query) if isinstance(query, str) else query
        try:
            return super().estimate(pq)
        except UnsupportedQueryError:
            return self._estimate_stitched(pq)

    # -- stitching --------------------------------------------------------

    def _estimate_stitched(self, pq: ParsedQuery) -> float:
        return chain_estimate(self.samples, pq,
                              lambda ts, frag: super(StitchedEstimator,
                                                     self).estimate(frag))


def build_chain(samples: list[TreeSample], pq: ParsedQuery,
                alias_to_table: dict[str, str]
                ) -> list[tuple[TreeSample, set[str], set[str]]]:
    """Greedy cover: repeatedly pick the sample whose QUERY-CONNECTED
    fragment covers the most uncovered query tables/edges while
    overlapping the covered set (reference analog: root = largest
    hyperedge + BFS visit, estimators.py:1196-1232).

    Fragments are trimmed to connected components of the query graph:
    a sample may contain a query table that the fragment's own query
    joins do not reach (e.g. supplier in the lineitem subschema when the
    query joins supplier to a DIFFERENT fact table's FK) — including
    such a "rider" table would make make_fragment reconnect it through
    the sample's own tree edge, silently estimating a different join
    than the query's (measured 600x+ over-estimates on multi-fact job-m
    chains before this trim)."""
    from .sample import _tree_edge_pairs

    q_tables = set(alias_to_table.values())
    qg = nx.Graph()
    qg.add_nodes_from(q_tables)
    q_edges = []  # (table_a, table_b, column-level key)
    for a, b in pq.joins:
        al_a, col_a = a.split(".", 1)
        al_b, col_b = b.split(".", 1)
        ta, tb = alias_to_table[al_a], alias_to_table[al_b]
        qg.add_edge(ta, tb)
        q_edges.append((ta, tb, frozenset(((ta, col_a), (tb, col_b)))))
    if len(q_tables) > 1 and not nx.is_connected(qg):
        raise UnsupportedQueryError("query tables are not connected")

    chain: list[tuple[TreeSample, set[str], set[str]]] = []
    covered: set[str] = set()
    uncovered_edges = set(frozenset((ta, tb)) for ta, tb, _ in q_edges)
    while covered != q_tables or uncovered_edges:
        best, best_frag, best_gain = None, None, -1
        for ts in samples:
            # the per-sample query graph keeps only joins this sample's
            # tree can actually evaluate — with parallel FK edges, two
            # samples over the same TABLES differ in which COLUMN-level
            # join they materialize, and picking by table overlap alone
            # would route a carrier-FK query to the from-FK sample
            pairs = _tree_edge_pairs(ts.tree)
            cand = ts.tables & q_tables
            g_ts = nx.Graph()
            g_ts.add_nodes_from(cand)
            for ta, tb, key in q_edges:
                if ta in cand and tb in cand and key in pairs:
                    g_ts.add_edge(ta, tb)
            for comp in nx.connected_components(g_ts):
                if covered and not (comp & covered):
                    continue
                gain_tables = len(comp - covered)
                gain_edges = len([e for e in uncovered_edges
                                  if set(e) <= comp])
                gain = gain_tables + gain_edges
                if gain > best_gain and gain > 0:
                    best, best_frag, best_gain = ts, set(comp), gain
        if best is None:
            raise UnsupportedQueryError(
                f"no sample chain covers tables {sorted(q_tables)}")
        shared = best_frag & covered
        chain.append((best, best_frag, shared))
        covered |= best_frag
        uncovered_edges = {e for e in uncovered_edges
                           if not set(e) <= best_frag}
    return chain


def chain_estimate(samples: list[TreeSample], pq: ParsedQuery,
                   frag_estimate) -> float:
    """Conditional chaining over a covering chain of samples/models:
    ``frag_estimate(ts, fragment_query)`` supplies each term — the HT
    aggregate (StitchedEstimator) or a per-subschema NAR model
    (NarCinEstimator)."""
    alias_to_table = dict(pq.tables)
    if len(set(alias_to_table.values())) != len(alias_to_table):
        raise UnsupportedQueryError("self-joins unsupported")
    chain = build_chain(samples, pq, alias_to_table)
    # every multi-table OR group must land whole inside some fragment —
    # otherwise make_fragment would silently drop it and the chained
    # product would over-count
    for p in pq.filters:
        tset = {alias_to_table.get(a or "", "") for a in pred_tables(p)}
        if len(tset) > 1 and not any(tset <= frag for _, frag, _ in chain):
            raise UnsupportedQueryError(
                f"OR group spans tables {sorted(tset)} across chain "
                f"fragments")
    card = 1.0
    for i, (ts, frag_tables, shared) in enumerate(chain):
        num = make_fragment(pq, alias_to_table, ts, frag_tables)
        card_k = frag_estimate(ts, num)
        if i == 0:
            card = card_k
            continue
        den_q = make_fragment(pq, alias_to_table, ts, shared)
        den = frag_estimate(ts, den_q)
        if den <= 0:
            return 0.0
        card *= card_k / den
    return card


def make_fragment(pq: ParsedQuery, alias_to_table: dict[str, str],
                  ts: TreeSample, frag_tables: set[str]) -> ParsedQuery:
        """Restrict the query to ``frag_tables``, keeping the joins among
        them and, when the fragment is disconnected within the query,
        connecting it through the sample's own tree edges (the sample
        materializes those joins anyway)."""
        aliases = {a: t for a, t in alias_to_table.items()
                   if t in frag_tables}
        table_to_alias = {t: a for a, t in aliases.items()}
        joins = []
        for a, b in pq.joins:
            al_a, al_b = a.split(".", 1)[0], b.split(".", 1)[0]
            if al_a in aliases and al_b in aliases:
                joins.append((a, b))
        # connect via sample tree edges if the query has no join between
        # two fragment tables (both sides must still be table-qualified)
        have = {frozenset((alias_to_table[a.split(".", 1)[0]],
                           alias_to_table[b.split(".", 1)[0]]))
                for a, b in joins}
        for rel in ts.tree.rels:
            key = frozenset((rel.pk_table, rel.fk_table))
            if (rel.pk_table in frag_tables and rel.fk_table in frag_tables
                    and key not in have and len(frag_tables) > 1):
                joins.append((
                    f"{table_to_alias[rel.pk_table]}.{rel.pk_col}",
                    f"{table_to_alias[rel.fk_table]}.{rel.fk_col}"))
                have.add(key)
        # OR-aware routing: a disjunction group belongs to a fragment only
        # when EVERY branch's table is inside it (a split OR cannot be
        # conditioned through the chain)
        filters = [p for p in pq.filters
                   if {alias_to_table.get(a or "", "")
                       for a in pred_tables(p)} <= frag_tables]
        return ParsedQuery(tables=aliases, joins=joins, filters=filters,
                           sql=f"<fragment {sorted(frag_tables)}>")
