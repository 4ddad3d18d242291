"""UR-mode learned estimator: NAR model over the materialized join sample.

This is the reference's main path end-to-end (scardina/estimators.py:
925-1030): train the density model on the unbiased join sample (columns
prefixed ``table.col``, plus ``__in__:table`` existence markers (P8) and
``__adj_fanout__`` columns), then answer a join query by progressive
sampling:

    card = |J| × mean over samples of ( Π conditional sels / Π fanouts )

* predicates on used tables become valid masks (including the implicit
  ``__in__:t = True`` marker predicate per used table);
* for every directed edge pointing away from the used set, the model
  SAMPLES the fanout column and the estimate divides by the decoded
  fanout value (M7) — except edges whose fanout is constant 1 in the
  sample (FK→PK directions), which are skipped as an exact no-op.

The statistical correction from estimators/sample.py carries over: the
divisors are per-edge adjacency fanouts, so deep unused subtrees stay
unbiased.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import functions as F

from ..estimators.sample import TreeSample, UnsupportedQueryError, _divisor_cols
from ..plans.parse import ParsedQuery, parse_query
from ..plans.predicates import Predicate, normalize_predicates
from .bridge import training_matrix
from .nar import NarMLP, TrainConfig
from .progressive import MASK_SLOT, NarEstimator, valid_mask


@dataclass
class NarJoinEstimator(NarEstimator):
    """NarEstimator over a join sample: multi-table queries, existence
    markers, fanout scaling."""

    ts: TreeSample | None = None
    constant_one_fanouts: frozenset = frozenset()
    name: str = "nar-ur"

    def estimate(self, query: ParsedQuery | str) -> float:
        pq = parse_query(query) if isinstance(query, str) else query
        alias_to_table = dict(pq.tables)
        if len(set(alias_to_table.values())) != len(alias_to_table):
            raise UnsupportedQueryError("self-joins unsupported")
        q_tables = set(alias_to_table.values())
        ts = self.ts
        if not q_tables <= ts.tables:
            raise UnsupportedQueryError(
                f"tables {sorted(q_tables - ts.tables)} not in model tree")
        from ..estimators.sample import _validate_joins
        _validate_joins(ts, pq, alias_to_table)

        # predicates → prefixed names, plus __in__ markers (P8 semantics:
        # reference scardina/estimators.py:139-145)
        by_col: dict[str, list[Predicate]] = {}
        for p in normalize_predicates(pq.filters):
            t = alias_to_table.get(p.table or "", p.table)
            if t not in ts.tables:
                raise UnsupportedQueryError(f"predicate on unknown table: {p.c}")
            name = f"{t}.{p.column}"
            if name not in self.domains:
                raise UnsupportedQueryError(f"column not in model: {name}")
            by_col.setdefault(name, []).append(p)
        for t in sorted(q_tables):
            marker = f"__in__:{t}"
            if marker in self.domains:
                by_col.setdefault(marker, []).append(
                    Predicate(marker, "=", True))

        masks = {c: valid_mask(self.domains[c], ps)
                 for c, ps in by_col.items()}
        order = self._order_columns(masks)

        # divisor fanout columns (sampled, then divided by decoded value)
        div_cols = []
        for c in _divisor_cols(ts, q_tables):
            if c in self.constant_one_fanouts:
                continue
            if c not in self.domains:
                raise UnsupportedQueryError(f"fanout column not in model: {c}")
            div_cols.append(c)

        rs = np.random.RandomState(self.seed)
        S = self.sample_size
        codes = np.zeros((S, self.model.C), dtype=np.int64)
        mask = np.ones((S, self.model.C), dtype=bool)
        prob = np.ones(S)

        for c in order:
            j = self.model.cols.index(c)
            p = self._conditional(codes, mask, j)
            pm = p * masks[c][None, :]
            mass, drawn = self._draw(pm, masks[c] > 0, rs)
            prob *= mass
            codes[:, j] = drawn
            mask[:, j] = False

        for c in div_cols:
            j = self.model.cols.index(c)
            p = self._conditional(codes, mask, j)
            p[:, 1] = 0.0  # fanout columns are never NULL
            row_sum = np.maximum(p.sum(axis=1, keepdims=True), 1e-300)
            p = p / row_sum
            cdf = np.cumsum(p, axis=1)
            u = rs.rand(S, 1)
            drawn = (u > cdf).sum(axis=1)
            codes[:, j] = drawn
            mask[:, j] = False
            vals = self.domains[c].values
            fan = np.array([
                float(vals[d - 2]) if 2 <= d < len(vals) + 2 else 1.0
                for d in drawn])
            prob /= np.maximum(fan, 1.0)  # fanout ≥ 1 invariant
                                          # (reference: estimators.py:383)

        return float(self.ts.join_size) * float(prob.mean())


def train_join_estimator(ts: TreeSample, data_columns: list[str],
                         cfg: TrainConfig | None = None,
                         sample_size: int = 512,
                         max_rows: int = 200_000,
                         dictionaries=None) -> NarJoinEstimator:
    """Train the UR-mode model on ``ts``'s sample.

    ``data_columns`` are prefixed ``table.col`` names; existence markers
    and non-constant fanout columns are added automatically.  Constant-1
    fanout columns (FK→PK directions) are recorded and skipped at query
    time instead of wasting model capacity."""
    cfg = cfg or TrainConfig()
    samp = ts.sample

    markers = [c for c in samp.columns if c.startswith("__in__:")]
    fanouts = [c for c in samp.columns if "__adj_fanout__:" in c]
    # split fanouts into constant-1 (skippable) and informative
    aggs = [F.countDistinct(F.col(f"`{c}`")).alias(c) for c in fanouts]
    n_distinct = samp.agg(*aggs).collect()[0].asDict() if fanouts else {}
    informative = [c for c in fanouts if n_distinct.get(c, 1) > 1]
    constant1 = frozenset(c for c in fanouts if n_distinct.get(c, 1) <= 1)

    columns = list(data_columns) + markers + informative
    codes, domains = training_matrix(samp, columns, max_rows, cfg.seed,
                                     dictionaries=dictionaries)
    bins = [(c, domains[c].dom_size) for c in columns]
    model = NarMLP(bins, cfg)
    model.fit(codes)
    return NarJoinEstimator(
        model=model, domains=domains, n_rows=ts.join_size,
        sample_size=sample_size, seed=cfg.seed, ts=ts,
        constant_one_fanouts=constant1)
