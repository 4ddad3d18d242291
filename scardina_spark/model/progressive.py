"""Progressive sampling over the NAR model + dictionary-domain valid masks.

Reference semantics (NOT code):
* valid masks (P5, scardina/estimators.py:673-793): every predicate is
  evaluated over the column's sorted distinct-value DICTIONARY, not base
  rows, producing a {0,1} vector over the code domain; MASK slot forced 0;
  the NULL slot is set only by IS [NOT] NULL.
* progressive sampling (M6, scardina/estimators.py:177-408): predicate
  columns are visited in a selectivity order; at each step the model's
  conditional distribution over the column is multiplied by the valid
  mask; the masked mass is the conditional selectivity; a value is drawn
  from the renormalized masked distribution and conditioning continues.
  Vanished rows (zero mass) fall back to uniform over the valid domain
  with probability contribution 0.
* column ordering (O4, scardina/estimators.py:833-910): 'prop-ratio'
  default = valid-mass / domain-size ascending (most selective first).

Estimate = table_rows × mean over samples of Π conditional selectivities.

The Spark side supplies: dictionaries (collected to numpy — domain-sized,
driver-safe), the encoded sample matrix for training, and exact truth for
evaluation.  Query-time inference is pure numpy on the driver — the same
deployment shape as the reference (GPU/CPU inference next to the planner,
no cluster round-trip per query).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..plans.parse import ParsedQuery, parse_query
from ..plans.predicates import Predicate, normalize_predicates
from .nar import NarMLP

MASK_SLOT = 0
NULL_SLOT = 1


@dataclass
class ColumnDomain:
    """Sorted distinct values of a column; index i ↔ code i+2."""

    name: str
    values: np.ndarray

    @property
    def dom_size(self) -> int:
        return len(self.values) + 2


def _like_regex(pattern: str) -> re.Pattern:
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out))


def valid_mask(dom: ColumnDomain, preds: list[Predicate]) -> np.ndarray:
    """{0,1} float mask over the code domain [dom_size] combining all
    predicates on this column (AND).  MASK slot 0; NULL slot per IS/IS NOT."""
    vals = dom.values
    m = np.ones(dom.dom_size)
    m[MASK_SLOT] = 0.0
    null_ok = None  # tri-state: None = follow value-predicates (NULL fails)
    vm = np.ones(len(vals), dtype=bool)
    for p in preds:
        o = p.o.upper()
        if o == "IS":
            null_ok = True
            vm &= np.zeros(len(vals), dtype=bool)
        elif o == "IS NOT":
            null_ok = False
        elif o == "=":
            vm &= vals == p.v
        elif o == "!=":
            vm &= vals != p.v
        elif o == ">":
            vm &= vals > p.v
        elif o == ">=":
            vm &= vals >= p.v
        elif o == "<":
            vm &= vals < p.v
        elif o == "<=":
            vm &= vals <= p.v
        elif o == "IN":
            vm &= np.isin(vals, np.array(list(p.v)))
        elif o == "LIKE":
            rx = _like_regex(str(p.v))
            vm &= np.array([bool(rx.fullmatch(str(v))) for v in vals])
        elif o == "NOT LIKE":
            rx = _like_regex(str(p.v))
            vm &= np.array([not rx.fullmatch(str(v)) for v in vals])
        elif o == "ALL_TRUE":
            pass
        elif o == "ALL_FALSE":
            vm &= np.zeros(len(vals), dtype=bool)
        else:
            raise ValueError(f"unsupported op in valid mask: {p.o}")
    m[2:] = vm.astype(float)
    if null_ok is None or null_ok is False:
        m[NULL_SLOT] = 0.0
    else:
        m[NULL_SLOT] = 1.0
    return m


@dataclass
class NarEstimator:
    """Single-relation progressive-sampling estimator (the reference's
    one-table path, scardina/estimators.py:925-927; multi-table queries
    route to the sample/CIN estimators)."""

    model: NarMLP
    domains: dict[str, ColumnDomain]
    n_rows: int
    sample_size: int = 512
    seed: int = 42
    name: str = "nar-mlp"

    def estimate(self, query: ParsedQuery | str) -> float:
        pq = parse_query(query) if isinstance(query, str) else query
        if len(pq.tables) != 1:
            raise ValueError("NarEstimator answers single-table queries")
        preds = normalize_predicates(pq.filters)
        by_col: dict[str, list[Predicate]] = {}
        for p in preds:
            if p.column not in self.model.cols:
                raise ValueError(f"column not in model: {p.column}")
            by_col.setdefault(p.column, []).append(p)
        if not by_col:
            return float(self.n_rows)

        masks = {
            c: valid_mask(self.domains[c], ps) for c, ps in by_col.items()}
        # prop-ratio ordering: valid-mass / domain ascending
        order = sorted(masks, key=lambda c: (masks[c].sum()
                                             / self.domains[c].dom_size, c))

        rs = np.random.RandomState(self.seed)
        S = self.sample_size
        codes = np.zeros((S, self.model.C), dtype=np.int64)
        mask = np.ones((S, self.model.C), dtype=bool)  # all masked initially
        prob = np.ones(S)

        for c in order:
            j = self.model.cols.index(c)
            logits = self.model.logits_for(codes, mask, j)
            logits[:, MASK_SLOT] = -1e9
            z = logits - logits.max(axis=1, keepdims=True)
            p = np.exp(z)
            p /= p.sum(axis=1, keepdims=True)
            pm = p * masks[c][None, :]
            mass = pm.sum(axis=1)
            prob *= mass
            # renormalize; vanished rows -> uniform over valid slots
            # (reference: estimators.py:240-243)
            valid_slots = masks[c] > 0
            safe = pm.copy()
            dead = mass <= 0
            if dead.any() and valid_slots.any():
                safe[dead] = valid_slots.astype(float)
            safe /= np.maximum(safe.sum(axis=1, keepdims=True), 1e-300)
            # vectorized multinomial draw via inverse CDF
            cdf = np.cumsum(safe, axis=1)
            u = rs.rand(S, 1)
            drawn = (u > cdf).sum(axis=1)
            codes[:, j] = drawn
            mask[:, j] = False

        return float(self.n_rows) * float(prob.mean())
