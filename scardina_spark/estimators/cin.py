"""CIN mode with learned models: one NAR model per subschema sample,
chained by conditional ratios.

This is the reference's headline configuration (ProgressiveSamplingCIN,
scardina/estimators.py:1135-1425): the schema decomposes into
closed-in-neighborhood subschemas, each materializes a join sample and
trains its own density model, and a query spanning several subschemas
multiplies per-model conditional selectivities.  The reference conditions
by *inheriting sampled values* of shared columns between models; here the
conditioning is the expectation-level ratio

    P_k(frag_k) / P_k(frag_k ∩ shared)

— the same chain rule, stated over model estimates instead of per-row
inherited samples, reusing the identical cover/chain machinery as the
sample-backed StitchedEstimator.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..plans.parse import ParsedQuery, parse_query
from .sample import TreeSample, UnsupportedQueryError
from .stitch import chain_estimate


@dataclass
class NarCinEstimator:
    """models: one NarJoinEstimator per prepared CIN subschema sample."""

    models: list = field(default_factory=list)  # [NarJoinEstimator]
    name: str = "nar-cin"

    def add(self, model) -> None:
        self.models.append(model)

    @property
    def samples(self) -> list[TreeSample]:
        return [m.ts for m in self.models]

    def _model_for(self, ts: TreeSample):
        for m in self.models:
            if m.ts is ts:
                return m
        raise UnsupportedQueryError(f"no model for sample {ts.tree.name}")

    def estimate(self, query: ParsedQuery | str) -> float:
        pq = parse_query(query) if isinstance(query, str) else query
        # single-model fast path: smallest covering subschema
        candidates = sorted(
            (m for m in self.models
             if set(pq.tables.values()) <= m.ts.tables),
            key=lambda m: (len(m.ts.tables), m.ts.tree.name))
        for m in candidates:
            try:
                return m.estimate(pq)
            except UnsupportedQueryError:
                continue
        return chain_estimate(
            self.samples, pq,
            lambda ts, frag: self._model_for(ts).estimate(frag))
