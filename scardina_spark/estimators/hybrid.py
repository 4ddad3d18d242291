"""Sampling-verified learned estimation.

Learned density models smooth: a conjunction with zero satisfying rows
still receives a small positive mass, which the join-size multiplier
inflates into a visible overestimate (q-error = est under the zero
conventions, reference scardina/run.py:60-67).  The materialized join
sample already answers the complementary question exactly: if an unbiased
sample of the join contains NO satisfying row, the true cardinality is
below the sample's resolution (join_size / n_sample) with high
probability — for the clamped sample sizes used here (>= 1e5 rows of a
join within 6x of that), that resolution is O(1) rows.

HybridEstimator therefore routes each query through the learned model,
but short-circuits to 0 when the sample-backed estimator reports 0.  The
sample is already materialized (the model trained on it), so the check
adds one vectorized predicate evaluation over the cached/localized
sample, no extra prep.
"""

from __future__ import annotations

from dataclasses import dataclass

from .sample import UnsupportedQueryError


@dataclass
class HybridEstimator:
    """learned: any estimator with .estimate(sql); checker: a
    SampleEstimator over the same tree sample (localized for latency)."""

    learned: object
    checker: object
    name: str = "nar-hybrid"

    def estimate(self, query) -> float:
        return self.clamp(query, self.learned.estimate(query))

    def clamp(self, query, est: float) -> float:
        """Apply the zero short-circuit to an already-computed learned
        estimate — lets callers that hold the estimate avoid re-running
        the progressive sampler."""
        try:
            ht = self.checker.estimate(query)
        except (UnsupportedQueryError, ValueError):
            return est
        if ht == 0:
            return 0.0
        return est
