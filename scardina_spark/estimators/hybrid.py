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
    SampleEstimator over the same tree sample (localized for latency).

    ``mode="zero"`` (default) applies only the zero short-circuit.
    ``mode="ci"`` additionally confines the learned estimate to the
    sample's ``k_sigma`` confidence band around its own HT estimate: the
    sample certifies both an unbiased estimate and its standard error,
    so a learned value outside ``ht ± k·se`` is, with known probability,
    model smoothing rather than signal — clamp to the nearer bound.  The
    model stays primary inside the band (where the sample cannot
    adjudicate); the band is tight exactly where the sample is sure.
    ``mode="arbiter"`` cross-validates the learned estimate against the
    HT estimate (plus the zero short-circuit) — the same protocol
    ``NarCinEstimator.sample_arbiter`` applies to chained estimates.
    When the two agree within ``gate``x, it returns their geometric mean
    (in log space the geomean halves the worst single-side error); when
    they disagree by MORE than ``gate``x, the disagreement itself is the
    signal — the sample is unbiased with known stderr, so a learned
    value that far outside it is model smoothing, and the arbiter falls
    back to the HT estimate entirely.  The hybrid q-error is therefore
    bounded by max(q_ht, q_ht * sqrt(gate)) — independent of how far the
    model tail drifts (the ungated sqrt(q_model * q_ht) bound degrades
    with the model; round-3 bench measured jm raw 5.22 -> hybrid 2.24,
    which motivated the gate)."""

    learned: object
    checker: object
    name: str = "nar-hybrid"
    mode: str = "zero"
    k_sigma: float = 3.0
    gate: float = 2.0

    def estimate(self, query) -> float:
        return self.clamp(query, self.learned.estimate(query))

    def clamp(self, query, est: float,
              ht_se: tuple[float, float | None] | None = None) -> float:
        """Apply the clamp to an already-computed learned estimate — lets
        callers that hold the estimate avoid re-running the progressive
        sampler.  ``ht_se`` optionally carries a precomputed
        ``checker.estimate_with_stderr`` pair so callers running several
        clamps over the same query pay the sample pass once (the point
        estimate is identical between ``estimate`` and
        ``estimate_with_stderr`` — same contribution fold)."""
        try:
            if ht_se is not None:
                ht, se = ht_se
                if self.mode != "ci":
                    se = None  # only the CI clamp consumes the band
            elif self.mode == "ci":
                ht, se = self.checker.estimate_with_stderr(query)
            else:
                ht, se = self.checker.estimate(query), None
        except (UnsupportedQueryError, ValueError):
            return est
        if ht == 0:
            return 0.0
        if self.mode == "arbiter":
            import math
            if est <= 0.0:
                return float(ht)
            ratio = est / ht
            if ratio > self.gate or ratio < 1.0 / self.gate:
                return float(ht)
            return float(math.sqrt(est * ht))
        if se is not None:
            lo = max(ht - self.k_sigma * se, 0.0)
            hi = ht + self.k_sigma * se
            return min(max(est, lo), hi)
        return est
