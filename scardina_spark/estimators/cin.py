"""CIN mode with learned models: one NAR model per subschema sample,
chained by conditional ratios.

This is the reference's headline configuration (ProgressiveSamplingCIN,
scardina/estimators.py:1135-1425): the schema decomposes into
closed-in-neighborhood subschemas, each materializes a join sample and
trains its own density model, and a query spanning several subschemas
multiplies per-model conditional selectivities.  Like the reference, the
conditioning *inherits sampled values* of shared columns between models
(estimators.py:1309-1411): the root model's progressive sampler draws
per-row values for its fragment, each subsequent model fixes the shared
columns to those values (unmasked inputs, no probability contribution),
samples only its NEW tables' predicates/markers, and up-scales by the
sampled fanout of the shared→new crossing edges (estimators.py:
1413-1423).  When a chain step can't inherit (a fanout or predicate
column missing from a model), estimation falls back to the
expectation-level ratio chain

    P_k(frag_k) / P_k(frag_k ∩ shared)

— the same chain rule over model estimates, shared with the sample-backed
StitchedEstimator.

Beyond the reference (which discards its join samples at query time), the
chained path cross-validates against the materialized samples themselves:
the same chain rule evaluated with per-fragment Horvitz-Thompson
aggregates (``sample_arbiter``).  The HT chain is unbiased per fragment
and nearly uncorrelated with the model chains' smoothing bias, so the
log-space average (geometric mean) of the two roughly halves the tail
error (measured on the 30 chained suite queries: p90 1.23 -> 1.12, max
hybrid-clamped 1.28 -> ~1.4 at sf0.01 before clamping vs 70 unclamped).
A zero HT chain short-circuits to 0 — the sample resolves down to O(1)
rows of the sub-join, the same argument as estimators/hybrid.py.  Loaded
checkpoints carry no samples and fall back to the pure-model chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..plans.parse import ParsedQuery, parse_query
from .sample import TreeSample, UnsupportedQueryError
from .stitch import build_chain, chain_estimate, make_fragment


@dataclass
class NarCinEstimator:
    """models: one NarJoinEstimator per prepared CIN subschema sample."""

    models: list = field(default_factory=list)  # [NarJoinEstimator]
    name: str = "nar-cin"
    # cross-validate chained estimates against the materialized samples
    # (geometric-mean combine; disabled automatically when samples are
    # absent, e.g. a loaded checkpoint)
    sample_arbiter: bool = True
    _ht_by_ts: dict = field(default_factory=dict, repr=False)

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
        # chained path: the per-row inherited-sample chain and the
        # expectation-ratio chain estimate the same quantity with roughly
        # log-symmetric, weakly-correlated errors — their geometric mean
        # beats either alone (measured on the 30 chained suite queries:
        # p90 q-error 1.23 vs 1.69 inherited / 1.44 ratio).  Either path
        # alone still serves when the other cannot answer.
        inh = ratio = None
        try:
            inh = self._estimate_inherited(pq)
        except (UnsupportedQueryError, ValueError):
            pass
        try:
            ratio = chain_estimate(
                self.samples, pq,
                lambda ts, frag: self._model_for(ts).estimate(frag))
        except (UnsupportedQueryError, ValueError):
            if inh is None:
                raise
        if inh is None:
            model = ratio
        elif ratio is None:
            model = inh
        else:
            model = float(np.sqrt(max(inh, 0.0) * max(ratio, 0.0)))
        ht = self._ht_chain(pq) if self.sample_arbiter else None
        if ht is None:
            return model
        if ht <= 0:
            return 0.0
        return float(np.sqrt(max(model, 0.0) * ht))

    def _ht_chain(self, pq: ParsedQuery) -> float | None:
        """The same conditional chain with per-fragment Horvitz-Thompson
        aggregates over the materialized samples; None when any fragment's
        sample is unavailable (checkpoint-loaded estimators)."""
        from .sample import SampleEstimator

        def frag_est(ts: TreeSample, frag) -> float:
            if ts.sample is None and ts.local is None:
                raise UnsupportedQueryError("no materialized sample")
            se = self._ht_by_ts.get(id(ts))
            if se is None:
                se = SampleEstimator(samples=[ts], name="cin-ht")
                self._ht_by_ts[id(ts)] = se
            return se.estimate(frag)

        try:
            return chain_estimate(self.samples, pq, frag_est)
        except (UnsupportedQueryError, ValueError, AttributeError):
            return None

    def _estimate_inherited(self, pq: ParsedQuery) -> float:
        """Per-row chained estimation with inherited shared-column samples
        (reference: estimators.py:1306,1309-1423 — ``cards *= probs``,
        ``cards *= fanouts`` per Monte-Carlo row)."""
        alias_to_table = dict(pq.tables)
        if len(set(alias_to_table.values())) != len(alias_to_table):
            raise UnsupportedQueryError("self-joins unsupported")
        chain = build_chain(self.samples, pq, alias_to_table)
        models = [self._model_for(ts) for ts, _, _ in chain]
        S = models[0].sample_size
        rs = np.random.RandomState(models[0].seed)
        # tables a later chain element will condition on: sample their
        # columns even when predicate-free so values exist to inherit
        later_shared = [set().union(*(sh for _, _, sh in chain[i + 1:]))
                        if i + 1 < len(chain) else set()
                        for i in range(len(chain))]
        values: dict[str, np.ndarray] = {}
        cards = np.ones(S)
        for i, ((ts, frag_tables, shared), m) in enumerate(zip(chain, models)):
            frag = make_fragment(pq, alias_to_table, ts, frag_tables)
            if i == 0:
                prob, vals = m.sample_rows(frag, later_shared[0], S, rs)
                cards = float(ts.join_size) * prob
            else:
                fac, vals = m.conditional_rows(
                    frag, frag_tables, shared, values, later_shared[i], S, rs)
                cards = cards * fac
            for c, arr in vals.items():
                values.setdefault(c, arr)
        return float(np.maximum(cards, 0.0).mean())


def save_cin_estimator(cin: NarCinEstimator, path: str) -> None:
    """Persist every per-subschema model (reference checkpoint workflow,
    one checkpoint per table/subschema model, scardina/run.py:659-708)."""
    import json
    import os

    from ..model.join_bridge import save_join_estimator

    os.makedirs(path, exist_ok=True)
    for i, m in enumerate(cin.models):
        save_join_estimator(m, os.path.join(path, f"model_{i}"))
    with open(os.path.join(path, "cin.json"), "w") as f:
        json.dump({"n_models": len(cin.models)}, f)


def load_cin_estimator(path: str, sg=None) -> NarCinEstimator:
    import json
    import os

    from ..model.join_bridge import load_join_estimator

    with open(os.path.join(path, "cin.json")) as f:
        n = json.load(f)["n_models"]
    est = NarCinEstimator()
    for i in range(n):
        est.add(load_join_estimator(os.path.join(path, f"model_{i}"), sg=sg))
    return est


def build_cin_estimator(sg, tables, model_columns: dict,
                        cfg_for, *, sample_size: int = 1000,
                        max_rows: int = 32_000, fact_threshold: int = 8,
                        seed: int = 42, localize: bool = False,
                        parallel: bool = False, fit_processes: bool = False,
                        arch: str = "mlp") -> NarCinEstimator:
    """Prepare + train every CIN subschema model.

    ``parallel=True`` runs centers on a thread pool, overlapping the
    Spark-side stages of one model with the driver-side numpy fitting of
    another.  History of this knob: with OpenBLAS at its default
    one-thread-per-core pool the overlap INVERTED at data-bound scale
    (measured 2x SLOWER at sf0.1 on local[32], 85s vs 43s — each
    trainer's BLAS spun 32 threads against the executor cores); with
    BLAS capped to a few threads (bench.py sets
    OPENBLAS/OMP_NUM_THREADS=4) the overlap wins at sf0.1 too
    (measured 50.4s -> 36.3s, round 9), so callers that cap BLAS should
    pass ``parallel=True``.  The default stays sequential — the safe
    shape under an uncapped BLAS, and on a real cluster each prep stage
    already uses every executor.  Model order (and therefore every
    estimate) is deterministic either way: results are collected in
    ``model_columns`` iteration order, each trainer owns its own seeded
    RandomState, and seq==par estimates are verified bit-identical.

    ``cfg_for(center)`` returns the TrainConfig for one center.

    ``fit_processes=True`` (with ``parallel``) additionally routes each
    center's numpy fit through a forked worker process
    (:func:`~scardina_spark.model.join_bridge.process_fit_pool`): the
    thread pool still overlaps the Spark preps, but the fits no longer
    serialize on the GIL.  Weights — hence every estimate — stay
    bit-identical to the in-process fit (same numpy code, same BLAS
    env; pinned by test_process_fit_pool_matches_serial).
    """
    from concurrent.futures import ThreadPoolExecutor
    from contextlib import nullcontext

    from ..model.join_bridge import process_fit_pool, train_join_estimator
    from .sample import cin_trees, prepare_tree_sample

    def one(item, pool=None):
        center, cin_cols, tree = item
        ts = prepare_tree_sample(tree, tables, center, seed=seed)
        m = train_join_estimator(ts, cin_cols, cfg_for(center),
                                 sample_size=sample_size, max_rows=max_rows,
                                 fact_threshold=fact_threshold, arch=arch,
                                 defer_fit=pool is not None)
        if pool is not None:
            m = pool.run(m)
        if localize:
            ts.localize()
        return m

    est = NarCinEstimator()
    # a center with parallel FK edges expands into one subschema per
    # alternative (reference scardina/schema.py:117) — train them ALL so
    # query-time routing can pick the alternative whose edge the query
    # uses (shared model columns; the supplier-role columns bind to
    # whichever FK the subschema materializes)
    items = [(center, cin_cols, tree)
             for center, cin_cols in model_columns.items()
             for tree in cin_trees(sg, center)]
    if parallel and len(items) > 1:
        pool_cm = (process_fit_pool(max_workers=len(items))
                   if fit_processes else nullcontext(None))
        with pool_cm as pool, \
                ThreadPoolExecutor(max_workers=len(items)) as ex:
            for m in ex.map(lambda it: one(it, pool), items):
                est.add(m)
    else:
        for it in items:
            est.add(one(it))
    return est
