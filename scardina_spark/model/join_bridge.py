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

from ..estimators.sample import (
    TreeSample, UnsupportedQueryError, _crossing_fanout_cols, _divisor_cols)
from ..plans.parse import ParsedQuery, parse_query
from ..plans.predicates import Predicate, normalize_predicates
from .bridge import training_matrix
from .nar import NarMLP, TrainConfig
from .progressive import MASK_SLOT, NarEstimator, valid_mask


def _require_local_values(dom, what: str) -> np.ndarray:
    """Guard for paths that need the collected value array: a
    DistributedDomain (huge dictionary, values never localized) cannot
    serve them — fail with a clear message instead of an AttributeError
    deep in numpy."""
    if dom.values is None:
        raise ValueError(
            f"{what} needs the collected dictionary values of "
            f"'{dom.name}', but its domain is distributed "
            f"(> DICT_DRIVER_CAP distinct values); use a driver-scale "
            f"dictionary for this column or skip the operation")
    return dom.values


def _decode_codes(dom, codes: np.ndarray) -> np.ndarray:
    """Dictionary codes → values (object array; MASK/NULL/OOD → None)."""
    _require_local_values(dom, "cross-model value decoding")
    out = np.empty(len(codes), dtype=object)
    out[:] = None
    ok = (codes >= 2) & (codes < len(dom.values) + 2)
    if ok.any():
        out[ok] = dom.values[codes[ok] - 2]
    return out


def _encode_values(dom, values: np.ndarray) -> np.ndarray:
    """Values (object array, None = NULL) → this model's codes; values
    outside the dictionary land on the NULL slot (the encode-side OOD
    convention, functions/dictionary.encode_with_dictionary)."""
    codes = np.full(len(values), 1, dtype=np.int64)
    nn = np.array([v is not None for v in values], dtype=bool)
    vals = _require_local_values(dom, "cross-model value encoding")
    if len(vals) and nn.any():
        arr = np.array([v for v in values[nn]], dtype=vals.dtype)
        idx = np.searchsorted(vals, arr)
        idx = np.minimum(idx, len(vals) - 1)
        match = vals[idx] == arr
        codes[nn] = np.where(match, idx + 2, 1)
    return codes


def _col_table(col: str) -> str | None:
    """Owning table of a sample column: ``t.col`` → t, ``__in__:t`` → t."""
    if col.startswith("__in__:"):
        return col.split(":", 1)[1]
    if "." in col:
        return col.split(".", 1)[0]
    return None


def _is_data_col(col: str) -> bool:
    return not col.startswith("__in__:") and "__adj_fanout__:" not in col


@dataclass
class NarJoinEstimator(NarEstimator):
    """NarEstimator over a join sample: multi-table queries, existence
    markers, fanout scaling."""

    ts: TreeSample | None = None
    constant_one_fanouts: frozenset = frozenset()
    continuous: frozenset = frozenset()  # cont-fanout columns (log2-regressed)
    name: str = "nar-ur"
    # eval-time skip of near-key common columns when sampling values for
    # chained inheritance (the reference's skip-high-cardinality
    # heuristic, scardina/estimators.py:206-209; disable flag
    # run.py:164 ``--eval-disable-skip-high-card-cols``).  False samples
    # EVERY ahead-table data column regardless of dictionary size.
    skip_high_card_cols: bool = True

    # -- fragment preparation ---------------------------------------------

    def _fragment_cols(self, pq: ParsedQuery, marker_tables: set[str]
                       ) -> dict[str, list[Predicate]]:
        """Predicates → prefixed model columns, plus ``__in__`` markers for
        ``marker_tables`` (P8 semantics: reference scardina/estimators.py:
        139-145)."""
        alias_to_table = dict(pq.tables)
        ts = self.ts
        by_col: dict[str, list[Predicate]] = {}
        for p in normalize_predicates(pq.filters):
            if p.o.upper() == "OR" and len({b.c for b in p.branches}) > 1:
                # the valid-mask machinery is per-column; a cross-column
                # disjunction has no mask factorization (route such
                # queries to the sample/exact estimators instead)
                raise UnsupportedQueryError(
                    "OR across different columns is not supported by the "
                    "learned estimator")
            t = alias_to_table.get(p.table or "", p.table)
            if t not in ts.tables:
                raise UnsupportedQueryError(f"predicate on unknown table: {p.c}")
            name = f"{t}.{p.column}"
            if name not in self.domains:
                raise UnsupportedQueryError(f"column not in model: {name}")
            by_col.setdefault(name, []).append(p)
        for t in sorted(marker_tables):
            marker = f"__in__:{t}"
            if marker in self.domains:
                by_col.setdefault(marker, []).append(
                    Predicate(marker, "=", True))
        return by_col

    def _fanout_cols(self, edge_cols: list[str]) -> list[str]:
        out = []
        for c in edge_cols:
            if c in self.constant_one_fanouts:
                continue
            if c not in self.domains and c not in self.continuous:
                raise UnsupportedQueryError(f"fanout column not in model: {c}")
            out.append(c)
        return out

    def _extra_cols(self, ahead_tables: set[str], sampled: set[str]) -> list[str]:
        """Predicate-free data columns of ``ahead_tables`` worth sampling so
        a later chained model can condition on their values (reference:
        common columns sampled for inheritance, scardina/estimators.py:
        1380-1393).  With ``skip_high_card_cols`` (default, the
        reference's eval heuristic, estimators.py:206-209), near-key
        columns — dictionary larger than half the sample, the sample
        playing the reference's table-size role since dictionaries are
        sample-built here — are skipped: conditioning on an almost-unique
        inherited value adds variance without tightening the chain."""
        cap = (max(64, self.ts.n_sample // 2)
               if self.skip_high_card_cols else None)
        return sorted(
            c for c, dom in self.domains.items()
            if c not in sampled and _is_data_col(c)
            and _col_table(c) in ahead_tables
            and (cap is None or dom.dom_size <= cap))

    # -- progressive core --------------------------------------------------

    def _progressive(self, by_col: dict[str, list[Predicate]],
                     inherited: dict[str, np.ndarray],
                     div_cols: list[str], mult_cols: list[str],
                     extra_cols: list[str], S: int,
                     rs: np.random.RandomState
                     ) -> tuple[np.ndarray, dict[str, np.ndarray]]:
        """One progressive-sampling pass: condition on ``inherited`` codes
        (fixed, unmasked, no probability contribution), sample the
        ``by_col`` predicate columns in selectivity order accumulating
        per-row masses, then ``extra_cols`` unconstrained (mass 1), then
        fanout columns — dividing by ``div_cols`` draws (unused-table
        multiplicity) and multiplying by ``mult_cols`` draws (new-fragment
        up-scaling, reference estimators.py:1413-1423).

        Returns (per-row factors [S], sampled codes per column)."""
        dtype = np.float64 if self.continuous else np.int64
        codes = np.zeros((S, self.model.C), dtype=dtype)
        mask = np.ones((S, self.model.C), dtype=bool)
        prob = np.ones(S)
        for c, inh in inherited.items():
            # full dictionary codes; split into sub-codes when factorized
            self.set_inherited(c, codes, mask, inh)

        sampled: dict[str, np.ndarray] = {}
        masks = {c: valid_mask(self.domains[c], ps)
                 for c, ps in by_col.items()}
        for c in self._order_columns(masks):
            # group-aware draw: factorized columns sample their bit-window
            # sub-columns most-significant-first under projected masks
            # (P4/P6) and return the reconstructed full code
            mass, full = self._sample_masked_col(c, masks[c], codes, mask, rs)
            prob *= mass
            sampled[c] = full

        for c in extra_cols:
            # unconstrained (mass 1): everything valid except the MASK slot
            m = np.ones(self.domains[c].dom_size)
            m[MASK_SLOT] = 0.0
            _, full = self._sample_masked_col(c, m, codes, mask, rs)
            sampled[c] = full

        for sign, cols in ((-1, div_cols), (+1, mult_cols)):
            for c in cols:
                j = self.model.cols.index(c)
                if c in self.continuous:
                    # regressed log2 fanout, decoded 2**x, clamp ≥ 1
                    # (reference: scardina/estimators.py:374-376)
                    val = self.model.regress_for(codes, mask, j)
                    codes[:, j] = val
                    mask[:, j] = False
                    fan = np.maximum(np.exp2(val), 1.0)
                    prob = prob / fan if sign < 0 else prob * fan
                    continue
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
                fan = np.maximum(fan, 1.0)  # fanout ≥ 1 invariant
                                            # (reference: estimators.py:383)
                prob = prob / fan if sign < 0 else prob * fan
        return prob, sampled

    def _validate_fragment(self, pq: ParsedQuery) -> set[str]:
        alias_to_table = dict(pq.tables)
        if len(set(alias_to_table.values())) != len(alias_to_table):
            raise UnsupportedQueryError("self-joins unsupported")
        q_tables = set(alias_to_table.values())
        if not q_tables <= self.ts.tables:
            raise UnsupportedQueryError(
                f"tables {sorted(q_tables - self.ts.tables)} not in model tree")
        from ..estimators.sample import _validate_joins
        _validate_joins(self.ts, pq, alias_to_table)
        return q_tables

    def estimate(self, query: ParsedQuery | str) -> float:
        pq = parse_query(query) if isinstance(query, str) else query
        q_tables = self._validate_fragment(pq)
        by_col = self._fragment_cols(pq, q_tables)
        div_cols = self._fanout_cols(_divisor_cols(self.ts, q_tables))
        rs = np.random.RandomState(self.seed)
        prob, _ = self._progressive(by_col, {}, div_cols, [], [],
                                    self.sample_size, rs)
        return float(self.ts.join_size) * float(prob.mean())

    # -- chained (inherited-sample) API -----------------------------------

    def sample_rows(self, pq: ParsedQuery, ahead_tables: set[str], S: int,
                    rs: np.random.RandomState
                    ) -> tuple[np.ndarray, dict[str, np.ndarray]]:
        """Root-of-chain pass: per-row probabilities for the fragment plus
        sampled *values* (decoded) of its columns for inheritance."""
        q_tables = self._validate_fragment(pq)
        by_col = self._fragment_cols(pq, q_tables)
        div_cols = self._fanout_cols(_divisor_cols(self.ts, q_tables))
        extra = self._extra_cols(ahead_tables & q_tables, set(by_col))
        prob, sampled = self._progressive(by_col, {}, div_cols, [], extra,
                                          S, rs)
        return prob, self._decode_sampled(sampled)

    def conditional_rows(self, pq: ParsedQuery, frag_tables: set[str],
                         shared: set[str], values: dict[str, np.ndarray],
                         ahead_tables: set[str], S: int,
                         rs: np.random.RandomState
                         ) -> tuple[np.ndarray, dict[str, np.ndarray]]:
        """Chained pass (reference inherited-sample stitching, scardina/
        estimators.py:1309-1411): condition on the shared tables' inherited
        values, sample only the NEW tables' predicates and markers, and
        up-scale by the sampled fanouts of the edges crossing shared→new.
        Returns per-row factors and this model's newly sampled values."""
        self._validate_fragment(pq)
        new = frag_tables - shared
        by_col = self._fragment_cols(
            _restrict_filters(pq, new), new)
        inherited: dict[str, np.ndarray] = {}
        for c, vals in values.items():
            if _col_table(c) in shared and c in self.domains:
                inherited[c] = _encode_values(self.domains[c], vals)
        div_cols = self._fanout_cols(_divisor_cols(self.ts, frag_tables))
        mult_cols = self._fanout_cols(
            _crossing_fanout_cols(self.ts, shared, new))
        extra = self._extra_cols(ahead_tables & new, set(by_col))
        prob, sampled = self._progressive(by_col, inherited, div_cols,
                                          mult_cols, extra, S, rs)
        return prob, self._decode_sampled(sampled)

    def _decode_sampled(self, sampled: dict[str, np.ndarray]
                        ) -> dict[str, np.ndarray]:
        return {c: _decode_codes(self.domains[c], drawn)
                for c, drawn in sampled.items() if _is_data_col(c)
                or c.startswith("__in__:")}


def _restrict_filters(pq: ParsedQuery, tables: set[str]) -> ParsedQuery:
    """Copy of ``pq`` keeping only filters on ``tables``."""
    a2t = dict(pq.tables)
    from ..plans.predicates import pred_tables
    kept = []
    for p in pq.filters:
        tset = {a2t.get(a or "", a) for a in pred_tables(p)}
        if tset <= set(tables):
            kept.append(p)
        elif tset & set(tables):
            # an OR group straddling the restriction boundary cannot be
            # routed to either side without changing semantics
            raise UnsupportedQueryError(
                f"OR group spans tables {sorted(tset)} across the "
                f"chain-fragment boundary")
    return ParsedQuery(tables=pq.tables, joins=pq.joins, filters=kept,
                       sql=pq.sql)


class DeferredFit:
    """A fully-prepared training job whose numpy ``fit`` has not run
    yet: the Spark side (sample prep, encode, training matrix) is done,
    and ``model``/``mat`` are plain driver objects.  Exists so callers
    training SEVERAL models can run the fits in forked worker
    PROCESSES (:func:`process_fit_pool`) instead of GIL-sharing
    threads — the fit is identical numpy code either way, so the
    trained weights are bit-identical to the in-process path (pinned
    by test_process_fit_pool_matches_serial)."""

    def __init__(self, model, mat, kwargs: dict):
        self.model = model
        self.mat = mat
        self.kwargs = kwargs

    def finish(self, fitted_model=None) -> "NarJoinEstimator":
        """Fit (unless a fitted model is supplied) and assemble the
        estimator — the tail of :func:`train_join_estimator`."""
        m = fitted_model
        if m is None:
            self.model.fit(self.mat)
            m = self.model
        return NarJoinEstimator(model=m, **self.kwargs)


def _fit_worker(payload):
    model, mat = payload
    model.fit(mat)
    return model


class _ProcessFitPool:
    """See :func:`process_fit_pool`."""

    def __init__(self, ex):
        self._ex = ex

    def run(self, deferred: "DeferredFit") -> "NarJoinEstimator":
        if self._ex is None:
            return deferred.finish()
        fut = self._ex.submit(_fit_worker, (deferred.model, deferred.mat))
        return deferred.finish(fitted_model=fut.result())


from contextlib import contextmanager  # noqa: E402


@contextmanager
def process_fit_pool(max_workers: int | None = None):
    """Forked-process executor for :class:`DeferredFit` numpy fits.

    Multi-model builds (CIN centers, per-variant UR models) previously
    overlapped on a thread pool: the Spark preps genuinely parallelize
    (py4j releases the GIL), but the numpy fits only overlap during
    BLAS sections — the Python-level training loop serializes on the
    GIL.  Forked workers run the fits truly concurrently; the fit is
    the same numpy code with the same BLAS thread env, so the weights
    are bit-identical to the in-process fit.  Only (model, matrix)
    cross the process boundary — never Spark objects; the forked child
    inherits but never touches the JVM gateway (the same fork contract
    pyspark's own daemon workers rely on).  Falls back to in-process
    fits where fork is unavailable."""
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    try:
        ctx = mp.get_context("fork")
    except ValueError:  # pragma: no cover - non-POSIX
        yield _ProcessFitPool(None)
        return
    with ProcessPoolExecutor(max_workers=max_workers,
                             mp_context=ctx) as ex:
        yield _ProcessFitPool(ex)


def train_join_estimator(ts: TreeSample, data_columns: list[str],
                         cfg: TrainConfig | None = None,
                         sample_size: int = 512,
                         max_rows: int = 200_000,
                         dictionaries=None,
                         cont_fanout: bool = False,
                         fact_threshold: int | None = None,
                         arch: str = "mlp",
                         defer_fit: bool = False) -> NarJoinEstimator:
    """Train the UR-mode model on ``ts``'s sample.

    ``data_columns`` are prefixed ``table.col`` names; existence markers
    and non-constant fanout columns are added automatically.  Constant-1
    fanout columns (FK→PK directions) are recorded and skipped at query
    time instead of wasting model capacity.  ``cont_fanout`` stores
    fanouts as regressed log2 floats instead of dictionary codes (the
    reference's ``--cont-fanout``, scardina/common.py:536-548).

    With ``fact_threshold``, data columns whose dictionary exceeds
    ``2**fact_threshold`` codes are bit-slice factorized (M2, reference
    scardina/common.py:137-196): near-continuous columns (prices,
    timestamps) would otherwise each add a domain-wide softmax head that
    dominates the training cost."""
    from ..functions.factorize import factorization_spec
    from .progressive import ColumnGroup

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
    cont = frozenset(informative) if cont_fanout else frozenset()
    # __sample_id__ is the sample's unique key: the id-hash cap makes
    # the training matrix (hence the model) layout-independent
    codes, domains = training_matrix(samp, columns, max_rows, cfg.seed,
                                     dictionaries=dictionaries,
                                     cont_log2=set(cont),
                                     id_cols=["__sample_id__"])
    bins: list[tuple[str, int]] = []
    mat_cols: list[np.ndarray] = []
    groups: dict[str, ColumnGroup] = {}
    for ci, c in enumerate(columns):
        dom = domains[c].dom_size if c in domains else 0
        spec = (factorization_spec(c, dom, fact_threshold)
                if fact_threshold and c in data_columns else None)
        if spec is None or not spec.is_factorized:
            bins.append((c, dom))
            mat_cols.append(codes[:, ci])
            continue
        idxs = []
        full = codes[:, ci].astype(np.int64)
        for sub in spec.sub_cols:
            idxs.append(len(bins))
            bins.append((sub.name, sub.dist_size))
            mat_cols.append(((full >> sub.offset)
                             & ((1 << sub.window) - 1)) + 1)
        groups[c] = ColumnGroup(c, idxs, spec)
    dtype = np.float64 if cont else np.int64
    if arch == "mlp":
        model = NarMLP(bins, cfg, continuous=cont)
    elif arch == "trm":
        # the Transformer head is categorical-only (like the reference's
        # default; cont-fanout pairs with the MLP)
        if cont:
            raise ValueError("cont_fanout requires arch='mlp'")
        from .transformer import NarTransformer, TrmConfig
        tcfg = cfg if isinstance(cfg, TrmConfig) else TrmConfig(
            d_word=cfg.d_word, d_ff=cfg.d_ff, epochs=cfg.epochs,
            batch_size=cfg.batch_size, lr=cfg.lr, seed=cfg.seed)
        model = NarTransformer(bins, tcfg)
    else:
        raise ValueError(f"unknown arch: {arch}")
    mat = np.stack(mat_cols, axis=1).astype(dtype)
    kwargs = dict(domains=domains, n_rows=ts.join_size,
                  sample_size=sample_size, seed=cfg.seed, ts=ts,
                  constant_one_fanouts=constant1, continuous=cont,
                  groups=groups or None)
    if defer_fit:
        # ``defer_fit=True`` hands back the (model, matrix) pair with
        # the estimator-assembly kwargs so multi-model callers can run
        # the numpy fits in forked processes (process_fit_pool) —
        # identical weights, true parallelism
        return DeferredFit(model, mat, kwargs)
    model.fit(mat)
    return NarJoinEstimator(model=model, **kwargs)


def fine_tune_join_estimator(est: NarJoinEstimator,
                             refreshed_ts: "TreeSample",
                             epochs: int | None = None,
                             max_rows: int = 200_000,
                             seed: int = 43) -> NarJoinEstimator:
    """Incremental JOIN-model refresh — the model leg of the
    streaming→model loop (the sample leg is
    ``operators/incremental.streaming_refresh_tree_sample``): continue
    training the fitted UR model on the REFRESHED mixture sample.

    The mixture is an iid draw of the grown join (old and delta rows in
    exact proportion — the binomial split in append_refresh), so
    warm-starting on it adapts the model toward the post-append
    distribution without overweighting the shard; dictionaries stay
    frozen (OOD delta values encode as NULL — a domain-growing append
    warrants re-prep, same contract as ``fine_tune_single_table``).
    ``n_rows`` — the COUNT(*) scale factor — is set to the refreshed
    join size EXACTLY (maintained incrementally by the refresh, root
    count for fact-rooted trees), and the estimator's sample handle is
    swapped so hybrid clamping sees the fresh mixture too."""
    if est.continuous:
        raise ValueError(
            "cont-fanout join models regress log2 fanouts whose codes "
            "are not re-derivable under frozen domains — retrain instead")
    from .bridge import fine_tune_single_table
    est = fine_tune_single_table(est, refreshed_ts.sample, epochs=epochs,
                                 max_rows=max_rows, seed=seed)
    est.n_rows = refreshed_ts.join_size
    est.ts = refreshed_ts
    return est


# -- persistence (the reference's checkpoint-eval workflow: train once,
# -- load + estimate many times; scardina/run.py:659-708, 770-788) ---------

def save_join_estimator(est: NarJoinEstimator, path: str) -> None:
    """Persist a trained join estimator to ``path`` (a directory).

    The join SAMPLE is deliberately NOT saved: ``estimate()`` never touches
    it (queries run against the model + domains), and the chained CIN path
    reads only its scalar metadata.  What goes to disk: the model weights
    (``model.npz``), the per-column dictionaries (``domains.npz``), and a
    JSON sidecar with the tree identity + scaling metadata.
    """
    import json
    import os

    from .transformer import NarTransformer
    if not isinstance(est.model, (NarMLP, NarTransformer)):
        raise ValueError(f"unsupported model type: {type(est.model)}")
    os.makedirs(path, exist_ok=True)
    est.model.save(os.path.join(path, "model.npz"))
    doms = {}
    for i, (c, dom) in enumerate(est.domains.items()):
        vals = _require_local_values(dom, "estimator checkpointing")
        if vals.dtype == object:
            vals = vals.astype(np.str_)  # no pickle in the npz
        doms[f"dom_{i}"] = vals
    np.savez_compressed(os.path.join(path, "domains.npz"), **doms)
    meta = {
        "dom_cols": list(est.domains.keys()),
        "tree_tables": sorted(est.ts.tables),
        "tree_rels": sorted(str(r) for r in est.ts.tree.rels),
        "tree_center": est.ts.tree.center,
        "root": est.ts.root,
        "join_size": est.ts.join_size,
        "n_sample": est.ts.n_sample,
        "sample_size": est.sample_size,
        "seed": est.seed,
        "constant_one_fanouts": sorted(est.constant_one_fanouts),
        "continuous": sorted(est.continuous),
        "fact_groups": {c: g.spec.threshold
                        for c, g in (est.groups or {}).items()},
        "arch": "mlp" if isinstance(est.model, NarMLP) else "trm",
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_join_estimator(path: str, sg=None) -> NarJoinEstimator:
    """Rebuild a served estimator from ``save_join_estimator`` output.

    The subschema tree is reconstructed from the schema graph (driver-side
    metadata, not data): the saved table set picks between the CIN tree of
    the saved center and the UR spanning tree of the saved root.
    Factorization groups rebuild deterministically from each column's
    domain size + threshold."""
    import json
    import os

    from ..catalog import build_tpch_schema
    from ..estimators.sample import cin_tree, spanning_tree
    from ..functions.factorize import factorization_spec
    from .progressive import ColumnDomain, ColumnGroup

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("arch") == "trm":
        from .transformer import NarTransformer
        model = NarTransformer.load(os.path.join(path, "model.npz"))
    else:
        model = NarMLP.load(os.path.join(path, "model.npz"))
    z = np.load(os.path.join(path, "domains.npz"), allow_pickle=False)
    domains = {c: ColumnDomain(c, z[f"dom_{i}"])
               for i, c in enumerate(meta["dom_cols"])}

    sg = sg or build_tpch_schema()

    def _matches(t) -> bool:
        if sorted(t.tables) != meta["tree_tables"]:
            return False
        saved_rels = meta.get("tree_rels")
        # table-set equality alone can collide across tree kinds in richer
        # schemas; the edge list is the tree's identity
        return saved_rels is None or \
            sorted(str(r) for r in t.rels) == saved_rels

    tree = cin_tree(sg, meta["tree_center"])
    if not _matches(tree):
        tree = spanning_tree(sg, meta["root"])
    if not _matches(tree):
        raise ValueError(
            f"saved tree (tables {meta['tree_tables']}) matches neither the "
            f"CIN tree of {meta['tree_center']} nor the spanning tree of "
            f"{meta['root']} in this schema")
    ts = TreeSample(tree=tree, root=meta["root"], sample=None,
                    join_size=int(meta["join_size"]),
                    n_sample=int(meta["n_sample"]))

    groups = {}
    for c, thr in meta["fact_groups"].items():
        spec = factorization_spec(c, domains[c].dom_size, thr)
        idxs = [model.cols.index(sub.name) for sub in spec.sub_cols]
        groups[c] = ColumnGroup(c, idxs, spec)

    return NarJoinEstimator(
        model=model, domains=domains, n_rows=int(meta["join_size"]),
        sample_size=int(meta["sample_size"]), seed=int(meta["seed"]), ts=ts,
        constant_one_fanouts=frozenset(meta["constant_one_fanouts"]),
        continuous=frozenset(meta["continuous"]),
        groups=groups or None)
