"""Hyperparameter search over the NAR models (M8).

Reference semantics (NOT code): scardina/run.py:611-708 — a search over
{d_word, d_ff, ...} scored by validation loss, best config exported.  The
reference drives Ray Tune + Optuna + ASHA; here two deterministic
drivers cover the same protocol:

* ``grid_search`` — exhaustive over the (small) space, every trial at
  full budget; and
* ``asha_search`` — the reference's ASHA SCHEDULER semantics made
  deterministic: successive-halving rungs (epoch budgets r, r·eta,
  r·eta², ...), each rung keeping the top 1/eta configs by validation
  loss (ties broken by config, so the run is reproducible), survivors
  retrained at the next budget from the same seed.  Synchronous rather
  than async (no worker pool here — promotion decisions see the whole
  rung, which is ASHA's limit behavior), and early-stopped configs
  really do cost only their rung budget — the resource-adaptivity the
  reference gets from Ray's scheduler; and
* ``tpe_search`` — the reference's Optuna TPE SAMPLER semantics
  (Bergstra et al., NIPS'11 categorical TPE) made deterministic: a
  fixed maximin startup spread replaces the random startup, then each
  trial splits history at the gamma-quantile of validation loss into
  good/bad sets, scores every untried config by the product of
  per-dimension smoothed density ratios l(v)/g(v) (the
  EI-proportional acquisition), and trains the argmax (ties broken by
  config).  No RNG anywhere, so every promotion/pick decision is
  externally re-checkable.

Both use a seeded 90/10 train/validation split (validation capped at
10k rows, matching scardina/common.py:597-608); each trial is seconds
of NumPy.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from .nar import NarMLP, TrainConfig, _softmax


def train_val_split(codes: np.ndarray, seed: int = 42,
                    val_frac: float = 0.1, val_cap: int = 10_000
                    ) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    n = codes.shape[0]
    order = rs.permutation(n)
    n_val = min(int(n * val_frac), val_cap)
    return codes[order[n_val:]], codes[order[:n_val]]


def masked_val_loss(model, codes: np.ndarray, seed: int = 7) -> float:
    """Deterministic-seeded validation loss (reference:
    scardina/models.py:356-391 uses a fixed seed per validation pass)."""
    rs = np.random.RandomState(seed)
    C = model.C
    n_mask = max(1, C // 2)
    mask = np.zeros(codes.shape, dtype=bool)
    for i in range(codes.shape[0]):
        mask[i, rs.choice(C, size=n_mask, replace=False)] = True
    total, cnt = 0.0, 0
    for j in range(C):
        rows = np.where(mask[:, j])[0]
        if rows.size == 0:
            continue
        logits = model.logits_for(codes[rows], mask[rows], j)
        logits[:, 0] = -1e9
        p = _softmax(logits)
        y = codes[rows, j]
        total += -np.log(np.maximum(p[np.arange(rows.size), y], 1e-12)).sum()
        cnt += rows.size
    return total / max(cnt, 1)


@dataclass
class TrialResult:
    cfg: TrainConfig
    val_loss: float
    train_loss: float


@dataclass
class AshaTrial:
    cfg: TrainConfig
    rung: int          # highest rung this config was trained at
    epochs: int        # epoch budget of that rung
    val_loss: float    # validation loss at that rung
    train_loss: float
    promoted: bool     # survived into the next rung


def asha_schedule(n_configs: int, max_epochs: int, eta: int = 2,
                  min_epochs: int = 2) -> list[tuple[int, int]]:
    """The successive-halving ladder: [(epoch_budget, n_kept_after)]
    per rung.  Budgets grow by eta, survivors shrink by eta, and the
    last rung trains at ``max_epochs`` keeping one winner."""
    rungs = []
    n, e = n_configs, min_epochs
    while n > 1 and e < max_epochs:
        keep = max(1, n // eta)
        rungs.append((e, keep))
        n, e = keep, min(e * eta, max_epochs)
    rungs.append((max_epochs, 1))
    return rungs


def asha_search(input_bins: list[tuple[str, int]], codes: np.ndarray,
                base: TrainConfig | None = None,
                d_words: tuple[int, ...] = (8, 16, 32),
                d_ffs: tuple[int, ...] = (32, 64, 96),
                eta: int = 2, min_epochs: int = 2,
                model_cls=NarMLP) -> tuple[NarMLP, list[AshaTrial]]:
    """Deterministic successive halving over the (d_word, d_ff) grid:
    returns the winning model (trained at the full epoch budget) and
    the complete trial table — one row per (config, rung) training run,
    so the promotion decisions are externally re-checkable.

    Retraining survivors from the same seed (rather than checkpointing
    optimizer state) keeps every rung bit-reproducible; at this model
    scale a retrain costs the same handful of seconds the reference's
    per-trial Ray task does."""
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    alive = [replace(base, d_word=dw, d_ff=dff)
             for dw in d_words for dff in d_ffs]
    rungs = asha_schedule(len(alive), base.epochs, eta, min_epochs)
    trials: list[AshaTrial] = []
    best_model = None
    for rung_idx, (budget, keep) in enumerate(rungs):
        scored = []
        for cfg in alive:
            run_cfg = replace(cfg, epochs=budget)
            model = model_cls(input_bins, run_cfg)
            losses = model.fit(train)
            vl = masked_val_loss(model, val)
            scored.append((vl, cfg.d_word, cfg.d_ff, cfg, model,
                           losses[-1]))
        # promotion rule: top-`keep` by (val_loss, d_word, d_ff) — the
        # config tie-break makes the whole run deterministic
        scored.sort(key=lambda t: (t[0], t[1], t[2]))
        kept = {(t[1], t[2]) for t in scored[:keep]}
        for vl, dw, dff, cfg, model, tl in scored:
            trials.append(AshaTrial(replace(cfg, epochs=budget),
                                    rung_idx, budget, vl, tl,
                                    (dw, dff) in kept))
        alive = [t[3] for t in scored[:keep]]
        best_model = scored[0][4]
    return best_model, trials


@dataclass
class AsyncTrial:
    cfg: TrainConfig
    job: int                   # 0-based scheduling order
    rung: int                  # rung this job trained at
    epochs: int                # rung budget
    val_loss: float
    train_loss: float
    promoted_from: int | None  # rung promoted from; None = fresh start


def asha_async_search(input_bins: list[tuple[str, int]],
                      codes: np.ndarray,
                      base: TrainConfig | None = None,
                      d_words: tuple[int, ...] = (8, 16, 32),
                      d_ffs: tuple[int, ...] = (32, 64, 96),
                      eta: int = 2, min_epochs: int = 2,
                      model_cls=NarMLP) -> tuple[NarMLP, list[AsyncTrial]]:
    """ASYNCHRONOUS ASHA (Li et al., MLSys 2020 — the algorithm the
    reference's Ray scheduler actually runs), deterministically
    serialized: one simulated worker, so each scheduling decision sees
    every previously completed job and the run is bit-reproducible.

    The get_job rule is Li et al.'s verbatim: scan rungs top-down and
    PROMOTE the best not-yet-promoted config sitting in the top
    ``floor(n_seen / eta)`` of its rung's results-so-far; if no rung
    has a promotable config, START the next unstarted config (row-major
    grid order) at rung 0; stop when neither exists.  This is the
    semantics sync ASHA lacks: promotions fire on PARTIAL rung
    information (the first rung-1 job runs after only ``eta`` rung-0
    completions, long before the rung fills), which is what removes
    the straggler barrier on a real worker pool.

    The rung whose budget reaches ``base.epochs`` is final (never
    promoted from); the winner is the val-loss argmin among final-rung
    trials (config tie-break).  Total job count and epoch spend depend
    only on |grid| and eta, not on losses — the e14 contract exploits
    this for its literal oracle."""
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    grid = [(dw, dff) for dw in d_words for dff in d_ffs]

    def rung_budget(r: int) -> int:
        return min(min_epochs * eta ** r, base.epochs)

    results: dict[int, list[tuple[float, int, int]]] = {}
    promoted: dict[int, set] = {}
    models: dict[tuple[int, int, int], object] = {}  # (rung, dw, dff)
    trials: list[AsyncTrial] = []
    started = 0
    job = 0
    while True:
        pick = None
        for r in sorted(results, reverse=True):
            if rung_budget(r) >= base.epochs:
                continue  # final rung: never promoted from
            done = sorted(results[r])
            k = len(done) // eta
            cands = [t for t in done[:k]
                     if (t[1], t[2]) not in promoted.get(r, set())]
            if cands:
                pick = ("promote", r, cands[0][1], cands[0][2])
                break
        if pick is None and started < len(grid):
            pick = ("start", None, *grid[started])
            started += 1
        if pick is None:
            break
        kind, from_rung, dw, dff = pick
        rung = 0 if kind == "start" else from_rung + 1
        cfg = replace(base, d_word=dw, d_ff=dff,
                      epochs=rung_budget(rung))
        model = model_cls(input_bins, cfg)
        losses = model.fit(train)
        vl = masked_val_loss(model, val)
        results.setdefault(rung, []).append((vl, dw, dff))
        if kind == "promote":
            promoted.setdefault(from_rung, set()).add((dw, dff))
        models[(rung, dw, dff)] = model
        trials.append(AsyncTrial(cfg, job, rung, rung_budget(rung),
                                 vl, losses[-1], from_rung))
        job += 1
    final_rung = max(results)
    win = min(results[final_rung])
    return models[(final_rung, win[1], win[2])], trials


@dataclass
class TpeTrial:
    cfg: TrainConfig
    trial: int        # 0-based pick order
    val_loss: float
    train_loss: float
    startup: bool     # fixed-spread startup pick vs TPE-scored pick


def tpe_startup_order(d_words: tuple[int, ...], d_ffs: tuple[int, ...]
                      ) -> list[tuple[int, int]]:
    """The deterministic analog of TPE's random startup: the full grid
    ordered extremes-first (corners before edges before center, by L1
    distance of the index pair from the grid center), ties broken by
    (d_word, d_ff).  Maximal early spread without randomness."""
    kd, kf = len(d_words), len(d_ffs)

    def key(c: tuple[int, int]):
        i, j = d_words.index(c[0]), d_ffs.index(c[1])
        ext = abs(i - (kd - 1) / 2) + abs(j - (kf - 1) / 2)
        return (-ext, c[0], c[1])

    return sorted(((dw, dff) for dw in d_words for dff in d_ffs),
                  key=key)


def tpe_scores(history: list[tuple[int, int, float]],
               candidates: list[tuple[int, int]],
               d_words: tuple[int, ...], d_ffs: tuple[int, ...],
               gamma: float = 0.25, prior: float = 1.0
               ) -> dict[tuple[int, int], float]:
    """The categorical-TPE acquisition: split ``history`` (sorted by
    (val_loss, config)) at ``ceil(gamma*n)`` into good/bad, estimate a
    smoothed per-dimension categorical density for each side
    ((count + prior) / (n + prior*K)), and score each candidate by the
    product of density ratios l(v)/g(v) — monotone in the expected
    improvement for categorical spaces (Bergstra et al. NIPS'11 §4).
    Exposed separately so callers (the e13 contract) can re-verify
    every pick independently of the search loop."""
    import math
    from collections import Counter

    n_good = max(1, math.ceil(gamma * len(history)))
    srt = sorted(history, key=lambda t: (t[2], t[0], t[1]))
    good, bad = srt[:n_good], srt[n_good:]

    def dens(subset, dim_vals, idx):
        cnt = Counter(t[idx] for t in subset)
        tot = len(subset) + prior * len(dim_vals)
        return {v: (cnt.get(v, 0) + prior) / tot for v in dim_vals}

    lw, gw = dens(good, d_words, 0), dens(bad, d_words, 0)
    lf, gf = dens(good, d_ffs, 1), dens(bad, d_ffs, 1)
    return {(dw, dff): (lw[dw] / gw[dw]) * (lf[dff] / gf[dff])
            for dw, dff in candidates}


def tpe_search(input_bins: list[tuple[str, int]], codes: np.ndarray,
               base: TrainConfig | None = None,
               d_words: tuple[int, ...] = (8, 16, 32),
               d_ffs: tuple[int, ...] = (32, 64, 96),
               n_trials: int = 6, n_startup: int = 3,
               gamma: float = 0.25, prior: float = 1.0,
               model_cls=NarMLP) -> tuple[NarMLP, list[TpeTrial]]:
    """Deterministic TPE over the (d_word, d_ff) grid: returns the
    best-validation model and the full pick-ordered trial table.  Each
    config is trained at most once (the space is finite), so
    ``n_trials < |grid|`` really saves the difference vs exhaustive —
    the sampler's adaptivity claim, which the e13 contract certifies
    alongside pick-by-pick re-verification of the acquisition argmax."""
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    grid = [(dw, dff) for dw in d_words for dff in d_ffs]
    n_trials = min(n_trials, len(grid))
    startup = tpe_startup_order(d_words, d_ffs)
    history: list[tuple[int, int, float]] = []
    trials: list[TpeTrial] = []
    best = None  # (val_loss, d_word, d_ff, model)
    for t in range(n_trials):
        if t < n_startup:
            dw, dff = startup[t]
        else:
            tried = {(h[0], h[1]) for h in history}
            untried = [c for c in grid if c not in tried]
            scores = tpe_scores(history, untried, d_words, d_ffs,
                                gamma, prior)
            dw, dff = min(untried,
                          key=lambda c: (-scores[c], c[0], c[1]))
        cfg = replace(base, d_word=dw, d_ff=dff)
        model = model_cls(input_bins, cfg)
        losses = model.fit(train)
        vl = masked_val_loss(model, val)
        history.append((dw, dff, vl))
        trials.append(TpeTrial(cfg, t, vl, losses[-1], t < n_startup))
        if best is None or (vl, dw, dff) < best[:3]:
            best = (vl, dw, dff, model)
    return best[3], trials


def grid_search(input_bins: list[tuple[str, int]], codes: np.ndarray,
                base: TrainConfig | None = None,
                d_words: tuple[int, ...] = (16, 32),
                d_ffs: tuple[int, ...] = (64, 96),
                model_cls=NarMLP) -> tuple[NarMLP, list[TrialResult]]:
    """Train every (d_word, d_ff) combination; return the best-val model
    and the full trial table (the analog of the exported best-config
    JSON)."""
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    trials: list[TrialResult] = []
    best, best_model = None, None
    for dw in d_words:
        for dff in d_ffs:
            cfg = replace(base, d_word=dw, d_ff=dff)
            model = model_cls(input_bins, cfg)
            losses = model.fit(train)
            vl = masked_val_loss(model, val)
            t = TrialResult(cfg, vl, losses[-1])
            trials.append(t)
            if best is None or vl < best.val_loss:
                best, best_model = t, model
    return best_model, trials


def asha_async_pool_search(input_bins: list[tuple[str, int]],
                           codes: np.ndarray,
                           base: TrainConfig | None = None,
                           d_words: tuple[int, ...] = (8, 16, 32),
                           d_ffs: tuple[int, ...] = (32, 64, 96),
                           eta: int = 2, min_epochs: int = 2,
                           n_workers: int = 4,
                           model_cls=NarMLP,
                           trial_runner=None
                           ) -> tuple[NarMLP, list[AsyncTrial], int]:
    """Async ASHA on a REAL worker pool — the physical execution the
    reference gets from Ray Tune (run.py:611-657), here a
    ``ThreadPoolExecutor``: trials are NumPy training whose BLAS
    kernels release the GIL, so ``n_workers`` trials genuinely train
    concurrently on one box (the single-node stand-in for Ray's
    cluster pool; the SCHEDULING rule is byte-for-byte
    :func:`asha_async_search`'s get_job).

    Each freed worker takes the scheduler lock, applies the get_job
    rule to the results completed SO FAR (promotions fire on partial
    rung information — the property that removes sync ASHA's straggler
    barrier), and trains outside the lock.  A worker finding no
    eligible job while others are in flight WAITS on the condition —
    their completions can unlock promotions — and only exits when the
    queue is empty with nothing in flight.

    Trial ORDER (and therefore which jobs exist) depends on completion
    timing with ``n_workers > 1`` — exactly as on Ray; with
    ``n_workers=1`` the run is bit-identical to the serialized
    :func:`asha_async_search` (test-pinned).  Invariants that hold for
    every timing: each config starts at rung 0 at most once, each
    (rung, config) promotes at most once, every promotion was in the
    top ``floor(n_seen/eta)`` of its rung at decision time, and the
    winner is the val-loss argmin of the highest rung.  Returns
    ``(best_model, trials, max_inflight)`` — the last observed
    concurrency high-water mark, so callers can assert the pool really
    overlapped.

    ``trial_runner`` (cfg -> (val_loss, train_loss, model)) swaps WHERE
    a trial trains while this function stays the scheduler: the default
    trains on the calling thread (one-box pool); pass a closure that
    submits a Spark job to get the cluster-wide async pool
    (:func:`asha_async_spark_search`)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    if n_workers < 1:
        raise ValueError("n_workers must be >= 1")
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    if trial_runner is None:
        def trial_runner(cfg):
            return _run_trial(input_bins, cfg, train, val, model_cls)
    grid = [(dw, dff) for dw in d_words for dff in d_ffs]

    def rung_budget(r: int) -> int:
        return min(min_epochs * eta ** r, base.epochs)

    lock = threading.Condition()
    results: dict[int, list[tuple[float, int, int]]] = {}
    promoted: dict[int, set] = {}
    models: dict[tuple[int, int, int], object] = {}
    trials: list[AsyncTrial] = []
    state = {"started": 0, "job": 0, "inflight": 0, "max_inflight": 0}

    def get_job():
        """get_job under the lock: Li et al.'s rule over completed
        results; None = nothing eligible right now."""
        for r in sorted(results, reverse=True):
            if rung_budget(r) >= base.epochs:
                continue
            done = sorted(results[r])
            k = len(done) // eta
            cands = [t for t in done[:k]
                     if (t[1], t[2]) not in promoted.get(r, set())]
            if cands:
                promoted.setdefault(r, set()).add(
                    (cands[0][1], cands[0][2]))
                return ("promote", r, cands[0][1], cands[0][2])
        if state["started"] < len(grid):
            cfg = grid[state["started"]]
            state["started"] += 1
            return ("start", None, *cfg)
        return None

    def worker():
        while True:
            with lock:
                pick = get_job()
                while pick is None and state["inflight"] > 0:
                    lock.wait()
                    pick = get_job()
                if pick is None:
                    return
                state["inflight"] += 1
                state["max_inflight"] = max(state["max_inflight"],
                                            state["inflight"])
                job = state["job"]
                state["job"] += 1
            kind, from_rung, dw, dff = pick
            rung = 0 if kind == "start" else from_rung + 1
            cfg = replace(base, d_word=dw, d_ff=dff,
                          epochs=rung_budget(rung))
            vl, tl, model = trial_runner(cfg)
            with lock:
                results.setdefault(rung, []).append((vl, dw, dff))
                models[(rung, dw, dff)] = model
                trials.append(AsyncTrial(cfg, job, rung,
                                         rung_budget(rung), vl,
                                         tl, from_rung))
                state["inflight"] -= 1
                lock.notify_all()

    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        futs = [ex.submit(worker) for _ in range(n_workers)]
        for f in futs:
            f.result()   # surface worker exceptions
    final_rung = max(results)
    win = min(results[final_rung])
    return (models[(final_rung, win[1], win[2])], trials,
            state["max_inflight"])


# -- cluster-distributed drivers (the reference's Ray Tune leg,
# -- scardina/run.py:643-657, re-expressed as Spark jobs) -------------------

def _run_trial(input_bins, cfg, train, val, model_cls):
    """One trial = construct, fit, validate.  Runs identically on the
    driver or inside a Spark task (pure NumPy, seeded by cfg)."""
    model = model_cls(input_bins, cfg)
    losses = model.fit(train)
    return masked_val_loss(model, val), losses[-1], model


def grid_search_spark(spark, input_bins: list[tuple[str, int]],
                      codes: np.ndarray, base: TrainConfig | None = None,
                      d_words: tuple[int, ...] = (16, 32),
                      d_ffs: tuple[int, ...] = (64, 96),
                      model_cls=NarMLP) -> tuple[NarMLP, list[TrialResult]]:
    """:func:`grid_search` distributed over the CLUSTER: one Spark task
    per (d_word, d_ff) config — the multi-machine leg the reference
    gets from Ray Tune, here plain ``parallelize(configs).map(train)``.

    The train/val matrices broadcast once (sample-scale: bounded by the
    500k-row sample clamp times the column count, independent of data
    scale); each task trains its NumPy model from the config's seed and
    ships back (val_loss, train_loss, pickled model) — grid-size
    models, MBs.  Trials are re-sorted into grid order on the driver:
    distribution changes WHERE a trial runs, never the schedule or the
    arithmetic SEMANTICS — losses match the serial driver to float32
    BLAS kernel noise (~1e-6 relative; executor Python workers are
    separate processes whose GEMM kernels may re-associate, the same
    caveat as any cross-process float reduction — test-pinned)."""
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    grid = [(dw, dff) for dw in d_words for dff in d_ffs]
    b_train = spark.sparkContext.broadcast(train)
    b_val = spark.sparkContext.broadcast(val)
    try:
        def run(pair):
            dw, dff = pair
            cfg = replace(base, d_word=dw, d_ff=dff)
            vl, tl, model = _run_trial(input_bins, cfg,
                                       b_train.value, b_val.value,
                                       model_cls)
            return dw, dff, vl, tl, model

        got = {(dw, dff): (vl, tl, m)
               for dw, dff, vl, tl, m in
               spark.sparkContext.parallelize(grid, len(grid)).map(run)
               .collect()}
    finally:
        b_train.unpersist()
        b_val.unpersist()
    trials: list[TrialResult] = []
    best, best_model = None, None
    for dw, dff in grid:                       # serial driver's order
        vl, tl, model = got[(dw, dff)]
        t = TrialResult(replace(base, d_word=dw, d_ff=dff), vl, tl)
        trials.append(t)
        if best is None or vl < best.val_loss:
            best, best_model = t, model
    return best_model, trials


def asha_search_spark(spark, input_bins: list[tuple[str, int]],
                      codes: np.ndarray, base: TrainConfig | None = None,
                      d_words: tuple[int, ...] = (8, 16, 32),
                      d_ffs: tuple[int, ...] = (32, 64, 96),
                      eta: int = 2, min_epochs: int = 2,
                      model_cls=NarMLP) -> tuple[NarMLP, list[AshaTrial]]:
    """:func:`asha_search` (synchronous successive halving) with each
    RUNG's trainings distributed as one Spark job — the rung barrier IS
    sync ASHA's semantics, so a per-rung job loses nothing the serial
    driver had.  Promotion decisions run on the driver over the
    collected (val_loss, config) rows with the identical
    (val_loss, d_word, d_ff) total order, so the trial SCHEDULE and
    promotion structure are identical to the serial driver, with losses
    equal to float32 BLAS kernel noise (cross-process GEMM
    re-association; a promotion could flip only on a near-tie at that
    scale, and the trial table records what happened — test-pinned to
    1e-5 relative).  For the
    barrier-free variant on one box, use :func:`asha_async_pool_search`;
    for the barrier-free variant across the CLUSTER (Ray's actual
    semantics), :func:`asha_async_spark_search`."""
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    alive = [replace(base, d_word=dw, d_ff=dff)
             for dw in d_words for dff in d_ffs]
    rungs = asha_schedule(len(alive), base.epochs, eta, min_epochs)
    trials: list[AshaTrial] = []
    best_model = None
    b_train = spark.sparkContext.broadcast(train)
    b_val = spark.sparkContext.broadcast(val)
    try:
        for rung_idx, (budget, keep) in enumerate(rungs):
            cfgs = [replace(cfg, epochs=budget) for cfg in alive]

            def run(cfg):
                vl, tl, model = _run_trial(input_bins, cfg,
                                           b_train.value, b_val.value,
                                           model_cls)
                return cfg.d_word, cfg.d_ff, vl, tl, model

            got = {(dw, dff): (vl, tl, m)
                   for dw, dff, vl, tl, m in
                   spark.sparkContext.parallelize(cfgs, len(cfgs))
                   .map(run).collect()}
            scored = []
            for cfg in alive:
                vl, tl, model = got[(cfg.d_word, cfg.d_ff)]
                scored.append((vl, cfg.d_word, cfg.d_ff, cfg, model, tl))
            scored.sort(key=lambda t: (t[0], t[1], t[2]))
            kept = {(t[1], t[2]) for t in scored[:keep]}
            for vl, dw, dff, cfg, model, tl in scored:
                trials.append(AshaTrial(replace(cfg, epochs=budget),
                                        rung_idx, budget, vl, tl,
                                        (dw, dff) in kept))
            alive = [t[3] for t in scored[:keep]]
            best_model = scored[0][4]
    finally:
        b_train.unpersist()
        b_val.unpersist()
    return best_model, trials


def asha_async_spark_search(spark, input_bins: list[tuple[str, int]],
                            codes: np.ndarray,
                            base: TrainConfig | None = None,
                            d_words: tuple[int, ...] = (8, 16, 32),
                            d_ffs: tuple[int, ...] = (32, 64, 96),
                            eta: int = 2, min_epochs: int = 2,
                            n_workers: int = 4,
                            model_cls=NarMLP
                            ) -> tuple[NarMLP, list[AsyncTrial], int]:
    """Cluster-wide ASYNC ASHA — the reference's actual Ray Tune
    semantics (scardina/run.py:643-657: trials run asynchronously
    across machines, promotions fire on partial rung information): a
    driver-side scheduler (the VERBATIM get_job rule of
    :func:`asha_async_pool_search`) feeds a pool of ``n_workers``
    driver threads, each of which submits its trial as ONE concurrent
    Spark job (``parallelize([cfg], 1).map(train)`` — Spark's scheduler
    spreads simultaneous jobs across executor slots, the cluster-wide
    job pool) and reports completion back through the shared condition
    variable, unblocking promotions that need only partial rung
    results — no rung barrier anywhere.

    Train/val matrices broadcast ONCE for all trials (sample-scale,
    bounded by the 500k-row sample clamp — independent of base-data
    scale); each task ships back (val_loss, train_loss, pickled model),
    grid-size small.  With ``n_workers=1`` the schedule is identical to
    the serialized :func:`asha_async_search` driver, with losses equal
    to float32 cross-process BLAS kernel noise (the grid_search_spark
    caveat; contract-pinned by e18); with ``n_workers>1`` job order is
    completion-timing-dependent exactly as on Ray, and the e16
    invariants (unique starts/promotions, nested rungs, final-rung
    argmin winner) hold for every timing."""
    b_train = None
    b_val = None
    base = base or TrainConfig()
    train, val = train_val_split(codes, base.seed)
    b_train = spark.sparkContext.broadcast(train)
    b_val = spark.sparkContext.broadcast(val)
    try:
        def submit(cfg):
            def run(c):
                return _run_trial(input_bins, c, b_train.value,
                                  b_val.value, model_cls)
            [(vl, tl, model)] = (spark.sparkContext
                                 .parallelize([cfg], 1).map(run)
                                 .collect())
            return vl, tl, model

        return asha_async_pool_search(
            input_bins, codes, base, d_words=d_words, d_ffs=d_ffs,
            eta=eta, min_epochs=min_epochs, n_workers=n_workers,
            model_cls=model_cls, trial_runner=submit)
    finally:
        b_train.unpersist()
        b_val.unpersist()
