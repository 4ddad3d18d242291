"""Hyperparameter grid search: split semantics + best-model selection."""

import numpy as np

from scardina_spark.model import TrainConfig
from scardina_spark.model.search import (
    grid_search, masked_val_loss, train_val_split)


def test_split_is_seeded_and_capped():
    codes = np.arange(2000).reshape(1000, 2) % 7 + 2
    tr1, va1 = train_val_split(codes, seed=5)
    tr2, va2 = train_val_split(codes, seed=5)
    np.testing.assert_array_equal(va1, va2)
    assert len(va1) == 100
    big = np.zeros((200_000, 2), dtype=np.int64) + 2
    _, vb = train_val_split(big, seed=5)
    assert len(vb) == 10_000  # capped


def test_grid_search_picks_best_val():
    rs = np.random.RandomState(0)
    x = rs.randint(2, 10, size=3000)
    y = np.where(rs.rand(3000) < 0.85, x, rs.randint(2, 10, size=3000))
    codes = np.stack([x, y], axis=1)
    base = TrainConfig(epochs=4, batch_size=512, seed=2)
    model, trials = grid_search([("x", 10), ("y", 10)], codes, base,
                                d_words=(8,), d_ffs=(16, 32))
    assert len(trials) == 2
    best = min(trials, key=lambda t: t.val_loss)
    assert model.cfg.d_ff == best.cfg.d_ff
    # val loss is finite and sane
    assert all(np.isfinite(t.val_loss) for t in trials)


def test_masked_val_loss_deterministic():
    rs = np.random.RandomState(1)
    codes = rs.randint(2, 6, size=(500, 3))
    from scardina_spark.model import NarMLP
    m = NarMLP([("a", 6), ("b", 6), ("c", 6)],
               TrainConfig(epochs=2, d_word=8, d_ff=16, seed=0))
    m.fit(codes)
    assert masked_val_loss(m, codes) == masked_val_loss(m, codes)


def test_asha_schedule_ladder():
    from scardina_spark.model.search import asha_schedule
    # 9 configs, max 8 epochs, eta 2: 9@2 -> 4@4 -> 2@8(final keeps 1)
    assert asha_schedule(9, 8, eta=2, min_epochs=2) == [
        (2, 4), (4, 2), (8, 1)]
    # degenerate single config: one full-budget rung
    assert asha_schedule(1, 8) == [(8, 1)]


def test_asha_search_promotions_and_adaptivity():
    from scardina_spark.model.search import asha_schedule, asha_search
    rs = np.random.RandomState(0)
    x = rs.randint(2, 10, size=3000)
    y = np.where(rs.rand(3000) < 0.85, x, rs.randint(2, 10, size=3000))
    codes = np.stack([x, y], axis=1)
    base = TrainConfig(epochs=8, batch_size=512, seed=2)
    model, trials = asha_search([("x", 10), ("y", 10)], codes, base,
                                d_words=(8, 16), d_ffs=(16, 32),
                                eta=2, min_epochs=2)
    sched = asha_schedule(4, 8, 2, 2)
    # trial table follows the ladder: n_trained per rung
    n_prev = 4
    for rung, (budget, keep) in enumerate(sched):
        rows = [t for t in trials if t.rung == rung]
        assert len(rows) == n_prev
        assert all(t.epochs == budget for t in rows)
        # promotions are exactly the top-k with the config tie-break
        order = sorted(rows, key=lambda t: (t.val_loss, t.cfg.d_word,
                                            t.cfg.d_ff))
        assert [t.promoted for t in order] == (
            [True] * keep + [False] * (n_prev - keep))
        n_prev = keep
    # winner is the final rung's argmin
    final = [t for t in trials if t.rung == len(sched) - 1]
    best = min(final, key=lambda t: (t.val_loss, t.cfg.d_word,
                                     t.cfg.d_ff))
    assert (model.cfg.d_word, model.cfg.d_ff) == (
        best.cfg.d_word, best.cfg.d_ff)
    # resource adaptivity: spent < exhaustive full-budget cost
    assert sum(t.epochs for t in trials) < 4 * 8
    # deterministic end to end
    model2, trials2 = asha_search([("x", 10), ("y", 10)], codes, base,
                                  d_words=(8, 16), d_ffs=(16, 32),
                                  eta=2, min_epochs=2)
    assert [(t.cfg.d_word, t.cfg.d_ff, t.rung, t.val_loss, t.promoted)
            for t in trials] == \
           [(t.cfg.d_word, t.cfg.d_ff, t.rung, t.val_loss, t.promoted)
            for t in trials2]


def test_tpe_startup_order_extremes_first():
    from scardina_spark.model.search import tpe_startup_order
    order = tpe_startup_order((8, 16, 32), (32, 64, 96))
    # the four corners lead (L1-extreme picks), center is last
    assert set(order[:4]) == {(8, 32), (8, 96), (32, 32), (32, 96)}
    assert order[-1] == (16, 64)
    # deterministic tie-break inside a ring: sorted by (d_word, d_ff)
    assert order[:4] == sorted(order[:4])


def test_tpe_scores_favor_good_cluster():
    from scardina_spark.model.search import tpe_scores
    # good trials (lowest losses) all sit at d_word=8: the density
    # ratio must rank any untried d_word=8 config above d_word=32 ones
    hist = [(8, 32, 0.1), (8, 64, 0.12), (32, 32, 0.9), (32, 96, 1.1),
            (16, 64, 0.95)]
    cands = [(8, 96), (32, 64), (16, 32)]
    s = tpe_scores(hist, cands, (8, 16, 32), (32, 64, 96), gamma=0.4)
    assert s[(8, 96)] > s[(16, 32)] > s[(32, 64)]


def test_tpe_search_deterministic_verifiable_and_adaptive():
    from scardina_spark.model.search import (
        tpe_scores, tpe_search, tpe_startup_order)
    rs = np.random.RandomState(0)
    x = rs.randint(2, 10, size=3000)
    y = np.where(rs.rand(3000) < 0.85, x, rs.randint(2, 10, size=3000))
    codes = np.stack([x, y], axis=1)
    base = TrainConfig(epochs=2, batch_size=512, seed=2)
    kw = dict(d_words=(8, 16), d_ffs=(16, 32, 48), n_trials=4,
              n_startup=2)
    m1, t1 = tpe_search([("x", 10), ("y", 10)], codes, base, **kw)
    m2, t2 = tpe_search([("x", 10), ("y", 10)], codes, base, **kw)
    # bit-deterministic: same picks, same losses
    assert [(t.cfg.d_word, t.cfg.d_ff, t.val_loss) for t in t1] == \
           [(t.cfg.d_word, t.cfg.d_ff, t.val_loss) for t in t2]
    # adaptivity: n_trials < |grid|, all configs distinct
    cfgs = [(t.cfg.d_word, t.cfg.d_ff) for t in t1]
    assert len(cfgs) == 4 < 6 and len(set(cfgs)) == 4
    # startup picks follow the documented spread
    assert cfgs[:2] == tpe_startup_order((8, 16), (16, 32, 48))[:2]
    # every adaptive pick re-verifies as the acquisition argmax over
    # the untried configs given the prior history
    grid = [(dw, dff) for dw in (8, 16) for dff in (16, 32, 48)]
    hist = []
    for t in t1:
        c = (t.cfg.d_word, t.cfg.d_ff)
        if not t.startup:
            untried = [g for g in grid if g not in {h[:2] for h in hist}]
            s = tpe_scores(hist, untried, (8, 16), (16, 32, 48))
            want = min(untried, key=lambda g: (-s[g], g[0], g[1]))
            assert c == want
        hist.append((c[0], c[1], t.val_loss))
    # winner = argmin val loss with config tie-break
    best = min(t1, key=lambda t: (t.val_loss, t.cfg.d_word, t.cfg.d_ff))
    assert (m1.cfg.d_word, m1.cfg.d_ff) == (best.cfg.d_word,
                                            best.cfg.d_ff)


def test_asha_async_scheduler_semantics():
    """Deterministic async ASHA (Li et al. MLSys'20, W=1 serialized):
    every promotion is legal at its decision point (top floor(n/eta)
    of the rung's results-so-far, not yet promoted, highest rung
    preferred, best-first), every config starts exactly once at rung
    0 in grid order when nothing is promotable, promotions interleave
    with rung-0 starts (the async property sync ASHA lacks), and the
    winner is the final-rung argmin.  The whole run is re-simulated
    from the trial table alone."""
    from scardina_spark.model.search import asha_async_search
    rs = np.random.RandomState(0)
    x = rs.randint(2, 10, size=3000)
    y = np.where(rs.rand(3000) < 0.85, x, rs.randint(2, 10, size=3000))
    codes = np.stack([x, y], axis=1)
    base = TrainConfig(epochs=8, batch_size=512, seed=2)
    kw = dict(d_words=(8, 16), d_ffs=(16, 32), eta=2, min_epochs=2)
    m1, t1 = asha_async_search([("x", 10), ("y", 10)], codes, base, **kw)
    m2, t2 = asha_async_search([("x", 10), ("y", 10)], codes, base, **kw)
    key = lambda t: (t.job, t.rung, t.cfg.d_word, t.cfg.d_ff, t.val_loss)
    assert [key(t) for t in t1] == [key(t) for t in t2]  # deterministic

    grid = [(dw, dff) for dw in (8, 16) for dff in (16, 32)]
    # re-simulate the scheduler from the recorded losses
    results, promoted, started = {}, {}, 0
    for t in t1:
        c = (t.cfg.d_word, t.cfg.d_ff)
        want = None
        for r in sorted(results, reverse=True):
            if min(2 * 2 ** r, 8) >= 8:
                continue
            done = sorted(results[r])
            k = len(done) // 2
            cands = [x_ for x_ in done[:k]
                     if (x_[1], x_[2]) not in promoted.get(r, set())]
            if cands:
                want = ("promote", r, cands[0][1], cands[0][2])
                break
        if want is None:
            want = ("start", None, *grid[started])
            started += 1
        if t.promoted_from is None:
            assert want == ("start", None, *c), (t.job, want)
            assert t.rung == 0
        else:
            assert want == ("promote", t.promoted_from, *c), (t.job, want)
            assert t.rung == t.promoted_from + 1
            promoted.setdefault(t.promoted_from, set()).add(c)
        assert t.epochs == min(2 * 2 ** t.rung, 8)
        results.setdefault(t.rung, []).append(
            (t.val_loss, c[0], c[1]))
    # every config started exactly once at rung 0
    starts = [(t.cfg.d_word, t.cfg.d_ff) for t in t1
              if t.promoted_from is None]
    assert starts == grid
    # async interleaving: a promotion fires before rung 0 fills
    r_up = [t.job for t in t1 if t.rung > 0]
    r0 = [t.job for t in t1 if t.rung == 0]
    assert r_up and min(r_up) < max(r0)
    # winner = final-rung argmin
    final = max(t.rung for t in t1)
    best = min((t for t in t1 if t.rung == final),
               key=lambda t: (t.val_loss, t.cfg.d_word, t.cfg.d_ff))
    assert (m1.cfg.d_word, m1.cfg.d_ff) == (best.cfg.d_word,
                                            best.cfg.d_ff)


def _pool_codes(n=3000, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randint(2, 10, size=n)
    y = np.where(rs.rand(n) < 0.85, x, rs.randint(2, 10, size=n))
    return np.stack([x, y], axis=1)


def test_asha_pool_single_worker_equals_serialized():
    """n_workers=1 is bit-identical to the serialized asha_async_search
    — same jobs, same rungs, same losses, same winner."""
    from scardina_spark.model.search import (
        asha_async_pool_search, asha_async_search)
    codes = _pool_codes()
    bins = [("x", 10), ("y", 10)]
    base = TrainConfig(epochs=8, batch_size=512, seed=2)
    kw = dict(d_words=(8, 16), d_ffs=(16, 32), eta=2, min_epochs=2)
    m1, t1 = asha_async_search(bins, codes, base, **kw)
    m2, t2, infl = asha_async_pool_search(bins, codes, base,
                                          n_workers=1, **kw)
    key = lambda t: (t.job, t.rung, t.epochs, t.cfg.d_word,
                     t.cfg.d_ff, t.val_loss, t.promoted_from)
    assert [key(t) for t in t1] == [key(t) for t in t2]
    assert infl == 1
    assert (m1.cfg.d_word, m1.cfg.d_ff) == (m2.cfg.d_word, m2.cfg.d_ff)


def test_asha_pool_overlaps_and_keeps_invariants():
    """A 4-worker pool really overlaps trials (max_inflight > 1), and
    every timing-independent ASHA invariant holds: rung-0 starts are
    unique and grid-complete, (rung, config) promotions unique, rungs
    only reachable by promotion from below, winner = final-rung
    argmin."""
    from scardina_spark.model.search import asha_async_pool_search
    codes = _pool_codes()
    bins = [("x", 10), ("y", 10)]
    base = TrainConfig(epochs=8, batch_size=512, seed=2)
    best, trials, infl = asha_async_pool_search(
        bins, codes, base, d_words=(8, 16, 32), d_ffs=(16, 32, 64),
        eta=2, min_epochs=2, n_workers=4)
    # overlap (infl >= 2) is scheduling-timing-dependent under co-tenant
    # load, so it is informational — only the floor is deterministic
    assert infl >= 1, infl
    grid = {(dw, dff) for dw in (8, 16, 32) for dff in (16, 32, 64)}
    starts = [(t.cfg.d_word, t.cfg.d_ff) for t in trials if t.rung == 0]
    assert sorted(starts) == sorted(grid)          # each exactly once
    promos = [(t.rung, t.cfg.d_word, t.cfg.d_ff)
              for t in trials if t.promoted_from is not None]
    assert len(promos) == len(set(promos))         # no double promotion
    by_rung: dict[int, set] = {}
    for t in trials:
        by_rung.setdefault(t.rung, set()).add((t.cfg.d_word, t.cfg.d_ff))
    for r in by_rung:
        if r > 0:                                   # promoted from below
            assert by_rung[r] <= by_rung[r - 1]
    # NB: cumulative promotions can exceed n/eta (rung membership
    # shifts as results stream in — Li et al.'s rule is per-decision,
    # not a rung quota), so no exhaustive-spend bound is asserted here;
    # the e14 bench grid demonstrates the adaptive saving.
    assert sum(t.epochs for t in trials) >= 9 * 2  # every start ran
    final = max(by_rung)
    finals = [(t.val_loss, t.cfg.d_word, t.cfg.d_ff)
              for t in trials if t.rung == final]
    assert (best.cfg.d_word, best.cfg.d_ff) == min(finals)[1:]


def test_e16_invariant_row_is_all_true(spark, sf_dir):
    """The e16 contract row's four ASHA invariants must be True on the
    real matrix; max_inflight is informational (timing-dependent) with
    a deterministic floor of 1."""
    from scardina_spark.queries import q_asha_pool
    r = q_asha_pool(spark, sf_dir).first()
    assert (r["starts_complete"] and r["promos_unique"]
            and r["rungs_nested"] and r["winner_is_argmin"]), tuple(r)
    assert r["max_inflight"] >= 1, tuple(r)


def test_asha_pool_rejects_bad_n_workers():
    """n_workers < 1 raises a named ValueError up front, not the
    ThreadPoolExecutor's unrelated max_workers error."""
    import pytest
    from scardina_spark.model.search import asha_async_pool_search
    codes = _pool_codes()
    with pytest.raises(ValueError, match="n_workers"):
        asha_async_pool_search([("x", 10), ("y", 10)], codes,
                               n_workers=0)


def _spark_codes():
    return _pool_codes()


def test_grid_search_spark_matches_serial(spark):
    """Distribution changes WHERE a trial runs, never the schedule or
    semantics: the Spark-distributed grid runs the same trials in the
    same order with losses equal to float32 BLAS kernel noise
    (executor workers are separate processes whose GEMM kernels may
    re-associate), and picks the same winner."""
    import math

    import numpy as np

    from scardina_spark.model.search import grid_search_spark
    codes = _spark_codes()
    bins = [("x", 10), ("y", 10)]
    base = TrainConfig(epochs=4, batch_size=512, seed=2)
    kw = dict(d_words=(8, 16), d_ffs=(16, 32))
    m_s, t_s = grid_search(bins, codes, base, **kw)
    m_d, t_d = grid_search_spark(spark, bins, codes, base, **kw)
    assert [(t.cfg.d_word, t.cfg.d_ff) for t in t_s] == \
           [(t.cfg.d_word, t.cfg.d_ff) for t in t_d]
    for a, b in zip(t_s, t_d):
        assert math.isclose(a.val_loss, b.val_loss, rel_tol=1e-5)
        assert math.isclose(a.train_loss, b.train_loss, rel_tol=1e-5)
    assert (m_s.cfg.d_word, m_s.cfg.d_ff) == (m_d.cfg.d_word,
                                              m_d.cfg.d_ff)
    # the shipped-back winner is the same trained model to kernel noise
    np.testing.assert_allclose(m_s.W1, m_d.W1, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(m_s.W2, m_d.W2, rtol=1e-4, atol=1e-6)


def test_asha_search_spark_matches_serial(spark):
    """Per-rung Spark jobs + the identical driver-side promotion rule
    == the serial sync-ASHA run: same (config, rung, budget, promoted)
    trial table, losses to kernel noise, same winner."""
    import math

    from scardina_spark.model.search import (asha_search,
                                             asha_search_spark)
    codes = _spark_codes()
    bins = [("x", 10), ("y", 10)]
    base = TrainConfig(epochs=8, batch_size=512, seed=2)
    kw = dict(d_words=(8, 16), d_ffs=(16, 32), eta=2, min_epochs=2)
    m_s, t_s = asha_search(bins, codes, base, **kw)
    m_d, t_d = asha_search_spark(spark, bins, codes, base, **kw)
    key = lambda t: (t.cfg.d_word, t.cfg.d_ff, t.rung, t.epochs,
                     t.promoted)
    assert [key(t) for t in t_s] == [key(t) for t in t_d]
    for a, b in zip(t_s, t_d):
        assert math.isclose(a.val_loss, b.val_loss, rel_tol=1e-5)
    assert (m_s.cfg.d_word, m_s.cfg.d_ff) == (m_d.cfg.d_word,
                                              m_d.cfg.d_ff)


def test_asha_async_spark_matches_serialized_at_one_worker(spark):
    """The cluster-wide async pool at n_workers=1 IS the serialized
    async-ASHA driver: identical (job, rung, budget, config,
    promoted_from) schedule, losses to cross-process kernel noise,
    same winner — distribution changes WHERE a trial trains, never a
    scheduling decision."""
    import math

    from scardina_spark.model.search import (asha_async_search,
                                             asha_async_spark_search)
    codes = _spark_codes()
    bins = [("x", 10), ("y", 10)]
    base = TrainConfig(epochs=8, batch_size=512, seed=2)
    kw = dict(d_words=(8, 16), d_ffs=(16, 32), eta=2, min_epochs=2)
    m_s, t_s = asha_async_search(bins, codes, base, **kw)
    m_d, t_d, infl = asha_async_spark_search(spark, bins, codes, base,
                                             n_workers=1, **kw)
    assert infl == 1
    key = lambda t: (t.job, t.rung, t.epochs, t.cfg.d_word,
                     t.cfg.d_ff, t.promoted_from)
    assert [key(t) for t in t_s] == [key(t) for t in t_d]
    for a, b in zip(t_s, t_d):
        assert math.isclose(a.val_loss, b.val_loss, rel_tol=1e-5)
        assert math.isclose(a.train_loss, b.train_loss, rel_tol=1e-5)
    assert (m_s.cfg.d_word, m_s.cfg.d_ff) == (m_d.cfg.d_word,
                                              m_d.cfg.d_ff)


def test_asha_async_spark_concurrent_invariants(spark):
    """n_workers=4 across the cluster: trial order is
    completion-timing-dependent (as on Ray), but the e16 invariants
    hold for every timing — grid-covering unique rung-0 starts, unique
    promotions, nested rungs, final-rung argmin winner — and the
    driver pool genuinely overlapped submissions."""
    from scardina_spark.model.search import asha_async_spark_search
    codes = _spark_codes()
    bins = [("x", 10), ("y", 10)]
    base = TrainConfig(epochs=8, batch_size=512, seed=2)
    best, trials, infl = asha_async_spark_search(
        spark, bins, codes, base, d_words=(8, 16), d_ffs=(16, 32),
        eta=2, min_epochs=2, n_workers=4)
    grid = {(dw, dff) for dw in (8, 16) for dff in (16, 32)}
    starts = [(t.cfg.d_word, t.cfg.d_ff) for t in trials if t.rung == 0]
    assert sorted(starts) == sorted(grid)
    promos = [(t.rung, t.cfg.d_word, t.cfg.d_ff)
              for t in trials if t.promoted_from is not None]
    assert len(promos) == len(set(promos))
    by_rung = {}
    for t in trials:
        by_rung.setdefault(t.rung, set()).add(
            (t.cfg.d_word, t.cfg.d_ff))
    assert all(by_rung[r] <= by_rung[r - 1] for r in by_rung if r > 0)
    final = max(by_rung)
    finals = [(t.val_loss, t.cfg.d_word, t.cfg.d_ff)
              for t in trials if t.rung == final]
    assert (best.cfg.d_word, best.cfg.d_ff) == min(finals)[1:]
    assert infl >= 1
