"""NumPy NAR Transformer: gradient sanity, convergence, q-error parity."""

import numpy as np
import pytest

from scardina_spark.model.transformer import NarTransformer, TrmConfig
from scardina_spark.model.bridge import train_single_table


def _loss_of(model, codes, mask):
    """Full-batch masked loss without updating (for finite-diff checks)."""
    from scardina_spark.model.nar import _softmax
    hf = model._forward(codes, mask)
    total, cnt = 0.0, 0
    for j in range(model.C):
        rows = np.where(mask[:, j])[0]
        if rows.size == 0:
            continue
        logits = hf[rows, j] @ model.emb[j].T
        logits[:, 0] = -1e9
        p = _softmax(logits)
        y = codes[rows, j]
        total += -np.log(np.maximum(p[np.arange(rows.size), y], 1e-12)).sum()
        cnt += rows.size
    return total / max(cnt, 1)


def test_train_step_decreases_fullbatch_loss():
    """A few Adam steps on a fixed batch must reduce the fixed-mask loss —
    catches sign/shape errors in the hand-written backprop."""
    rs = np.random.RandomState(0)
    codes = rs.randint(2, 8, size=(256, 3))
    m = NarTransformer([("a", 8), ("b", 8), ("c", 8)],
                       TrmConfig(epochs=1, d_word=8, d_ff=16, n_blocks=1,
                                 n_heads=2, seed=5, lr=1e-2))
    mask = np.zeros((256, 3), dtype=bool)
    mask[:, 1] = True
    before = _loss_of(m, codes, mask)
    step_rs = np.random.RandomState(1)
    for _ in range(30):
        m.train_step(codes, step_rs)
    after = _loss_of(m, codes, mask)
    assert after < before * 0.95, (before, after)


def test_learns_correlation():
    rs = np.random.RandomState(0)
    x = rs.randint(2, 10, size=3000)
    y = np.where(rs.rand(3000) < 0.9, x, rs.randint(2, 10, size=3000))
    codes = np.stack([x, y], axis=1)
    m = NarTransformer([("x", 10), ("y", 10)],
                       TrmConfig(epochs=25, d_word=8, d_ff=32, n_blocks=1,
                                 n_heads=2, seed=1, lr=1e-2))
    losses = m.fit(codes)
    assert losses[-1] < losses[0] * 0.8
    # conditional P(y|x) should peak at y == x
    codes_t = np.array([[4, 0]] * 8)
    mask = np.zeros((8, 2), dtype=bool)
    mask[:, 1] = True
    logits = m.logits_for(codes_t, mask, 1)
    assert logits[0].argmax() == 4


@pytest.fixture(scope="module")
def trm_estimator(tables):
    cols = ["l_returnflag", "l_linestatus", "l_quantity"]
    cfg = TrmConfig(epochs=12, d_word=12, d_ff=48, batch_size=512,
                    n_blocks=1, n_heads=2, seed=42)
    return train_single_table(tables["lineitem"], cols, cfg,
                              sample_size=800, arch="trm")


TRM_QUERIES = [
    ("SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'R'", 2.0),
    ("SELECT COUNT(*) FROM lineitem WHERE l_quantity > 30 "
     "AND l_linestatus = 'F'", 2.5),
]


@pytest.mark.parametrize("sql,bound", TRM_QUERIES)
def test_trm_qerror(trm_estimator, duck, sql, bound):
    est = trm_estimator.estimate(sql)
    true = duck.sql(sql).fetchone()[0]
    assert est > 0
    q = max(est / true, true / est)
    assert q < bound, (sql, est, true, q)


def test_trm_save_load_roundtrip(tmp_path):
    import numpy as np
    from scardina_spark.model.transformer import NarTransformer, TrmConfig
    rs = np.random.RandomState(3)
    codes = np.stack([rs.randint(2, 8, 2000), rs.randint(2, 6, 2000)], axis=1)
    m = NarTransformer([("a", 8), ("b", 6)],
                       TrmConfig(epochs=2, d_word=8, d_ff=16, batch_size=256,
                                 seed=3, n_blocks=1, n_heads=2))
    m.fit(codes)
    path = str(tmp_path / "trm.npz")
    m.save(path)
    m2 = NarTransformer.load(path)
    probe = np.array([[3, 0], [5, 0]])
    mask = np.array([[False, True], [False, True]])
    assert np.allclose(m.logits_for(probe, mask, 1),
                       m2.logits_for(probe, mask, 1))
