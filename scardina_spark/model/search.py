"""Hyperparameter search over the NAR models (M8).

Reference semantics (NOT code): scardina/run.py:611-708 — a search over
{d_word, d_ff, ...} scored by validation loss, best config exported.  The
reference drives Ray Tune + Optuna + ASHA; here a deterministic grid with
a seeded 90/10 train/validation split (validation capped at 10k rows,
matching scardina/common.py:597-608) is enough — the model space is small
and each trial is seconds of NumPy.
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
