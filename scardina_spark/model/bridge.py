"""Spark → model bridge: Spark builds dictionaries + the encoded training
matrix; the NumPy model trains on the collected matrix.

This is the reference's DataModule/discretize path (scardina/common.py:
499-632) re-cut along the Spark boundary: everything row-scale happens as
DataFrame ops (dictionary joins, casting), and only the final int-code
matrix — capped at a training-sample size, the same role as the
reference's join-sample clamp — crosses to the driver via Arrow.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.dictionary import CODE, VALUE, build_dictionary, encode_with_dictionary
from .nar import NarMLP, TrainConfig
from .progressive import ColumnDomain, NarEstimator


def collect_domain(dictionary: DataFrame, name: str) -> ColumnDomain:
    rows = dictionary.orderBy(CODE).collect()
    return ColumnDomain(name, np.array([r[VALUE] for r in rows]))


def training_matrix(df: DataFrame, columns: list[str],
                    max_rows: int = 200_000, seed: int = 42
                    ) -> tuple[np.ndarray, dict[str, ColumnDomain]]:
    """Dictionary-encode ``columns`` and collect an int64 matrix [n, C]
    (row-capped by deterministic sample) plus the collected domains."""
    proj = df.select(*[F.col(f"`{c}`") for c in columns])
    n = proj.count()
    if n > max_rows:
        proj = proj.sample(fraction=min(1.0, max_rows / n * 1.05), seed=seed) \
            .limit(max_rows)
    domains: dict[str, ColumnDomain] = {}
    enc = proj
    for c in columns:
        d = build_dictionary(proj, c)
        domains[c] = collect_domain(d, c)
        enc = encode_with_dictionary(enc, c, d)
    pdf = enc.toPandas()
    codes = pdf[columns].to_numpy(dtype=np.int64)
    return codes, domains


def train_single_table(df: DataFrame, columns: list[str],
                       cfg: TrainConfig | None = None,
                       sample_size: int = 512,
                       max_rows: int = 200_000) -> NarEstimator:
    """End-to-end: encode with Spark, train the NAR-MLP, return the
    progressive-sampling estimator."""
    cfg = cfg or TrainConfig()
    codes, domains = training_matrix(df, columns, max_rows, cfg.seed)
    bins = [(c, domains[c].dom_size) for c in columns]
    model = NarMLP(bins, cfg)
    model.fit(codes)
    return NarEstimator(model=model, domains=domains,
                        n_rows=df.count(), sample_size=sample_size,
                        seed=cfg.seed)
