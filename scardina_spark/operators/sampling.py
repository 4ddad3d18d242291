"""Deterministic dataset sampling: Bernoulli by hash threshold and
stratified per-group top-k by hash rank.

Training-data pipelines sample constantly (per-source quotas, class
balancing, eval holdouts).  Doing it with ``rand()`` makes runs
irreproducible and oracle-unfriendly; hashing a stable row id instead
gives samples that are (a) deterministic across runs, engines, and
cluster layouts, (b) consistent under re-partitioning, and (c) coherent
across tables — the same id-space threshold selects the same entities
everywhere, so a holdout split stays aligned between e.g. `documents`
and a derived features table.

Scale design: the Bernoulli filter is a pure projection + predicate
(no shuffle, pushes past scans of the id column).  The stratified
sampler shuffles once on the strata key; per-stratum top-k runs as a
rank-window.  For pathological single-stratum skew, pre-aggregate with
`operators/skew.salted_group_agg`-style two-phase slicing (same pattern
as `sketches.kmv_sketch`).

Contrast with the reference: Scardina's only sampler is the *weighted
join* sampler (`join.py:73-245`, rebuilt in `operators/sampler.py`);
uniform/stratified corpus sampling is green-field scope from the
LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sketches import HASH_SPACE, kmv_hash


def hash_fraction(col: F.Column | str) -> F.Column:
    """Uniform [0,1) fraction derived from md5 of the id — the shared
    coin for every sampler here (engine-reproducible, see sketches)."""
    return kmv_hash(col) / F.lit(HASH_SPACE)


def bernoulli_sample(df: DataFrame, fraction: float, id_col: str,
                     salt: str = "") -> DataFrame:
    """Keep rows whose hash fraction of (salt || id) < ``fraction``.
    Different salts give independent samples over the same ids; the
    same salt selects consistent id sets across tables."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    return df.where(hash_fraction(key) < fraction)


def split_train_holdout(df: DataFrame, holdout: float, id_col: str,
                        salt: str = "split") -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, holdout) pair keyed on the id hash —
    membership is a property of the id, stable across runs and joins."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    is_holdout = hash_fraction(key) < holdout
    return df.where(~is_holdout), df.where(is_holdout)


def stratified_sample(df: DataFrame, strata_cols: list[str], n: int,
                      id_col: str, salt: str = "") -> DataFrame:
    """At most ``n`` rows per stratum: the n smallest id-hashes win.
    Equivalent to a seeded uniform draw without replacement per group,
    but deterministic and engine-reproducible.  One shuffle (on the
    strata key); the rank window never materializes a stratum beyond
    its top n thanks to Spark's windowed rank filter pushdown."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(
        kmv_hash(key).asc(), F.col(id_col).asc())
    return (df.withColumn("__rk__", F.row_number().over(w))
            .where(F.col("__rk__") <= n).drop("__rk__"))


def proportional_stratified(df: DataFrame, strata_cols: list[str],
                            fraction: float, id_col: str,
                            salt: str = "") -> DataFrame:
    """fraction-of-each-stratum variant: Bernoulli filter, no shuffle at
    all — per-stratum proportions hold in expectation because the hash
    is uniform within every stratum."""
    return bernoulli_sample(df, fraction, id_col, salt)


def mixture_sample(df: DataFrame, rates: dict[str, float],
                   group_col: str, id_col: str,
                   default_rate: float = 0.0,
                   salt: str = "mix") -> DataFrame:
    """Training-corpus mixing: keep each row with its GROUP's rate
    (e.g. ``{"web": 0.1, "books": 1.0}``) — one hash comparison per
    row, no shuffle, deterministic and re-partitioning-proof like every
    sampler here.  Groups absent from ``rates`` get ``default_rate``
    (0.0 = drop).  Because the coin is the id hash, raising one
    source's rate keeps a SUPERSET of the previous sample — mixtures
    can be re-weighted incrementally without resampling everything."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))) \
            .otherwise(rate)
    return df.where(hash_fraction(key) < rate)
