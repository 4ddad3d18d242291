"""Per-key ordered feature engineering over event streams — the lag /
rolling-window / exponential-decay features every training-data
pipeline derives before modeling user or entity behavior (the batch
twin of a feature store's ingest transform).

Scale story (100 TB): every feature is a window over ONE
``partitionBy(key) orderBy(ts, tiebreak)`` — a single Exchange, one
sort, all features computed in the same pass (the scd2_history
pattern).  The EWMA is the TRUNCATED form — a fixed number of lag
terms — rather than the exact recursion: the exact form needs either a
sequential scan per key (``applyInPandas``, Python in the hot path) or
the prefix-sum trick whose ``(1-alpha)^-n`` factor overflows beyond a
few hundred rows; truncation at K terms bounds the error by
``(1-alpha)^K`` (0.7^8 ≈ 5.8% of the weight for the defaults, each
dropped term's coefficient under alpha·(1-alpha)^K) while staying a
pure in-codegen projection, deterministic and layout-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def rolling_features(df: DataFrame, key: str, ts: str, value: str,
                     tiebreak: list[str] | None = None,
                     ma_rows: int = 5, alpha: float = 0.3,
                     ewma_terms: int = 8) -> DataFrame:
    """Append ``lag1`` (previous observation), ``ma{ma_rows}``
    (trailing mean over the last ``ma_rows`` observations, current
    included), and ``ewma`` (windowed exponential moving average) to
    every row.

    EWMA convention: the recursion ``s_i = alpha·x_i +
    (1-alpha)·s_{i-1}`` seeded at the WINDOW START — lag ``i`` weighs
    ``alpha·(1-alpha)^i`` except the oldest observation visible in the
    ``ewma_terms`` window, which takes the full remaining mass
    ``(1-alpha)^i`` (pandas ``ewm(adjust=False)`` seeding).  Weights
    therefore sum to exactly 1 with no renormalization, and for keys
    with at most ``ewma_terms`` observations the result is EXACTLY the
    recursion — identical to the streaming twin
    (``streaming/stateful.rolling_features_stream``, which carries the
    state and is exact for any length; divergence beyond the window is
    bounded by ``(1-alpha)^(ewma_terms-1)·2·max|x|``, the mass the
    pretend-seed misassigns — both pinned in tests).

    Determinism: the caller-supplied ``(ts, *tiebreak)`` total order;
    every output is a pure function of the key's ordered prefix.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if ma_rows < 1 or ewma_terms < 1:
        raise ValueError("ma_rows and ewma_terms must be >= 1")
    order = [F.col(ts)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    v = F.col(value).cast("double")
    ewma: Column = F.lit(0.0)
    for i in range(ewma_terms):
        xi = v if i == 0 else F.lag(v, i).over(w)
        older = F.lag(v, i + 1).over(w)
        seed = i == ewma_terms - 1  # window edge: always seed weight
        ci = F.lit(float((1.0 - alpha) ** i)) if seed else F.when(
            older.isNull(),
            F.lit(float((1.0 - alpha) ** i))).otherwise(
            F.lit(float(alpha * (1.0 - alpha) ** i)))
        ewma = ewma + F.coalesce(xi * ci, F.lit(0.0))
    return (df
            .withColumn("lag1", F.lag(v).over(w))
            .withColumn(f"ma{ma_rows}",
                        F.avg(v).over(w.rowsBetween(-(ma_rows - 1), 0)))
            .withColumn("ewma", ewma))
