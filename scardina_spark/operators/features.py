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
    included), and ``ewma`` (truncated exponential moving average,
    weights ``alpha·(1-alpha)^i`` over the last ``ewma_terms``
    observations, renormalized over the terms actually present so the
    head of each key's history is unbiased) to every row.

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
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for i in range(ewma_terms):
        ci = float(alpha * (1.0 - alpha) ** i)
        xi = v if i == 0 else F.lag(v, i).over(w)
        num = num + F.coalesce(xi * F.lit(ci), F.lit(0.0))
        den = den + F.when(xi.isNotNull(), F.lit(ci)).otherwise(F.lit(0.0))
    return (df
            .withColumn("lag1", F.lag(v).over(w))
            .withColumn(f"ma{ma_rows}",
                        F.avg(v).over(w.rowsBetween(-(ma_rows - 1), 0)))
            .withColumn("ewma", num / den))
