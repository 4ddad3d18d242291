"""Frequent-item (heavy-hitter) extraction with bounded-memory candidate
pruning.

Two-phase design for the 100 TB case:

1. **Candidate generation** — a per-partition Misra-Gries summary with
   ``ceil(1/min_freq)`` counters runs inside ``mapInPandas`` (Arrow
   batches, no shuffle).  Pigeonhole guarantee: any value whose *global*
   frequency is at least ``min_freq`` has *local* frequency at least
   ``min_freq`` in at least one partition, and Misra-Gries with ``k``
   counters retains every value whose local share exceeds ``1/(k+1)``
   — so the union of partition summaries is a superset of the true
   heavy hitters.  The candidate set is at most ``k × n_partitions``
   rows, independent of the number of distinct values (the reason not
   to just ``groupBy().count()`` a trillion-distinct column).
2. **Exact recount** — a broadcast semi join keeps only candidate rows,
   then a ``groupBy().count()`` over that thin slice produces exact
   counts; false candidates are dropped by the final threshold filter.

Output is therefore **exact** (same rows as ``GROUP BY ... HAVING count
>= ceil(min_freq * N)``), which is what the DuckDB oracle checks.

Reference parity: Scardina's only frequency machinery is the pandas
``value_counts`` at ``datasets.py:113`` (fanout counts); heavy hitters
are a training-data-pipeline extension (vocabulary pruning, stop-word
mining, hot-key detection for skew handling).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def misra_gries_candidates(df: DataFrame, col: str, min_freq: float) -> DataFrame:
    """Bounded-memory candidate heavy hitters: one Misra-Gries summary per
    partition (capacity ``ceil(1/min_freq)``), unioned and deduplicated.

    Superset guarantee only — counts are NOT exact (use
    :func:`heavy_hitters` for the exact end-to-end op).
    """
    if not (0.0 < min_freq <= 1.0):
        raise ValueError(f"min_freq must be in (0, 1], got {min_freq}")
    k = int(math.ceil(1.0 / min_freq))
    src = df.select(F.col(col).alias("value")).where(F.col("value").isNotNull())
    schema = src.schema

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[object, int] = {}
        for pdf in batches:
            for v in pdf["value"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"value": list(counters.keys())})

    return src.mapInPandas(summarize, schema=schema).distinct()


def heavy_hitters(df: DataFrame, col: str, min_freq: float) -> DataFrame:
    """Exact heavy hitters: all values of ``col`` occurring in at least
    ``min_freq`` of the non-null rows, with exact counts.

    Equivalent to ``SELECT col, COUNT(*) FROM df GROUP BY col HAVING
    COUNT(*) >= ceil(min_freq * N)`` but never shuffles more than the
    candidate-matching rows, and never holds more than
    ``ceil(1/min_freq)`` counters per partition in memory.

    Returns columns ``(value, cnt)``.
    """
    src = df.select(F.col(col).alias("value")).where(F.col("value").isNotNull())
    n = src.count()
    threshold = int(math.ceil(min_freq * n))
    cands = misra_gries_candidates(df, col, min_freq)
    # broadcast semi join: the candidate set is k×partitions rows, tiny
    matched = src.join(F.broadcast(cands), on="value", how="left_semi")
    return (matched.groupBy("value")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= threshold))
