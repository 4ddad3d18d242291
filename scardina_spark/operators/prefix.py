"""Scalable global prefix sums and dense global indexes.

A single-partition ``Window.orderBy(...)`` is the textbook way to get a
global rank/cumsum in Spark, and the textbook way to OOM a driver at
100 TB: every row funnels through one task.  This module gives the
scale-safe alternative, the classic two-pass ``zipWithIndex`` pattern kept
inside the DataFrame API:

1. range-partition + sort by the order columns (a single shuffle whose
   parallelism matches the cluster),
2. aggregate per-partition totals (tiny: one row per partition),
3. broadcast the cumulative partition offsets and add the within-partition
   running value via ``mapInPandas`` (Arrow-batched, streaming, O(1) memory
   per batch).

Used by dictionary building (dense sorted codes) and by the exact
weighted-with-replacement sampler (global weight intervals).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

PID = "__pid__"
CUM = "__cum__"
IDX = "__idx__"


def _safe_names(df: DataFrame) -> tuple[DataFrame, dict[str, str]]:
    """Rename columns to dot-free temporaries.  PySpark's ``mapInPandas``
    resolves ``df[col]`` per raw name and breaks on names containing dots
    (e.g. our ``table.column`` prefixes), so we pass through safe names and
    restore afterwards."""
    mapping = {c: f"__sc{i}__" for i, c in enumerate(df.columns)}
    out = df
    for orig, safe in mapping.items():
        out = out.withColumnRenamed(orig, safe)
    return out, mapping


def _with_sorted_partitions(df: DataFrame, order_cols: list[str],
                            n_partitions: int | None) -> DataFrame:
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(f"`{c}`") for c in order_cols]
    return (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(PID, F.spark_partition_id())
    )


def with_prefix_sum(df: DataFrame, weight_col: str, order_cols: list[str],
                    n_partitions: int | None = None,
                    cache_out: list | None = None) -> DataFrame:
    """Add ``__cum__``: the EXCLUSIVE prefix sum of ``weight_col`` in the
    global order defined by ``order_cols``.

    The sorted input is persisted internally (it is read twice: once for
    the per-partition totals, once by the output's lineage).  Pass
    ``cache_out`` (a list) to receive the persisted handle — callers
    that eagerly materialize the result should then ``unpersist()`` it;
    without it the cached projection lives until session end."""
    out = with_prefix_sums(df, [weight_col], order_cols,
                           n_partitions=n_partitions, cache_out=cache_out)
    return out.withColumnRenamed(cum_col(0), CUM)


def cum_col(i: int) -> str:
    """Name of the i-th prefix-sum column added by :func:`with_prefix_sums`."""
    return f"__cum{i}__"


def with_prefix_sums(df: DataFrame, weight_cols: list[str],
                     order_cols: list[str],
                     n_partitions: int | None = None,
                     cache_out: list | None = None) -> DataFrame:
    """Add ``__cum0__``, ``__cum1__``, ...: the EXCLUSIVE prefix sums of
    each of ``weight_cols`` in the global order of ``order_cols`` —
    several running totals over ONE range-partitioned sort, one tiny
    per-partition-totals aggregate and one Arrow pass (the multi-column
    generalization of :func:`with_prefix_sum`; `ks_drift` folds both
    ECDFs through this in a single pass)."""
    d = _with_sorted_partitions(df, order_cols, n_partitions).persist()
    if cache_out is not None:
        cache_out.append(d)
    part_rows = (d.groupBy(PID)
                 .agg(*[F.sum(F.col(f"`{w}`")).alias(f"s{i}")
                        for i, w in enumerate(weight_cols)])
                 .collect())
    part_sums = {r[PID]: [float(r[f"s{i}"] or 0.0)
                          for i in range(len(weight_cols))]
                 for r in part_rows}
    offsets = {}
    running = [0.0] * len(weight_cols)
    for pid in sorted(part_sums):
        offsets[pid] = tuple(running)
        running = [a + b for a, b in zip(running, part_sums[pid])]

    boff = d.sparkSession.sparkContext.broadcast(offsets)
    safe, mapping = _safe_names(d)
    w_safe = [mapping[w] for w in weight_cols]
    pid_safe = mapping[PID]
    cum_names = [cum_col(i) for i in range(len(weight_cols))]
    schema = StructType(safe.schema.fields
                        + [StructField(c, DoubleType()) for c in cum_names])

    def add_cums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                for c in cum_names:
                    pdf[c] = pd.Series([], dtype="float64")
                yield pdf
                continue
            if acc is None:
                acc = list(boff.value.get(int(pdf[pid_safe].iloc[0]),
                                          (0.0,) * len(weight_cols)))
            pdf = pdf.copy()
            for i, (ws, cn) in enumerate(zip(w_safe, cum_names)):
                w = pdf[ws].astype("float64").fillna(0.0)
                pdf[cn] = w.cumsum().shift(fill_value=0.0) + acc[i]
                acc[i] += float(w.sum())
            yield pdf

    out = safe.mapInPandas(add_cums, schema)
    for orig, s in mapping.items():
        out = out.withColumnRenamed(s, orig)
    return out


def with_global_index(df: DataFrame, order_cols: list[str],
                      n_partitions: int | None = None) -> DataFrame:
    """Add ``__idx__``: a dense 0-based global index in the order of
    ``order_cols`` (distributed row_number, no single-partition window)."""
    d = _with_sorted_partitions(df, order_cols, n_partitions).persist()
    part_counts = {r[PID]: r["c"] for r in d.groupBy(PID).count()
                   .withColumnRenamed("count", "c").collect()}
    offsets = {}
    running = 0
    for pid in sorted(part_counts):
        offsets[pid] = running
        running += int(part_counts[pid])

    boff = d.sparkSession.sparkContext.broadcast(offsets)
    safe, mapping = _safe_names(d)
    pid_safe = mapping[PID]
    schema = StructType(safe.schema.fields + [StructField(IDX, LongType())])

    def add_idx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                pdf[IDX] = pd.Series([], dtype="int64")
                yield pdf
                continue
            if acc is None:
                acc = int(boff.value.get(int(pdf[pid_safe].iloc[0]), 0))
            pdf = pdf.copy()
            pdf[IDX] = range(acc, acc + len(pdf))
            acc += len(pdf)
            yield pdf

    out = safe.mapInPandas(add_idx, schema)
    for orig, s in mapping.items():
        out = out.withColumnRenamed(s, orig)
    return out
