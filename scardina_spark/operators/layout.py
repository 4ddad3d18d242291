"""Scan-friendly data layout: range-partitioned, sorted parquet writes.

At 100 TB the cheapest scan is the one that never reads a row group:
parquet footers carry per-row-group min/max statistics, and both Spark's
parquet reader and external engines skip row groups whose range cannot
match a pushed filter.  Those statistics only prune well when the data
is CLUSTERED on the filter column — which is a write-time decision.

``write_sorted`` makes it: ``repartitionByRange`` on the cluster
columns gives globally disjoint per-file ranges (each task owns one
range), ``sortWithinPartitions`` tightens every row group inside a file.
Rows land exactly once (range partitioning is a partition of the key
space); the cost is one range-exchange at write time, repaid on every
subsequent filtered scan.

Reference anchor: Scardina caches pickles with no layout control
(scardina/datasets.py:362-364); a columnar lake needs the clustered
form instead.  This is the same idea as Delta/Iceberg ORDER BY /
Z-ORDER maintenance, restricted to the single-column linear case Spark
can express natively (multi-column Z-curves would interleave bits with
the factorization helpers in functions/factorize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(df: DataFrame, path: str, cluster_cols: list[str],
                 n_files: int | None = None) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``: one range
    exchange, per-file disjoint key ranges, sorted row groups."""
    n = n_files or max(df.sparkSession.sparkContext.defaultParallelism, 4)
    (df.repartitionByRange(n, *cluster_cols)
       .sortWithinPartitions(*cluster_cols)
       .write.mode("overwrite").parquet(path))


def zorder_value(cols, bits: int = 16):
    """Z-curve (Morton) value of 2+ non-negative integer columns as one
    codegen expression: bit j of column i lands at interleaved position
    ``j * n_cols + i``.  Clustering on this single value gives PARTIAL
    clustering on every input column at once — the multi-column
    complement to ``write_sorted``'s linear order (same bit-slicing idea
    as functions/factorize.py, run in reverse).  Column values must fit
    in ``bits`` bits (clamp or bucketize wider domains first)."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 62:
        # bit 63 is the long sign bit and JVM shift counts alias mod 64
        # — either would silently corrupt the curve, so refuse
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits; "
            "at most 62 fit in a signed long — lower bits= or bucketize")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("long")
        for j in range(bits):
            bit = F.shiftright(col, j).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, j * n + i)
    return out


def write_zordered(df: DataFrame, path: str, cluster_cols: list[str],
                   bits: int = 16, n_files: int | None = None) -> None:
    """Write parquet clustered on the Z-curve of ``cluster_cols`` —
    filtered scans on ANY of the columns prune row groups."""
    z = zorder_value(cluster_cols, bits).alias("__z__")
    n = n_files or max(df.sparkSession.sparkContext.defaultParallelism, 4)
    (df.withColumn("__z__", z)
       .repartitionByRange(n, "__z__")
       .sortWithinPartitions("__z__")
       .drop("__z__")
       .write.mode("overwrite").parquet(path))


def row_group_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` for every row group under ``path`` —
    the statistics the pruning argument rests on, read from the parquet
    footers themselves."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        idx = f.schema_arrow.get_field_index(column)
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(
                    f"no min/max statistics for {column!r} in {name}: "
                    "the writer emitted a stats-less physical type "
                    "(e.g. TIMESTAMP_NANOS) — nothing can prune this "
                    "layout")
            out.append((st.min, st.max))
    return out


def overlap_fraction(ranges: list[tuple]) -> float:
    """Fraction of range pairs that overlap — 0.0 is perfectly
    clustered (every row group prunable independently), ~1.0 means the
    stats are useless for pruning.

    O(n log n) sweep: an unordered pair is DISJOINT iff exactly one of
    the two starts strictly after the other ends, so counting, for each
    interval, how many intervals start after its hi (binary search over
    the sorted starts) counts each disjoint pair exactly once."""
    import bisect

    n = len(ranges)
    if n < 2:
        return 0.0
    los = sorted(lo for lo, _ in ranges)
    disjoint = sum(n - bisect.bisect_right(los, hi) for _, hi in ranges)
    pairs = n * (n - 1) // 2
    return (pairs - disjoint) / pairs
