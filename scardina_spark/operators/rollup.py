"""Hypertable-style multi-resolution time rollup.

Continuous-aggregate pattern: aggregate the base table once at the
finest resolution, then derive every coarser level by re-aggregating
the finer *aggregate* (sums of sums, sums of counts).  At 100 TB the
base table is scanned exactly once; the hour table is ~rows/3600-scale,
so day/week levels cost almost nothing — versus one full scan per level
for the naive approach.  This is the algebraic-aggregate re-use that
TimescaleDB continuous aggregates / materialized rollups implement;
avg is derived as sum/count at read time (avg is not re-aggregable,
its sufficient statistics are).

Beyond the reference (SURVEY §2.4: no grouping sets / rollup exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# coarse -> finer ordering; each level re-aggregates the previous one
LEVELS = ("hour", "day", "week")


def time_rollup(df: DataFrame, ts_col: str, value_col: str,
                levels: tuple[str, ...] = LEVELS) -> DataFrame:
    """Union of per-level aggregates: (level, bucket_start, n, sum_value,
    avg_value).  levels must be ordered finest-first, each a valid
    ``date_trunc`` unit that nests into the next (hour ⊂ day ⊂ week)."""
    finest = levels[0]
    cur = (df.groupBy(F.date_trunc(finest, F.col(ts_col))
                      .alias("bucket_start"))
           .agg(F.count(F.lit(1)).alias("n"),
                # type-preserving: pass a decimal column for exact,
                # order-independent sums (doubles re-sum per level and
                # are shuffle-order sensitive in the last bits)
                F.sum(value_col).alias("sum_value")))
    out = cur.withColumn("level", F.lit(finest))
    for lvl in levels[1:]:
        cur = (cur.groupBy(F.date_trunc(lvl, F.col("bucket_start"))
                           .alias("bucket_start"))
               .agg(F.sum("n").alias("n"),
                    F.sum("sum_value").alias("sum_value")))
        out = out.unionByName(cur.withColumn("level", F.lit(lvl)))
    # n + sum are the sufficient statistics; the mean is derived at read
    # time (a rounded sum/n quotient is not engine-reproducible when the
    # double lands on a rounding midpoint — see queries.q_window_hourly)
    return out.select(
        "level", "bucket_start", "n",
        F.round(F.col("sum_value").cast("double"), 4).alias("sum_value"))
