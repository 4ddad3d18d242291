"""Banded range join: point-in-interval joins without an equi-key.

The reference joins only on PK–FK equality (`join.py:73-245`; SURVEY §2.3
"notably absent: theta/range/as-of joins").  A naive range join is a
cartesian product with a filter — O(|L|·|R|) and a broadcast-nested-loop
plan that dies at scale.  The banded rewrite turns it into an equi-join:

  * each point lands in bucket floor(p / w);
  * each interval [lo, hi) explodes into the buckets it covers;
  * equi-join on the bucket id, then apply the exact predicate.

A (point, interval) match meets in exactly one bucket — the point's —
so no dedup is needed.  Shuffle is O(|L| + |R| · avg_span/w); pick the
bucket width near the median interval length so the explode factor
stays ~2.  Skewed hot buckets compose with `operators/skew.salted_join`;
a small interval side should be broadcast by the caller instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(left: DataFrame, right: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bucket_width: float,
               ) -> DataFrame:
    """Inner join of ``left`` points to ``right`` intervals where
    ``lo <= point < hi``.  All three columns must be numeric and
    same-unit (cast timestamps to epoch seconds first)."""
    w = float(bucket_width)
    lb = left.withColumn("__rb__", F.floor(F.col(point_col) / w))
    rb = right.withColumn(
        "__rb__",
        F.explode(F.sequence(F.floor(F.col(lo_col) / w),
                             F.floor(F.col(hi_col) / w))))
    return (lb.join(rb, "__rb__")
            .where((F.col(point_col) >= F.col(lo_col))
                   & (F.col(point_col) < F.col(hi_col)))
            .drop("__rb__"))
