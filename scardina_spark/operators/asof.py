"""As-of (most-recent-prior) join — absent from the reference (SURVEY
§2.3 "notably absent: theta/range/as-of joins") and from Spark's builtin
join types; standard in event/feature pipelines (join each event to the
latest feature snapshot at or before its timestamp).

Spark-first derivation: a naive range join (``l.key = r.key AND r.ts <=
l.ts`` + pick max) explodes to O(|matches|) intermediate rows.  Instead,
union both sides tagged, sort once per key by (ts, side), and carry the
most recent right-side values forward with ``last(..., ignorenulls)``
over an unbounded-preceding window — ONE shuffle on the key, O(n log n)
per key, no row explosion.  Ties (right.ts == left.ts) order the right
row first, matching the inclusive ``r.ts <= l.ts`` semantics of
DuckDB/pandas ``ASOF JOIN``, which is also the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TS, _SIDE = "__asof_ts__", "__asof_side__"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None, suffix: str = "_r",
              tolerance_seconds: float | None = None) -> DataFrame:
    """Left rows + the latest right row with ``right.ts <= left.ts`` per
    ``on`` key (NULL-extended when none).  ``right_cols`` defaults to all
    right columns except the key and timestamp; clashes with left column
    names get ``suffix``.  ``tolerance_seconds`` voids matches older than
    ``left.ts - tolerance`` (pandas ``merge_asof`` semantics)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)]
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}

    l_part = left.select(
        F.col(on), F.col(left_ts).alias(_TS), F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts__"),
    )
    r_part = right.select(
        F.col(on), F.col(right_ts).alias(_TS), F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        *[F.col(c).alias(out_names[c]) for c in right_cols],
        F.col(right_ts).alias("__rts__"),
    )
    u = l_part.unionByName(r_part)

    w = (Window.partitionBy(on).orderBy(F.col(_TS), F.col(_SIDE))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in right_cols:
        u = u.withColumn(out_names[c],
                         F.last(F.col(out_names[c]), ignorenulls=True).over(w))
    u = u.withColumn("__rts__",
                     F.last(F.col("__rts__"), ignorenulls=True).over(w))

    out = u.where(F.col(_SIDE) == 1)
    if tolerance_seconds is not None:
        stale = (F.col("__rts__").isNull() |
                 (F.unix_micros(F.col(_TS)) - F.unix_micros(F.col("__rts__"))
                  > int(tolerance_seconds * 1_000_000)))
        for c in right_cols:
            out = out.withColumn(
                out_names[c],
                F.when(stale, F.lit(None)).otherwise(F.col(out_names[c])))
        out = out.withColumn(
            "__rts__", F.when(stale, F.lit(None)).otherwise(F.col("__rts__")))
    keep = ([F.col(on)]
            + [F.col(c) for c in left.columns if c != on]
            + [F.col(out_names[c]) for c in right_cols])
    return out.select(*keep)
