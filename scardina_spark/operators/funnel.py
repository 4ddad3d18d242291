"""Sequential funnel over an event stream: how many entities performed
stage_1 → stage_2 → ... → stage_n in strict timestamp order, each step
within a bounded horizon of the previous.

Scale shape: ONE shuffle on the entity key builds per-entity event
arrays (state per task = one entity's events); the ordered-stage walk is
a chain of array projections (filter + transform + array_min) in
whole-stage codegen — stage count and horizon length never add
shuffles, window functions, or re-joins of the event table.

Reference anchor: none (Scardina has no event analytics); this is the
north-star training-pipeline surface, same family as the session
windows in streaming/events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_counts(events: DataFrame, stages: list[str],
                  horizon: str | None = "INTERVAL 24 HOURS",
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """One row with a ``n_<stage>`` column per stage: entities whose
    first qualifying stage-k event follows their stage-(k-1) time,
    within ``horizon`` (None = unbounded)."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    ev = (events
          .where(F.col(type_col).isin(*stages))
          .where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
          .groupBy(user_col)
          .agg(F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                       F.col(type_col).alias("et")))
               .alias("__evts__")))

    def first_after(et, after):
        bound = (None if after is None or horizon is None
                 else after + F.expr(horizon))
        cond = (lambda x: (x["et"] == et)) if after is None else (
            lambda x: (x["et"] == et) & (x["ts"] > after)
            & (F.lit(True) if bound is None else (x["ts"] <= bound)))
        return F.array_min(
            F.transform(F.filter(F.col("__evts__"), cond),
                        lambda x: x["ts"]))

    cur = ev
    prev = None
    t_cols = []
    for i, st in enumerate(stages):
        tname = f"__t{i}__"
        cur = cur.withColumn(tname, first_after(st, prev))
        prev = F.col(tname)
        t_cols.append((tname, st))
    return cur.agg(*[F.count(t).alias(f"n_{st}") for t, st in t_cols])
