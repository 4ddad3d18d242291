"""Sequential funnel over an event stream: how many entities performed
stage_1 → stage_2 → ... → stage_n in strict timestamp order, each step
within a bounded horizon of the previous.

Scale shape: one pass per stage, each a filter → equi-join on the entity
key → partial-aggregated ``min``.  Per-task state is a single timestamp
per entity, never an event array — a hot entity (one bot holding 10^8
events) streams through the join and collapses map-side, costing CPU but
bounded memory.  An earlier design used one shuffle +
``collect_list``-per-entity arrays; that is O(events-per-entity) task
memory and dies on heavy entities at the 100 TB target, so the k cheap
shuffles (all on the same key, reusable exchanges under AQE) are the
right trade.

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
    first qualifying stage-k event strictly follows their stage-(k-1)
    time, within ``horizon`` (None = unbounded).

    Stage-k times satisfy ``t_k = min{ts : type = stage_k, ts > t_(k-1),
    ts <= t_(k-1) + horizon}`` — computed stage-by-stage, so aggregation
    state per entity is one timestamp regardless of event volume.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    ev = (events
          .where(F.col(type_col).isin(*stages))
          .where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
          .select(user_col, ts_col, type_col))

    acc = (ev.where(F.col(type_col) == stages[0])
           .groupBy(user_col)
           .agg(F.min(ts_col).alias("__t0__")))
    for i, st in enumerate(stages[1:], start=1):
        prev = f"__t{i - 1}__"
        stev = (ev.where(F.col(type_col) == st)
                .select(user_col, F.col(ts_col).alias("__ts__")))
        cond = F.col("__ts__") > F.col(prev)
        if horizon is not None:
            cond = cond & (F.col("__ts__") <= F.col(prev) + F.expr(horizon))
        tk = (stev.join(acc.select(user_col, prev), user_col)
              .where(cond)
              .groupBy(user_col)
              .agg(F.min("__ts__").alias(f"__t{i}__")))
        # every stage-k entity also reached stage k-1, so a left join
        # keeps the funnel population stable
        acc = acc.join(tk, user_col, "left")
    return acc.agg(*[F.count(f"__t{i}__").alias(f"n_{st}")
                     for i, st in enumerate(stages)])
