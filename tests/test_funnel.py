"""Generalized funnel operator: hand-checkable fixture, horizon
semantics, stage ordering strictness, and input validation."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from scardina_spark.operators.funnel import funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), t)
         for u, h, t in rows],
        ["user_id", "ts", "event_type"])


def test_funnel_hand_fixture(spark):
    ev = _ev(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "buy"),      # full path
        (2, 0, "view"), (2, 1, "click"),                      # no buy
        (3, 0, "click"), (3, 1, "view"),                      # wrong order
        (4, 0, "view"), (4, 30, "click"),                     # out of horizon
    ])
    r = funnel_counts(ev, ["view", "click", "buy"],
                      horizon="INTERVAL 24 HOURS").first()
    assert (r["n_view"], r["n_click"], r["n_buy"]) == (4, 2, 1)


def test_funnel_unbounded_horizon(spark):
    ev = _ev(spark, [(1, 0, "view"), (1, 1000, "click")])
    bounded = funnel_counts(ev, ["view", "click"],
                            horizon="INTERVAL 24 HOURS").first()
    unbounded = funnel_counts(ev, ["view", "click"], horizon=None).first()
    assert bounded["n_click"] == 0
    assert unbounded["n_click"] == 1


def test_funnel_strict_order_ties_excluded(spark):
    # same timestamp does NOT advance the funnel (strict >)
    ev = _ev(spark, [(1, 0, "view"), (1, 0, "click")])
    r = funnel_counts(ev, ["view", "click"]).first()
    assert (r["n_view"], r["n_click"]) == (1, 0)


def test_funnel_rejects_empty_stages(spark):
    ev = _ev(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        funnel_counts(ev, [])


def test_funnel_plan_bounded_state_no_window(spark):
    ev = _ev(spark, [(1, 0, "view"), (2, 1, "click")])
    df = funnel_counts(ev, ["view", "click"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Python" not in plan
    # heavy-entity safety: per-entity state must be a min, never an array
    assert "collect_list" not in plan
    # map-side partial aggregation absorbs hot keys before the shuffle
    assert "partial_min" in plan or "partial" in plan.lower()


def test_funnel_heavy_entity_bounded_memory(spark):
    # one bot entity holding 10^6 events must stream through (bounded
    # per-task state), not materialize as a single per-entity array
    n = 1_000_000
    ev = (spark.range(n)
          .select(F.lit(1).alias("user_id"),
                  (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                   + F.make_interval(secs=F.col("id").cast("double")))
                  .alias("ts"),
                  F.when(F.col("id") % 3 == 0, "view")
                  .when(F.col("id") % 3 == 1, "click")
                  .otherwise("buy").alias("event_type")))
    r = funnel_counts(ev, ["view", "click", "buy"],
                      horizon="INTERVAL 24 HOURS").first()
    # view@t=0, first click after it @t=1, first buy after that @t=2
    assert (r["n_view"], r["n_click"], r["n_buy"]) == (1, 1, 1)


def test_funnel_entity_column_named_a(spark):
    # internal aliases must not collide with user column names
    import datetime as dt
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "view"),
         (1, dt.datetime(2024, 1, 1, 1), "click")],
        ["a", "ts", "event_type"])
    r = funnel_counts(ev, ["view", "click"], user_col="a").first()
    assert (r["n_view"], r["n_click"]) == (1, 1)
