"""Rolling per-key features: crafted-value semantics, truncation
behavior, layout invariance, and the one-Exchange scale pin."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from scardina_spark.operators.features import rolling_features


def _t(m):
    return datetime(2024, 1, 1, 0, m)


def test_crafted_lag_ma_ewma(spark):
    rows = [(1, _t(i), float(v), i)
            for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(
        rows, "k: long, ts: timestamp, value: double, eid: long")
    out = {r["eid"]: r for r in
           rolling_features(df, "k", "ts", "value", tiebreak=["eid"],
                            ma_rows=2, alpha=0.5, ewma_terms=3)
           .collect()}
    assert out[0]["lag1"] is None and out[1]["lag1"] == 10.0
    assert out[0]["ma2"] == 10.0 and out[1]["ma2"] == 15.0
    assert out[3]["ma2"] == 35.0
    # ewma, alpha=.5, 3 terms, window-seeded (= the exact recursion
    # while the history fits the window)
    assert abs(out[0]["ewma"] - 10.0) < 1e-9
    assert abs(out[1]["ewma"] - 15.0) < 1e-9           # .5*20 + .5*10
    assert abs(out[2]["ewma"] - 22.5) < 1e-9           # .5*30+.25*20+.25*10
    # row3: the window edge re-seeds at row1 (exact would be 31.25)
    assert abs(out[3]["ewma"] - (20 + 7.5 + 5.0)) < 1e-9


def test_layout_invariant_on_events(spark, tables):
    ev = tables["events"]
    a = {r["event_id"]: (r["lag1"], r["ma5"], r["ewma"]) for r in
         rolling_features(ev, "user_id", "ts", "value",
                          tiebreak=["event_id"]).collect()}
    b = {r["event_id"]: (r["lag1"], r["ma5"], r["ewma"]) for r in
         rolling_features(ev.repartition(13), "user_id", "ts", "value",
                          tiebreak=["event_id"]).collect()}
    assert a == b


def test_single_exchange_plan(spark, tables):
    """Scale pin: lag, trailing mean and the 8 EWMA lag terms all ride
    ONE partitionBy(key) window — exactly one Exchange."""
    plan = (rolling_features(tables["events"], "user_id", "ts", "value",
                             tiebreak=["event_id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def test_validates(spark, tables):
    with pytest.raises(ValueError, match="alpha"):
        rolling_features(tables["events"], "user_id", "ts", "value",
                         alpha=0.0)
    with pytest.raises(ValueError, match="ma_rows"):
        rolling_features(tables["events"], "user_id", "ts", "value",
                         ma_rows=0)
