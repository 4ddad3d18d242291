"""SCD Type 2 history construction: island semantics on crafted
histories, the tiling/conservation invariants on the real events table,
and the one-Exchange scale pin."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from scardina_spark.operators.scd import scd2_history


def _t(m):
    return datetime(2024, 1, 1, 0, m)


def test_scd2_crafted_islands(spark):
    rows = [
        # user 1: A,A,B,A -> three intervals (repeat collapses, A returns)
        (1, "A", _t(0), 0), (1, "A", _t(1), 1),
        (1, "B", _t(2), 2), (1, "A", _t(3), 3),
        # user 2: NULL,NULL,x,NULL -> NULL is a real state (3 intervals)
        (2, None, _t(0), 4), (2, None, _t(1), 5),
        (2, "x", _t(2), 6), (2, None, _t(3), 7),
        # user 3: ts tie resolved by the tiebreak column
        (3, "p", _t(0), 9), (3, "q", _t(0), 8),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, state: string, ts: timestamp, event_id: long")
    got = [tuple(r) for r in
           scd2_history(df, "user_id", "state", "ts", ["event_id"])
           .orderBy("user_id", "valid_from").collect()]
    assert got == [
        (1, "A", _t(0), _t(2), 2, False),
        (1, "B", _t(2), _t(3), 1, False),
        (1, "A", _t(3), None, 1, True),
        (2, None, _t(0), _t(2), 2, False),
        (2, "x", _t(2), _t(3), 1, False),
        (2, None, _t(3), None, 1, True),
        (3, "q", _t(0), _t(0), 1, False),  # event 8 sorts before 9
        (3, "p", _t(0), None, 1, True),
    ]


def test_scd2_invariants_on_events(spark, tables):
    ev = tables["events"]
    hist = scd2_history(ev, "user_id", "event_type", "ts",
                        ["event_id"]).cache()
    try:
        # conservation: every observation lands in exactly one interval
        n_hist = hist.agg(F.sum("n_events")).first()[0]
        assert n_hist == ev.count()
        # exactly one current row per key
        cur = hist.groupBy("user_id").agg(
            F.sum(F.col("is_current").cast("int")).alias("c"))
        assert cur.where(F.col("c") != 1).count() == 0
        # tiling: valid_to == next interval's valid_from, per key
        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy("valid_from")
        bad = (hist.withColumn("nxt", F.lead("valid_from").over(w))
               .where(~F.col("valid_to").eqNullSafe(F.col("nxt"))))
        assert bad.count() == 0
        # islands are maximal: consecutive intervals never share a state
        rep = (hist.withColumn("nxt_s", F.lead("event_type").over(w))
               .where(F.col("nxt_s").isNotNull()
                      & F.col("event_type").eqNullSafe(F.col("nxt_s"))))
        assert rep.count() == 0
    finally:
        hist.unpersist()


def test_scd2_single_exchange(spark, tables):
    """Scale pin: the whole history build is windows over ONE
    partitionBy(key) — exactly one Exchange in the physical plan."""
    plan = (scd2_history(tables["events"], "user_id", "event_type", "ts",
                         ["event_id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def _canon_hist(df):
    return sorted(tuple(r) for r in df.collect())


def test_scd2_merge_equals_from_scratch_any_cutoff(spark, tables):
    """The x62 property, applied to dimensions: for EVERY cutoff the
    incremental merge must reproduce the from-scratch build exactly."""
    from scardina_spark.operators.scd import scd2_merge

    ev = tables["events"].where(F.col("user_id") < 6)
    full = _canon_hist(scd2_history(ev, "user_id", "event_type", "ts",
                                    ["event_id"]))
    for cut in ("2024-01-03", "2024-01-15", "2024-01-28"):
        c = F.lit(cut).cast("timestamp")
        hist = scd2_history(ev.where(F.col("ts") < c), "user_id",
                            "event_type", "ts", ["event_id"])
        merged = scd2_merge(hist, ev.where(F.col("ts") >= c), "user_id",
                            "event_type", "ts", ["event_id"])
        assert _canon_hist(merged.select(*[c_ for c_ in
                                           hist.columns])) == full, cut


def test_scd2_merge_handles_brand_new_keys(spark):
    from scardina_spark.operators.scd import scd2_merge
    old = [(1, "A", _t(0), 0), (1, "B", _t(1), 1)]
    new = [(1, "B", _t(2), 2),          # extends key 1's open interval
           (2, "Z", _t(3), 3), (2, "Y", _t(4), 4)]  # key 2 is new
    schema = "user_id: long, state: string, ts: timestamp, event_id: long"
    hist = scd2_history(spark.createDataFrame(old, schema),
                        "user_id", "state", "ts", ["event_id"])
    merged = scd2_merge(hist, spark.createDataFrame(new, schema),
                        "user_id", "state", "ts", ["event_id"])
    both = scd2_history(spark.createDataFrame(old + new, schema),
                        "user_id", "state", "ts", ["event_id"])
    assert _canon_hist(merged.select(*both.columns)) == _canon_hist(both)


def test_scd2_merge_rejects_backfill(spark):
    import pytest
    from scardina_spark.operators.scd import scd2_merge
    schema = "user_id: long, state: string, ts: timestamp, event_id: long"
    hist = scd2_history(
        spark.createDataFrame([(1, "A", _t(5), 0)], schema),
        "user_id", "state", "ts", ["event_id"])
    late = spark.createDataFrame([(1, "B", _t(2), 1)], schema)
    with pytest.raises(ValueError, match="append-only"):
        scd2_merge(hist, late, "user_id", "state", "ts", ["event_id"])

def test_scd2_last_seen_crafted(spark):
    """with_last_seen records each island's LAST observation (valid_from
    records the first)."""
    rows = [(1, "A", _t(0), 0), (1, "A", _t(5), 1),   # open island A
            (1, "B", _t(7), 2), (1, "B", _t(9), 3)]
    schema = "user_id: long, state: string, ts: timestamp, event_id: long"
    hist = scd2_history(spark.createDataFrame(rows, schema),
                        "user_id", "state", "ts", ["event_id"],
                        with_last_seen=True)
    got = {(r["state"]): (r["valid_from"], r["last_seen"])
           for r in hist.collect()}
    assert got == {"A": (_t(0), _t(5)), "B": (_t(7), _t(9))}


def test_scd2_last_seen_single_exchange(spark, tables):
    """The last_seen column rides the same partitionBy(key) — still
    exactly one Exchange (an extra Sort is fine, a shuffle is not)."""
    plan = (scd2_history(tables["events"], "user_id", "event_type", "ts",
                         ["event_id"], with_last_seen=True)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def test_scd2_merge_gate_catches_collapsed_observation_insert(spark):
    """The ADVICE scenario: open island has observations t0 and t5
    (collapsed to one interval with valid_from=t0); a delta event at t3
    passes the legacy valid_from gate but diverges from a from-scratch
    rebuild.  With last_seen the gate is exact and rejects it."""
    import pytest
    from scardina_spark.operators.scd import scd2_merge
    schema = "user_id: long, state: string, ts: timestamp, event_id: long"
    old = spark.createDataFrame([(1, "A", _t(0), 0), (1, "A", _t(5), 1)],
                                schema)
    mid = spark.createDataFrame([(1, "B", _t(3), 2)], schema)
    # legacy gate: silently accepted (documented insufficiency)
    legacy = scd2_history(old, "user_id", "state", "ts", ["event_id"])
    assert scd2_merge(legacy, mid, "user_id", "state", "ts",
                      ["event_id"]).count() == 2   # wrong, and ungated
    # last_seen gate: rejected
    strict = scd2_history(old, "user_id", "state", "ts", ["event_id"],
                          with_last_seen=True)
    with pytest.raises(ValueError, match="last_seen"):
        scd2_merge(strict, mid, "user_id", "state", "ts", ["event_id"])
    # since gate: the boundary check rejects the too-early delta
    with pytest.raises(ValueError, match="ingest boundary"):
        scd2_merge(legacy, mid, "user_id", "state", "ts", ["event_id"],
                   since="2024-01-01 00:04:00")


def test_scd2_merge_since_rejects_stale_boundary(spark):
    """since= also validates the history side: an interval starting
    at/after the boundary means the boundary is wrong."""
    import pytest
    from scardina_spark.operators.scd import scd2_merge
    schema = "user_id: long, state: string, ts: timestamp, event_id: long"
    hist = scd2_history(
        spark.createDataFrame([(1, "A", _t(0), 0), (1, "B", _t(9), 1)],
                              schema),
        "user_id", "state", "ts", ["event_id"])
    delta = spark.createDataFrame([(1, "C", _t(9), 2)], schema)
    with pytest.raises(ValueError, match="boundary"):
        scd2_merge(hist, delta, "user_id", "state", "ts", ["event_id"],
                   since="2024-01-01 00:05:00")


def test_scd2_merge_maintains_last_seen(spark, tables):
    """A last_seen history merged incrementally stays bit-identical —
    INCLUDING the last_seen column — to the from-scratch build, for
    every cutoff (so chained CDC loads keep their exact gate)."""
    from scardina_spark.operators.scd import scd2_merge

    ev = tables["events"].where(F.col("user_id") < 6)
    full = _canon_hist(scd2_history(ev, "user_id", "event_type", "ts",
                                    ["event_id"], with_last_seen=True))
    for cut in ("2024-01-03", "2024-01-15", "2024-01-28"):
        c = F.lit(cut).cast("timestamp")
        hist = scd2_history(ev.where(F.col("ts") < c), "user_id",
                            "event_type", "ts", ["event_id"],
                            with_last_seen=True)
        merged = scd2_merge(hist, ev.where(F.col("ts") >= c), "user_id",
                            "event_type", "ts", ["event_id"])
        assert _canon_hist(merged.select(*hist.columns)) == full, cut


def test_scd2_merge_chained_last_seen(spark):
    """Two successive merges over a last_seen history == one
    from-scratch build (the gate stays exact across generations)."""
    from scardina_spark.operators.scd import scd2_merge
    schema = "user_id: long, state: string, ts: timestamp, event_id: long"
    e1 = [(1, "A", _t(0), 0), (1, "A", _t(2), 1)]
    e2 = [(1, "B", _t(4), 2), (2, "Z", _t(5), 3)]
    e3 = [(1, "B", _t(6), 4), (2, "Y", _t(7), 5)]
    mk = lambda rows: spark.createDataFrame(rows, schema)
    h = scd2_history(mk(e1), "user_id", "state", "ts", ["event_id"],
                     with_last_seen=True)
    h = scd2_merge(h, mk(e2), "user_id", "state", "ts", ["event_id"])
    h = scd2_merge(h, mk(e3), "user_id", "state", "ts", ["event_id"])
    full = scd2_history(mk(e1 + e2 + e3), "user_id", "state", "ts",
                        ["event_id"], with_last_seen=True)
    assert _canon_hist(h.select(*full.columns)) == _canon_hist(full)
