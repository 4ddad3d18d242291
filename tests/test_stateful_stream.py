"""Stateful streaming first-seen dedup: stream == batch oracle, and
multi-batch replay/out-of-order semantics via a two-file stream."""

import os

from pyspark.sql import functions as F

from scardina_spark.streaming import (
    first_seen_dedup_stream, read_events_stream, run_to_memory_sink)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _batch_first(df):
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))


def test_stream_matches_batch(spark):
    st = read_events_stream(spark, SF_DIR)
    out = run_to_memory_sink(first_seen_dedup_stream(st),
                             "t_first_seen", output_mode="update")
    got = {(r["user_id"], r["event_id"]) for r in out.collect()}
    from scardina_spark.catalog import load_table
    ev = load_table(spark, SF_DIR, "events")
    want = {(r["user_id"], r["event_id"])
            for r in _batch_first(ev).collect()}
    assert got == want and got


def test_two_batch_replay_and_revision(spark, tmp_path):
    """Second micro-batch replays a seen event (suppressed) and delivers
    an out-of-order earlier event (revision emitted)."""
    d = str(tmp_path / "stream_src")
    os.makedirs(d)
    cols = ["event_id", "ts", "user_id"]
    b1 = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", 1), (20, "2024-01-01 09:00:00", 2)],
        cols).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", 1),    # replay of user 1's event
         (5, "2024-01-01 08:00:00", 1),     # earlier event -> revision
         (30, "2024-01-01 11:00:00", 3)],   # new user
        cols).withColumn("ts", F.to_timestamp("ts"))
    b1.coalesce(1).write.parquet(d + "/b=1")
    b2.coalesce(1).write.parquet(d + "/b=2")

    schema = spark.read.parquet(d + "/b=1").schema
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(d + "/b=*"))
    out = run_to_memory_sink(first_seen_dedup_stream(st),
                             "t_two_batch", output_mode="update")
    rows = out.collect()
    # final state per user: last update wins
    last = {}
    for r in rows:
        last[r["user_id"]] = r["event_id"]
    # depending on file order user 1 may emit once (5 first) or twice
    # (10 then revised to 5); the final value must be 5 either way
    assert last == {1: 5, 2: 20, 3: 30}
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["event_id"])
    assert len(per_user[2]) == 1  # never revised
    assert len(per_user[1]) <= 2  # replay suppressed, at most one revision


def test_state_ttl_evicts_and_replay_reemits(spark, tmp_path):
    """The 100 TB state bound: with ``state_timeout_ms`` set, a key
    idle past the horizon is EVICTED (fn sees hasTimedOut and removes
    it), so a replay arriving after the horizon re-emits as
    first-seen — exactly the bounded-state semantics the module
    docstring promises.  Without the knob the replay would be
    suppressed forever (pinned by test_two_batch_replay_and_revision)."""
    import time

    d = str(tmp_path / "ttl_src")
    os.makedirs(d)
    cols = ["event_id", "ts", "user_id"]
    b1 = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", 1)],
        cols).withColumn("ts", F.to_timestamp("ts"))
    b1.coalesce(1).write.parquet(d + "/b=1")
    schema = spark.read.parquet(d + "/b=1").schema
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(d + "/b=*"))
    out = first_seen_dedup_stream(st, state_timeout_ms=1_500)
    q = (out.writeStream.format("memory").queryName("t_ttl")
         .outputMode("update")
         .trigger(processingTime="300 milliseconds")
         .start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select * from t_ttl").count() >= 1:
                break
            time.sleep(0.2)
        assert spark.sql("select * from t_ttl").count() == 1
        # idle past the horizon: empty triggers fire the timeout and
        # evict the key's state
        time.sleep(5)
        # LATER event for the same user: without eviction this is
        # suppressed (not earlier than the emitted one); with eviction
        # it re-emits as the key's new first-seen
        b2 = spark.createDataFrame(
            [(99, "2024-01-01 12:00:00", 1)],
            cols).withColumn("ts", F.to_timestamp("ts"))
        b2.coalesce(1).write.parquet(d + "/b=2")
        while time.time() < deadline:
            if spark.sql("select * from t_ttl").count() >= 2:
                break
            time.sleep(0.2)
        rows = [(r["user_id"], r["event_id"])
                for r in spark.sql("select * from t_ttl").collect()]
        assert rows.count((1, 10)) == 1 and rows.count((1, 99)) == 1, rows
    finally:
        q.stop()


def test_scd2_stream_matches_batch_closed_intervals(spark, sf_dir):
    from pyspark.sql import functions as F
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.scd import scd2_history
    from scardina_spark.streaming.events import (
        read_events_stream, run_to_memory_sink)
    from scardina_spark.streaming.stateful import scd2_stream

    st = read_events_stream(spark, sf_dir).where(F.col("user_id") < 8)
    got = sorted(tuple(r) for r in run_to_memory_sink(
        scd2_stream(st), "scd2_stream_parity",
        output_mode="append").collect())
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    want = sorted(tuple(r) for r in
                  scd2_history(ev, "user_id", "event_type", "ts",
                               ["event_id"])
                  .where(F.col("valid_to").isNotNull())
                  .drop("is_current").collect())
    assert got == want and len(got) > 0


def test_scd2_stream_multi_batch_folds_against_state(spark, tmp_path):
    """Two micro-batches: the second closes the interval the first
    left open, and the emitted row spans both batches' events."""
    from datetime import datetime

    from scardina_spark.streaming.stateful import scd2_stream

    def _m(minute):
        return datetime(2024, 1, 1, 0, minute)

    d = str(tmp_path / "scdstream")
    schema = "user_id bigint, event_type string, ts timestamp, event_id bigint"
    b1 = [(1, "A", _m(0), 0), (1, "A", _m(1), 1)]
    b2 = [(1, "A", _m(2), 2), (1, "B", _m(3), 3)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        d, mode="overwrite")
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append").parquet(d)
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(d))
    q = (scd2_stream(st).writeStream.format("memory")
         .queryName("scd2_two_batches").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("scd2_two_batches").collect()
    # exactly one closed interval: A spanning all three A-events
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["event_type"], r["n_events"]) == (1, "A", 3)
    assert r["valid_from"] == _m(0)
    assert r["valid_to"] == _m(3)


def test_scd2_stream_drops_late_cross_batch_event(spark, tmp_path):
    """Watermark-style late-data policy: a second-batch event OLDER
    than the key's last folded observation is dropped instead of
    corrupting the open interval (the streaming analogue of the batch
    with_last_seen gate)."""
    from datetime import datetime

    from scardina_spark.streaming.stateful import scd2_stream

    def _m(minute):
        return datetime(2024, 1, 1, 0, minute)

    d = str(tmp_path / "scdlate")
    schema = "user_id bigint, event_type string, ts timestamp, event_id bigint"
    b1 = [(1, "A", _m(0), 0), (1, "A", _m(5), 1)]
    # b2: one late event (t3 < last folded t5, dropped) + one genuine
    # state change at t7 that closes the A interval
    b2 = [(1, "B", _m(3), 2), (1, "B", _m(7), 3)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        d, mode="overwrite")
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append").parquet(d)
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(d))
    q = (scd2_stream(st).writeStream.format("memory")
         .queryName("scd2_late").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("scd2_late").collect()
    assert len(rows) == 1
    r = rows[0]
    # the late t3 B-event is gone: A closes at t7, not t3
    assert (r["user_id"], r["event_type"], r["n_events"]) == (1, "A", 2)
    assert r["valid_from"] == _m(0)
    assert r["valid_to"] == _m(7)


def test_rolling_features_stream_exact_across_batches(spark, tmp_path):
    """The EWMA recursion continues ACROSS micro-batches from state
    (exactly — not the batch operator's truncated form), lag1 carries
    over, and a late cross-batch event is dropped."""
    from datetime import datetime

    from scardina_spark.streaming.events import run_to_memory_sink
    from scardina_spark.streaming.stateful import rolling_features_stream

    def _m(minute):
        return datetime(2024, 1, 1, 0, minute)

    d = str(tmp_path / "feat")
    schema = ("user_id bigint, event_type string, ts timestamp, "
              "event_id bigint, value double")
    b1 = [(1, "e", _m(0), 0, 10.0), (1, "e", _m(1), 1, 20.0)]
    b2 = [(1, "e", _m(2), 2, 30.0),
          (1, "e", _m(0), 9, 99.0)]        # late: older than last folded
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        d, mode="overwrite")
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append").parquet(d)
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(d))
    out = run_to_memory_sink(
        rolling_features_stream(st, alpha=0.5),
        "feat_stream_test", output_mode="append")
    rows = {r["event_id"]: (r["lag1"], r["ewma"])
            for r in out.collect()}
    assert set(rows) == {0, 1, 2}          # event 9 dropped as late
    assert rows[0] == (None, 10.0)
    assert rows[1] == (10.0, 15.0)         # .5*20 + .5*10
    assert rows[2] == (20.0, 22.5)         # continues from state: .5*30+.5*15


def test_rolling_features_stream_vs_batch_window_seeding(spark, tables):
    """Duality pin on the real events table: within the first K
    observations of a key, the batch window-seeded EWMA EQUALS the
    stream's exact recursion (to the 6-dp rounding); beyond the window
    they diverge by at most the pretend-seed's misassigned mass,
    (1-alpha)^(K-1) * 2 * max|x|."""
    from pyspark.sql import Window, functions as F

    from scardina_spark.operators.features import rolling_features
    from scardina_spark.queries import q_stream_features
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")
    stream = {(r["user_id"], r["event_id"]): r["ewma"]
              for r in q_stream_features(spark, sf).collect()}
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = rolling_features(tables["events"], "user_id", "ts", "value",
                             tiebreak=["event_id"], alpha=0.3,
                             ewma_terms=8
                             ).withColumn("rn", F.row_number().over(w))
    scale = batch.agg(F.max(F.abs("value"))).first()[0]
    bound = (1 - 0.3) ** 7 * 2 * scale + 1e-6
    for r in batch.collect():
        d = abs(r["ewma"] - stream[(r["user_id"], r["event_id"])])
        if r["rn"] <= 8:
            assert d < 1e-5, (r["user_id"], r["event_id"], d)
        else:
            assert d <= bound, (r["user_id"], r["event_id"], d)


def test_rolling_features_single_batch_drain_is_layout_proof(spark, tmp_path):
    """The st17 gate convention (queries.q_stream_features): draining in
    ONE micro-batch makes the in-batch (ts, id) sort total, so the
    stream folds EVERY event — matching the oracle's recursive CTE —
    even when the file layout is per-key out of order across files.
    With per-file micro-batches the same table silently drops the
    late-file rows (the watermark-style policy), which is exactly the
    divergence the single-batch drain exists to prevent."""
    from datetime import datetime

    from scardina_spark.streaming.events import run_to_memory_sink
    from scardina_spark.streaming.stateful import rolling_features_stream

    def _m(minute):
        return datetime(2024, 1, 1, 0, minute)

    d = str(tmp_path / "ooo")
    schema = ("user_id bigint, event_type string, ts timestamp, "
              "event_id bigint, value double")
    # file 1 holds the LATER events, file 2 the earlier ones: any
    # per-file schedule sees them out of order.
    f1 = [(1, "e", _m(2), 2, 30.0), (1, "e", _m(3), 3, 40.0)]
    f2 = [(1, "e", _m(0), 0, 10.0), (1, "e", _m(1), 1, 20.0)]
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(
        d, mode="overwrite")
    spark.createDataFrame(f2, schema).coalesce(1).write.mode(
        "append").parquet(d)

    def drain(max_files, name):
        st = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files).parquet(d))
        out = run_to_memory_sink(
            rolling_features_stream(st, alpha=0.5), name,
            output_mode="append")
        return {r["event_id"]: r["ewma"] for r in out.collect()}

    # per-file: whichever file lands second loses rows (late policy)
    per_file = drain(1, "ooo_per_file")
    assert len(per_file) < 4
    # single-batch: all four events folded in exact recursion order
    whole = drain(1_000_000, "ooo_single_batch")
    assert whole == {0: 10.0, 1: 15.0, 2: 22.5, 3: 31.25}
