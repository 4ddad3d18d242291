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
