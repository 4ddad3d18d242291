"""Structured Streaming surface over the events table.

The reference has no streaming at all (SURVEY §2.7); this is green-field
Spark: file-source streams with watermarked tumbling windows and native
session windows.  The batch equivalents (queries.q_window_hourly /
q_sessionize) give the exact oracle — a streaming run with
``availableNow`` over the same files must produce the same aggregates,
which is what the tests assert.

Scale notes: watermark bounds state (late rows beyond 2 hours are
dropped); session windows use Spark's built-in state store rather than a
hand-rolled applyInPandasWithState, so state eviction, spill and restart
recovery come from the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import table_path


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the events parquet.  The testdata stores
    ``ts`` as TIMESTAMP(NANOS) which Spark reads as long under
    ``nanosAsLong`` — normalized here exactly like the batch loader
    (catalog.load_table)."""
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # the file stream source wants a directory to watch; point it at the
    # sf dir and glob-filter to the events file(s)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # integer division — see catalog.load_table
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # exact relabel under the pinned-UTC session — see catalog.load_table
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_counts_stream(events: DataFrame,
                           watermark: str = "2 hours",
                           window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming
    twin of queries.q_window_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).getField("start").alias("hour"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             # decimal sum: exact and order-independent, so the stream
             # matches the batch/DuckDB oracle bit-for-bit (see
             # queries.q_window_hourly on why not a rounded mean)
             F.sum(F.col("value").cast("decimal(18,6)"))
             .cast("double").alias("sum_value"))
    )


def sessionized_stream(events: DataFrame,
                       watermark: str = "2 hours",
                       gap: str = "30 minutes") -> DataFrame:
    """Native session windows per user (30-minute inactivity gap) — the
    streaming twin of queries.q_sessionize's session counting."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"), "n_events")
    )


def clicks_to_purchases_stream(events: DataFrame,
                               watermark: str = "2 hours",
                               horizon: str = "1 hour") -> DataFrame:
    """Stream-stream interval self-join: each click joined to the same
    user's purchases within ``horizon`` after the click.

    Both sides carry a watermark and the join condition bounds
    ``purchase_ts`` to ``[click_ts, click_ts + horizon]``, so Spark's
    symmetric-hash join can evict state once an input falls behind
    ``watermark + horizon`` — state stays O(in-flight window), not
    O(stream).  The batch twin (queries.q_clicks_to_purchases) is the
    exact oracle."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(F.col("user_id"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark))
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark))
    cond = (
        (clicks["user_id"] == purchases["p_user_id"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (purchases["purchase_ts"]
           <= clicks["click_ts"] + F.expr(f"INTERVAL {horizon}")))
    return (clicks.join(purchases, cond, "inner")
            .select("user_id", "click_id", "purchase_id",
                    "click_ts", "purchase_ts"))


def run_to_memory_sink(stream: DataFrame, name: str,
                       output_mode: str = "complete",
                       timeout_sec: int = 120) -> DataFrame:
    """Drain the stream with availableNow into an in-memory table and
    return it as a batch DataFrame (test/driver harness path)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stream.sparkSession.table(name)


def exact_dedup_stream(events: DataFrame, keys: list[str],
                       ts_col: str = "ts",
                       horizon: str = "30 days") -> DataFrame:
    """Streaming exact deduplication: emit each key-tuple's FIRST
    arrival, dropping later duplicates that land within ``horizon`` of
    it — Spark's ``dropDuplicatesWithinWatermark``, the ingest-time
    twin of the batch ``dedup.exact_dedup``.

    The watermark bounds the state exactly the way the TTL knobs on the
    stateful operators do: a key's fingerprint is held only until the
    event-time watermark passes its timestamp + horizon, so state is
    O(keys per horizon), not O(keys ever seen) — the property that
    keeps an at-least-once ingest dedup running forever at 100 TB/day.
    A duplicate arriving later than the horizon is re-emitted (the
    documented trade: bound the state or catch stragglers, pick one;
    the batch operator downstream catches the long tail).
    """
    return (events.withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark(keys))
