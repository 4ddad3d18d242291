"""Structured Streaming over events: streaming results must equal the
batch equivalents on the same files (availableNow drains everything)."""

import pytest

from pyspark.sql import functions as F

from scardina_spark.queries import q_sessionize, q_window_hourly
from scardina_spark.streaming import (
    read_events_stream, run_to_memory_sink, sessionized_stream,
    windowed_counts_stream)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


def test_stream_is_streaming(event_stream):
    assert event_stream.isStreaming
    assert dict(event_stream.dtypes)["ts"] == "timestamp"


def test_windowed_counts_match_batch(spark, sf_dir, event_stream):
    out = run_to_memory_sink(
        windowed_counts_stream(event_stream), "win_counts")
    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"])
           for r in out.collect()}
    want = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"])
            for r in q_window_hourly(spark, sf_dir).collect()}
    assert got == want


def test_sessionized_totals_match_batch(spark, sf_dir, event_stream):
    out = run_to_memory_sink(
        sessionized_stream(event_stream), "sessions")
    # session windows: total events per user must match; session count per
    # user must match the batch lag-gap computation
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in
           out.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").cast("long").alias("n_events"))
           .collect()}
    want = {r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in q_sessionize(spark, sf_dir).collect()}
    assert got == want


def test_session_windows_respect_gap(spark, event_stream):
    out = run_to_memory_sink(
        sessionized_stream(event_stream), "sessions_gap")
    rows = out.orderBy("user_id", "session_start").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        for a, b in zip(sess, sess[1:]):
            # next session must start >= 30 min after previous session end
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap >= 0


def test_stream_stream_join_matches_batch(spark, sf_dir, event_stream):
    """The stream-stream interval self-join (clicks -> purchases within
    1 h) drained with availableNow must equal the batch join exactly."""
    from scardina_spark.queries import q_clicks_to_purchases
    from scardina_spark.streaming import clicks_to_purchases_stream
    out = run_to_memory_sink(
        clicks_to_purchases_stream(event_stream), "ss_join",
        output_mode="append")
    got = sorted((r["user_id"], r["click_id"], r["purchase_id"])
                 for r in out.collect())
    want = sorted((r["user_id"], r["click_id"], r["purchase_id"])
                  for r in q_clicks_to_purchases(spark, sf_dir).collect())
    assert got == want and len(got) > 0


def test_stream_dsir_matches_batch_scorer(spark, tables, sf_dir):
    from scardina_spark.operators.dsir import score_against_lms
    from scardina_spark.streaming.curate import read_documents_stream
    from scardina_spark.streaming.dsir import (dsir_score_stream,
                                               train_reference_lms)
    from scardina_spark.streaming.events import run_to_memory_sink
    from pyspark.sql import functions as F

    docs = tables["documents"]
    lm_t, lm_r, oov_t, oov_r = train_reference_lms(
        docs, docs.where(F.col("source") == "src0"))
    st = read_documents_stream(spark, sf_dir)
    out = run_to_memory_sink(
        dsir_score_stream(st, lm_t, lm_r, oov_t, oov_r),
        "t_stream_dsir", output_mode="update")
    final = (out.groupBy("doc_id")
             .agg(F.max(F.struct("n_toks", "log_iw")).alias("m"))
             .select("doc_id", "m.n_toks", "m.log_iw"))
    got = {r["doc_id"]: (r["n_toks"], r["log_iw"])
           for r in final.collect()}
    want = {r["doc_id"]: (r["n_toks"], r["log_iw"])
            for r in score_against_lms(docs, lm_t, lm_r,
                                       oov_t, oov_r).collect()}
    assert got == want


def test_stream_media_decode_matches_batch(spark, tables, sf_dir):
    """st13: codec feature extraction on the stream == the batch
    pipeline row for row (the stages are stateless projections), for
    every codec; unknown codec rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from scardina_spark.operators.multimodal import (
        decode_avi_features, decode_png_features, decode_wav_features,
        documents_as_avi, documents_as_png, documents_as_wav)
    from scardina_spark.streaming.curate import read_documents_stream
    from scardina_spark.streaming.events import run_to_memory_sink
    from scardina_spark.streaming.media import decode_media_stream

    docs = tables["documents"]
    batch = {
        "wav": decode_wav_features(documents_as_wav(docs)),
        "png": decode_png_features(documents_as_png(docs)),
        "avi": decode_avi_features(documents_as_avi(docs)),
    }
    for codec, want_df in batch.items():
        st = read_documents_stream(spark, sf_dir)
        got = run_to_memory_sink(decode_media_stream(st, codec=codec),
                                 f"t_media_{codec}",
                                 output_mode="append")
        want = {tuple(r) for r in want_df.collect()}
        have = {tuple(r) for r in got.collect()}
        assert have == want and have, codec
    with _pytest.raises(ValueError, match="unknown codec"):
        decode_media_stream(read_documents_stream(spark, sf_dir),
                            codec="mp3")


def test_stream_media_decode_plan_is_stateless(spark, sf_dir):
    """st13's legality: the analyzed streaming plan carries NO
    stateful operator and NO aggregate — pure projections, so append
    mode needs no watermark."""
    from scardina_spark.streaming.curate import read_documents_stream
    from scardina_spark.streaming.media import decode_media_stream

    out = decode_media_stream(read_documents_stream(spark, sf_dir))
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" not in plan
    assert "Aggregate" not in plan


def test_exact_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """Duplicates split across micro-batches within the horizon are
    dropped; the survivor set is exactly the distinct key set."""
    from datetime import datetime

    from scardina_spark.streaming.events import (
        exact_dedup_stream, run_to_memory_sink)

    def _m(minute):
        return datetime(2024, 1, 1, 0, minute)

    d = str(tmp_path / "dd")
    schema = ("user_id bigint, event_type string, ts timestamp, "
              "event_id bigint")
    b1 = [(1, "click", _m(0), 0), (1, "click", _m(1), 1),  # dup in-batch
          (2, "view", _m(2), 2)]
    b2 = [(1, "click", _m(3), 3),                          # dup cross-batch
          (2, "click", _m(4), 4)]                          # new pair
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        d, mode="overwrite")
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append").parquet(d)
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(d))
    out = run_to_memory_sink(
        exact_dedup_stream(st, ["user_id", "event_type"], horizon="1 hour"),
        "dd_stream_test", output_mode="append")
    pairs = sorted((r["user_id"], r["event_type"]) for r in out.collect())
    assert pairs == [(1, "click"), (2, "click"), (2, "view")]
