"""Streaming maintenance of per-FK counts: multi-batch merge equals the
batch recompute; restarts and compaction change nothing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scardina_spark.streaming.stats import (
    compact_fk_counts, maintain_fk_counts, read_fk_counts)


@pytest.fixture(scope="module")
def event_files(spark, tables, tmp_path_factory):
    """events split into 3 parquet files so the file stream yields 3
    micro-batches with maxFilesPerTrigger=1."""
    d = str(tmp_path_factory.mktemp("ev_src"))
    ev = tables["events"]
    for i in range(3):
        (ev.where(F.col("event_id") % 3 == i)
         .coalesce(1).write.mode("append").parquet(d))
    return d


def _stream(spark, event_files):
    schema = spark.read.parquet(event_files).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(event_files))


def test_stream_counts_equal_batch(spark, tables, event_files, tmp_path):
    state = str(tmp_path / "state")
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    # one delta dir per micro-batch
    n_batches = len([d for d in os.listdir(state)
                     if d.startswith("batch_id=")])
    assert n_batches >= 3
    got = {(r["key"], r["cnt"]) for r in
           read_fk_counts(spark, state).collect()}
    want = {(r["user_id"], r["n"]) for r in
            tables["events"].where(F.col("user_id").isNotNull())
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_stream_restart_is_noop(spark, tables, event_files, tmp_path):
    state = str(tmp_path / "state")
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    before = sorted(read_fk_counts(spark, state).collect())
    # same checkpoint: the restarted query finds no new files
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    after = sorted(read_fk_counts(spark, state).collect())
    assert before == after


def test_new_file_after_restart_merges_in(spark, tables, event_files,
                                          tmp_path):
    state = str(tmp_path / "state")
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    # append a 4th file (duplicate of slice 0) and re-drain
    ev = spark.read.parquet(event_files)
    extra = ev.where(F.col("event_id") % 3 == 0)
    extra.coalesce(1).write.mode("append").parquet(event_files)
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    got = {(r["key"], r["cnt"]) for r in
           read_fk_counts(spark, state).collect()}
    full = spark.read.parquet(event_files)
    want = {(r["user_id"], r["n"]) for r in
            full.where(F.col("user_id").isNotNull())
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_compaction_preserves_counts(spark, event_files, tmp_path):
    state = str(tmp_path / "state")
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    before = sorted(read_fk_counts(spark, state).collect())
    compact_fk_counts(spark, state)
    dirs = [d for d in os.listdir(state) if d.startswith("batch_id=")]
    assert dirs == ["batch_id=-1"]
    assert sorted(read_fk_counts(spark, state).collect()) == before


def test_stream_kmv_sketch_equals_batch(spark, tables, event_files,
                                        tmp_path):
    """Multi-batch streamed KMV sketch == batch sketch of all events,
    bit-for-bit (deterministic hashing + semigroup merge)."""
    from scardina_spark.operators.sketches import kmv_sketch
    from scardina_spark.streaming.stats import (
        maintain_kmv_sketch, read_kmv_sketch)

    state = str(tmp_path / "state")
    maintain_kmv_sketch(_stream(spark, event_files), "user_id", state,
                        k=16, group_cols=["event_type"])
    got = {r["event_type"]: r["hashes"] for r in
           read_kmv_sketch(spark, state, k=16,
                           group_cols=["event_type"]).collect()}
    want = {r["event_type"]: r["hashes"] for r in
            kmv_sketch(tables["events"], "user_id", k=16,
                       group_cols=["event_type"]).collect()}
    assert got == want


def test_kmv_compaction_preserves_sketch(spark, tables, event_files,
                                         tmp_path):
    import os

    from scardina_spark.streaming.stats import (
        compact_kmv_sketch, maintain_kmv_sketch, read_kmv_sketch)

    state = str(tmp_path / "state")
    maintain_kmv_sketch(_stream(spark, event_files), "user_id", state,
                        k=16, group_cols=["event_type"])
    before = {r["event_type"]: r["hashes"] for r in
              read_kmv_sketch(spark, state, k=16,
                              group_cols=["event_type"]).collect()}
    compact_kmv_sketch(spark, state, k=16, group_cols=["event_type"])
    deltas = [d for d in os.listdir(state) if d.startswith("batch_id=")]
    assert deltas == ["batch_id=-1"]
    after = {r["event_type"]: r["hashes"] for r in
             read_kmv_sketch(spark, state, k=16,
                             group_cols=["event_type"]).collect()}
    assert before == after


def _committed_snapshot(state, merged):
    """Replicate _swap_deltas up to its commit point (manifest written),
    returning the folded delta dirs — callers then crash the delete loop
    wherever they like."""
    import json
    import os

    folded = [d for d in os.listdir(state) if d.startswith("batch_id=")]
    merged.write.mode("overwrite").parquet(f"{state}/__compact__")
    with open(f"{state}/__compact__/_manifest.json", "w") as f:
        json.dump(folded, f)
    return folded


def test_compaction_crash_window_recovers(spark, tables, event_files,
                                          tmp_path):
    """A crash between delta deletion and snapshot publication must not
    lose state: the read path publishes the committed __compact__."""
    import os
    import shutil

    from scardina_spark.streaming.stats import (
        maintain_kmv_sketch, read_kmv_sketch)

    state = str(tmp_path / "state")
    maintain_kmv_sketch(_stream(spark, event_files), "user_id", state,
                        k=16, group_cols=["event_type"])
    want = {r["event_type"]: r["hashes"] for r in
            read_kmv_sketch(spark, state, k=16,
                            group_cols=["event_type"]).collect()}

    # simulate the crash: snapshot committed, deltas deleted, rename lost
    merged = read_kmv_sketch(spark, state, k=16,
                             group_cols=["event_type"])
    for d in _committed_snapshot(state, merged):
        shutil.rmtree(f"{state}/{d}")

    got = {r["event_type"]: r["hashes"] for r in
           read_kmv_sketch(spark, state, k=16,
                           group_cols=["event_type"]).collect()}
    assert got == want
    assert not os.path.exists(f"{state}/__compact__")  # published


def test_mid_delete_crash_recovers(spark, tables, event_files, tmp_path):
    """THE lost-update window: a committed snapshot coexisting with a
    partial subset of deltas (crash midway through the delete loop).
    Folding the survivors would silently drop the deleted batches; the
    manifest gate must finish the swap instead."""
    import os
    import shutil

    from scardina_spark.streaming.stats import (
        maintain_fk_counts, read_fk_counts)

    state = str(tmp_path / "state")
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    want = sorted(read_fk_counts(spark, state).collect())

    merged = read_fk_counts(spark, state).selectExpr("key", "cnt as count")
    folded = _committed_snapshot(state, merged)
    assert len(folded) >= 2, "fixture needs multiple deltas"
    shutil.rmtree(f"{state}/{folded[0]}")  # crash after the FIRST delete

    got = sorted(read_fk_counts(spark, state).collect())
    assert got == want
    assert not os.path.exists(f"{state}/__compact__")


def test_post_crash_batch_survives_recovery(spark, tables, event_files,
                                            tmp_path):
    """A delta written AFTER a crashed (committed) compaction but BEFORE
    recovery is not part of the manifest and must survive the finished
    swap."""
    import shutil

    from pyspark.sql import functions as F

    from scardina_spark.streaming.stats import (
        maintain_fk_counts, read_fk_counts)

    state = str(tmp_path / "state")
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    base = {r["key"]: r["cnt"] for r in read_fk_counts(spark, state).collect()}

    merged = read_fk_counts(spark, state).selectExpr("key", "cnt as count")
    for d in _committed_snapshot(state, merged):
        shutil.rmtree(f"{state}/{d}")
    # the late batch: one more occurrence of a known key
    some_key = min(base)
    spark.createDataFrame([(some_key, 1)], "key long, count long") \
        .write.mode("overwrite").parquet(f"{state}/batch_id=999")

    got = {r["key"]: r["cnt"] for r in read_fk_counts(spark, state).collect()}
    assert got[some_key] == base[some_key] + 1
    assert {k: v for k, v in got.items() if k != some_key} == \
        {k: v for k, v in base.items() if k != some_key}


def test_uncommitted_compact_snapshot_is_discarded(spark, tables,
                                                   event_files, tmp_path):
    """__compact__ without a manifest (crash BEFORE the commit point)
    must be ignored — the deltas are still complete — not double-merged."""
    import os

    from scardina_spark.streaming.stats import (
        maintain_fk_counts, read_fk_counts)

    state = str(tmp_path / "state")
    maintain_fk_counts(_stream(spark, event_files), "user_id", state)
    want = sorted(read_fk_counts(spark, state).collect())
    # uncommitted snapshot (no manifest) next to intact deltas
    read_fk_counts(spark, state).selectExpr("key", "cnt as cnt") \
        .write.mode("overwrite").parquet(f"{state}/__compact__")
    got = sorted(read_fk_counts(spark, state).collect())
    assert got == want
    assert not os.path.exists(f"{state}/__compact__")


def test_stream_quantile_sketch_equals_batch(spark, tables, event_files,
                                             tmp_path):
    """Multi-batch streamed quantile sketch == batch sketch of all
    events, bit-for-bit (deterministic hashing + semigroup merge)."""
    from scardina_spark.operators.sketches import quantile_sketch
    from scardina_spark.streaming.stats import (
        maintain_quantile_sketch, read_quantile_sketch)

    state = str(tmp_path / "state")
    maintain_quantile_sketch(_stream(spark, event_files), "value",
                             "event_id", state, k=32,
                             group_cols=["event_type"])
    got = {r["event_type"]: r["samp"] for r in
           read_quantile_sketch(spark, state, k=32,
                                group_cols=["event_type"]).collect()}
    want = {r["event_type"]: r["samp"] for r in
            quantile_sketch(spark.read.parquet(event_files), "value",
                            "event_id", 32,
                            group_cols=["event_type"]).collect()}
    assert got == want


def test_quantile_compaction_preserves_sketch(spark, tables, event_files,
                                              tmp_path):
    from scardina_spark.streaming.stats import (
        compact_quantile_sketch, maintain_quantile_sketch,
        read_quantile_sketch)

    state = str(tmp_path / "state")
    maintain_quantile_sketch(_stream(spark, event_files), "value",
                             "event_id", state, k=32,
                             group_cols=["event_type"])
    before = {r["event_type"]: r["samp"] for r in
              read_quantile_sketch(spark, state, k=32,
                                   group_cols=["event_type"]).collect()}
    compact_quantile_sketch(spark, state, k=32, group_cols=["event_type"])
    deltas = [d for d in os.listdir(state) if d.startswith("batch_id=")]
    assert deltas == ["batch_id=-1"]
    after = {r["event_type"]: r["samp"] for r in
             read_quantile_sketch(spark, state, k=32,
                                  group_cols=["event_type"]).collect()}
    assert before == after


def test_token_account_stream_matches_batch(spark, sf_dir):
    from scardina_spark.operators.bpe import bpe_apply
    from scardina_spark.queries import BPE_APPLY_MERGES
    from scardina_spark.streaming.curate import read_documents_stream
    from scardina_spark.streaming.events import run_to_memory_sink
    from scardina_spark.streaming.stats import token_account_stream
    from scardina_spark.catalog import load_table
    from pyspark.sql import functions as F

    st = read_documents_stream(spark, sf_dir)
    got = {r["source"]: (r["n_docs"], r["total_bpe"]) for r in
           run_to_memory_sink(
               token_account_stream(st, BPE_APPLY_MERGES),
               "tok_account_parity", output_mode="complete").collect()}
    docs = load_table(spark, sf_dir, "documents")
    want = {r["source"]: (r["n"], r["t"]) for r in
            (bpe_apply(docs, BPE_APPLY_MERGES, keep_cols=("source",))
             .groupBy("source")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("n_bpe").alias("t"))).collect()}
    assert got == want


def test_token_account_stream_single_stateful_op(spark, sf_dir):
    """The tokenizer is a stateless projection; only the per-source
    aggregate holds state (|sources|-sized)."""
    from scardina_spark.queries import BPE_APPLY_MERGES
    from scardina_spark.streaming.curate import read_documents_stream
    from scardina_spark.streaming.stats import token_account_stream

    st = token_account_stream(read_documents_stream(spark, sf_dir),
                              BPE_APPLY_MERGES)
    assert st.isStreaming
    plan = st._jdf.queryExecution().analyzed().toString()
    assert plan.count("Aggregate") == 1, plan


def test_streamed_hll_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Streamed register maintenance == one batch pass, bit-for-bit,
    and therefore the estimates agree exactly (the max-semigroup
    property, the HLL leg of the st8 pattern)."""
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.sketches import (
        approx_distinct_hll, hll_estimate, hll_registers)
    from scardina_spark.streaming import read_events_stream
    from scardina_spark.streaming.stats import (
        maintain_hll_registers, read_hll_registers)

    state = str(tmp_path / "hll_state")
    maintain_hll_registers(read_events_stream(spark, sf_dir), "user_id",
                           state, group_cols=["event_type"])
    streamed = read_hll_registers(spark, state,
                                  group_cols=["event_type"])
    ev = load_table(spark, sf_dir, "events")
    batch = hll_registers(ev, "user_id", group_cols=["event_type"])
    assert (sorted(tuple(r) for r in streamed.collect())
            == sorted(tuple(r) for r in batch.collect()))
    a = sorted(tuple(r) for r in hll_estimate(
        streamed, group_cols=["event_type"]).collect())
    b = sorted(tuple(r) for r in approx_distinct_hll(
        ev, "user_id", group_cols=["event_type"]).collect())
    assert a == b
