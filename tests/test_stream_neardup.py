"""Streaming near-dup probe (st12): row-wise signatures equal the
batch explode+groupBy signatures bit-for-bit, the stream's emitted
pairs equal the batch incremental probe's, and cross-batch replays of
the same pair are suppressed by the stateful operator."""

import os

from pyspark.sql import functions as F

from scardina_spark.operators.dedup import (
    incremental_near_dup, minhash_signatures, minhash_signatures_rowwise)
from scardina_spark.streaming.events import run_to_memory_sink
from scardina_spark.streaming.neardup import (
    build_neardup_index, near_dup_probe_stream)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_rowwise_signatures_match_batch(tables):
    """The projection form must reproduce the shuffle form exactly —
    same salted hashes, same min over the same distinct shingles — in
    both hash modes (the streaming path's correctness rests on it)."""
    docs = tables["documents"]
    for hf in ("md5", "xxhash64"):
        a = [r.asDict() for r in minhash_signatures(
            docs, n_hashes=8, hash_fn=hf).orderBy("doc_id").collect()]
        b = [r.asDict() for r in minhash_signatures_rowwise(
            docs, n_hashes=8, hash_fn=hf).orderBy("doc_id").collect()]
        assert a == b and a, hf


def test_stream_probe_matches_batch_probe(spark, tables):
    """availableNow drain over the sf corpus == the batch asymmetric
    probe on the same shard split: same pairs, same jaccard."""
    from scardina_spark.streaming.curate import read_documents_stream
    docs = tables["documents"]
    new = docs.where(F.col("doc_id") % 5 == 0)
    idx = docs.where(F.col("doc_id") % 5 != 0)
    bands, shingles = build_neardup_index(idx)
    st = (read_documents_stream(spark, SF_DIR)
          .where(F.col("doc_id") % 5 == 0))
    out = run_to_memory_sink(
        near_dup_probe_stream(st, bands, shingles, threshold=0.8),
        "t_neardup_stream", output_mode="update")
    got = {(r["new_id"], r["index_id"]): r["jaccard"]
           for r in out.collect()}
    want = {(r["new_id"], r["index_id"]): r["jaccard"]
            for r in incremental_near_dup(new, idx,
                                          threshold=0.8).collect()}
    assert got == want and got


def test_cross_batch_pair_suppression(spark, tmp_path):
    """A pair reported in micro-batch 1 must NOT re-emit when batch 2
    replays the same document (and a new near-dup in batch 2 still
    reports)."""
    d = str(tmp_path / "neardup_src")
    os.makedirs(d)
    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    idx = spark.createDataFrame(
        [(1, dup_text), (2, "one two three four five six seven")],
        "doc_id: long, text: string")
    bands, shingles = build_neardup_index(idx)
    b1 = spark.createDataFrame([(10, dup_text)],
                               "doc_id: long, text: string")
    b2 = spark.createDataFrame(
        [(10, dup_text),                                  # replay
         (15, "one two three four five six seven"),       # new dup
         (20, "totally different words compose this doc")],
        "doc_id: long, text: string")
    b1.coalesce(1).write.parquet(d + "/b=1")
    b2.coalesce(1).write.parquet(d + "/b=2")
    schema = spark.read.parquet(d + "/b=1").schema
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(d + "/b=*"))
    out = run_to_memory_sink(
        near_dup_probe_stream(st, bands, shingles, threshold=0.8),
        "t_neardup_two_batch", output_mode="update")
    rows = [(r["new_id"], r["index_id"]) for r in out.collect()]
    assert rows.count((10, 1)) == 1   # replay suppressed
    assert rows.count((15, 2)) == 1   # later batch still reports
    assert all(p in ((10, 1), (15, 2)) for p in rows)
