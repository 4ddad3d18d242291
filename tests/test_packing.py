"""Sequence packing: hand-checkable layout, invariants, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scardina_spark.operators.packing import pack_sequences, pack_stats


def _docs(spark, token_counts):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(token_counts)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pack_hand_fixture(spark):
    # widths 4, 8, 3 on a seq_len-10 line: starts 0, 4, 12
    df = _docs(spark, [4, 8, 3])
    got = {r["doc_id"]: r for r in pack_sequences(df, 10).collect()}
    assert (got[0]["pack_id"], got[0]["pack_offset"], got[0]["n_packs"]) \
        == (0, 0, 1)
    # doc 1 occupies [4, 12): starts in pack 0, spills into pack 1
    assert (got[1]["pack_id"], got[1]["pack_offset"], got[1]["n_packs"]) \
        == (0, 4, 2)
    assert (got[2]["pack_id"], got[2]["pack_offset"], got[2]["n_packs"]) \
        == (1, 2, 1)


def test_pack_stats_counts_all_packs(spark):
    # widths 4, 8, 3 = 15 tokens on seq_len 10 → 2 packs (ceil includes
    # the final partial pack), one spanning doc (doc 1: [4, 12))
    df = _docs(spark, [4, 8, 3])
    s = pack_stats(pack_sequences(df, 10), 10).first()
    assert (s["total_tokens"], s["n_packs"], s["n_spanning_docs"],
            s["last_pack_id"]) == (15, 2, 1, 1)


def test_pack_boundary_exact_fit_does_not_spill(spark):
    # widths 10, 10: each exactly fills a pack
    df = _docs(spark, [10, 10])
    got = {r["doc_id"]: r for r in pack_sequences(df, 10).collect()}
    assert (got[0]["pack_id"], got[0]["n_packs"]) == (0, 1)
    assert (got[1]["pack_id"], got[1]["pack_offset"], got[1]["n_packs"]) \
        == (1, 0, 1)


def test_empty_document_keeps_position(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, ""), (2, "c d e")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pack_sequences(df, 10).collect()}
    assert got[1]["n_tokens"] == 0
    assert (got[1]["pack_id"], got[1]["pack_offset"], got[1]["n_packs"]) \
        == (0, 2, 1)
    assert got[2]["pack_offset"] == 2  # empty doc consumed no room


def test_pack_layout_invariants(spark, tables):
    """Contiguity on real data: sorted by doc_id, each document starts
    exactly where the previous ended (global position = pack_id*L +
    offset), and stats agree with the token total."""
    seq_len = 128
    docs = tables["documents"]
    asg = pack_sequences(docs, seq_len).orderBy("doc_id").collect()
    pos = 0
    for r in asg:
        assert r["pack_id"] * seq_len + r["pack_offset"] == pos, r
        pos += r["n_tokens"]
    st = pack_stats(pack_sequences(docs, seq_len), seq_len).first()
    assert st["total_tokens"] == pos
    assert st["n_packs"] == -(-pos // seq_len)
    assert st["last_pack_id"] == (pos - 1) // seq_len


def test_pack_rejects_bad_seq_len(spark):
    df = _docs(spark, [3])
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_pack_plan_no_single_partition_window(spark):
    df = _docs(spark, [4, 8, 3])
    plan = pack_sequences(df, 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_chunk_hand_fixture(spark):
    from scardina_spark.operators.packing import chunk_documents
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    # chunk 4, overlap 1 -> stride 3: starts 0, 3, 6 (6+4 covers all 10)
    got = [(r["chunk_id"], r["chunk_text"], r["n_chunk_toks"])
           for r in chunk_documents(df, 4, 1).orderBy("chunk_id").collect()]
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]


def test_chunk_reconstructs_document_no_overlap(spark, tables):
    from scardina_spark.operators.packing import chunk_documents
    from scardina_spark.operators.textstats import token_count
    docs = tables["documents"].limit(50)
    chunks = chunk_documents(docs, 64, 0)
    # zero overlap: concatenating a doc's chunks in order restores its
    # whitespace-normalized token stream, and counts add up exactly
    rejoined = (chunks.orderBy("doc_id", "chunk_id")
                .groupBy("doc_id")
                .agg(F.array_join(F.collect_list("chunk_text"), " ")
                     .alias("re"),
                     F.sum("n_chunk_toks").alias("n")))
    norm = docs.select(
        "doc_id",
        F.array_join(F.filter(F.split("text", r"\s+"),
                              lambda w: F.length(w) > 0), " ")
        .alias("want"),
        token_count().alias("want_n"))
    joined = rejoined.join(norm, "doc_id").collect()
    assert len(joined) == 50
    for r in joined:
        assert r["re"] == r["want"] and r["n"] == r["want_n"]


def test_chunk_short_and_empty_docs(spark):
    from scardina_spark.operators.packing import chunk_documents
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "x")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["chunk_id"], r["n_chunk_toks"])
           for r in chunk_documents(df, 8, 4).collect()}
    assert got == {1: (0, 3), 2: (0, 0), 3: (0, 1)}


def test_chunk_rejects_bad_params(spark):
    from scardina_spark.operators.packing import chunk_documents
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, 4)


def test_chunk_overlap_invariants_across_lengths(spark):
    """Vectorized invariants over documents of every length 0..40 with
    odd params (chunk 7, overlap 3): chunk sizes <= 7, every chunk but
    the last is full, consecutive chunks share exactly the 3-token
    overlap, and the union of windows covers the whole token stream."""
    from scardina_spark.operators.packing import chunk_documents
    rows = [(n, " ".join(f"t{n}_{i}" for i in range(n)))
            for n in range(41)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = chunk_documents(df, 7, 3).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    stride = 4
    for n, text in rows:
        got = sorted(by_doc[n], key=lambda r: r["chunk_id"])
        toks = text.split()
        assert [r["chunk_id"] for r in got] == list(range(len(got)))
        for r in got:
            start = r["chunk_id"] * stride
            want = toks[start:start + 7]
            assert r["chunk_text"].split() == want if want else \
                r["chunk_text"] == ""
            assert r["n_chunk_toks"] == len(want)
        # coverage: last window reaches the end; no extra empty windows
        if n > 0:
            last = got[-1]
            assert last["chunk_id"] * stride + last["n_chunk_toks"] == n
            assert last["n_chunk_toks"] > 0 or n == 0
        else:
            assert len(got) == 1 and got[0]["n_chunk_toks"] == 0


def test_shard_plan_balance_and_partition_layout(spark, tables):
    """The serpentine deal's balance guarantee on the real corpus:
    shard token totals differ by at most 2x the largest doc; every doc
    lands in exactly one shard; assignment is layout-invariant."""
    from pyspark.sql import functions as F

    from scardina_spark.operators.packing import shard_plan
    from scardina_spark.operators.textstats import lower_words
    docs = tables["documents"].select(
        "doc_id",
        F.size(F.coalesce(lower_words("text"),
                          F.array().cast("array<string>")))
        .alias("n_toks"))
    plan = shard_plan(docs, n_shards=8)
    tot = {r["shard"]: r["t"] for r in
           plan.groupBy("shard").agg(F.sum("n_toks").alias("t")).collect()}
    assert set(tot) == set(range(8))
    mx = docs.agg(F.max("n_toks")).first()[0]
    assert max(tot.values()) - min(tot.values()) <= 2 * mx, (tot, mx)
    assert plan.count() == docs.count()
    a = {r["doc_id"]: r["shard"] for r in plan.collect()}
    b = {r["doc_id"]: r["shard"] for r in
         shard_plan(docs.repartition(11), n_shards=8).collect()}
    assert a == b


def test_shard_plan_validates(spark, tables):
    import pytest
    from scardina_spark.operators.packing import shard_plan
    with pytest.raises(ValueError, match="n_shards"):
        shard_plan(tables["documents"], n_shards=0)
