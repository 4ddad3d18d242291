"""Sequence packing: lay a tokenized corpus onto fixed-capacity
training sequences.

Pre-training batches want constant-length sequences (e.g. 2048 tokens);
documents are laid end-to-end on a single global token line and cut
every ``seq_len`` tokens — the standard "packed" dataset layout
(concat-and-chunk, as used by GPT-2/T5-style pipelines).  This module
computes, per document, WHERE on that line it lands:

* ``pack_id``    — the sequence containing the document's first token;
* ``pack_offset``— the document's start position inside that sequence;
* ``n_packs``    — how many sequences the document spans (a document
  longer than the remaining room spills into the next pack(s)).

The layout is a pure function of (corpus, order, seq_len): documents
are ordered deterministically (by id) and positioned by the EXCLUSIVE
prefix sum of their token counts — so the assignment is exactly
reproducible by a SQL window cumsum, and a writer can materialize the
physical packed sequences partition-by-partition with no coordination.

Scale shape: one range-partitioned sort for the distributed prefix sum
(`operators/prefix.with_prefix_sum` — per-partition offsets, no
single-partition window), then pure projections.  Reference anchor:
none (Scardina has no text pipeline); north-star training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .prefix import CUM, with_prefix_sum
from .textstats import token_count, words


def pack_sequences(docs: DataFrame, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text",
                   n_tokens_col: str | None = None) -> DataFrame:
    """Assign each document its place in the packed layout.

    ``n_tokens_col`` supplies a pre-computed token count column;
    otherwise whitespace tokens of ``text_col`` are counted.  Documents
    with zero tokens still occupy a position (width 0) so ids never
    vanish.  Returns ``(id, n_tokens, pack_id, pack_offset, n_packs)``.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    nt = (F.col(n_tokens_col) if n_tokens_col
          else token_count(text_col)).cast("long")
    base = docs.select(F.col(id_col), nt.alias("n_tokens"))
    handles: list = []
    laid = with_prefix_sum(base.withColumn("__w__", F.col("n_tokens")
                                           .cast("double")),
                           "__w__", [id_col], cache_out=handles)
    start = F.col(CUM).cast("long")
    end = start + F.col("n_tokens")
    # a document [start, end) spans packs floor(start/L) ..
    # floor((end-1)/L); empty documents span exactly their start pack
    last = F.when(F.col("n_tokens") > 0, (end - 1) / seq_len) \
        .otherwise(start / seq_len)
    out = laid.select(
        id_col, "n_tokens",
        F.floor(start / seq_len).alias("pack_id"),
        F.pmod(start, F.lit(seq_len)).cast("long").alias("pack_offset"),
        (F.floor(last) - F.floor(start / seq_len) + 1).cast("long")
        .alias("n_packs"))
    # materialize the (5-numeric-column) assignment eagerly so the
    # prefix-sum's internal cache can be released — without this, each
    # invocation pins a corpus-sized cached projection for the session
    out = out.localCheckpoint(eager=True)
    for h in handles:
        h.unpersist()
    return out


def pack_stats(assignment: DataFrame, seq_len: int) -> DataFrame:
    """One-row layout audit: total tokens, total pack count (``ceil``
    includes the final partial pack — the layout has no padding holes
    anywhere else), the count of boundary-crossing documents, and the
    highest pack id."""
    return assignment.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / F.lit(seq_len)).cast("long")
        .alias("n_packs"),
        F.sum((F.col("n_packs") > 1).cast("long")).alias("n_spanning_docs"),
        F.max(F.col("pack_id") + F.col("n_packs") - 1).alias("last_pack_id"))


def chunk_documents(docs: DataFrame, chunk_tokens: int,
                    overlap_tokens: int = 0, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the per-document complement of :func:`pack_sequences` (context-
    window preparation for embedding/retrieval pipelines, where a
    document must NOT bleed into its neighbor the way the packed
    pre-training layout allows).

    Chunk ``i`` covers whitespace tokens ``[i*stride, i*stride +
    chunk_tokens)`` with ``stride = chunk_tokens - overlap_tokens``;
    the last chunk may be short; a document shorter than one chunk
    yields exactly one chunk.  Output: ``(id_col, chunk_id int,
    chunk_text string, n_chunk_toks int)`` — one row per chunk, in
    document order.

    Scale shape: tokenize once per document, then a JVM-side
    ``sequence -> transform -> slice`` builds every window from the one
    token array and ``explode`` emits the rows — no shuffle at all
    (chunking is embarrassingly row-parallel), no Python, and the
    window count is data-derived so no driver-side per-document loop.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap_tokens
    # NULL text == empty document (otherwise slice/array_join propagate
    # NULL and the chunk row comes out part-NULL)
    toks = F.coalesce(words(text_col),
                      F.array().cast("array<string>"))
    n = F.greatest(F.size(toks), F.lit(1))
    # number of windows whose start < n: ceil((n - overlap) / stride)
    # (== ceil((n - chunk)/stride) + 1 exactly); floored at 1 so a doc
    # shorter than the overlap still yields its single short chunk
    # (sequence(0, -1) would count DOWN, not empty)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap_tokens)) / F.lit(stride)).cast("int"),
        F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens))
    out = (docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "__ctoks__")))
    return out.select(
        id_col,
        "chunk_id",
        F.array_join("__ctoks__", " ").alias("chunk_text"),
        F.size("__ctoks__").alias("n_chunk_toks"))


def shard_plan(df: DataFrame, n_shards: int,
               tokens_col: str = "n_toks", id_col: str = "doc_id",
               ) -> DataFrame:
    """Assign documents to ``n_shards`` output shards with near-equal
    token budgets — the corpus EXPORT step after selection/packing
    (training jobs read one shard per data-parallel rank, so shard
    imbalance is step-time imbalance).

    Boustrophedon (serpentine) round-robin by global token rank: docs
    sorted ``(tokens desc, id)`` deal out as ``0,1,..,S-1,S-1,..,1,0``
    — each CONSECUTIVE 2S-block contributes one small+one large doc to
    every shard, so shard totals differ by at most a few max-doc sizes
    (the classic offline-balancing guarantee; exact bound asserted in
    tests on real corpora).  The global rank comes from
    ``prefix.with_global_index`` — partition-count prefix offsets, NOT
    a one-partition window, so the sort scales.  Returns ``(id,
    tokens, shard)``; the writer partitions by ``shard``.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from .prefix import with_global_index

    base = df.select(F.col(id_col), F.col(tokens_col).cast("long")
                     .alias(tokens_col),
                     (-F.col(tokens_col).cast("long")).alias("__neg__"))
    idx = with_global_index(base, order_cols=["__neg__", id_col])
    cycle = F.col("__idx__") % (2 * n_shards)
    shard = F.when(cycle < n_shards, cycle).otherwise(
        F.lit(2 * n_shards - 1) - cycle).cast("int")
    return idx.select(F.col(id_col), F.col(tokens_col),
                      shard.alias("shard"))
