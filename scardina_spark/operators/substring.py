"""Exact substring-level deduplication (token-granular).

Doc-level dedup (operators/dedup.py) removes whole near/exact duplicate
documents; training corpora additionally contain duplicated PASSAGES
inside otherwise-distinct documents (boilerplate, licenses, quoted
text).  The published protocol for this is ExactSubstr (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022):
find every maximal span whose k-token windows occur at more than one
(doc, position) in the corpus, and strip ALL occurrences.

Spark-first design (the suffix-array of the paper is a single-node
construction; this is the same semantics as distributed dataflow):

1. positional k-gram digests per document, computed JVM-side in O(k·n)
   per doc via ``arrays_zip`` of k SHIFTED token-array slices — NOT a
   ``transform(sequence, i -> slice(...))`` lambda, which re-evaluates
   the captured token array per element and goes O(n²) (measured 33x
   on long documents elsewhere in this repo);
2. posexplode to (doc, pos, digest) rows — shuffle volume is
   O(total tokens × digest), data-parallel in documents;
3. digest-keyed groupBy marks positions whose window occurs >1 time
   globally (map-side combinable count);
4. per-document gaps-and-islands merge of flagged positions into
   maximal spans — a window PARTITIONED BY doc (never a global window:
   per-task state is one document's flagged positions);
5. strip = JVM ``filter`` of the token array against the doc's span
   list (spans per doc are few; membership is O(spans) per token).

Every digest is md5 over the space-joined window, so a DuckDB oracle
reproduces the spans bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKENS = "__tokens__"
POS = "pos"
GRAM_HASH = "gram_hash"


def _tokens(col: str) -> F.Column:
    from .dedup import normalized
    return F.split(normalized(col), " ")


def positional_kgram_hashes(df: DataFrame, k: int = 8,
                            id_col: str = "doc_id", col: str = "text"
                            ) -> DataFrame:
    """(id, pos, gram_hash) for every token position 0..n-k: md5 of the
    space-joined window starting there.  O(k·n) per doc, JVM-side."""
    toks = _tokens(col)
    d = df.select(F.col(id_col), toks.alias(TOKENS))
    d = d.where(F.size(F.col(TOKENS)) >= k)
    # k shifted views; position i of the zip holds tokens i..i+k-1
    n_out = F.size(F.col(TOKENS)) - F.lit(k - 1)
    shifted = [F.slice(F.col(TOKENS), 1 + j, n_out) for j in range(k)]
    grams = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.md5(F.concat_ws(
            " ", *[s.getField(str(j)) for j in range(k)])))
    return (d.select(F.col(id_col), F.posexplode(grams)
                     .alias(POS, GRAM_HASH)))


def duplicated_positions(df: DataFrame, k: int = 8,
                         id_col: str = "doc_id", col: str = "text"
                         ) -> DataFrame:
    """Positions whose k-token window occurs at >1 (doc, pos) in the
    corpus — ALL occurrences are flagged (ExactSubstr strips every
    copy, not every-but-one)."""
    g = positional_kgram_hashes(df, k, id_col, col)
    dup = (g.groupBy(GRAM_HASH)
           .agg(F.count(F.lit(1)).alias("occ"))
           .where(F.col("occ") > 1))
    return g.join(dup, GRAM_HASH).select(id_col, POS)


def duplicated_spans(df: DataFrame, k: int = 8, id_col: str = "doc_id",
                     col: str = "text") -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start,
    span_end, span_tokens) with end EXCLUSIVE in token positions.
    Flagged window starts p, p' belong to one span iff p' - p < k
    (their windows overlap); each island covers [min_pos,
    max_pos + k)."""
    pos = duplicated_positions(df, k, id_col, col)
    w = Window.partitionBy(id_col).orderBy(POS)
    brk = F.when(
        F.col(POS) - F.lag(POS, 1).over(w) >= k, 1).otherwise(0)
    islands = pos.withColumn("__island__",
                             F.sum(brk).over(w.rowsBetween(
                                 Window.unboundedPreceding, 0)))
    return (islands.groupBy(id_col, "__island__")
            .agg(F.min(POS).alias("span_start"),
                 (F.max(POS) + k).alias("span_end"))
            .withColumn("span_tokens",
                        F.col("span_end") - F.col("span_start"))
            .drop("__island__"))


def strip_duplicated_spans(df: DataFrame, k: int = 8,
                           id_col: str = "doc_id", col: str = "text",
                           spans: DataFrame | None = None) -> DataFrame:
    """Remove every token inside a duplicated span from every document
    (the ExactSubstr cut); returns (id, text, n_tokens, n_removed)
    over the normalized token stream.  Documents with no duplicated
    span pass through with n_removed = 0.  Pass a precomputed
    ``duplicated_spans`` result as ``spans`` to avoid re-running the
    k-gram pipeline (the dominant cost) when the caller already has it."""
    if spans is None:
        spans = duplicated_spans(df, k, id_col, col)
    spans = (spans.groupBy(id_col)
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("__spans__")))
    d = df.select(F.col(id_col), _tokens(col).alias(TOKENS))
    j = d.join(spans, id_col, "left_outer")
    sp = F.coalesce(F.col("__spans__"),
                    F.array().cast("array<struct<span_start:int,"
                                   "span_end:int>>"))
    with_idx = F.transform(
        F.col(TOKENS), lambda t, i: F.struct(t.alias("t"), i.alias("i")))
    kept = F.filter(
        with_idx,
        lambda s: ~F.exists(sp, lambda b: (s.getField("i") >= b.getField(
            "span_start")) & (s.getField("i") < b.getField("span_end"))))
    return (j.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda s: s.getField("t")))
        .alias(col),
        F.size(F.col(TOKENS)).alias("n_tokens"),
        (F.size(F.col(TOKENS)) - F.size(kept)).alias("n_removed")))
