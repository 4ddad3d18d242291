"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units",
ACL 2016) — learn a subword merge table from the corpus, the way LLM
data pipelines train their tokenizers before token-count accounting.

Scale story (100 TB): the ONLY corpus-sized operation is the word-count
aggregation (one hash shuffle on the word, map-side combined).  Every
merge iteration then runs over the DISTINCT-word relation — bounded by
vocabulary size (millions of rows at web scale, ~KBs here), not corpus
size — exactly the word-frequency factorization every production BPE
trainer uses (the HuggingFace tokenizers pre-count protocol).  Encoding
afterwards is a broadcast vocabulary join: no per-document merge
computation at all.

Determinism: the best pair each iteration is chosen by
``(count desc, left, right)`` — a total order, so ties never depend on
partition layout; merge application is a leftmost-greedy fold expressed
with built-in higher-order functions (JVM-side, no Python in any loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import lower_words as _words

END = "</w>"  # end-of-word marker (reference protocol, Sennrich §3.2)


def word_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """``(word, cnt)`` over the whitespace-normalized lower-cased
    corpus — the one corpus-sized shuffle of the whole trainer."""
    return (df.select(F.explode(_words(col)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _char_symbols(word: Column) -> Column:
    """Initial symbol sequence: characters plus the end-of-word
    marker."""
    chars = F.filter(F.split(word, ""), lambda x: x != "")
    return F.concat(chars, F.array(F.lit(END)))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """``(left_sym, right_sym, pair_count)`` of adjacent symbols over a
    ``(cnt, symbols)`` vocabulary relation, weighted by word frequency.
    Adjacent pairs come from zipping two SHIFTED slices (each argument
    of ``zip_with`` is evaluated once — the O(n^2)
    captured-expression-in-lambda trap does not apply to slice
    arguments)."""
    s = F.col("symbols")
    pairs = F.zip_with(
        F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))),
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")))
    return (vocab.select("cnt", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("left_sym"),
                     F.col("p.r").alias("right_sym"))
            .agg(F.sum("cnt").alias("pair_count")))


def bpe_pair_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Iteration-0 pair statistics straight off the corpus — the exact
    relation the first merge decision is taken from."""
    wc = word_counts(df, col)
    return pair_counts(
        wc.select("cnt", _char_symbols(F.col("word")).alias("symbols")))


def merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Leftmost-greedy application of one merge to a symbol array: a
    fold that either glues the current symbol onto the accumulator's
    last element (when they form the pair) or appends it.  O(len) per
    word; only literals are captured by the lambda."""
    la, lb = F.lit(left), F.lit(right)

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(acc, -1)
        merged = F.concat(F.slice(acc, 1, F.size(acc) - 1),
                          F.array(F.concat(last, x)))
        return F.when((F.size(acc) > 0) & (last == la) & (x == lb),
                      merged).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(symbols, F.array().cast("array<string>"), step)


def bpe_learn(df: DataFrame, n_merges: int = 8, col: str = "text",
              min_count: int = 2
              ) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` merges; returns ``(merges, vocab)`` where
    ``merges`` is ``[(left, right, pair_count), ...]`` in learned order
    and ``vocab`` the final ``(word, cnt, symbols)`` relation (the
    encode-time lookup table).  Stops early when no pair reaches
    ``min_count``.

    Each iteration eagerly checkpoints the vocabulary relation: it is
    vocabulary-sized (small), and the checkpoint both truncates the
    n-deep fold-expression lineage and makes every later iteration read
    materialized symbols instead of recomputing all previous merges."""
    wc = word_counts(df, col)
    vocab = (wc.select("word", "cnt",
                       _char_symbols(F.col("word")).alias("symbols"))
             .localCheckpoint(eager=True))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (pair_counts(vocab)
               .orderBy(F.col("pair_count").desc(), "left_sym",
                        "right_sym")
               .limit(1).collect())  # 1 row
        if not top or top[0]["pair_count"] < min_count:
            break
        left, right, cnt = (top[0]["left_sym"], top[0]["right_sym"],
                            int(top[0]["pair_count"]))
        merges.append((left, right, cnt))
        vocab = (vocab.withColumn(
            "symbols", merge_pair(F.col("symbols"), left, right))
            .localCheckpoint(eager=True))
    return merges, vocab


def bpe_encode(df: DataFrame, vocab: DataFrame, col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Tokenize documents with a learned vocabulary: explode words,
    broadcast-join the ``(word, symbols)`` table, reassemble per
    document in word order.  Returns ``(id, bpe_tokens, n_bpe)``.
    Words unseen at train time fall back to their character symbols
    (no merges apply — the standard open-vocabulary fallback)."""
    pos_words = df.select(
        F.col(id_col),
        F.posexplode(_words(col)).alias("pos", "word"))
    joined = pos_words.join(
        F.broadcast(vocab.select("word", "symbols")), "word",
        "left_outer")
    syms = F.coalesce(F.col("symbols"),
                      _char_symbols(F.col("word")))
    return (joined
            .select(id_col, "pos", syms.alias("s"))
            .groupBy(id_col)
            .agg(F.flatten(F.array_sort(
                F.collect_list(F.struct("pos", "s"))).getField("s"))
                .alias("bpe_tokens"))
            .withColumn("n_bpe", F.size("bpe_tokens")))
