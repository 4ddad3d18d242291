"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): score every raw document by the log importance weight
``log p_target(doc) - log p_raw(doc)`` under cheap bag-of-words language
models, then keep the top of the reweighted distribution.  The standard
way LLM pipelines pull target-domain-like documents out of a web crawl;
beyond the reference engine, first-class here like the other curation
operators.

Spark shape (100 TB story): both LMs reuse
:func:`perplexity.train_unigram_lm` — one map-side-combinable count
shuffle each, vocabulary-sized (Zipf-bounded) outputs.  Scoring is the
perplexity join pattern: explode tokens, two token-keyed joins against
the broadcast-sized LM relations, one groupBy(doc).  Selection is a
TakeOrdered top-k (no full sort shuffle).  The paper's Gumbel-top-k
resampling variant derives its noise from xxhash64 of the document id —
content-keyed randomness, layout-independent and identical across
sessions (the sampler discipline everywhere in this repo).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .perplexity import _oov_logp, train_unigram_lm
from .textstats import words


def score_against_lms(docs: DataFrame, lm_t: DataFrame, lm_r: DataFrame,
                      oov_t: float, oov_r: float,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> DataFrame:
    """``(id, n_toks, log_iw)`` for documents against PRE-TRAINED
    target/raw LMs — the scoring core shared by the batch path and the
    streaming twin (``streaming/dsir.py``): a token explode (pure
    projection), two token-keyed joins against the vocabulary-sized LM
    relations, one groupBy(doc)."""
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(words(text_col)).alias("tok")).select(
        id_col, F.lower("tok").alias("token"))
    scored = (toks
              .join(lm_t.select("token", F.col("logp").alias("lp_t")),
                    "token", "left")
              .join(lm_r.select("token", F.col("logp").alias("lp_r")),
                    "token", "left")
              .select(id_col,
                      F.when(F.col("token").isNull(), F.lit(0.0))
                      .otherwise(F.coalesce("lp_t", F.lit(oov_t))
                                 - F.coalesce("lp_r", F.lit(oov_r)))
                      .alias("dlw"),
                      F.col("token").isNotNull().cast("long")
                      .alias("one")))
    return (scored.groupBy(id_col)
            .agg(F.sum("one").alias("n_toks"),
                 F.round(F.sum("dlw"), 4).alias("log_iw")))


def dsir_scores(raw: DataFrame, target: DataFrame,
                id_col: str = "doc_id", text_col: str = "text",
                smoothing_k: float = 1.0) -> DataFrame:
    """``(id, n_toks, log_iw)`` per raw document: the summed per-token
    log-probability ratio between the target-trained and raw-trained
    add-k unigram LMs (OOV tokens score each model's smoothed floor).
    Empty/NULL documents carry zero evidence: ``log_iw = 0``.  Rounded
    to 4 dp so float fold order never splits engines."""
    lm_t = train_unigram_lm(target, text_col, smoothing_k)
    lm_r = train_unigram_lm(raw, text_col, smoothing_k)
    return score_against_lms(raw, lm_t, lm_r,
                             _oov_logp(lm_t, smoothing_k),
                             _oov_logp(lm_r, smoothing_k),
                             id_col, text_col)


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                smoothing_k: float = 1.0, gumbel: bool = False,
                seed: int = 42) -> DataFrame:
    """Top-``k`` raw documents by importance weight.

    ``gumbel=False`` (default, oracle-checkable): deterministic rank by
    ``(log_iw desc, id)``.  ``gumbel=True``: the paper's importance
    RESAMPLING without replacement via Gumbel-top-k — perturb each key
    with ``-ln(-ln(u))`` where ``u`` is an xxhash64-of-(id, seed)
    uniform, then take the top k (Vieira 2014's equivalence)."""
    s = dsir_scores(raw, target, id_col, text_col, smoothing_k)
    if gumbel:
        u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                    F.lit(1_000_000_007)).cast("double") + 0.5) \
            / 1_000_000_007.0
        key = F.col("log_iw") - F.log(-F.log(u))
        return (s.withColumn("gumbel_key", key)
                .orderBy(F.desc("gumbel_key"), id_col).limit(k))
    return s.orderBy(F.desc("log_iw"), id_col).limit(k)


def ref_log_iw(doc: str, target_texts: list[str], raw_texts: list[str],
               smoothing_k: float = 1.0) -> float:
    """Pure-Python reference scorer for tests: same tokenizer, same
    add-k smoothing, same OOV floors."""
    import re

    def toks(t: str | None) -> list[str]:
        return [w.lower() for w in re.split(r"\s+", (t or "").strip())
                if w]

    def lm(texts: list[str]):
        from collections import Counter
        c: Counter = Counter()
        for t in texts:
            c.update(toks(t))
        n, v, k = sum(c.values()), len(c), smoothing_k
        # add-k covers OOV uniformly: count 0 -> the smoothed floor
        return lambda w: math.log((c.get(w, 0) + k) / (n + k * (v + 1)))

    lt, lr = lm(target_texts), lm(raw_texts)
    return round(sum(lt(w) - lr(w) for w in toks(doc)), 4)
