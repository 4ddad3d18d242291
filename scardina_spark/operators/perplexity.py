"""Unigram-LM perplexity scoring and band filtering — the CCNet
quality-filtering protocol (Wenzek et al., LREC 2020, arXiv:1911.00359;
public protocol): score each document by the perplexity of a language
model trained on a trusted corpus, then keep the low/middle-perplexity
band (CCNet's head/middle split) instead of a hard classifier cutoff.

CCNet uses a 5-gram KenLM; this is the distribution-equivalent unigram
variant so the whole pipeline stays declarative DataFrame algebra and
the DuckDB oracle can replicate it exactly — the *protocol* (train LM
on reference text, score by per-token negative log-likelihood, filter
by perplexity band) is what's re-expressed, not KenLM internals.

Scale design:

* LM training is ONE map-side-combinable groupBy over exploded tokens
  (the word-count shuffle every corpus pass already pays — same shape
  as `bpe.word_counts`); the LM relation is vocabulary-sized, Zipf-
  bounded, and carries its own smoothing constants.
* Scoring joins exploded tokens against the LM on the token key.  The
  LM is usually << corpus (vocabulary vs occurrences), so Spark's AQE
  broadcasts it when it fits; otherwise it's a hash join on the token
  — never a driver-side dictionary.
* Out-of-vocabulary tokens get the additive-smoothing floor
  ``k / (N + k·(V+1))`` — every token contributes a finite NLL, so a
  fully-OOV document scores the worst band rather than NaN.
* The band filter is a projection + predicate over the scored
  relation: no extra shuffle beyond the score join.

Reference relationship: Scardina has no text-quality operators at all —
this is green-field scope from the LLM-pipeline north star (same family
as `textstats.quality_score` and `sampling.pareto_quality_sample`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import words


def train_unigram_lm(df: DataFrame, text_col: str = "text",
                     smoothing_k: float = 1.0) -> DataFrame:
    """Unigram LM with additive (add-k) smoothing over lowercased
    whitespace tokens: ``(token, logp double)`` plus the corpus
    constants needed to score OOV tokens, carried on every row
    (``n_total long, vocab long``) so the relation is self-contained.

    One exploded groupBy — map-side combinable, O(vocabulary) output.
    """
    toks = df.select(
        F.explode(words(text_col)).alias("tok")).select(
        F.lower("tok").alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # corpus totals as a one-row broadcast-of-one cross join (same
    # pattern as bm25's stats row)
    totals = counts.agg(F.sum("n").alias("n_total"),
                        F.count(F.lit(1)).alias("vocab"))
    k = float(smoothing_k)
    return (counts.crossJoin(F.broadcast(totals))
            .select(
                "token",
                F.log((F.col("n") + F.lit(k)) /
                      (F.col("n_total") + F.lit(k) * (F.col("vocab") + 1)))
                .alias("logp"),
                "n_total", "vocab"))


def _oov_logp(lm: DataFrame, smoothing_k: float) -> float:
    """The smoothed floor log-prob for unseen tokens (count 0)."""
    row = lm.select("n_total", "vocab").first()
    if row is None:
        raise ValueError("empty language model")
    import math
    k = float(smoothing_k)
    return math.log(k / (row["n_total"] + k * (row["vocab"] + 1)))


def doc_perplexity(df: DataFrame, lm: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   smoothing_k: float = 1.0) -> DataFrame:
    """Per-document unigram perplexity ``exp(mean token NLL)``, rounded
    to 4 dp (float fold order differs between engines; the rounding
    absorbs it).  Empty documents score the OOV floor.  Output:
    ``(id_col, n_toks long, ppl double)``.
    """
    oov = _oov_logp(lm, smoothing_k)
    toks = df.select(
        F.col(id_col),
        F.explode_outer(words(text_col)).alias("tok")).select(
        id_col, F.lower("tok").alias("token"))
    scored = (toks.join(lm.select("token", "logp"), "token", "left")
              .select(id_col,
                      F.coalesce(F.col("logp"), F.lit(oov)).alias("lp"),
                      F.col("token").isNotNull().cast("long").alias("one")))
    return (scored.groupBy(id_col)
            .agg(F.sum("one").alias("n_toks"),
                 F.round(F.exp(-F.sum("lp") / F.greatest(F.sum("one"),
                                                         F.lit(1))), 4)
                 .alias("ppl"))
            .withColumn("ppl",
                        F.when(F.col("n_toks") == 0,
                               F.round(F.exp(F.lit(-oov)), 4))
                        .otherwise(F.col("ppl"))))


def perplexity_band(df: DataFrame, lm: DataFrame, lo: float, hi: float,
                    id_col: str = "doc_id", text_col: str = "text",
                    smoothing_k: float = 1.0) -> DataFrame:
    """CCNet head/middle/tail banding with FIXED thresholds: label each
    document ``head`` (ppl < lo — closest to the LM's training
    distribution), ``middle`` (lo <= ppl < hi), or ``tail`` (>= hi).
    CCNet derives lo/hi as per-language percentiles of a held-out
    sample; feed those in as the thresholds.  Adds ``n_toks, ppl,
    ppl_band`` to ``df``."""
    ppl = doc_perplexity(df, lm, id_col, text_col, smoothing_k)
    band = (F.when(F.col("ppl") < lo, F.lit("head"))
            .when(F.col("ppl") < hi, F.lit("middle"))
            .otherwise(F.lit("tail")))
    return df.join(ppl, id_col).withColumn("ppl_band", band)


def filter_by_perplexity(df: DataFrame, lm: DataFrame, lo: float,
                         hi: float, keep: tuple[str, ...] = ("head",
                                                             "middle"),
                         id_col: str = "doc_id", text_col: str = "text",
                         smoothing_k: float = 1.0) -> DataFrame:
    """Keep only the requested bands (CCNet keeps head+middle),
    restoring the input schema."""
    banded = perplexity_band(df, lm, lo, hi, id_col, text_col,
                             smoothing_k)
    return banded.where(F.col("ppl_band").isin(*keep)) \
        .drop("n_toks", "ppl", "ppl_band")


def derive_ppl_thresholds(df: DataFrame, lm: DataFrame,
                          qs: tuple[float, float] = (1 / 3, 2 / 3),
                          lang_col: str | None = None,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          smoothing_k: float = 1.0) -> DataFrame:
    """Derive the CCNet band thresholds as perplexity percentiles —
    the paper computes them per language over a held-out sample and
    keeps the head+middle (lowest two thirds).  Returns one row per
    language (``(lang, lo, hi)``; a single ``('*', lo, hi)`` row when
    ``lang_col`` is None) to feed :func:`perplexity_band`.

    Exact ``percentile`` (not approx) so the cut is deterministic and
    engine-reproducible; the aggregation input is one double per
    document — percentile's sort cost is bounded by the document count,
    not the token count, and at 100 TB the held-out sample this runs
    on is bounded by construction (CCNet protocol)."""
    ppl = doc_perplexity(df, lm, id_col, text_col, smoothing_k)
    if lang_col is not None:
        ppl = ppl.join(df.select(id_col, lang_col), id_col)
        grouped = ppl.groupBy(F.col(lang_col).alias("lang"))
    else:
        grouped = ppl.groupBy(F.lit("*").alias("lang"))
    return (grouped.agg(
        F.percentile("ppl", F.lit(float(qs[0]))).alias("lo"),
        F.percentile("ppl", F.lit(float(qs[1]))).alias("hi"))
        .orderBy("lang"))
