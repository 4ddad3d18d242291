"""Streaming DSIR scoring: continuously rate arriving documents
against pre-trained target/raw language models — the ingestion-time
twin of the batch selector (`operators/dsir.py`), the shape a
crawl-ingest pipeline uses to tag importance weights as documents
land.

Streaming composition: the token explode is a pure projection (fuses
into the source scan), the LM lookups are STREAM-STATIC joins (the two
vocabulary-sized LM relations are plain batch DataFrames — no state),
and the per-document sum is a streaming aggregation keyed by the
document id (update mode).  State is O(documents in flight) because a
file-source document's tokens arrive in one batch, so each key emits
once and never updates — at 100 TB bound the store with a state
timeout matching the ingest horizon, like the other stateful twins.

The batch path IS the oracle: scores must equal
`dsir.score_against_lms` on the same corpus, row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dsir import score_against_lms
from ..operators.perplexity import _oov_logp, train_unigram_lm


def dsir_score_stream(docs: DataFrame, lm_t: DataFrame, lm_r: DataFrame,
                      oov_t: float, oov_r: float,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> DataFrame:
    """Score a document STREAM against pre-trained LMs; same plan as
    the batch scorer (the core is shared), valid under structured
    streaming because every stage is projection / stream-static join /
    keyed aggregation."""
    return score_against_lms(docs, lm_t, lm_r, oov_t, oov_r,
                             id_col, text_col)


def train_reference_lms(raw: DataFrame, target: DataFrame,
                        text_col: str = "text",
                        smoothing_k: float = 1.0):
    """Batch-train the (target, raw) LM pair + OOV floors the stream
    scores against — DSIR's models are fit offline on a snapshot, the
    stream only consumes them."""
    lm_t = train_unigram_lm(target, text_col, smoothing_k)
    lm_r = train_unigram_lm(raw, text_col, smoothing_k)
    return (lm_t, lm_r, _oov_logp(lm_t, smoothing_k),
            _oov_logp(lm_r, smoothing_k))
