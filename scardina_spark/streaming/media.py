"""Multimodal decode on structured streams.

The real codec stages (`operators/multimodal.py`: WAV / PNG / AVI
encode, container decode, feature extraction) are STATELESS
Arrow-batched projections — ``mapInPandas`` with no aggregation and no
state — so they compose with a streaming source unchanged: the same
functions that run the batch pipeline run the ingest pipeline, and the
batch oracle is exact for the drained stream.  This module only picks
the composition; there is deliberately no stream-specific decode code.

At 100 TB the point is operational: media feature extraction happens
AT INGEST (one pass over arriving payloads, features appended to the
metadata store) instead of as a later corpus-wide batch job over
payload bytes.  State: none.  Output mode: append (pure projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.multimodal import (
    decode_avi_features, decode_png_features, decode_wav_features,
    documents_as_avi, documents_as_png, documents_as_wav)

_CODECS = {
    "wav": (documents_as_wav, decode_wav_features),
    "png": (documents_as_png, decode_png_features),
    "avi": (documents_as_avi, decode_avi_features),
}


def decode_media_stream(docs: DataFrame, codec: str = "png") -> DataFrame:
    """Encode each arriving document into a real media container and
    decode it back to features, all on the stream: encode → container
    decode → feature extraction as one stateless lazy plan (append
    mode; no watermark needed — nothing aggregates)."""
    if codec not in _CODECS:
        raise ValueError(f"unknown codec: {codec} (want one of "
                         f"{sorted(_CODECS)})")
    encode, features = _CODECS[codec]
    return features(encode(docs))
