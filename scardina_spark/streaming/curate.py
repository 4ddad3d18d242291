"""Streaming corpus curation: the continuous-ingestion twin of the batch
pipeline's gate + dedup core (`operators/curate.py`).

Documents arrive on a file stream; the quality / language / repetition
gates are pure projections (stateless — they fuse into the source scan
exactly as in batch), and content dedup is a stateful
lowest-doc-id-per-fingerprint operator via ``applyInPandasWithState``:
the state per key is the winning doc id, so replays and re-sent
documents never re-enter the corpus, and a lower-id arrival revises the
key (update mode).  State is O(distinct fingerprints) × 8 bytes across
the state store's shuffle partitions; at 100 TB you bound it by passing
``state_timeout_ms`` (a ProcessingTimeTimeout matching the replay
horizon, same knob as ``first_seen_dedup_stream``).

The batch oracle is exact: gates + min(doc_id) per fingerprint.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import table_path
from ..operators.textstats import (
    dup_token_fraction, top_bigram_fraction, with_text_stats)


def read_documents_stream(spark: SparkSession, sf_dir: str,
                          max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the documents parquet (same dir-watch +
    glob shape as ``read_events_stream``)."""
    schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("pathGlobFilter", "documents*.parquet")
            .parquet(sf_dir))


def curate_doc_stream(docs: DataFrame, min_quality: float = 0.7,
                      langs: tuple[str, ...] = ("en",),
                      max_dup_token_fraction: float = 0.5,
                      max_top_bigram_fraction: float = 0.2,
                      col: str = "text",
                      state_timeout_ms: int | None = None) -> DataFrame:
    """Gated + content-deduped stream of corpus admissions: one row per
    fingerprint holding the lowest-id admitted document.

    ``state_timeout_ms`` (optional) bounds dedup state at the replay
    horizon — an idle fingerprint is evicted and a later duplicate
    re-admits.  Default ``None`` = exact batch-oracle parity."""
    gated = (
        with_text_stats(docs, col)
        .withColumn("dup_token_fraction", dup_token_fraction(col))
        .withColumn("top_bigram_fraction", top_bigram_fraction(col))
        .where((F.col("quality") >= min_quality)
               & F.col("lang_pred").isin(*langs)
               & (F.col("dup_token_fraction") <= max_dup_token_fraction)
               & (F.col("top_bigram_fraction")
                  <= max_top_bigram_fraction))
        .select("fingerprint", "doc_id",
                F.col("n_tokens").cast("long").alias("n_tokens"),
                "quality", "lang_pred"))

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            row = pdf.sort_values("doc_id").iloc[0]
            cand = (int(row["doc_id"]), int(row["n_tokens"]),
                    float(row["quality"]), str(row["lang_pred"]))
            if best is None or cand[0] < best[0]:
                best = cand
        if best is None:
            return
        if state.exists and state.get[0] <= best[0]:
            if state_timeout_ms is not None:
                # any sighting extends the retention window
                state.setTimeoutDuration(state_timeout_ms)
            return  # an earlier-or-equal document already won this key
        state.update((best[0],))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame({
            "fingerprint": [key[0]], "doc_id": [best[0]],
            "n_tokens": [best[1]], "quality": [best[2]],
            "lang_pred": [best[3]],
        })

    out_schema = ("fingerprint string, doc_id bigint, n_tokens bigint, "
                  "quality double, lang_pred string")
    timeout = (GroupStateTimeout.NoTimeout if state_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (gated.groupBy("fingerprint")
            .applyInPandasWithState(fn, out_schema, "doc_id bigint",
                                    "update", timeout))
