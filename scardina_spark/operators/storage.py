"""Explicit release of ``localCheckpoint`` storage.

``DataFrame.unpersist`` only uncaches CacheManager entries, so a
checkpointed DataFrame's blocks survive it — they are pinned in the
block manager until the JVM happens to garbage-collect the RDD
reference and the ContextCleaner notices (30-minute periodic GC by
default).  Operators that checkpoint intermediates therefore leaked
them for the life of the session: measured in r11/r12 benches, the
accumulated pinned blocks degraded every LATER stage (GC-bound tails,
anti-scaling at 32 cores).  This module is the one explicit release
path; freeing a checkpoint kills the DataFrame's recompute path, so
callers release only once downstream results are materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CheckpointHandle:
    """``unpersist()``-compatible handle for a ``localCheckpoint``'s
    backing RDD, so checkpointed intermediates ride the same release
    protocol as persists.  Freeing it removes the checkpoint data (the
    DataFrame's recompute path) — release only once downstream
    consumers are materialized."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self):
        try:
            (self._df._jdf.queryExecution().analyzed()
             .rdd().unpersist(False))
        except Exception:
            pass


def free_checkpoint(df: DataFrame | None) -> None:
    """Release the blocks behind a checkpointed (or persisted)
    DataFrame.  Safe on any DataFrame; a no-op when nothing is stored.
    Idempotent."""
    if df is None:
        return
    try:
        df.unpersist()
    except Exception:
        pass
    CheckpointHandle(df).unpersist()
