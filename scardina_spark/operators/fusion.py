"""Reciprocal-rank fusion (RRF) of ranked retrieval lists.

Hybrid search — lexical BM25 (`operators/bm25.py`) fused with embedding
ANN (`operators/similarity.py`) — is the standard retrieval shape for
training-data curation and eval-set mining.  RRF (Cormack et al.,
SIGIR'09) needs only the RANKS of each input list:

    rrf(d) = Σ_lists 1 / (k_const + rank_list(d))

so it is score-scale-free and trivially deterministic.

Scale shape: every input list is already a bounded top-k (the expensive
part — scoring the corpus — happened inside BM25/ANN, which never
shuffle document data).  Fusing therefore runs on k-sized relations: the
rank window and the full-outer id join touch ≤ Σk rows regardless of
corpus size, and the single-partition Window this implies is bounded by
construction (never applied to data-scale input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_rank(ranked: DataFrame, score_col: str,
              id_col: str = "doc_id") -> DataFrame:
    """(id, rank) with rank 1 = best; ties broken by id ascending.
    Input must be a bounded (top-k) relation — see module docstring."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return ranked.select(F.col(id_col),
                         F.row_number().over(w).alias("rank"))


def rrf_fuse(rankings: list[tuple[DataFrame, str]], k: int = 10,
             id_col: str = "doc_id", k_const: float = 60.0) -> DataFrame:
    """Fuse ``[(topk_df, score_col), ...]`` into an RRF top-k:
    (id_col, rrf_score double).  A document absent from one list simply
    contributes nothing for it (no imputed rank).  Contributions are
    summed in list order, so the double arithmetic is reproducible."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    fused = None
    for i, (df, score_col) in enumerate(rankings):
        r = with_rank(df, score_col, id_col) \
            .withColumnRenamed("rank", f"__r{i}__")
        fused = r if fused is None else \
            fused.join(r, on=id_col, how="full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(k_const) + F.col(f"__r{i}__")
                          .cast("double")),
            F.lit(0.0))
    # rank and cut on the RAW sum; round only for display (ranking on
    # the rounded value could re-order near-ties at the k boundary and
    # diverge from a raw-ordering oracle)
    return (fused.select(F.col(id_col), score.alias("__raw__"))
            .orderBy(F.col("__raw__").desc(), F.col(id_col).asc())
            .limit(k)
            .select(F.col(id_col),
                    F.round(F.col("__raw__"), 6).alias("rrf_score")))
