"""Embedding similarity search: brute-force cosine top-k and LSH-bucketed
approximate nearest neighbors over an ``embeddings(vec_id, embedding
array<float>, label)`` table.

Scale design:

* brute force — one projection computing the dot product JVM-side
  (``zip_with`` + ``aggregate`` fold, no UDF) followed by a global top-k.
  Spark's ``orderBy().limit(k)`` executes as per-partition top-k + a
  k-row merge on one reducer — O(rows) work, O(k) shuffle, the right plan
  at any scale.
* LSH — sign of the dot with ``n_planes`` fixed random hyperplanes forms a
  bucket id; the query only scans its own bucket.  Planes are derived from
  a seed (numpy RandomState) so results are reproducible and the oracle
  can re-derive them as literals.
* near-dup pairs — bucket-join (shuffle on bucket id) then exact cosine
  within buckets only: no all-pairs blowup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def topk_cosine(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                ) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``; deterministic
    tie-break on id.  The baseline every ANN variant is measured against."""
    q = _lit_vec(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only the sign matters)."""
    rs = np.random.RandomState(seed)
    return [[float(v) for v in rs.randn(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Bucket id = bits of sign(v·p) over the planes (sign>0 → 1)."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(dot(vec_col, _lit_vec(p)) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        out = out + F.shiftleft(bit, i)
    return out


def with_lsh_bucket(df: DataFrame, planes: list[list[float]],
                    vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))


def topk_cosine_lsh(df: DataFrame, query_vec: list[float], k: int = 10,
                    planes: list[list[float]] | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    ) -> DataFrame:
    """ANN top-k: score only the query's LSH bucket.  Recall < 1 by design;
    candidate set shrinks by ~2^n_planes."""
    dim = len(query_vec)
    planes = planes or hyperplanes(dim)
    bucketed = with_lsh_bucket(df, planes, vec_col)
    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qb |= 1 << i
    cands = bucketed.where(F.col("bucket") == qb)
    return topk_cosine(cands.drop("bucket"), query_vec, k, id_col, vec_col)


def near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                   planes: list[list[float]] | None = None, dim: int = 64,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   ) -> DataFrame:
    """Embedding near-duplicates: LSH-bucket join, exact cosine inside
    buckets, pairs (a < b) above threshold."""
    planes = planes or hyperplanes(dim)
    b = with_lsh_bucket(df, planes, vec_col)
    a = b.select(F.col("bucket"), F.col(id_col).alias("id_a"),
                 F.col(vec_col).alias("va"))
    c = b.select(F.col("bucket"), F.col(id_col).alias("id_b"),
                 F.col(vec_col).alias("vb"))
    pairs = a.join(c, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )
