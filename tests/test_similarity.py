"""Embedding similarity ops vs DuckDB list functions and numpy."""

import numpy as np
import pytest

from scardina_spark.operators import similarity as S


@pytest.fixture(scope="module")
def query_vec(duck):
    row = duck.sql(
        "select embedding from embeddings where vec_id = 0").fetchone()
    return [float(x) for x in row[0]]


def test_topk_matches_duckdb(tables, duck, query_vec):
    got = [(r["vec_id"], r["cos_sim"])
           for r in S.topk_cosine(tables["embeddings"], query_vec, 10).collect()]
    qlit = "[" + ",".join(repr(x) for x in query_vec) + "]"
    want = duck.sql(f"""
        with q as (select {qlit}::DOUBLE[] as v)
        select vec_id, round(
            list_dot_product(embedding::DOUBLE[], q.v) /
            greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                     * sqrt(list_dot_product(q.v, q.v)), 1e-12), 6) as cos
        from embeddings, q
        order by cos desc, vec_id limit 10""").fetchall()
    assert [v for v, _ in got] == [v for v, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-5


def test_topk_self_is_first(tables, duck, query_vec):
    top = S.topk_cosine(tables["embeddings"], query_vec, 1).collect()
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-6


def test_lsh_bucket_deterministic_and_distributed(tables):
    planes = S.hyperplanes(64, 8, seed=42)
    b1 = S.with_lsh_bucket(tables["embeddings"], planes)
    counts = {r["bucket"]: r["c"] for r in
              b1.groupBy("bucket").count().withColumnRenamed("count", "c").collect()}
    assert sum(counts.values()) == tables["embeddings"].count()
    assert len(counts) > 10  # buckets actually spread


def test_lsh_topk_subset_of_bucket(tables, query_vec):
    planes = S.hyperplanes(64, 4, seed=42)
    ann = S.topk_cosine_lsh(tables["embeddings"], query_vec, 5, planes)
    rows = ann.collect()
    assert 0 < len(rows) <= 5
    # the query vector itself (vec_id 0) lands in its own bucket
    assert rows[0]["vec_id"] == 0


def test_lsh_recall_against_bruteforce(tables, query_vec):
    planes = S.hyperplanes(64, 4, seed=42)
    exact = {r["vec_id"] for r in
             S.topk_cosine(tables["embeddings"], query_vec, 10).collect()}
    approx = {r["vec_id"] for r in
              S.topk_cosine_lsh(tables["embeddings"], query_vec, 10, planes).collect()}
    # 4-plane LSH on near-orthogonal random vectors is coarse; demand
    # nonzero overlap, not high recall
    assert exact & approx


def test_ivf_assign_matches_numpy(tables):
    emb = tables["embeddings"]
    cents = [[float(x) for x in r["embedding"]]
             for r in emb.orderBy("vec_id").limit(8).collect()]
    got = {r["vec_id"]: r["cell"]
           for r in S.ivf_assign(emb, cents).select("vec_id", "cell").collect()}
    cmat = np.asarray(cents, dtype=np.float64).T
    for r in emb.collect():
        v = np.asarray([float(x) for x in r["embedding"]])
        assert got[r["vec_id"]] == int((v @ cmat).argmax())


def test_ivf_assign_large_k_pandas_path(tables):
    emb = tables["embeddings"]
    rows = emb.orderBy("vec_id").limit(65).collect()
    cents = [[float(x) for x in r["embedding"]] for r in rows]
    df = S.ivf_assign(emb, cents)
    counts = df.groupBy("cell").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    # each seed vector is its own nearest centroid (random vectors)
    got = {r["vec_id"]: r["cell"]
           for r in df.select("vec_id", "cell").collect()}
    hits = sum(1 for i in range(65) if got[rows[i]["vec_id"]] == i)
    assert hits >= 60


def test_ivf_train_reduces_distortion(tables):
    emb = tables["embeddings"]
    init = [[float(x) for x in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(4).collect()]
    trained = S.ivf_train(emb, k=4, iters=2)
    assert len(trained) == 4 and len(trained[0]) == 64
    # Lloyd steps move centroids off the raw seed vectors
    assert any(np.linalg.norm(np.asarray(a) - np.asarray(b)) > 1e-6
               for a, b in zip(init, trained))
    # determinism
    again = S.ivf_train(emb, k=4, iters=2)
    assert trained == again


def test_ivf_topk_probe_subset(tables, query_vec):
    emb = tables["embeddings"]
    cents = [[float(x) for x in r["embedding"]]
             for r in emb.orderBy("vec_id").limit(8).collect()]
    ann = S.topk_cosine_ivf(emb, query_vec, 10, centroids=cents, nprobe=2)
    rows = ann.collect()
    assert 0 < len(rows) <= 10
    assert rows[0]["vec_id"] == 0  # query's own vector in the probed cell
    exact = {r["vec_id"] for r in S.topk_cosine(emb, query_vec, 10).collect()}
    assert exact & {r["vec_id"] for r in rows}


def test_cosine_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, 5.0, 6.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    from pyspark.sql import functions as F
    got = df.select(S.cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    want = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(got - want) < 1e-9


def test_similarity_selection_card_unbiased_and_monotone(tables):
    """Sampling estimate tracks the exact similarity-selection count and
    is monotone in the threshold (raising t can only shrink the set)."""
    from scardina_spark.operators.similarity import (
        similarity_selection_card)

    emb = tables["embeddings"]
    qv = [float(x) for x in emb.first()["embedding"]]
    ests = {}
    for t in [0.0, 0.2, 0.5]:
        r = similarity_selection_card(emb, qv, threshold=t, k=128).first()
        assert r["n_sample"] == 128
        ests[t] = (r["est_card"], r["true_card"])
        # binomial 4-sigma bound around the truth's fraction
        import math
        n, k = r["n_total"], r["n_sample"]
        p = r["true_card"] / n
        tol = 4 * n * math.sqrt(p * (1 - p) / k) + 1
        assert abs(r["est_card"] - r["true_card"]) < tol, (t, ests[t])
    assert ests[0.0][0] >= ests[0.2][0] >= ests[0.5][0]


def test_similarity_selection_card_exact_when_sample_covers(spark):
    from scardina_spark.operators.similarity import (
        similarity_selection_card)
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qv = rows[0][1]
    r = similarity_selection_card(df, qv, threshold=0.3, k=100).first()
    # sample covers the whole table -> estimate IS the exact count
    assert r["n_sample"] == 60
    assert r["est_card"] == float(r["true_card"])
