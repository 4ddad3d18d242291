"""BM25 ranked retrieval: formula parity with a pure-python oracle,
zero-score exclusion, and the physical-plan properties (no Python UDF,
TakeOrderedAndProject top-k)."""

import math

from pyspark.sql import functions as F

from scardina_spark.operators.bm25 import bm25_scores, bm25_topk

CORPUS = [
    (0, "spark join window spark"),
    (1, "join the table and the table"),
    (2, "window window window sort"),
    (3, "nothing relevant here"),
    (4, "spark"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = s
    return out


def test_scores_match_python_oracle(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    terms = ["spark", "window"]
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, terms).collect()}
    want = _py_bm25(CORPUS, terms)
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


def test_zero_score_docs_excluded(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {r["doc_id"] for r in bm25_scores(df, ["spark"]).collect()}
    assert got == {0, 4}  # only docs containing the term


def test_topk_order_and_tiebreak(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    rows = bm25_topk(df, ["spark", "window"], k=3).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) == 3


def test_plan_is_jvm_side_take_ordered(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    plan = bm25_topk(df, ["spark"], k=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan  # pure codegen, no UDFs
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats broadcast


def test_absent_term_contributes_nothing(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    base = {r["doc_id"]: r["score"]
            for r in bm25_scores(df, ["spark"]).collect()}
    plus = {r["doc_id"]: r["score"]
            for r in bm25_scores(df, ["spark", "zzz_absent"]).collect()}
    assert base == plus


# ----------------------------------------------------------------- fusion


def test_rrf_matches_hand_computation(spark):
    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)],
                              ["doc_id", "s"])
    bdf = spark.createDataFrame([(3, 0.9), (4, 0.8)], ["doc_id", "s"])
    from scardina_spark.operators.fusion import rrf_fuse
    got = {r["doc_id"]: r["rrf_score"]
           for r in rrf_fuse([(a, "s"), (bdf, "s")], k=10).collect()}
    want = {
        1: 1 / 61,               # rank 1 in a only
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,      # rank 3 in a, rank 1 in b
        4: 1 / 62,
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - round(want[d], 6)) < 1e-9


def test_rrf_orders_and_limits(spark):
    a = spark.createDataFrame([(i, float(100 - i)) for i in range(30)],
                              ["doc_id", "s"])
    from scardina_spark.operators.fusion import rrf_fuse
    rows = rrf_fuse([(a, "s")], k=5).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 4]
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_query_terms_case_normalized(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    lower = {r["doc_id"]: r["score"]
             for r in bm25_scores(df, ["spark"]).collect()}
    upper = {r["doc_id"]: r["score"]
             for r in bm25_scores(df, ["Spark"]).collect()}
    assert lower == upper and lower


def test_bm25_random_corpora_match_python():
    """Randomized corpora (seeded) against the pure-python oracle —
    formula parity beyond the hand-written fixture."""
    import random

    from scardina_spark.session import get_spark

    spark = get_spark("bm25-prop")
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rng = random.Random(11)
    for trial in range(3):
        docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
                for i in range(rng.randint(2, 25))]
        terms = rng.sample(vocab, k=rng.randint(1, 3))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["doc_id"]: r["score"]
               for r in bm25_scores(df, terms).collect()}
        want = _py_bm25(docs, terms)
        assert set(got) == set(want), (trial, terms)
        for i in want:
            assert abs(got[i] - want[i]) < 1e-9, (trial, i)


# --- materialized inverted index ------------------------------------------

def test_indexed_topk_matches_scan_path(spark, tables):
    from scardina_spark.operators.bm25 import (
        bm25_build_index, bm25_topk, bm25_topk_indexed)

    docs = tables["documents"]
    idx = bm25_build_index(docs)
    for terms in [["spark", "join"], ["table"], ["spark", "window", "agg"]]:
        scan = bm25_topk(docs, terms, k=10).collect()
        fast = bm25_topk_indexed(idx, terms, k=10).collect()
        assert [r["doc_id"] for r in scan] == [r["doc_id"] for r in fast]
        for a, b in zip(scan, fast):
            assert abs(a["score"] - b["score"]) < 1e-9


def test_index_save_load_roundtrip_and_pruned_scan(spark, tables, tmp_path):
    from scardina_spark.operators.bm25 import (
        bm25_build_index, bm25_load_index, bm25_topk, bm25_topk_indexed)

    docs = tables["documents"]
    path = str(tmp_path / "bm25idx")
    bm25_build_index(docs).save(path)
    idx = bm25_load_index(spark, path)
    got = bm25_topk_indexed(idx, ["spark", "join"], k=5)
    want = bm25_topk(docs, ["spark", "join"], k=5).collect()
    assert [r["doc_id"] for r in got.collect()] == \
        [r["doc_id"] for r in want]
    # the per-query scan must carry the term IN filter down to parquet
    plan = got._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:")[-1].split("]")[0]
    assert "term" in pushed and "In(" in pushed


def test_index_postings_row_groups_prune_single_term(spark, tables,
                                                     tmp_path):
    """The pruning claim, pinned at the footer level (the layout.py
    pattern): the term-sorted postings' row-group min/max stats must
    make a single-term query's candidate set a strict subset of the row
    groups — i.e. the scan reads fewer row groups than the file holds."""
    from scardina_spark.operators.bm25 import bm25_build_index
    from scardina_spark.operators.layout import row_group_ranges

    docs = tables["documents"]
    path = str(tmp_path / "bm25idx")
    # small row groups so the fixture-scale postings span several of them
    bm25_build_index(docs).save(path, parquet_block_bytes=16 * 1024)
    ranges = [(a.decode() if isinstance(a, bytes) else a,
               b.decode() if isinstance(b, bytes) else b)
              for a, b in row_group_ranges(path + "/postings", "term")]
    assert len(ranges) > 1, "one row group total: nothing can prune"
    term = "spark"
    candidates = sum(1 for lo, hi in ranges if lo <= term <= hi)
    assert 0 < candidates < len(ranges), (candidates, len(ranges))


def test_index_dedup_terms_and_case(spark, tables):
    from scardina_spark.operators.bm25 import (
        bm25_build_index, bm25_topk, bm25_topk_indexed)

    docs = tables["documents"]
    idx = bm25_build_index(docs)
    a = bm25_topk_indexed(idx, ["Spark", "spark", "SPARK"], k=5).collect()
    b = bm25_topk(docs, ["spark"], k=5).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
