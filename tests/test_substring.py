"""Substring-level (ExactSubstr) dedup: span semantics on hand
fixtures, all-occurrence stripping, island merging, and the
no-Python-UDF plan property."""

import pytest

from scardina_spark.operators.substring import (
    duplicated_positions, duplicated_spans, positional_kgram_hashes,
    strip_duplicated_spans)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "a b c d e f g h i j"),
         (2, "x y a b c d w z q r"),      # shares a b c d with doc 1
         (3, "p q r s t u v w p2 q2"),    # no duplicated window
         (4, "a b c d e f g h i j"),      # full duplicate of doc 1
         (5, "m n o e f g h zz a b c d")],  # two separate islands
        "doc_id long, text string")


def test_positional_hashes_count_and_short_doc(spark, docs):
    from pyspark.sql import functions as F
    g = positional_kgram_hashes(docs, k=4)
    n = {r["doc_id"]: r["c"] for r in
         g.groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
    assert n[1] == 10 - 4 + 1
    short = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    assert positional_kgram_hashes(short, k=4).count() == 0


def test_all_occurrences_flagged(docs):
    pos = duplicated_positions(docs, k=4).collect()
    by_doc = {}
    for r in pos:
        by_doc.setdefault(r["doc_id"], set()).add(r["pos"])
    # the a b c d window occurs in docs 1, 2, 4 (positions 0, 2, 0) and
    # doc 5 (position 8): every occurrence flagged, not every-but-one
    assert 0 in by_doc[1] and 2 in by_doc[2] and 0 in by_doc[4]
    assert 8 in by_doc[5]
    assert 3 not in by_doc


def test_spans_merge_overlapping_windows(docs):
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in duplicated_spans(docs, k=4).collect()}
    # docs 1 and 4 are identical: every window duplicated -> one span
    # covering the whole 10-token doc
    assert (1, 0, 10) in spans and (4, 0, 10) in spans
    # doc 2: only the a b c d window (start 2) -> [2, 6)
    assert (2, 2, 6) in spans
    # doc 5: e f g h (start 3) and a b c d (start 8) are 5 apart
    # (>= k): two SEPARATE islands
    assert (5, 3, 7) in spans and (5, 8, 12) in spans
    assert not any(d == 3 for d, _, _ in spans)


def test_strip_removes_exact_token_sets(docs):
    out = {r["doc_id"]: r for r in
           strip_duplicated_spans(docs, k=4).collect()}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 10
    assert out[2]["text"] == "x y w z q r" and out[2]["n_removed"] == 4
    assert out[3]["n_removed"] == 0 and out[3]["n_tokens"] == 10
    assert out[5]["text"] == "m n o zz" and out[5]["n_removed"] == 8
    # token accounting is exact
    for r in out.values():
        assert len(r["text"].split()) == (r["n_tokens"] - r["n_removed"]
                                          if r["text"] else 0)


def test_no_python_udfs_in_plan(docs):
    for df in (duplicated_spans(docs, k=4),
               strip_duplicated_spans(docs, k=4)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
