"""Hashed-BoW logistic-regression text classification: deterministic
label mapping, heuristic distillation agreement, the map-side-only
scoring plan, and the non-degenerate synthetic validation task."""

from __future__ import annotations

from pyspark.sql import functions as F

from scardina_spark.operators import textstats as TS
from scardina_spark.operators.textclf import (
    TOPIC_LABELS, distill_heuristic, topic_corpus, train_text_classifier)


def test_labels_sorted_and_layout_independent(spark, tables):
    docs = tables["documents"]
    clf = train_text_classifier(
        docs.withColumn("lbl", TS.lang_id("text")), "lbl")
    assert clf.labels == sorted(clf.labels)
    clf2 = train_text_classifier(
        docs.repartition(13).withColumn("lbl", TS.lang_id("text")), "lbl")
    assert clf2.labels == clf.labels


def test_distill_lang_heuristic_agreement(spark, tables):
    docs = tables["documents"]
    clf, report = distill_heuristic(docs, TS.lang_id("text"))
    rows = report.collect()
    n = sum(r["n_test"] for r in rows)
    agree = sum(r["n_agree"] for r in rows)
    assert n > 0
    # the marker heuristic is linearly separable in unigram space —
    # distillation should be near-perfect (measured 1.0; margin for
    # optimizer tolerance)
    assert agree / n >= 0.95
    # holdout split is the documented plain modulo
    n_expected = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert n == n_expected


def test_score_preserves_columns_and_is_map_side(spark, tables):
    docs = tables["documents"]
    clf = train_text_classifier(
        docs.withColumn("lbl", TS.lang_id("text")), "lbl")
    scored = clf.score(docs)
    assert set(scored.columns) == set(docs.columns) | {"pred_label"}
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # broadcast coefficients, no shuffle
    preds = set(r["pred_label"] for r in scored.collect())
    assert preds <= set(clf.labels)


def test_topic_corpus_deterministic_and_balanced(spark, tables):
    ids = tables["documents"].select("doc_id")
    c1 = {r["doc_id"]: (r["label"], r["text"])
          for r in topic_corpus(ids).collect()}
    c2 = {r["doc_id"]: (r["label"], r["text"])
          for r in topic_corpus(ids.repartition(17)).collect()}
    assert c1 == c2  # content-hash randomness: layout-independent
    assert {v[0] for v in c1.values()} == set(TOPIC_LABELS)
    # every class emits every word often enough that no single word
    # determines the class (the non-degeneracy the x45 gate asserts)
    from collections import Counter
    seen = Counter()
    for lbl, text in c1.values():
        for w in set(text.split()):
            seen[(lbl, w)] += 1
    words = {w for _, w in seen}
    for lbl in TOPIC_LABELS:
        assert {w for (l, w) in seen if l == lbl} == words


def test_synthetic_task_separates_but_not_perfectly(spark, tables):
    """The x45 gate semantics: learned agreement must beat a
    majority-class baseline by a wide margin yet stay below the
    degenerate 1.0 (the task has genuine Bayes error)."""
    ids = tables["documents"].select("doc_id")
    corpus = topic_corpus(ids)
    _, report = distill_heuristic(corpus, F.col("label"))
    rows = report.collect()
    assert {r["label"] for r in rows} == set(TOPIC_LABELS)
    n = sum(r["n_test"] for r in rows)
    agree = sum(r["n_agree"] for r in rows)
    # majority baseline on a 3-way balanced task is ~1/3
    assert 0.55 * n <= agree <= 0.98 * n
    for r in rows:  # the per-label band the x45 oracle pins
        assert 0.55 * r["n_test"] <= r["n_agree"] <= 0.98 * r["n_test"]


def test_distill_report_covers_only_training_labels(spark):
    """A label occurring solely in the holdout (doc_id % 5 == 0) can
    never be predicted; the report must exclude it rather than emit an
    unsatisfiable agreement row (ADVICE r04)."""
    rows = [(i, "aaa bbb" if i % 5 else "ccc ddd",
             "seen" if i % 5 else "holdout_only") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lbl: string")
    clf, report = distill_heuristic(df, F.col("lbl"))
    assert clf.labels == ["seen"]
    assert [r["label"] for r in report.collect()] == []
