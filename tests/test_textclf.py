"""Hashed-BoW logistic-regression text classification: deterministic
label mapping, heuristic distillation agreement, and the map-side-only
scoring plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from scardina_spark.operators import textstats as TS
from scardina_spark.operators.textclf import (
    distill_heuristic, train_text_classifier)


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
