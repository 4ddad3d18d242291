"""Gopher rule battery (Rae et al. 2021 App. A1.1): each rule on a
crafted document that isolates it, NULL/empty normalization, and the
shuffle-free plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from scardina_spark.operators.gopher import (
    gopher_filter, with_gopher_flags)

GOOD = ("the data and pipeline that we have built works well with "
        "careful planning " * 5)  # 65 words, stop words present


def _flags(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id: long, text: string")
    return with_gopher_flags(df).first()


def test_good_doc_passes_all(spark):
    r = _flags(spark, GOOD)
    assert r["gopher_keep"]


def test_word_count_bounds(spark):
    assert not _flags(spark, "too short")["g_word_count"]
    assert _flags(spark, "w " * 50)["g_word_count"]


def test_mean_word_length(spark):
    r = _flags(spark, "a b c " * 30)
    assert not r["g_mean_word_len"]  # mean length 1
    r = _flags(spark, "incomprehensibilities " * 60)
    assert not r["g_mean_word_len"]  # mean length > 10


def test_symbol_ratio(spark):
    assert not _flags(spark, "w # " * 40)["g_symbol_ratio"]
    assert not _flags(spark, "w ... " * 40)["g_symbol_ratio"]
    assert _flags(spark, GOOD)["g_symbol_ratio"]


def test_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join("• item" for _ in range(10))
    assert not _flags(spark, bullets)["g_bullet_lines"]
    ells = "\n".join("trailing line..." for _ in range(10))
    assert not _flags(spark, ells)["g_ellipsis_lines"]
    assert _flags(spark, "one line\nsecond line")["g_bullet_lines"]


def test_alpha_words_and_stop_words(spark):
    nums = " ".join(str(i) for i in range(60))
    r = _flags(spark, nums)
    assert not r["g_alpha_words"]
    assert not r["g_stop_words"]
    # 2 distinct stop words is the threshold
    assert _flags(spark, "the of " + "word " * 48)["g_stop_words"]
    assert not _flags(spark, "the the " + "word " * 48)["g_stop_words"]


def test_null_and_empty_normalize(spark):
    df = spark.createDataFrame([(0, None), (1, ""), (2, "   ")],
                               "doc_id: long, text: string")
    rows = with_gopher_flags(df).collect()
    for r in rows:
        assert r["gopher_keep"] is False  # real boolean, never NULL
        assert r["g_word_count"] is False


def test_filter_restores_schema_and_is_shuffle_free(spark, tables):
    docs = tables["documents"]
    out = gopher_filter(docs)
    assert out.columns == docs.columns
    plan = (with_gopher_flags(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
