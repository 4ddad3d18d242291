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
    assert not _flags(spark, bullets)["g_bullet_lines"]  # 100% > 0.90
    ells = "\n".join("trailing line..." for _ in range(10))
    assert not _flags(spark, ells)["g_ellipsis_lines"]
    assert _flags(spark, "one line\nsecond line")["g_bullet_lines"]
    # the paper's threshold is >90% bullet LINES, not >10%: a normal
    # list-bearing page (half its lines bulleted) must pass
    half = "\n".join("- item" if i % 2 else "prose line"
                     for i in range(10))
    assert _flags(spark, half)["g_bullet_lines"]


def test_alpha_words_and_stop_words(spark):
    nums = " ".join(str(i) for i in range(60))
    r = _flags(spark, nums)
    assert not r["g_alpha_words"]
    assert not r["g_stop_words"]
    # 2 distinct stop words is the threshold
    assert _flags(spark, "the of " + "word " * 48)["g_stop_words"]
    assert not _flags(spark, "the the " + "word " * 48)["g_stop_words"]


def test_custom_stop_words_plumb_through(spark):
    """A custom function-word set must flip g_stop_words through every
    layer — gopher_flags / with_gopher_flags / gopher_filter — so a
    positional-arg drift in the plumbing can't silently revert the rule
    to the English default."""
    text = "zz qq " + "word " * 48  # 50 words, no English stop words
    df = spark.createDataFrame([(0, text)], "doc_id: long, text: string")
    assert not with_gopher_flags(df).first()["g_stop_words"]
    assert with_gopher_flags(
        df, stop_words=("zz", "qq")).first()["g_stop_words"]
    assert gopher_filter(df).count() == 0
    assert gopher_filter(df, stop_words=("zz", "qq")).count() == 1


def test_curate_corpus_forwards_gopher_stop_words(tables):
    """The composed pipeline's gopher gate must honor the corpus's own
    stop set (ADVICE r6: the knob was unreachable through
    curate_corpus, leaving the composed gate degenerate)."""
    from scardina_spark.operators.curate import curate_corpus
    docs = tables["documents"]
    n_default = curate_corpus(docs, gopher_rules=True).count()
    n_custom = curate_corpus(
        docs, gopher_rules=True,
        gopher_stop_words=("the", "a")).count()
    # English set is degenerate on the synthetic corpus; the corpus's
    # own function words let documents through
    assert n_custom > n_default


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


def test_repetition_battery_crafted_docs(spark):
    from scardina_spark.operators.gopher import repetition_signals
    df = spark.createDataFrame([
        (0, " ".join(f"w{i}" for i in range(60))),   # 60 unique tokens
        (1, "spam ham " * 30),                        # total repetition
        (2, "l1\nl2\nl1\nl1"),                        # duplicated lines
        (3, ""), (4, None),                           # no units at all
    ], "doc_id: long, text: string")
    r = {x["doc_id"]: x.asDict() for x in repetition_signals(df).collect()}
    # clean doc: no duplicate grams/lines; top-n coverage is one gram's
    # chars over the doc (small at 60 tokens)
    assert r[0]["dup_5gram_char_frac"] == 0.0
    assert r[0]["dup_line_frac"] == 0.0
    assert r[0]["top_2gram_char_frac"] < 0.05
    assert r[0]["rep_keep"] is True
    # the top-n-gram rule reads the MOST FREQUENT gram's coverage, not
    # the longest gram's: one giant unique bigram must not trip it
    # when a short bigram repeats more often
    long_doc = ("xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx "
                "yyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyy "
                + "a b " * 10)
    from scardina_spark.operators.gopher import repetition_signals as RS
    df2 = spark.createDataFrame([(0, long_doc)],
                                "doc_id: long, text: string")
    row = RS(df2).first()
    # most frequent 2-gram is 'a b' / 'b a' (count ~10, 3 chars), not
    # the 81-char unique gram
    assert row["top_2gram_char_frac"] < 0.35
    # degenerate doc: every signal saturates (capped at 1.0)
    assert r[1]["top_2gram_char_frac"] <= 1.0
    assert r[1]["dup_5gram_char_frac"] == 1.0
    assert r[1]["dup_10gram_char_frac"] == 1.0
    assert r[1]["rep_keep"] is False
    # duplicate lines: 4 occurrences of 2 distinct -> 0.5; para = whole
    # text (single blank-line-free block) -> no para dup
    assert r[2]["dup_line_frac"] == 0.5
    assert r[2]["dup_line_char_frac"] == 0.5
    assert r[2]["dup_para_frac"] == 0.0
    assert r[2]["rep_keep"] is False
    # empty / NULL docs restore with all-zero signals and keep=True
    for i in (3, 4):
        assert r[i]["rep_keep"] is True
        assert all(v == 0.0 for k, v in r[i].items()
                   if k not in ("doc_id", "rep_keep"))


def test_repetition_tiebreak_hash_vs_raw_invariant(spark):
    """Property-pin the round-6 tie-break argument: replacing the raw
    gram string with (xxhash64, len) in the count shuffle and the
    max_by tie-break must leave EVERY battery output bit-identical —
    over random corpora built from a tiny equal-length vocabulary, so
    (count, chars) ties (the only case where the tie-break key order
    differs between hash and raw) occur constantly."""
    from hypothesis import given, settings, strategies as st
    from scardina_spark.operators.gopher import repetition_signals

    vocab = ["aa", "bb", "cc", "dd"]  # equal lengths -> forced ties

    @st.composite
    def corpus(draw):
        n_docs = draw(st.integers(2, 8))
        docs = []
        for i in range(n_docs):
            n_words = draw(st.integers(0, 60))
            words = [vocab[draw(st.integers(0, 3))]
                     for _ in range(n_words)]
            # sprinkle line breaks so line/para kinds participate
            text = ""
            for j, w in enumerate(words):
                sep = "\n" if j and draw(st.booleans()) else " "
                text += (sep if j else "") + w
            docs.append((i, text))
        return docs

    @given(docs=corpus())
    @settings(max_examples=8, deadline=None)
    def check(docs):
        df = spark.createDataFrame(docs, "doc_id: long, text: string")
        hashed = [r.asDict() for r in
                  repetition_signals(df).orderBy("doc_id").collect()]
        raw = [r.asDict() for r in
               repetition_signals(df, _hash_units=False)
               .orderBy("doc_id").collect()]
        assert hashed == raw

    check()


def test_repetition_battery_matches_bruteforce(spark, tables):
    """Cross-check the Spark battery against a direct Python
    recomputation of the documented formulas on a corpus slice."""
    from collections import Counter
    from scardina_spark.operators.gopher import repetition_signals
    docs = tables["documents"].limit(30)
    got = {r["doc_id"]: r.asDict()
           for r in repetition_signals(docs).collect()}
    for row in docs.collect():
        text = row["text"] or ""
        ws = [w for w in __import__("re").split(r"\s+", text) if w]
        doc_chars = max(len(text), 1)
        for n in (2, 5):
            grams = [" ".join(ws[i:i + n])
                     for i in range(len(ws) - n + 1)]
            c = Counter(grams)
            # most-frequent gram, ties by (chars, gram text) — the
            # engine's max_by struct order
            top = (max(((k, len(g), g) for g, k in c.items()),
                       default=None))
            top = top[0] * top[1] if top else 0
            dup = sum(k * len(g) for g, k in c.items() if k >= 2)

            def r4(x):  # Spark rounds half-up; python round() half-even
                from decimal import Decimal, ROUND_HALF_UP
                return float(Decimal(repr(x)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP))

            want_top = min(r4(top / doc_chars), 1.0)
            want_dup = min(r4(dup / doc_chars), 1.0)
            d = got[row["doc_id"]]
            if n == 2:
                assert d["top_2gram_char_frac"] == want_top, row["doc_id"]
            else:
                assert d["dup_5gram_char_frac"] == want_dup, row["doc_id"]
