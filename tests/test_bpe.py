"""BPE trainer: merge semantics, parity with a pure-Python reference
implementation of the Sennrich et al. (ACL 2016) algorithm, and the
encode path's broadcast-lookup + OOV fallback."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from scardina_spark.operators.bpe import (
    END, bpe_apply, bpe_encode, bpe_learn, bpe_pair_counts, merge_pair,
    word_counts)


def _ref_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def _ref_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    # leftmost-greedy, same semantics as the Spark fold
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def _ref_bpe(word_cnt: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {w: _ref_symbols(w) for w in word_cnt}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_cnt[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        vocab = {w: _ref_apply(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def test_merge_pair_greedy_leftmost(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "b"],), (["x", "a", "a", "y"],)],
        "s: array<string>")
    got = [r[0] for r in
           df.select(merge_pair(F.col("s"), "a", "a")).collect()]
    # "a a a" -> [aa, a] (leftmost wins, merged symbol does not re-merge)
    assert got == [["aa", "a"], ["a", "b", "b"], ["x", "aa", "y"]]


def test_learn_matches_reference_bpe(spark, tables):
    docs = tables["documents"]
    wc = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    ref_merges, ref_vocab = _ref_bpe(wc, n_merges=6)
    merges, vocab = bpe_learn(docs, n_merges=6)
    assert merges == ref_merges
    got_vocab = {r["word"]: tuple(r["symbols"]) for r in vocab.collect()}
    assert got_vocab == ref_vocab


def test_pair_counts_match_reference(spark, tables):
    docs = tables["documents"]
    wc = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    ref: Counter = Counter()
    for w, cnt in wc.items():
        syms = _ref_symbols(w)
        for i in range(len(syms) - 1):
            ref[(syms[i], syms[i + 1])] += cnt
    got = {(r["left_sym"], r["right_sym"]): r["pair_count"]
           for r in bpe_pair_counts(docs).collect()}
    assert got == dict(ref)


def test_encode_roundtrip_and_oov(spark, tables):
    docs = tables["documents"]
    merges, vocab = bpe_learn(docs, n_merges=4)
    enc = bpe_encode(docs, vocab)
    assert enc.count() == docs.count()
    # concatenating subwords (stripping END) reconstructs the normalized text
    row = (enc.join(docs.select("doc_id", "text"), "doc_id")
           .orderBy("doc_id").first())
    rebuilt = "".join(t for t in row["bpe_tokens"]).replace(END, " ").strip()
    import re
    norm = re.sub(r"\s+", " ", row["text"].strip().lower())
    assert rebuilt == norm
    # OOV word falls back to character symbols
    oov = spark.createDataFrame([(1, "zzqx")], "doc_id: long, text: string")
    toks = bpe_encode(oov, vocab).first()["bpe_tokens"]
    assert toks == ["z", "z", "q", "x", END]


def test_encode_uses_broadcast_join(spark, tables):
    docs = tables["documents"]
    _, vocab = bpe_learn(docs, n_merges=2)
    plan = bpe_encode(docs, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_learn_stops_below_min_count(spark):
    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id: long, text: string")
    merges, _ = bpe_learn(df, n_merges=10, min_count=2)
    # only pairs with weight >= 2 survive: (a,b) and (b,</w>) at 2 each,
    # then their merge chain; cd-pairs (count 1) never get merged
    assert all(cnt >= 2 for _, _, cnt in merges)
    assert ("c", "d", 1) not in merges


def test_local_and_distributed_loops_agree(spark, tables):
    docs = tables["documents"].limit(40)
    # driver_cap=0 forces the distributed per-iteration fallback
    m_dist, v_dist = bpe_learn(docs, n_merges=5, driver_cap=0)
    m_loc, v_loc = bpe_learn(docs, n_merges=5)
    assert m_loc == m_dist
    got_d = {r["word"]: (r["cnt"], tuple(r["symbols"]))
             for r in v_dist.collect()}
    got_l = {r["word"]: (r["cnt"], tuple(r["symbols"]))
             for r in v_loc.collect()}
    assert got_l == got_d


def test_local_loop_job_count_independent_of_merges(spark, tables):
    """The scale contract: Spark-job count per training is O(1), not
    O(n_merges) — 1k merges must run in seconds with a handful of jobs
    (the word-count localization), never ~2k sequential cluster jobs."""
    import time

    docs = tables["documents"]
    sc = spark.sparkContext
    sc.setJobGroup("bpe-local-learn", "bpe_learn driver-side loop")
    t0 = time.monotonic()
    merges, _ = bpe_learn(docs, n_merges=1000, min_count=1)
    elapsed = time.monotonic() - t0
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-local-learn")
    sc.setJobGroup("", "")
    assert len(merges) > 100  # the corpus really supports a deep merge table
    assert len(jobs) <= 4, f"expected O(1) Spark jobs, saw {len(jobs)}"
    assert elapsed < 60, f"1k merges took {elapsed:.1f}s"


APPLY_MERGES = [("a", "r"), ("t", "h"), ("th", "e"), ("r", "o")]


def test_bpe_apply_matches_reference_fold(spark, tables):
    """Token-level parity with the pure-Python leftmost-greedy twin on
    the real corpus — stacked merges ('the' consumes the earlier 'th')
    included."""
    import re

    docs = tables["documents"].limit(60)
    got = {r["doc_id"]: (r["n_words"], tuple(r["bpe_tokens"]), r["n_bpe"])
           for r in bpe_apply(docs, APPLY_MERGES).collect()}
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in
                 re.split(r"\s+", (row["text"] or "").strip().lower()) if w]
        toks: list[str] = []
        for w in words:
            syms = _ref_symbols(w)
            for a, b in APPLY_MERGES:
                syms = _ref_apply(syms, a, b)
            toks.extend(syms)
        assert got[row["doc_id"]] == (len(words), tuple(toks), len(toks)), \
            row["doc_id"]


def test_bpe_apply_stacked_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "the thermos"), (2, ""), (3, None), (4, "arrow road")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: (r["n_words"], list(r["bpe_tokens"]))
           for r in bpe_apply(df, APPLY_MERGES).collect()}
    # stacked merge: 'the' fires wherever 'th' precedes 'e', so
    # 'thermos' also opens with the 'the' symbol
    assert got[1] == (2, ["the", END, "the", "r", "m", "o", "s", END])
    assert got[2] == (0, [])
    assert got[3] == (0, [])
    # 'arrow': a,r,r,o,w -> ar,r,o,w -> ar,ro,w ; 'road': ro,a,d
    assert got[4] == (2, ["ar", "ro", "w", END, "ro", "a", "d", END])


def test_bpe_apply_validates_merges(spark, tables):
    docs = tables["documents"]
    with pytest.raises(ValueError):
        bpe_apply(docs, [])
    with pytest.raises(ValueError):
        bpe_apply(docs, [("a", "")])


def test_bpe_apply_is_shuffle_free(spark, tables):
    """The scale contract: tokenizer inference is a pure projection —
    no Exchange anywhere in the physical plan ONCE the input is as
    parallel as the cluster (the r12 under-parallel-scan guard spreads
    a too-coarse scan first; on an input with >= defaultParallelism
    partitions it must stay a no-op)."""
    par = spark.sparkContext.defaultParallelism
    wide = tables["documents"].repartition(par)
    plan = (bpe_apply(wide, APPLY_MERGES)
            ._jdf.queryExecution().executedPlan().toString())
    # exactly the one Exchange WE added to widen the input; the
    # tokenizer itself must not introduce another
    assert plan.count("Exchange") == 1


def test_bpe_apply_spreads_underparallel_scan(spark, tables):
    """A scan with fewer splits than the cluster has slots is
    repartitioned before the fold (r12) — and the token output is
    identical either way (the fold is per-row)."""
    docs = tables["documents"].coalesce(1)
    got = bpe_apply(docs, APPLY_MERGES)
    assert got.rdd.getNumPartitions() >= \
        min(spark.sparkContext.defaultParallelism, 2)


def test_merge_pair_is_ansi_safe(spark):
    """element_at(acc, -1) on the empty fold accumulator throws under
    spark.sql.ansi.enabled; the F.get guard must keep merge_pair
    working in both modes (ADVICE r04)."""
    df = spark.createDataFrame([(["a", "b"],), ([],)], "s: array<string>")
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = [r[0] for r in
               df.select(merge_pair(F.col("s"), "a", "b")).collect()]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert got == [["ab"], []]


def test_bpe_apply_agrees_with_encode_on_learned_merges(spark, tables):
    """The two inference paths are duals: applying the learned merge
    LIST reproduces exactly the token sequences of the vocab-join
    encode path — the merges/vocab duality of the trainer."""
    docs = tables["documents"].limit(50)
    merges, vocab = bpe_learn(docs, n_merges=6)
    via_vocab = {r["doc_id"]: list(r["bpe_tokens"])
                 for r in bpe_encode(docs, vocab).collect()}
    via_merges = {r["doc_id"]: list(r["bpe_tokens"])
                  for r in bpe_apply(
                      docs, [(a, b) for a, b, _ in merges]).collect()}
    assert via_merges == via_vocab


def test_bpe_apply_rejects_oversize_merge_table(spark):
    """The pure-projection path's expression tree is linear in merge
    count; past the cap the operator refuses and points at
    bpe_encode's broadcast join."""
    import pytest
    from scardina_spark.operators.bpe import (
        APPLY_PROJECTION_MERGE_CAP, bpe_apply)
    df = spark.createDataFrame([(0, "hi")], "doc_id: long, text: string")
    big = [(f"a{i}", f"b{i}") for i in range(APPLY_PROJECTION_MERGE_CAP + 1)]
    with pytest.raises(ValueError, match="bpe_encode"):
        bpe_apply(df, big)


def test_vocab_coverage_crafted(spark):
    """OOV accounting: repeated words count per occurrence; empty and
    NULL texts audit as 0-word docs with NULL rate."""
    from scardina_spark.operators.bpe import vocab_coverage
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "zorp the gnarf"),
         (2, ""), (3, None)],
        "doc_id: long, text: string")
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("sat",), ("on",), ("mat",)], "word: string")
    got = {r["doc_id"]: (r["n_words"], r["n_oov"], r["oov_rate"])
           for r in vocab_coverage(docs, vocab).collect()}
    assert got[0] == (6, 0, 0.0)
    assert got[1] == (3, 2, round(2 / 3, 6))
    assert got[2] == (0, 0, None) and got[3] == (0, 0, None)


def test_vocab_coverage_broadcasts_and_single_wide_shuffle(spark, tables):
    """Scale pin: the vocab join is a BroadcastHashJoin; the only wide
    shuffles are the two aggregations (per-(doc,word) combine + per-doc
    rollup) and the base-relation join, never a sort-merge on words."""
    from pyspark.sql import functions as F
    from scardina_spark.operators.bpe import vocab_coverage, word_counts
    docs = tables["documents"]
    vocab = word_counts(docs).where(F.col("cnt") >= 20)
    plan = (vocab_coverage(docs, vocab)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_apply_arrow_parity_on_learned_merges(spark, tables):
    """The Arrow tokenizer is BIT-IDENTICAL to bpe_apply's codegen fold
    on the real documents table with real learned merges."""
    from scardina_spark.operators.bpe import bpe_apply_arrow
    docs = tables["documents"]
    merges, _ = bpe_learn(docs, n_merges=8, min_count=2)
    pairs = [(a, b) for a, b, _ in merges]
    want = {r["doc_id"]: (r["n_words"], tuple(r["bpe_tokens"]), r["n_bpe"])
            for r in bpe_apply(docs, pairs).collect()}
    got = {r["doc_id"]: (r["n_words"], tuple(r["bpe_tokens"]), r["n_bpe"])
           for r in bpe_apply_arrow(docs, pairs).collect()}
    assert got == want


def test_bpe_apply_arrow_sequential_not_min_rank(spark):
    """The semantics edge that distinguishes sequential passes from the
    GPT-2 min-rank loop: merges=[(ab,c),(a,b)] on 'abc' must yield
    [ab, c, </w>] — merge 0's pair only becomes adjacent AFTER merge
    1's turn, so it never fires (min-rank-first would give [abc,</w>]).
    Pinned on both paths."""
    from scardina_spark.operators.bpe import bpe_apply_arrow
    df = spark.createDataFrame([(0, "abc")], "doc_id: long, text: string")
    pairs = [("ab", "c"), ("a", "b")]
    for op in (bpe_apply, bpe_apply_arrow):
        toks = op(df, pairs).first()["bpe_tokens"]
        assert toks == ["ab", "c", END], (op.__name__, toks)


def test_bpe_apply_arrow_large_table_nulls_and_keeps(spark):
    """Above the projection cap the Arrow path just works (that's its
    reason to exist): a 300-merge table, NULL text to the empty doc,
    keep_cols carried through, duplicate pairs rejected."""
    import pytest
    from scardina_spark.operators.bpe import (
        APPLY_PROJECTION_MERGE_CAP, bpe_apply_arrow)
    n = APPLY_PROJECTION_MERGE_CAP + 44
    pairs = [("q", "z")] + [(f"a{i}", f"b{i}") for i in range(n - 1)]
    df = spark.createDataFrame(
        [(0, "qz qq", "en"), (1, None, "fr")],
        "doc_id: long, text: string, lang: string")
    rows = {r["doc_id"]: r for r in
            bpe_apply_arrow(df, pairs, keep_cols=("lang",)).collect()}
    assert rows[0]["bpe_tokens"] == ["qz", END, "q", "q", END]
    assert (rows[0]["n_words"], rows[0]["n_bpe"]) == (2, 5)
    assert rows[0]["lang"] == "en" and rows[1]["lang"] == "fr"
    assert rows[1]["bpe_tokens"] == [] and rows[1]["n_words"] == 0
    with pytest.raises(ValueError, match="duplicate"):
        bpe_apply_arrow(df, [("a", "b"), ("a", "b")])


def test_bpe_apply_cap_is_an_opt_in_knob(spark):
    """The projection cap is a keyword argument: lowering it rejects a
    table the default accepts, raising it admits one a lower cap
    rejects — so callers control the trade explicitly.  (Raising it far
    past the default hits Spark's own analyzer iteration limit — the
    very wall the cap fronts for — so the knob is exercised at small
    scale.)"""
    import pytest
    df = spark.createDataFrame([(0, "xy")], "doc_id: long, text: string")
    pairs = [("x", "y"), ("a", "b"), ("c", "d")]
    with pytest.raises(ValueError, match="bpe_encode"):
        bpe_apply(df, pairs, cap=2)
    out = bpe_apply(df, pairs, cap=3).first()
    assert out["bpe_tokens"] == ["xy", END]


def test_merges_txt_roundtrip(tmp_path, spark, tables):
    """save_merges/load_merges speak the standard merges.txt line
    format (header skipped, order preserved), round-trip bpe_learn's
    triples, and reject unrepresentable symbols."""
    import pytest
    from scardina_spark.operators.bpe import (
        bpe_apply, load_merges, save_merges)
    docs = tables["documents"]
    triples, _ = bpe_learn(docs, n_merges=6)
    p = str(tmp_path / "merges.txt")
    save_merges(triples, p)
    loaded = load_merges(p)
    assert loaded == [(a, b) for a, b, _ in triples]
    with open(p) as f:
        assert f.readline().startswith("#version")
    # tokenization through the file == tokenization from the triples
    a = bpe_apply(docs, loaded).orderBy("doc_id").limit(5).collect()
    b = bpe_apply(docs, [(x, y) for x, y, _ in triples]) \
        .orderBy("doc_id").limit(5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    with pytest.raises(ValueError, match="whitespace"):
        save_merges([("a b", "c")], str(tmp_path / "bad.txt"))
    with pytest.raises(ValueError, match="malformed"):
        (tmp_path / "m2.txt").write_text("a b c\n")
        load_merges(str(tmp_path / "m2.txt"))


def test_cli_tokenize_merges_file_roundtrip(capsys, spark, sf_dir,
                                            tmp_path):
    """tokenize --merges-out saves merges.txt; a second run with
    --merges-file reproduces the same token accounting without
    relearning."""
    import json as _json
    from scardina_spark.__main__ import main

    mf = str(tmp_path / "merges.txt")
    rc = main(["tokenize", "--sf-dir", sf_dir, "--n-merges", "6",
               "--out", str(tmp_path / "tok1"), "--merges-out", mf])
    assert rc == 0
    o1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert o1["learned"] == 6 and o1["merges_out"] == mf
    rc = main(["tokenize", "--sf-dir", sf_dir, "--merges-file", mf,
               "--out", str(tmp_path / "tok2")])
    assert rc == 0
    o2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert o2["learned"] == 0
    assert o2["total_tokens"] == o1["total_tokens"]
