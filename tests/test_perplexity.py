"""CCNet-style unigram perplexity scoring vs a pure-Python reference."""

import math

import pytest

from scardina_spark.operators import perplexity as P

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "zyx qqq zzz"),          # rare/OOV-ish relative to the rest
    (3, "the the the the"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _py_lm(texts, k=1.0):
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w.lower()] = counts.get(w.lower(), 0) + 1
    n_total = sum(counts.values())
    vocab = len(counts)
    denom = n_total + k * (vocab + 1)
    logp = {w: math.log((n + k) / denom) for w, n in counts.items()}
    return logp, math.log(k / denom)


def test_unigram_lm_matches_python(spark, docs):
    lm = {r["token"]: r["logp"]
          for r in P.train_unigram_lm(docs).collect()}
    want, _ = _py_lm([t for _, t in DOCS])
    assert set(lm) == set(want)
    for w, lp in want.items():
        assert abs(lm[w] - lp) < 1e-12


def test_doc_perplexity_matches_python(spark, docs):
    lm = P.train_unigram_lm(docs)
    got = {r["doc_id"]: (r["n_toks"], r["ppl"])
           for r in P.doc_perplexity(docs, lm).collect()}
    logp, _ = _py_lm([t for _, t in DOCS])
    for i, t in DOCS:
        toks = [w.lower() for w in t.split()]
        ppl = math.exp(-sum(logp[w] for w in toks) / len(toks))
        assert got[i][0] == len(toks)
        assert abs(got[i][1] - round(ppl, 4)) < 1e-9


def test_oov_tokens_score_the_smoothed_floor(spark, docs):
    # train only on docs 0-1; doc 2 is fully OOV and must score
    # exp(-oov) exactly, worse than any in-vocabulary doc
    train = docs.where("doc_id < 2")
    lm = P.train_unigram_lm(train)
    got = {r["doc_id"]: r["ppl"]
           for r in P.doc_perplexity(docs, lm).collect()}
    _, oov = _py_lm([t for _, t in DOCS[:2]])
    assert got[2] == round(math.exp(-oov), 4)
    assert got[2] > max(got[0], got[1], got[3])


def test_band_filter_keeps_head_and_middle(spark, docs):
    lm = P.train_unigram_lm(docs)
    ppls = sorted(r["ppl"]
                  for r in P.doc_perplexity(docs, lm).collect())
    lo, hi = ppls[0] + 1e-6, ppls[3] - 1e-6   # 1 head, 2 middle, 1 tail
    banded = {r["doc_id"]: r["ppl_band"]
              for r in P.perplexity_band(docs, lm, lo, hi).collect()}
    assert sorted(banded.values()) == ["head", "middle", "middle", "tail"]
    kept = P.filter_by_perplexity(docs, lm, lo, hi)
    assert kept.count() == 3
    assert kept.columns == ["doc_id", "text"]


def test_derive_ppl_thresholds_percentiles(spark, tables):
    docs = tables["documents"].limit(100)
    lm = P.train_unigram_lm(docs)
    row = P.derive_ppl_thresholds(docs, lm).collect()
    assert len(row) == 1 and row[0]["lang"] == "*"
    lo, hi = row[0]["lo"], row[0]["hi"]
    assert lo < hi
    # the derived cut actually thirds the corpus: band sizes ~33/33/33
    banded = P.perplexity_band(docs, lm, lo, hi)
    from pyspark.sql import functions as F
    sizes = {r["ppl_band"]: r["n"] for r in
             banded.groupBy("ppl_band")
             .agg(F.count("*").alias("n")).collect()}
    assert all(20 <= sizes.get(b, 0) <= 47 for b in
               ("head", "middle", "tail")), sizes
    # per-language variant: one row per language, each internally sorted
    per_lang = P.derive_ppl_thresholds(docs, lm, lang_col="lang").collect()
    assert len(per_lang) == docs.select("lang").distinct().count()
    for r in per_lang:
        assert r["lo"] <= r["hi"]


def _py_bigram(texts, k=1.0):
    bi, ctx = {}, {}
    for t in texts:
        ws = [w.lower() for w in t.split()]
        prevs = ["<s>"] + ws[:-1]
        for p, w in zip(prevs, ws):
            bi[(p, w)] = bi.get((p, w), 0) + 1
            ctx[p] = ctx.get(p, 0) + 1
    vocab = len({w for _, w in bi})
    denom_k = k * (vocab + 1)
    logp = {pw: math.log((n + k) / (ctx[pw[0]] + denom_k))
            for pw, n in bi.items()}
    floor = {p: math.log(k / (c + denom_k)) for p, c in ctx.items()}
    return logp, floor, math.log(1.0 / (vocab + 1))


def test_bigram_lm_matches_python(spark, docs):
    lm = P.train_bigram_lm(docs)
    got = {(r["prev"], r["token"]): r["logp"]
           for r in lm.bigrams.collect()}
    want, floors, default = _py_bigram([t for _, t in DOCS])
    assert set(got) == set(want)
    for pw, lp in want.items():
        assert abs(got[pw] - lp) < 1e-12
    got_floors = {r["prev"]: r["floor_logp"]
                  for r in lm.contexts.collect()}
    for p, fl in floors.items():
        assert abs(got_floors[p] - fl) < 1e-12
    assert abs(lm.default_floor - default) < 1e-12


def test_bigram_perplexity_matches_python_with_fallbacks(spark, docs):
    # train on docs 0-1 only: doc 2 exercises the unseen-context
    # fallback, doc 3 the seen-context/unseen-continuation floor
    train = docs.where("doc_id < 2")
    lm = P.train_bigram_lm(train)
    got = {r["doc_id"]: (r["n_toks"], r["ppl"])
           for r in P.doc_perplexity_bigram(docs, lm).collect()}
    logp, floors, default = _py_bigram([t for _, t in DOCS[:2]])
    for i, t in DOCS:
        ws = [w.lower() for w in t.split()]
        prevs = ["<s>"] + ws[:-1]
        lps = [logp.get((p, w), floors.get(p, default))
               for p, w in zip(prevs, ws)]
        ppl = round(math.exp(-sum(lps) / len(lps)), 4)
        assert got[i] == (len(ws), ppl), (i, got[i], ppl)
    # the bigram model sharpens in-domain docs vs the unigram one
    uni = P.train_unigram_lm(train)
    uni_ppl = {r["doc_id"]: r["ppl"]
               for r in P.doc_perplexity(docs, uni).collect()}
    assert got[0][1] < uni_ppl[0]


def test_bigram_empty_doc_scores_uniform_floor(spark):
    docs = spark.createDataFrame(
        [(0, "a b a c"), (1, "")], ["doc_id", "text"])
    lm = P.train_bigram_lm(docs.where("doc_id = 0"))
    got = {r["doc_id"]: (r["n_toks"], r["ppl"])
           for r in P.doc_perplexity_bigram(docs, lm).collect()}
    assert got[1] == (0, round(math.exp(-lm.default_floor), 4))


def _duckdb_oracle_rows(pq_path: str, sql: str) -> list[tuple]:
    """Run an oracle SQL over ``create view documents as select * from
    <pq_path>`` in a FRESH SUBPROCESS and return its rows.

    DuckDB 1.0.0 segfaults natively on some of these queries when the
    host process's allocator is in a particular state (reproducibly:
    the fast-tier test ordering crashed ``SQL_BIGRAM_PPL`` here while
    the same call passed standalone and under the full-suite ordering).
    A subprocess gives the oracle a clean native heap; the SQL, the
    view, and the returned rows are identical."""
    import pickle
    import subprocess
    import sys

    prog = (
        "import sys, pickle, duckdb\n"
        "pq, sql = pickle.load(sys.stdin.buffer)\n"
        "con = duckdb.connect()\n"
        "con.execute(\"create view documents as select * from '\" + pq + \"'\")\n"
        "sys.stdout.buffer.write(pickle.dumps(con.execute(sql).fetchall()))\n"
    )
    out = subprocess.run([sys.executable, "-c", prog],
                         input=pickle.dumps((pq_path, sql)),
                         capture_output=True, check=True)
    return pickle.loads(out.stdout)


def test_bigram_oracle_parity_with_empty_docs(spark, tmp_path):
    """The latent class that bit x50/x51/x52 in review: run the x52
    oracle SQL and the Spark engine over a synthetic corpus CONTAINING
    empty, whitespace-only, and NULL texts and require exact parity
    (fixtures today have no empty docs, so the contract gate alone
    cannot pin this)."""
    from scardina_spark.queries import SQL_BIGRAM_PPL

    rows = [(0, "the cat sat"), (1, ""), (2, "   "), (3, None),
            (4, "the cat ran home"), (5, "cat")]
    pq = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d"))
    import glob
    import shutil
    shutil.copy(glob.glob(str(tmp_path / "d" / "*.parquet"))[0], pq)

    docs = spark.read.parquet(pq)
    lm = P.train_bigram_lm(docs)
    got = {(r["doc_id"], r["n_toks"], r["ppl"]) for r in
           P.doc_perplexity_bigram(docs, lm).collect()}

    want = {(r[0], r[1], r[2]) for r in
            _duckdb_oracle_rows(pq, SQL_BIGRAM_PPL)}
    assert got == want
    # empty/ws/NULL docs all score the uniform floor with n_toks 0
    floors = {r for r in got if r[0] in (1, 2, 3)}
    assert all(n == 0 for _, n, _ in floors)
    assert len({p for _, _, p in floors}) == 1


def test_unigram_and_chunk_oracle_parity_with_empty_docs(spark, tmp_path):
    """Same empty-doc pin for the x50 (unigram band) and x51 (chunk)
    oracles — their earlier review fixes are otherwise exercised by no
    fixture."""
    import glob
    import shutil

    from scardina_spark.queries import (
        SQL_CHUNK_DOCS, SQL_PERPLEXITY_BAND, q_chunk_docs,
        q_perplexity_band)

    rows = [(0, "the cat sat on the mat"), (1, ""), (2, "   "),
            (3, None), (4, "dog " * 40)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d"))
    pq = str(tmp_path / "documents.parquet")
    shutil.copy(glob.glob(str(tmp_path / "d" / "*.parquet"))[0], pq)

    sf_dir = str(tmp_path)  # load_table reads <sf_dir>/documents.parquet
    for q_fn, sql in ((q_perplexity_band, SQL_PERPLEXITY_BAND),
                      (q_chunk_docs, SQL_CHUNK_DOCS)):
        got = {tuple(r) for r in q_fn(spark, sf_dir).collect()}
        want = {tuple(r) for r in _duckdb_oracle_rows(pq, sql)}
        assert got == want, (q_fn.__name__, got ^ want)


def test_band_derived_per_language_terciles(spark):
    """CCNet §4.3: thresholds are PER-LANGUAGE terciles — each language
    bands against its own cuts, so a document pair with identical ppl
    can band differently across languages."""
    rows = []
    # each doc mixes a common and a less-common token in a different
    # ratio, so per-lang ppls are distinct (terciles populate); lang b
    # adds a rare token so its distribution (hence cuts) differs
    for i in range(1, 10):
        rows.append((i, "a", "x " * i + "y " * (10 - i)))
        rows.append((100 + i, "b", "x " * i + "rare " + "y " * (9 - i)))
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")
    lm = P.train_unigram_lm(df)
    out = P.perplexity_band_derived(df, lm, lang_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        bands = sorted(r["ppl_band"] for r in rs)
        # terciles of 9 docs: head/middle/tail all populated
        assert set(bands) == {"head", "middle", "tail"}, (lang, bands)
        for r in rs:
            assert r["lo"] <= r["hi"]
            if r["ppl_band"] == "head":
                assert r["ppl"] < r["lo"]
            elif r["ppl_band"] == "tail":
                assert r["ppl"] >= r["hi"]
    # the two languages derived different cuts
    assert by_lang["a"][0]["lo"] != by_lang["b"][0]["lo"]


def _ref_kn(texts, d=0.75, k=1.0):
    """Pure-Python interpolated-KN twin."""
    import math
    from collections import Counter, defaultdict
    bi = Counter()
    for t in texts:
        ws = [w.lower() for w in (t or "").split() if w]
        prev = "<s>"
        for w in ws:
            bi[(prev, w)] += 1
            prev = w
    cn = defaultdict(int)
    n1p_fwd = defaultdict(int)
    n1p_bwd = defaultdict(int)
    for (p, w), n in bi.items():
        cn[p] += n
        n1p_fwd[p] += 1
        n1p_bwd[w] += 1
    tt = len(bi)
    vocab = len(n1p_bwd)
    denom = tt + k * (vocab + 1)

    def prob(p, w):
        pc = (n1p_bwd.get(w, 0) + k) / denom
        if (p, w) in bi:
            return (bi[(p, w)] - d) / cn[p] + (d * n1p_fwd[p] / cn[p]) * pc
        if p in cn:
            return (d * n1p_fwd[p] / cn[p]) * pc
        return pc

    def ppl(t):
        ws = [w.lower() for w in (t or "").split() if w]
        if not ws:
            return round(denom / k, 4)
        prev, s = "<s>", 0.0
        for w in ws:
            s += math.log(prob(prev, w))
            prev = w
        return round(math.exp(-s / len(ws)), 4)

    return prob, ppl


def test_kn_matches_reference(spark):
    from scardina_spark.operators.perplexity import (
        doc_perplexity_kn, train_bigram_kn)
    texts = ["the cat sat on the mat", "the cat ran", "a dog sat",
             "", "zz unseen words here", "the the the"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id: long, text: string")
    lm = train_bigram_kn(df)
    _, ref_ppl = _ref_kn(texts)
    got = {r["doc_id"]: (r["n_toks"], r["ppl"])
           for r in doc_perplexity_kn(df, lm).collect()}
    for i, t in enumerate(texts):
        n = len([w for w in t.split() if w])
        assert got[i] == (n, ref_ppl(t)), (i, t)
    lm.release()


def test_kn_probabilities_sum_to_one_per_context(spark):
    """The defining interpolated-KN closure: for any SEEN context p,
    sum over the vocabulary PLUS one OOV slot of P(w|p) is EXACTLY 1 —
    the discount mass re-spent on the continuation distribution
    (which itself closes to 1 over vocab + the add-k OOV slot)."""
    import pytest as _pt

    from scardina_spark.operators.perplexity import train_bigram_kn
    texts = ["the cat sat on the mat", "the cat ran", "a dog sat"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id: long, text: string")
    lm = train_bigram_kn(df)
    prob, _ = _ref_kn(texts)
    vocab = [r["token"] for r in lm.continuations.collect()]
    assert len(vocab) == lm.vocab
    for ctx in ("the", "cat", "<s>"):
        total = (sum(prob(ctx, w) for w in vocab)
                 + prob(ctx, "@@never-seen@@"))
        assert total == _pt.approx(1.0, abs=1e-12), ctx
    # unseen context: pure continuation distribution, same closure
    total = (sum(prob("@@noctx@@", w) for w in vocab)
             + prob("@@noctx@@", "@@never-seen@@"))
    assert total == _pt.approx(1.0, abs=1e-12)
    lm.release()
