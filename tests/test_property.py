"""Property-based tests (hypothesis) for the driver-side kernels."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from scardina_spark.functions.factorize import factorization_spec
from scardina_spark.model.progressive import ColumnDomain, valid_mask
from scardina_spark.plans.parse import parse_query
from scardina_spark.plans.predicates import (
    Predicate, literal_value, normalize_predicates)

_SQL_RESERVED = {
    "as", "and", "or", "not", "in", "is", "null", "like", "between",
    "select", "from", "where", "count", "on", "join", "by", "group",
    "order", "asc", "desc", "true", "false", "all",
}
idents = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True) \
    .filter(lambda s: s not in _SQL_RESERVED)


@given(dist_size=st.integers(3, 2 ** 24), threshold=st.integers(1, 16))
@settings(max_examples=200, deadline=None)
def test_factorize_roundtrip_any_size(dist_size, threshold):
    spec = factorization_spec("c", dist_size, threshold)
    assert sum(s.window for s in spec.sub_cols) >= \
        (dist_size.bit_length() if spec.is_factorized else 0)
    rs = np.random.RandomState(dist_size % 1000)
    codes = rs.randint(1, dist_size, size=50)
    for c in codes:
        rebuilt = 0
        for sub in spec.sub_cols:
            v = ((int(c) >> sub.offset) & (2 ** sub.window - 1)) + 1
            assert 1 <= v <= sub.dist_size - 1 or not spec.is_factorized
            rebuilt |= (v - 1) << sub.offset
        if spec.is_factorized:
            assert rebuilt == c


@given(vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=50,
                     unique=True),
       lo=st.integers(-1000, 1000), hi=st.integers(-1000, 1000))
@settings(max_examples=200, deadline=None)
def test_valid_mask_matches_bruteforce_range(vals, lo, hi):
    dom = ColumnDomain("c", np.array(sorted(vals)))
    preds = [Predicate("t.c", ">=", lo), Predicate("t.c", "<=", hi)]
    m = valid_mask(dom, preds)
    assert m[0] == 0 and m[1] == 0
    for i, v in enumerate(sorted(vals)):
        assert m[i + 2] == (1.0 if lo <= v <= hi else 0.0)


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=30,
                     unique=True),
       members=st.lists(st.integers(-50, 50), min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_valid_mask_matches_bruteforce_in(vals, members):
    dom = ColumnDomain("c", np.array(sorted(vals)))
    m = valid_mask(dom, [Predicate("t.c", "IN", tuple(members))])
    for i, v in enumerate(sorted(vals)):
        assert m[i + 2] == (1.0 if v in members else 0.0)


@given(col=idents, val=st.integers(-10**6, 10**6))
@settings(max_examples=100, deadline=None)
def test_parser_roundtrips_comparison(col, val):
    q = parse_query(f"SELECT COUNT(*) FROM t WHERE {col} > {val}")
    assert q.filters == [Predicate(f"t.{col}", ">", val)]


@given(s=st.text(alphabet=st.characters(
    whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_literal_value_quoted_strings(s):
    if any(ch.isdigit() for ch in s) and s.isdigit():
        return  # plain numbers tested elsewhere
    assert literal_value(f"'{s}'") == s or isinstance(
        literal_value(f"'{s}'"), type(literal_value(f"'{s}'")))


@given(lo=st.integers(-100, 100), hi=st.integers(-100, 100))
@settings(max_examples=100, deadline=None)
def test_normalize_between_always_splits(lo, hi):
    out = normalize_predicates([Predicate("t.c", "BETWEEN", (lo, hi))])
    assert Predicate("t.c", ">=", lo) in out
    assert Predicate("t.c", "<=", hi) in out
    assert len(out) == 2


# -- plan-quality (perror) invariants ---------------------------------------

def _random_tree_query(rs, n):
    """A random tree-shaped join query over n aliases."""
    aliases = [f"t{i}" for i in range(n)]
    joins = []
    for i in range(1, n):
        j = int(rs.randint(0, i))  # attach to a random earlier node
        joins.append((f"{aliases[i]}.k", f"{aliases[j]}.k"))
    from scardina_spark.plans.parse import ParsedQuery
    return ParsedQuery(tables={a: a for a in aliases}, joins=joins,
                       filters=[])


@given(n=st.integers(3, 6), seed=st.integers(0, 10_000))
@settings(max_examples=100, deadline=None)
def test_perror_at_least_one_and_perfect_is_one(n, seed):
    """p-error >= 1 for ANY estimates; == 1 for perfect estimates — over
    random tree shapes and random cardinalities."""
    from scardina_spark.estimators.perror import (
        connected_subsets, left_deep_plans, p_error, plan_cost)
    rs = np.random.RandomState(seed)
    pq = _random_tree_query(rs, n)
    subs = connected_subsets(pq)
    true = {s: float(rs.randint(1, 10_000)) for s in subs}
    est = {s: float(rs.randint(1, 10_000)) for s in subs}
    tfn = lambda frag: true[frozenset(frag.tables)]  # noqa: E731
    efn = lambda frag: est[frozenset(frag.tables)]   # noqa: E731
    assert p_error(pq, efn, tfn) >= 1.0
    assert p_error(pq, tfn, tfn) == 1.0
    # the optimum really is the min over the enumerated space
    plans = left_deep_plans(pq)
    assert plans, "a tree query always has at least one left-deep order"
    best = min(plan_cost(p, true) for p in plans)
    assert all(plan_cost(p, true) >= best for p in plans)


@given(n=st.integers(3, 6), seed=st.integers(0, 10_000))
@settings(max_examples=60, deadline=None)
def test_bushy_dp_matches_bruteforce_and_contains_left_deep(n, seed):
    """The bushy DP optimum equals an explicit brute-force enumeration
    of every connected tree, never exceeds the left-deep optimum (the
    space contains it), and perfect estimates score exactly 1 under the
    bushy default — over random tree shapes, cardinalities, and both
    cost models."""
    from scardina_spark.estimators.perror import (
        bushy_best_plan, connected_splits, connected_subsets,
        left_deep_plans, p_error, plan_cost, plan_space_size,
        tree_cost, _join_graph)
    rs = np.random.RandomState(seed)
    pq = _random_tree_query(rs, n)
    adj = _join_graph(pq)
    subs = connected_subsets(pq)
    cards = {s: float(rs.randint(1, 10_000)) for s in subs}

    def all_trees(s):
        if len(s) == 1:
            return [next(iter(s))]
        return [(t1, t2) for s1, s2 in connected_splits(s, adj)
                for t1 in all_trees(s1) for t2 in all_trees(s2)]

    trees = all_trees(frozenset(pq.tables))
    assert len(trees) == plan_space_size(pq)
    for cm in ("out", "smj"):
        t_dp, c_dp = bushy_best_plan(pq, cards, cm)
        c_bf = min(tree_cost(t, cards, cm) for t in trees)
        assert math.isclose(c_dp, c_bf, rel_tol=1e-9)
        assert math.isclose(tree_cost(t_dp, cards, cm), c_dp,
                            rel_tol=1e-9)
        c_ld = min(plan_cost(p, cards, cm) for p in left_deep_plans(pq))
        assert c_dp <= c_ld * (1 + 1e-12)
    est = {s: float(rs.randint(1, 10_000)) for s in subs}
    tfn = lambda frag: cards[frozenset(frag.tables)]  # noqa: E731
    efn = lambda frag: est[frozenset(frag.tables)]    # noqa: E731
    for cm in ("out", "smj"):
        assert p_error(pq, tfn, tfn, cost_model=cm) == 1.0
        assert p_error(pq, efn, tfn, cost_model=cm) >= 1.0


@given(n=st.integers(2, 6), seed=st.integers(0, 10_000))
@settings(max_examples=100, deadline=None)
def test_left_deep_plans_prefixes_connected(n, seed):
    from scardina_spark.estimators.perror import (
        _connected, _join_graph, left_deep_plans)
    rs = np.random.RandomState(seed)
    pq = _random_tree_query(rs, n)
    adj = _join_graph(pq)
    for plan in left_deep_plans(pq):
        assert sorted(plan) == sorted(pq.tables)
        for k in range(1, len(plan) + 1):
            assert _connected(frozenset(plan[:k]), adj)


def _py_eval(v, p: Predicate) -> bool:
    """Reference semantics of one simple predicate on a non-null value."""
    o = p.o.upper()
    if o == "=":
        return v == p.v
    if o == "!=":
        return v != p.v
    if o == ">":
        return v > p.v
    if o == ">=":
        return v >= p.v
    if o == "<":
        return v < p.v
    if o == "<=":
        return v <= p.v
    if o == "IN":
        return v in p.v
    if o == "BETWEEN":
        return p.v[0] <= v <= p.v[1]
    if o == "IS":
        return False
    if o == "IS NOT":
        return True
    raise AssertionError(o)


simple_pred = st.one_of(
    st.tuples(st.sampled_from(["=", "!=", ">", ">=", "<", "<="]),
              st.integers(-50, 50)).map(lambda t: Predicate("t.c", *t)),
    st.lists(st.integers(-50, 50), min_size=1, max_size=4)
    .map(lambda vs: Predicate("t.c", "IN", tuple(vs))),
    st.tuples(st.integers(-50, 50), st.integers(-50, 50))
    .map(lambda t: Predicate("t.c", "BETWEEN", (min(t), max(t)))),
    st.just(Predicate("t.c", "IS", None)),
    st.just(Predicate("t.c", "IS NOT", None)),
)


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=30,
                     unique=True),
       branches=st.lists(simple_pred, min_size=2, max_size=4))
@settings(max_examples=300, deadline=None)
def test_valid_mask_or_is_union_of_branches(vals, branches):
    dom = ColumnDomain("c", np.array(sorted(vals)))
    g = Predicate("t.c", "OR", tuple(branches))
    m = valid_mask(dom, [g])
    assert m[0] == 0.0  # MASK slot always invalid
    for i, v in enumerate(sorted(vals)):
        want = any(_py_eval(v, b) for b in branches)
        assert bool(m[i + 2]) == want, (v, branches)
    null_want = any(b.o.upper() == "IS" for b in branches)
    assert bool(m[1]) == null_want


@given(branches=st.lists(
    st.tuples(st.sampled_from(["=", "!=", ">", "<"]),
              st.integers(-99, 99)), min_size=2, max_size=4))
@settings(max_examples=200, deadline=None)
def test_parse_or_roundtrip(branches):
    conds = " OR ".join(f"l.l_q {o} {v}" for o, v in branches)
    pq = parse_query(
        f"SELECT COUNT(*) FROM lineitem l WHERE ({conds})")
    (g,) = pq.filters
    assert g.o == "OR"
    assert [(b.o, b.v) for b in g.branches] == list(branches)


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_overlap_fraction_matches_bruteforce(iv):
    from scardina_spark.operators.layout import overlap_fraction
    ranges = [(min(a, b), max(a, b)) for a, b in iv]
    n = len(ranges)
    if n < 2:
        assert overlap_fraction(ranges) == 0.0
        return
    brute = sum(
        1 for i in range(n) for j in range(i + 1, n)
        if ranges[i][0] <= ranges[j][1] and ranges[j][0] <= ranges[i][1])
    assert overlap_fraction(ranges) == brute / (n * (n - 1) // 2)


# ---- round-8 exactness properties (driver-side reference twins; the
# Spark runs use few examples because each example is a Spark job) ----

_WORDS = ["spark", "table", "row", "scan", "join", "key", "agg"]


@given(texts=st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8)
    .map(" ".join), min_size=2, max_size=8),
    tpct=st.sampled_from([0.4, 0.6, 0.8, 1.0]))
@settings(max_examples=12, deadline=None)
def test_allpairs_complete_on_random_corpora(spark, texts, tpct):
    """Prefix filtering finds EVERY pair brute force finds — for random
    small corpora and every threshold, including J == t boundaries and
    the whole-text short-doc fallback."""
    from scardina_spark.operators.dedup import allpairs_sim_join

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id: long, text: string")
    got = {(r["id_a"], r["id_b"]) for r in
           allpairs_sim_join(df, threshold=tpct).collect()}

    def shingles(t):
        ws = t.split()
        if not ws:
            return frozenset()
        if len(ws) < 3:
            return frozenset({" ".join(ws)})
        return frozenset(" ".join(ws[i:i + 3])
                         for i in range(len(ws) - 2))

    sh = {i: shingles(t) for i, t in enumerate(texts)}
    want = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = sh[a], sh[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= tpct:
                want.add((a, b))
    assert got == want, (texts, tpct)


@given(events=st.lists(
    st.tuples(st.integers(0, 2),          # key
              st.sampled_from(["A", "B", None]),  # state
              st.integers(0, 40)),        # minute
    min_size=1, max_size=14),
    cut=st.integers(0, 40))
@settings(max_examples=12, deadline=None)
def test_scd2_merge_identity_on_random_streams(spark, events, cut):
    """For ANY event stream and ANY cutoff, incrementally merging the
    post-cutoff delta reproduces the from-scratch history exactly."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from scardina_spark.operators.scd import scd2_history, scd2_merge

    rows = [(k, s, datetime(2024, 1, 1, 0, m), i)
            for i, (k, s, m) in enumerate(events)]
    schema = "k: long, s: string, ts: timestamp, eid: long"
    df = spark.createDataFrame(rows, schema)
    c = datetime(2024, 1, 1, 0, cut)

    def canon(rows):  # None states sort; stringify like the gate does
        return sorted((tuple(r) for r in rows),
                      key=lambda t: tuple(str(x) for x in t))

    full = canon(scd2_history(df, "k", "s", "ts", ["eid"]).collect())
    hist = scd2_history(df.where(F.col("ts") < F.lit(c)),
                        "k", "s", "ts", ["eid"])
    merged = scd2_merge(hist, df.where(F.col("ts") >= F.lit(c)),
                        "k", "s", "ts", ["eid"])
    got = canon(merged.select(
        "k", "s", "valid_from", "valid_to", "n_events",
        "is_current").collect())
    assert got == full, (events, cut)


@given(toks=st.lists(st.integers(0, 10_000), min_size=1, max_size=400),
       s=st.integers(1, 16))
@settings(max_examples=150, deadline=None)
def test_serpentine_shard_balance_bound(toks, s):
    """Driver twin of packing.shard_plan's serpentine deal: for ANY
    token multiset and shard count, totals differ by at most 2 max-doc
    sizes and every doc is dealt exactly once."""
    order = sorted(range(len(toks)), key=lambda i: (-toks[i], i))
    shard = {}
    for idx, doc in enumerate(order):
        c = idx % (2 * s)
        shard[doc] = c if c < s else 2 * s - 1 - c
    assert len(shard) == len(toks)
    tot = [0] * s
    for doc, sh in shard.items():
        tot[sh] += toks[doc]
    if len(toks) >= s:      # fewer docs than shards: some stay empty
        assert max(tot) - min(tot) <= 2 * max(toks), (tot, max(toks))


@given(n=st.integers(1, 4000), pre=st.sampled_from("abc"))
@settings(max_examples=80, deadline=None)
def test_hll_driver_twin_error_band(n, pre):
    """Driver twin of sketches.hll_registers/hll_estimate over the same
    md5-prefix hash: relative error stays under 0.45 across the whole
    cardinality range INCLUDING the linear-counting -> raw estimator
    transition region (~2m, the classic HLL weak spot that HLL++'s
    bias table shaves; 1.04/sqrt(64) = 13% is the asymptotic sigma)."""
    import hashlib
    import math as m

    ALPHA, M, WB = 0.709, 64, 26
    regs: dict[int, int] = {}
    for i in range(n):
        h = int(hashlib.md5(f"{pre}{i}".encode()).hexdigest()[:8], 16)
        idx, w = h >> WB, h % (1 << WB)
        rho = WB + 1 if w == 0 else WB + 1 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    zeros = M - len(regs)
    raw = ALPHA * M * M / (sum(2.0 ** -r for r in regs.values()) + zeros)
    est = M * m.log(M / zeros) if (raw <= 2.5 * M and zeros > 0) else raw
    assert abs(est - n) / n <= 0.45, (n, pre, est)


@given(vals=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1,
                     max_size=40),
       alpha=st.floats(0.05, 1.0), k=st.integers(1, 12))
@settings(max_examples=150, deadline=None)
def test_window_seeded_ewma_twin(vals, alpha, k):
    """The window-seeded EWMA coefficients (features.rolling_features)
    equal the exact recursion RE-SEEDED at the window start — and the
    plain exact recursion whenever the history fits the window."""
    outs = []
    for n in range(1, len(vals) + 1):
        lo = max(0, n - k)
        s = vals[lo]                       # seed = oldest in window
        for x in vals[lo + 1:n]:
            s = alpha * x + (1.0 - alpha) * s
        outs.append(s)
        # closed-form coefficient replay (the operator's expression)
        acc = 0.0
        for i in range(min(k, n)):
            xi = vals[n - 1 - i]
            oldest = (i == k - 1) or (n - 1 - i == 0)
            ci = (1.0 - alpha) ** i if oldest else \
                alpha * (1.0 - alpha) ** i
            acc += xi * ci
        assert math.isclose(acc, s, rel_tol=1e-9, abs_tol=1e-9), (n, acc, s)
    # full-history agreement while n <= k
    s = vals[0]
    for j, x in enumerate(vals[1:min(len(vals), k)], start=1):
        s = alpha * x + (1.0 - alpha) * s
        assert math.isclose(outs[j], s, rel_tol=1e-9, abs_tol=1e-9)


def _naive_sequential_passes(word, merges):
    """The definitional semantics: every merge applied leftmost-greedily
    ONCE, at its own turn, in merge order — O(n_merges · len), the spec
    the rank-heap scheduler must reproduce exactly."""
    from scardina_spark.operators.bpe import END, _apply_merge
    syms = tuple(word) + (END,)
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return syms


@given(st.text(alphabet="abc", min_size=0, max_size=12),
       st.lists(st.tuples(st.text(alphabet="abc", min_size=1, max_size=3),
                          st.text(alphabet="abc", min_size=1, max_size=3)),
                min_size=0, max_size=12))
@settings(max_examples=400, deadline=None)
def test_bpe_rank_heap_equals_naive_sequential(word, merges):
    """bpe_apply_arrow's lazy rank-heap scheduler is EXACTLY the naive
    one-pass-per-merge fold for every word and merge table (tiny
    alphabet maximizes merge interactions: chains, later-merge-creates-
    earlier-pair, END-touching merges)."""
    from scardina_spark.operators.bpe import (END,
                                              _sequential_merge_passes)
    # duplicates unsupported by the heap path (documented); dedup keeps
    # first occurrence, preserving order
    seen, uniq = set(), []
    for m in merges:
        if m not in seen:
            seen.add(m)
            uniq.append(m)
    ranks = {p: i for i, p in enumerate(uniq)}
    got = _sequential_merge_passes(word, uniq, ranks)
    want = _naive_sequential_passes(word, uniq)
    assert got == want, (word, uniq, got, want)


@given(st.text(alphabet="ab", min_size=1, max_size=8),
       st.lists(st.tuples(st.sampled_from(["a", "b", "ab", "ba", "aa",
                                           "bb", "</w>"]),
                          st.sampled_from(["a", "b", "ab", "ba", "aa",
                                           "bb", "</w>"])),
                min_size=1, max_size=10, unique=True))
@settings(max_examples=400, deadline=None)
def test_bpe_rank_heap_with_multichar_and_end_merges(word, merges):
    """Same exactness under merge tables whose symbols are themselves
    merge OUTPUTS or the END marker — the regime where the lazy
    schedule's created-pair bookkeeping actually fires."""
    from scardina_spark.operators.bpe import _sequential_merge_passes
    ranks = {p: i for i, p in enumerate(merges)}
    got = _sequential_merge_passes(word, merges, ranks)
    want = _naive_sequential_passes(word, merges)
    assert got == want, (word, merges, got, want)
