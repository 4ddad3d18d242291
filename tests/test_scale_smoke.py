"""Opt-in 10x scale smoke (set SPARK_GRAFT_SCALE_SMOKE=1 to run).

Replicates the sf0.1 fact tables 10x (~6M-row lineitem) with shifted
keys and drives the join sampler end-to-end: wall-clock must scale
roughly linearly with input size while the output stays clamped at
n_max rows.  This is the empirical check behind SCALE.md's sampler
claims; it is excluded from the default suite for runtime.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from scardina_spark.catalog import build_tpch_schema
from scardina_spark.estimators.sample import (
    prepare_tree_sample, spanning_tree)

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="10x scale smoke is opt-in (SPARK_GRAFT_SCALE_SMOKE=1)")

# sf0.1 sibling of the configured test data root (matches conftest's
# SPARK_GRAFT_TEST_SF_DIR convention)
SF_DIR = os.path.join(
    os.path.dirname(os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                                   "/root/testdata/sf0.001")),
    "sf0.1")


def _replicate(tables, factor=10):
    n_ord = tables["orders"].agg(F.max("o_orderkey")).first()[0] + 1
    reps = tables["orders"].sparkSession.range(factor) \
        .select(F.col("id").alias("__rep__"))
    out = dict(tables)
    for name, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]:
        out[name] = (tables[name].crossJoin(reps)
                     .withColumn(key, F.col(key) + F.col("__rep__") * n_ord)
                     .drop("__rep__"))
    return out


def test_join_sampler_scales_linearly(spark):
    from scardina_spark.catalog import load_tables
    tables = load_tables(spark, SF_DIR)
    big = _replicate(tables, 10)
    assert big["lineitem"].count() == 10 * tables["lineitem"].count()
    sg = build_tpch_schema()

    t0 = time.perf_counter()
    base = prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                               "lineitem", seed=42)
    base_n, base_s = base.sample.count(), time.perf_counter() - t0

    t0 = time.perf_counter()
    ts = prepare_tree_sample(spanning_tree(sg, "lineitem"), big,
                             "lineitem", seed=42)
    big_n, big_s = ts.sample.count(), time.perf_counter() - t0

    assert big_n == base_n == 500_000  # output clamped, not input-sized
    # 10x input should cost well under 20x (roughly linear; the bound is
    # loose to tolerate shared-box noise)
    assert big_s < 20 * max(base_s, 1.0), (base_s, big_s)


def test_minhash_dedup_exact_under_replication(spark):
    """10x the documents corpus (each doc replicated with offset ids,
    text unchanged).  Signatures depend only on text, so the verified
    pair count must follow the exact combinatorial law:
    100x the original near-dup pairs (every (a_i, b_j) replica combo)
    plus C(10,2)=45 identical-replica pairs per document — a strong
    end-to-end correctness check of the LSH banding + verification at
    10x volume."""
    import time

    from pyspark.sql import functions as F

    from scardina_spark.catalog import load_table
    from scardina_spark.operators import dedup as DD

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    t0 = time.perf_counter()
    base_pairs = DD.minhash_dedup(docs, threshold=0.5,
                                  hash_fn="xxhash64").count()
    base_s = time.perf_counter() - t0

    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    docs10 = (docs.crossJoin(reps)
              .withColumn("doc_id",
                          F.col("doc_id") + F.col("__rep__") * n)
              .drop("__rep__"))
    t0 = time.perf_counter()
    pairs10 = DD.minhash_dedup(docs10, threshold=0.5,
                               hash_fn="xxhash64").count()
    big_s = time.perf_counter() - t0

    assert pairs10 == 100 * base_pairs + 45 * n, (pairs10, base_pairs, n)
    # candidate volume grows ~100x by construction (every replica combo
    # is a true near-dup); runtime must stay within that envelope
    assert big_s < 100 * max(base_s, 1.0), (base_s, big_s)


def test_jobm_10x_scale_smoke(spark):
    """10x shipments (rows_per_order=20 instead of 2): the two-variant
    jm sample prep must stay clamped at n_max output rows and complete
    within a modest multiple of the 1x wall, and parallel-edge routing
    must still answer both supplier roles."""
    import tempfile

    from scardina_spark.estimators.sample import SampleEstimator
    from scardina_spark.jobm import (
        derive_shipments, jm_sample_trees, load_jobm_tables)

    tables_1x = load_jobm_tables(spark, SF_DIR)

    def prep(tables):
        est = SampleEstimator(name="jm-ht")
        t0 = time.perf_counter()
        for t in jm_sample_trees():
            est.add(prepare_tree_sample(t, tables, "shipments",
                                        n_min=20_000, n_max=50_000,
                                        seed=3).localize())
        return est, time.perf_counter() - t0

    est1, dt1 = prep(tables_1x)

    big_dir = tempfile.mkdtemp(prefix="jm10x_")
    path = derive_shipments(spark, SF_DIR, out_dir=big_dir,
                            rows_per_order=20)
    tables_10x = dict(tables_1x)
    tables_10x["shipments"] = spark.read.parquet(path)
    est10, dt10 = prep(tables_10x)

    for est in (est1, est10):
        for ts in est.samples:
            assert ts.n_sample <= 50_000
    # 10x shipments: wall grows sublinearly vs input (the sample is
    # clamped; only the fanout aggregates and the sampled-key join grow)
    assert dt10 < dt1 * 8, (dt1, dt10)
    for fk in ["sh_from_suppkey", "sh_carrier_suppkey"]:
        e = est10.estimate(
            f"SELECT COUNT(*) FROM shipments h, supplier s "
            f"WHERE h.{fk} = s.s_suppkey AND s.s_nationkey < 12")
        truth = tables_10x["shipments"].join(
            tables_10x["supplier"].where(F.col("s_nationkey") < 12),
            F.col(fk) == F.col("s_suppkey")).count()
        assert truth > 0
        assert max(e / truth, truth / e) < 1.5, (fk, e, truth)


def test_curate_pipeline_scales_linearly(spark):
    """The composed curation pipeline at 20x documents (~100k docs at
    sf0.1): wall-clock must scale roughly linearly and the survivor
    count must scale with the corpus (the gates are per-document, the
    dedup and packing shuffles are O(survivors))."""
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.curate import curate_corpus

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    n_base = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(20).select(F.col("id").alias("__rep__"))
    big = (docs.crossJoin(reps)
           # shift ids AND make the replicated text distinct, otherwise
           # the fingerprint dedup collapses every replica to one row
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("__rep__") * n_base)
           .withColumn("text", F.concat_ws(" ", "text",
                                           F.concat(F.lit("rep"),
                                                    F.col("__rep__"))))
           .drop("__rep__"))

    t0 = time.perf_counter()
    base_n = curate_corpus(docs, seq_len=128).count()
    base_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    big_n = curate_corpus(big, seq_len=128).count()
    big_s = time.perf_counter() - t0

    assert base_n > 0
    # every replica's text passes the same gates (the suffix token does
    # not change quality bands or language) and fingerprints are unique,
    # so survivors scale ~20x
    assert big_n >= 10 * base_n
    # generous linearity bound: 20x input in < 20x wall (fixed per-stage
    # overheads amortize; a quadratic stage would blow far past this)
    assert big_s < 20 * max(base_s, 1.0), (base_s, big_s)
    print(f"curate 20x: {n_docs} -> {n_docs * 20} docs, "
          f"{base_n} -> {big_n} survivors, {base_s:.1f}s -> {big_s:.1f}s")


def test_repetition_battery_scales_linearly(spark):
    """10x the documents corpus: the battery's one corpus-token-scale
    shuffle should cost roughly linearly in input (SCALE.md claim),
    and per-doc signals are replication-invariant for the n-gram
    columns (within-doc statistics)."""
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.gopher import repetition_signals

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    big = (docs.crossJoin(reps)
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("__rep__") * n_docs)
           .drop("__rep__"))

    t0 = time.perf_counter()
    base = repetition_signals(docs)
    base_kept = base.where("rep_keep").count()
    base_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    bigsig = repetition_signals(big)
    big_kept = bigsig.where("rep_keep").count()
    big_s = time.perf_counter() - t0

    # per-doc signals are pure within-doc statistics: every replica
    # scores identically, so keeps scale exactly 10x
    assert big_kept == 10 * base_kept
    assert big_s < 20 * max(base_s, 1.0), (base_s, big_s)


def _shuffle_metrics(df) -> dict:
    """Execute ``df`` (reduced to a driver-sized count so nothing big
    collects) and sum shuffleBytesWritten (compressed wire bytes) and
    dataSize (uncompressed row bytes) over every ShuffleExchange in the
    executed plan (AQE query stages descended) — per-plan SQL metrics,
    immune to other queries on the session.  The reduction must be
    built ON df and collect()ed so the inspected QueryExecution is the
    one that ran (``df.count()`` plans a SEPARATE execution and would
    leave df's own metrics empty)."""
    probe = df.groupBy().count()
    probe.collect()
    ep = probe._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in ep.getClass().getSimpleName():
        ep = ep.executedPlan()
    out = {"shuffleBytesWritten": 0, "dataSize": 0}

    def walk(node):
        name = node.getClass().getSimpleName()
        if "ShuffleExchange" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                k = str(kv._1())
                if k in out:
                    out[k] += int(kv._2().value())
        if "QueryStage" in name:
            walk(node.plan())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(ep)
    return out


def _battery_shuffles(units):
    hashed = (units.select(
        "doc_id", "doc_chars", "kind",
        F.xxhash64("unit").alias("uhash"),
        F.length("unit").alias("ulen"))
        .groupBy("doc_id", "doc_chars", "kind", "uhash", "ulen")
        .agg(F.count(F.lit(1)).alias("c")))
    raw = (units
           .groupBy("doc_id", "doc_chars", "kind", "unit")
           .agg(F.count(F.lit(1)).alias("c")))
    return _shuffle_metrics(hashed), _shuffle_metrics(raw)


def test_repetition_hashed_shuffle_beats_raw_grams(spark):
    """MEASURE the round-6 hashing change (r6 verdict nit: the
    shuffle-width win was argued, never measured).  Two corpora:

    * the 10x sf corpus — short synthetic grams, so the honest win is
      modest: hashed must still shuffle strictly fewer bytes, both
      compressed (wire) and uncompressed (dataSize >= 1.3x, the
      row-width the argument is actually about);
    * a crafted long-unit corpus (~240-char lines — the web-text shape
      where lines/paragraphs dominate bytes) — the claimed >= 2x
      uncompressed win must materialize.

    Measured on this box: sf corpus ~1.5x both metrics (the round-6
    note's 2-5x band holds only for long units); long-unit corpus
    comfortably >= 2x."""
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.gopher import unit_relation

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    big = (docs.crossJoin(reps)
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("__rep__") * n_docs)
           .drop("__rep__"))
    h, r = _battery_shuffles(unit_relation(big))
    assert 0 < h["shuffleBytesWritten"] < r["shuffleBytesWritten"]
    assert h["dataSize"] * 1.3 <= r["dataSize"], (h, r)
    print(f"x56 sf-corpus shuffle: hashed {h} vs raw {r} (wire "
          f"{r['shuffleBytesWritten'] / h['shuffleBytesWritten']:.2f}x, "
          f"rows {r['dataSize'] / h['dataSize']:.2f}x)")

    # 30-char tokens make EVERY unit long — the n-gram rows (which
    # dominate the exploded relation ~9:1) are 60-300 chars each, the
    # shape of real web text with long words/URLs/code identifiers
    toks = [f"identifier{i:04d}".ljust(30, "x") for i in range(100)]
    doc = "\n".join(" ".join(toks[j:j + 10])
                    for j in range(0, 100, 10))
    texts = [(i, doc) for i in range(500)]
    crafted = spark.createDataFrame(texts, "doc_id: long, text: string")
    h2, r2 = _battery_shuffles(unit_relation(crafted))
    assert h2["dataSize"] * 2 <= r2["dataSize"], (h2, r2)
    print(f"x56 long-unit shuffle: rows "
          f"{r2['dataSize'] / h2['dataSize']:.2f}x smaller hashed")


def _replicated_embeddings(spark, factor):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    n = emb.count()
    reps = spark.range(factor).select(F.col("id").alias("__rep__"))
    big = (emb.crossJoin(reps)
           .withColumn("vec_id", F.col("vec_id") + F.col("__rep__") * n)
           # perturb magnitude only per replica: k-means still separates
           # the data's real clusters, vectors stay distinct rows
           .withColumn("embedding",
                       F.expr("transform(embedding, "
                              "x -> cast(x * (1.0 + __rep__ / 100.0) "
                              "as float))"))
           .drop("__rep__"))
    return emb, big, n


def test_semdedup_pair_work_subquadratic(spark):
    """SemDeDup's growth law: with derived k ~ sqrt(n) cells the
    within-cell pair work must grow ~n^1.5, never ~n^2 — measured
    EXACTLY from the cell histogram (sum of c*(c-1)/2), not wall-clock,
    at 1x vs 10x embeddings."""
    from scardina_spark.operators.similarity import (
        derive_ivf_params, ivf_assign, ivf_train, semdedup_flags)

    emb, big, n = _replicated_embeddings(spark, 10)

    def pair_work(df):
        k, _ = derive_ivf_params(df.count())
        cents = ivf_train(df, k=k, iters=2)
        hist = (ivf_assign(df, cents).groupBy("cell")
                .agg(F.count(F.lit(1)).alias("c")))
        row = hist.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
            F.max("c").alias("maxc")).first()
        return float(row["pairs"]), cents

    base_pairs, _ = pair_work(emb)
    big_pairs, big_cents = pair_work(big)
    # n^1.5 predicts ~31.6x; n^2 would be 100x.  The bound allows 2x
    # cell-imbalance headroom but still rejects anything quadratic.
    assert big_pairs <= base_pairs * 10 ** 1.75, (base_pairs, big_pairs)
    # and the operator still runs end-to-end at 10x with sane output
    flags = semdedup_flags(big, big_cents, threshold=0.95)
    kept = flags.where("kept").count()
    assert 0 < kept < big.count()


def test_ivf_indexed_probe_fraction_shrinks(spark):
    """The IVF scale path: with derived (k, nprobe) the probed fraction
    of the corpus must SHRINK as the corpus grows (~N^-1/4), and the
    indexed top-k must still land in the brute-force top set."""
    from scardina_spark.operators.similarity import (
        IvfIndex, derive_ivf_params, ivf_assign, ivf_train,
        topk_cosine, topk_cosine_ivf_indexed)

    emb, big, n = _replicated_embeddings(spark, 10)
    query = [float(x) for x in
             emb.orderBy("vec_id").first()["embedding"]]

    def probe_stats(df):
        n_rows = df.count()
        k, nprobe = derive_ivf_params(n_rows)
        cents = ivf_train(df, k=k, iters=2)
        assigned = ivf_assign(df, cents)
        index = IvfIndex(assigned, cents, "vec_id", "embedding")
        top = topk_cosine_ivf_indexed(index, query, k=10, nprobe=nprobe)
        got = [r["vec_id"] for r in top.collect()]
        from scardina_spark.operators.similarity import _probe_cells
        probed = _probe_cells(cents, query, nprobe)
        scanned = (assigned.where(F.col("cell").isin(probed)).count())
        return scanned / n_rows, got, df

    frac_base, got_base, _ = probe_stats(emb)
    frac_big, got_big, big_df = probe_stats(big)
    assert frac_big < frac_base, (frac_base, frac_big)
    # recall floor vs brute force at 10x: the probed cells must hold
    # most of the true top-10 (the query IS a corpus vector, so its
    # replicas dominate and cluster together)
    brute = {r["vec_id"] for r in
             topk_cosine(big_df, query, k=10).collect()}
    recall = len(set(got_big) & brute) / 10
    assert recall >= 0.5, (recall, got_big, brute)
    print(f"ivf probe fraction: {frac_base:.3f} -> {frac_big:.3f}, "
          f"recall@10 at 10x: {recall}")


def test_substring_dedup_scales_and_saturates(spark):
    """10x replication makes EVERY k-token window a corpus-level
    duplicate: ExactSubstr must flag each replicated doc as one full
    span (10x the docs with >= k tokens) and strip everything, at
    roughly linear cost."""
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.substring import (
        duplicated_spans, strip_duplicated_spans)

    k = 8
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    n_long = docs.where(F.size(F.split(
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " "))
        >= k).count()
    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    big = (docs.crossJoin(reps)
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("__rep__") * n_docs)
           .drop("__rep__"))

    t0 = time.perf_counter()
    base_spans = duplicated_spans(docs, k=k).count()
    base_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    spans = duplicated_spans(big, k=k)
    big_spans = spans.count()
    big_s = time.perf_counter() - t0

    # every position of every replicated doc is flagged -> exactly one
    # maximal span per doc with >= k tokens
    assert big_spans == 10 * n_long, (big_spans, n_long)
    assert big_spans > 10 * base_spans  # base corpus is NOT saturated
    stripped = strip_duplicated_spans(big, k=k, spans=spans)
    row = (stripped.where(F.col("n_tokens") >= k)
           .agg(F.sum("n_tokens").alias("nt"),
                F.sum("n_removed").alias("nr")).first())
    assert row["nt"] == row["nr"]  # total duplication strips everything
    assert big_s < 20 * max(base_s, 1.0), (base_s, big_s)


def test_line_dedup_scales_and_saturates(spark):
    """10x replication makes EVERY line a corpus-level duplicate: the
    pass must drop everything (n_kept = 0) while costing roughly
    linearly — the count-shuffle scale shape, plus the semantics under
    total duplication."""
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.dedup import line_dedup

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    big = (docs.crossJoin(reps)
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("__rep__") * n_docs)
           .drop("__rep__"))

    t0 = time.perf_counter()
    base_row = line_dedup(docs).agg(
        F.sum("n_lines").alias("nl"), F.sum("n_kept").alias("nk")).first()
    base_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    big_row = line_dedup(big).agg(
        F.sum("n_lines").alias("nl"), F.sum("n_kept").alias("nk")).first()
    big_s = time.perf_counter() - t0

    assert big_row["nl"] == 10 * base_row["nl"]
    assert big_row["nk"] == 0  # every line now repeats corpus-wide
    assert big_s < 20 * max(base_s, 1.0), (base_s, big_s)


def test_codec_stages_scale_linearly(spark):
    """The three real-codec decode loops (WAV/PNG/AVI) at 10x
    documents: wall-clock must scale roughly linearly — the stages are
    shuffle-free mapInPandas projections, so anything super-linear
    would mean Arrow batching or payload assembly regressed."""
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.multimodal import (
        decode_avi_features, decode_png_features, decode_wav_features,
        documents_as_avi, documents_as_png, documents_as_wav)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    big = (docs.crossJoin(reps)
           .withColumn("doc_id",
                       F.col("doc_id") + F.col("__rep__") * n_base)
           .drop("__rep__"))

    stages = {
        "wav": lambda d: decode_wav_features(documents_as_wav(d)),
        "png": lambda d: decode_png_features(documents_as_png(d)),
        "avi": lambda d: decode_avi_features(documents_as_avi(d)),
    }
    for name, fn in stages.items():
        t0 = time.perf_counter()
        small_n = fn(docs).count()
        small_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        big_n = fn(big).count()
        big_s = time.perf_counter() - t0
        assert big_n == 10 * small_n
        # generous linearity bound (fixed overheads amortize; the
        # codecs are per-row, so quadratic growth would blow past this)
        assert big_s < 10 * max(small_s, 1.0), (name, small_s, big_s)
        print(f"{name} 10x: {small_n} -> {big_n} rows, "
              f"{small_s:.1f}s -> {big_s:.1f}s")


def test_repeated_component_merges_stay_flat(spark):
    """The real ingest pattern: FIVE successive shard merges into a
    standing labeling.  Per-merge wall time must stay roughly flat
    (each merge's plan starts from checkpointed state — before the
    round-8 lineage fix, plan analysis grew exponentially and a merge
    of a merge hung), and the final labeling must equal a from-scratch
    recompute over all edges."""
    from scardina_spark.operators.components import (
        connected_components, merge_components)

    # a chain-of-cliques corpus graph split into 6 shards
    edges = []
    for c in range(40):
        base = c * 5
        edges += [(base + i, base + i + 1) for i in range(4)]
    bridges = [(c * 5 + 4, (c + 1) * 5) for c in range(0, 39, 2)]
    all_edges = edges + bridges
    shards = [all_edges[k::6] for k in range(6)]
    schema = "id_a: long, id_b: long"

    assign = connected_components(
        spark.createDataFrame(shards[0], schema))
    times = []
    for shard in shards[1:]:
        t0 = time.perf_counter()
        assign = merge_components(
            assign, spark.createDataFrame(shard, schema))
        assign = assign.localCheckpoint(eager=True)
        times.append(time.perf_counter() - t0)
    got = {(r["node"], r["component"]) for r in assign.collect()}
    want = {(r["node"], r["component"])
            for r in connected_components(
                spark.createDataFrame(all_edges, schema)).collect()}
    assert got == want and got
    # flatness: the last merge may not cost more than 3x the first
    # (exponential lineage growth would be orders of magnitude)
    assert times[-1] < 3 * max(times[0], 1.0), times
    print("merge times:", [round(t, 1) for t in times])


def test_allpairs_candidate_work_stays_subquadratic(spark):
    """AllPairs at 10x docs, replicated as DISJOINT corpora (every
    word tagged with its replica id, so cross-replica Jaccard is 0 and
    the true-pair population grows exactly 10x): the prefix filter's
    candidate count must track the true pairs (~10x), nowhere near the
    quadratic 100x — the rare-first canonical order is what keeps
    prefix tokens from colliding across the corpus."""
    import pyspark.sql.functions as F
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.dedup import (
        normalized, word_shingles)

    docs = load_table(spark, SF_DIR, "documents")
    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    tag = F.col("__rep__").cast("string")
    tagged = F.array_join(
        F.transform(F.split(normalized(), " "),
                    lambda w: F.concat(w, F.lit("r"), tag)), " ")
    big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("__rep__") * n_docs)
                   .alias("doc_id"),
                   tagged.alias("text")))

    def cand_count(d, t=0.8):
        toks = (d.select(F.col("doc_id").alias("id"),
                         word_shingles("text", 3).alias("toks"))
                .where(F.length(normalized()) > 0))
        tok_cnt = (toks.select(F.explode("toks").alias("tok"))
                   .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
        ranked = (toks.select("id", F.explode("toks").alias("tok"))
                  .join(tok_cnt, "tok").groupBy("id")
                  .agg(F.array_sort(
                      F.collect_list(F.struct("cnt", "tok"))).alias("s")))
        nn = F.size("s")
        plen = (nn - F.ceil(F.lit(t) * nn - F.lit(1e-9)) + 1).cast("int")
        ex = ranked.select("id", F.explode(
            F.slice(F.transform("s", lambda x: x["tok"]),
                    F.lit(1), plen)).alias("tok"))
        return (ex.alias("a").join(ex.alias("b"), "tok")
                .where(F.col("a.id") < F.col("b.id"))
                .select("a.id", "b.id").distinct().count())

    n1, n10 = docs.count(), big.count()
    c1, c10 = cand_count(docs), cand_count(big)
    # quadratic would be 100x the candidates for 10x the docs; with
    # disjoint replicas the truth grows exactly 10x, so candidates must
    # stay ~linear (ties in the per-replica canonical order give slack)
    assert n10 == 10 * n1
    assert c10 < 15 * c1, (c1, c10)


def test_scd2_history_scales_linearly(spark):
    """10x events: one window shuffle — wall must grow ~linearly, and
    conservation must hold exactly at 1M rows."""
    import time as _t

    import pyspark.sql.functions as F
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.scd import scd2_history

    ev = load_table(spark, SF_DIR, "events")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    reps = spark.range(10).select(F.col("id").alias("__rep__"))
    big = (ev.crossJoin(reps)
           .select((F.col("user_id") + F.col("__rep__") * 10_000)
                   .alias("user_id"),
                   "event_type", "ts",
                   (F.col("event_id") + F.col("__rep__") * n_ev)
                   .alias("event_id")))

    def run(d):
        t0 = _t.perf_counter()
        s = (scd2_history(d, "user_id", "event_type", "ts", ["event_id"])
             .agg(F.sum("n_events")).first()[0])
        return s, _t.perf_counter() - t0

    s1, w1 = run(ev)
    s10, w10 = run(big)
    assert s1 == ev.count() and s10 == big.count()  # conservation
    assert w10 < 25 * w1, (w1, w10)


def test_pagerank_wall_dominated_by_edge_build_not_iterations(spark):
    """The per-iteration cost at small node counts is fixed job
    overhead: doubling iterations must NOT double total wall once the
    edge relation is checkpointed."""
    import time as _t

    import pyspark.sql.functions as F
    from scardina_spark.catalog import load_tables
    from scardina_spark.operators.graphrank import pagerank

    t = load_tables(spark, SF_DIR)
    edges = (t["lineitem"]
             .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
             .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
             .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
             .select(F.col("c_nationkey").alias("src"),
                     F.col("s_nationkey").alias("dst")))

    def run(k):
        t0 = _t.perf_counter()
        pagerank(edges, n_iter=k).count()
        return _t.perf_counter() - t0

    w3, w12 = run(3), run(12)
    # 4x the iterations must cost well under 4x the wall (edge build +
    # fixed overheads dominate; iteration state is 25 rows)
    assert w12 < 3.0 * w3, (w3, w12)


def test_pq_adc_search_scales_with_codes_not_vectors(spark):
    """10x the corpus: ADC search wall grows sub-linearly (the scan is
    m small ints per row inside codegen; fixed overheads dominate at
    these sizes), and encode stays a shuffle-free projection."""
    import time as _t

    import pyspark.sql.functions as F
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.similarity import (
        pq_encode, pq_topk, pq_train)

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding")
    books = pq_train(emb, m=8, k_codes=16, iters=1)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).first()["embedding"]]

    def run(mult):
        big = emb
        for i in range(mult - 1):
            big = big.unionByName(
                emb.select((F.col("vec_id") + 100000 * (i + 1))
                           .alias("vec_id"), "embedding"))
        enc = pq_encode(big, books).localCheckpoint()
        t0 = _t.perf_counter()
        pq_topk(enc, books, qv, 10).collect()
        return _t.perf_counter() - t0

    w1, w10 = run(1), run(10)
    assert w10 < 5.0 * w1, (w1, w10)


def test_ks_drift_replication_invariant_and_subquadratic(spark):
    """KS on a CONTINUOUS column (events.value — distinct-value relation
    is corpus-sized, the shape the old single-partition-window ECDF
    degraded on): 10x-replicating BOTH samples leaves d_stat exactly
    unchanged (ECDFs are replication-invariant) and wall grows far
    sub-quadratically."""
    import time as _t

    import pyspark.sql.functions as F
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.profile import ks_drift

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id",
                                                    "value")

    def replicate(df, k):
        out = df
        for i in range(k - 1):
            out = out.unionByName(
                df.withColumn("event_id",
                              F.col("event_id") + 10_000_000 * (i + 1)))
        return out

    def run(k):
        big = replicate(ev, k).localCheckpoint()
        a = big.where("user_id % 2 = 0")
        b = big.where("user_id % 2 = 1")
        t0 = _t.perf_counter()
        r = ks_drift(a, b, "value").first()
        return r, _t.perf_counter() - t0

    r1, w1 = run(1)
    r10, w10 = run(10)
    assert r10["n_a"] == 10 * r1["n_a"] and r10["n_b"] == 10 * r1["n_b"]
    assert r10["d_stat"] == r1["d_stat"], (r1, r10)
    assert w10 < 6.0 * w1, (w1, w10)
