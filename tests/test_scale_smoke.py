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
