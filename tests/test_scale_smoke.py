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
