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
