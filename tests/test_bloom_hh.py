"""Bloom-filtered semi join and bounded-memory heavy hitters vs exact SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from scardina_spark.operators.bloomjoin import bloom_filter_table, bloom_semi_join
from scardina_spark.operators.heavyhitters import (
    heavy_hitters,
    misra_gries_candidates,
)


def test_bloom_semi_join_matches_plain_semi(tables):
    li = tables["lineitem"]
    build = tables["part"].where(F.col("p_size") > 40)
    got = bloom_semi_join(li, build, "l_partkey", "p_partkey").count()
    want = li.join(
        build, li["l_partkey"] == build["p_partkey"], "left_semi").count()
    assert got == want > 0


def test_bloom_semi_join_tiny_buckets_still_exact(tables):
    # Heavy collisions (8 buckets): the final equi-semi-join must remove
    # every false positive.
    li = tables["lineitem"]
    build = tables["part"].where(F.col("p_size") > 45)
    got = bloom_semi_join(li, build, "l_partkey", "p_partkey",
                          num_buckets=8).count()
    want = li.join(
        build, li["l_partkey"] == build["p_partkey"], "left_semi").count()
    assert got == want


def test_bloom_filter_table_bounded(tables):
    filt = bloom_filter_table(tables["orders"], "o_custkey", num_buckets=64)
    rows = filt.collect()
    assert 0 < len(rows) <= 64
    assert all(0 <= r["__bucket"] < 64 for r in rows)


def test_bloom_null_probe_keys_never_match(spark):
    probe = spark.createDataFrame(
        [(1,), (None,), (2,)], "k int")
    build = spark.createDataFrame([(1,), (None,)], "k int")
    got = {r["k"] for r in bloom_semi_join(probe, build, "k", "k").collect()}
    assert got == {1}


def test_heavy_hitters_exact(tables, duck):
    got = {(r["value"], r["cnt"])
           for r in heavy_hitters(tables["events"], "user_id", 0.01).collect()}
    want = {tuple(r) for r in duck.sql("""
        select user_id, count(*) from events where user_id is not null
        group by 1
        having count(*) >= ceil(0.01 * (select count(*) from events
                                        where user_id is not null))
    """).fetchall()}
    assert got == want
    assert len(got) > 0


def test_misra_gries_superset(tables, duck):
    cands = {r["value"] for r in
             misra_gries_candidates(tables["events"], "user_id", 0.01).collect()}
    true_hh = {r[0] for r in duck.sql("""
        select user_id from events where user_id is not null group by 1
        having count(*) >= ceil(0.01 * (select count(*) from events
                                        where user_id is not null))
    """).fetchall()}
    assert true_hh <= cands


def test_heavy_hitters_min_freq_validation(tables):
    import pytest

    with pytest.raises(ValueError):
        misra_gries_candidates(tables["events"], "user_id", 0.0)
    with pytest.raises(ValueError):
        misra_gries_candidates(tables["events"], "user_id", 1.5)
