"""Synthetic JOB-light IMDB (datasets_imdb_synth): deterministic
hash-derived generation, referential integrity, query-literal heavy
lumps, and the shipped 70-query workload running end-to-end through
the UR sampler + estimator at tiny scale."""

import os

import pytest
from pyspark.sql import functions as F

from scardina_spark.datasets_imdb_synth import (
    _BASE_ROWS, synth_job_light_tables)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth(spark):
    return {n: df.localCheckpoint()
            for n, df in synth_job_light_tables(
                spark, scale=0.02, seed=42).items()}


def test_row_counts_scale(spark, synth):
    for n, df in synth.items():
        assert df.count() == max(int(_BASE_ROWS[n] * 0.02), 10)


def test_deterministic_across_calls(spark, synth):
    again = synth_job_light_tables(spark, scale=0.02, seed=42)
    for n in synth:
        assert synth[n].exceptAll(again[n]).count() == 0
        assert again[n].exceptAll(synth[n]).count() == 0
    other = synth_job_light_tables(spark, scale=0.02, seed=7)
    assert other["cast_info"].exceptAll(
        synth["cast_info"]).count() > 0


def test_referential_integrity_and_domains(spark, synth):
    n_t = synth["title"].count()
    for fk in ("cast_info", "movie_info", "movie_info_idx",
               "movie_keyword", "movie_companies"):
        r = synth[fk].agg(F.min("movie_id"), F.max("movie_id")).first()
        assert r[0] >= 1 and r[1] <= n_t, (fk, r)
    t = synth["title"].agg(
        F.min("kind_id"), F.max("kind_id"),
        F.min("production_year"), F.max("production_year")).first()
    assert 1 <= t[0] and t[1] <= 7
    assert 1880 <= t[2] and t[3] <= 2019
    assert synth["movie_companies"].select("company_type_id") \
        .distinct().count() == 2


def test_fk_fanout_is_skewed(spark, synth):
    """Zipf-ish popularity: the top-1% of titles must hold far more
    than 1% of cast_info references (power 1.5 puts
    P(u^1.5 <= 0.01) = 0.01^(2/3) ~ 4.6% there — pin >3x uniform)."""
    ci = synth["cast_info"]
    n = ci.count()
    n_t = synth["title"].count()
    top = ci.where(F.col("movie_id") <= max(n_t // 100, 1)).count()
    assert top > 0.03 * n, (top, n)


def test_heavy_value_lumps_cover_query_literals(spark, synth):
    """The mixture puts real mass on the literals job-light predicates
    use, so suite truths are non-degenerate."""
    mi = synth["movie_info"]
    n = mi.count()
    assert mi.where("info_type_id = 3").count() > 0.01 * n
    mk = synth["movie_keyword"]
    assert mk.where("keyword_id = 117").count() > 0


def test_job_light_suite_end_to_end_tiny(spark, synth):
    """The shipped workload CSV parses and estimates 70/70 through the
    UR sample rooted at cast_info, with q-error sane on mid-size
    truths (correctness of the pipeline, not accuracy tuning)."""
    import duckdb

    from scardina_spark.datasets_imdb import build_job_light_schema
    from scardina_spark.estimators import SampleEstimator
    from scardina_spark.estimators.sample import (prepare_tree_sample,
                                                  spanning_tree)
    from scardina_spark.runner import load_benchmark_csv, q_error

    suite = load_benchmark_csv(
        os.path.join(REPO, "benchmarks", "imdb", "job-light.csv"))
    assert len(suite) == 70
    con = duckdb.connect()
    for n, df in synth.items():
        con.register(n, df.toPandas())
    sg = build_job_light_schema()
    ts = prepare_tree_sample(spanning_tree(sg, "cast_info"), synth,
                             "cast_info", n_min=50_000, n_max=50_000,
                             seed=42)
    ts.localize()
    est = SampleEstimator()
    est.add(ts)
    qs = []
    for _, sql in suite:
        truth = con.sql(sql.rstrip(";")).fetchone()[0]
        e = est.estimate(sql)
        if truth >= 100:   # mid-size truths: sampling must be sane
            qs.append(q_error(max(1, round(e)), truth))
    assert len(qs) >= 10
    qs.sort()
    assert qs[len(qs) // 2] < 5.0, qs
    ts.sample.unpersist()
