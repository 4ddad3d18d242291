"""Deterministic synthetic JOB-light-shaped IMDB — the 6-table
benchmark dataset at a configurable scale, generated DISTRIBUTED
(``spark.range`` + xxhash64-derived uniforms; no driver-side rows, no
RNG state), so the reference's actual ``job-light.csv`` 70-query suite
runs end-to-end (prep → HT/NAR estimation → q-error vs exact truth)
without the 3.6 GB real IMDB export (reference schema:
scardina/datasets.py:585-806; workload: benchmarks/imdb/job-light.csv).

Shape choices mirror what makes real IMDB hard:

* **Zipf-ish FK fanouts** — ``movie_id = 1 + floor(N·u²)`` concentrates
  references on low title ids (fanout density ∝ m^-1/2), so popular
  titles dominate joins the way blockbusters do, and the UR join size
  is far from |fact| · mean-fanout naïvety.
* **Heavy-value categorical mixtures** — each predicate column places
  an extra mass lump on exactly the literal values the 70 queries use
  (info_type 3/16/18/…, keyword 117/398/7084/8200, role 1/2/4/7), over
  a Zipf-ish base across the full real domain (113 info types, 8.5k
  keywords, 23.5k companies) — so query truths span empty → huge, the
  q-error regime the suite was built to probe.
* **Dense title ids 1..N** — every FK lands (referential integrity),
  matching the reference's outer-join-with-dangling-rows prep counts.

At ``scale=1.0`` row counts are the real dataset's ÷125 (title 20k,
cast_info 290k, total ≈ 500k rows ≈ TPC-H sf0.1); all columns INT, all
expressions codegen (hash, pow, floor) — generation is one shuffle-free
projection per table at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: real row counts ÷125 at scale=1.0 (reference datasets.py:585-782)
_BASE_ROWS = {
    "title": 20_226,
    "cast_info": 289_955,
    "movie_info": 118_686,
    "movie_info_idx": 11_040,
    "movie_keyword": 36_191,
    "movie_companies": 20_873,
}

#: heavy-value lumps = the literal sets job-light.csv predicates use
_INFO_TYPES = [3, 16, 18, 99, 100, 101, 105, 113]
_KEYWORDS = [117, 398, 7084, 8200]
_ROLES = [1, 2, 4, 7]


def _u(col, salt: str):
    """Deterministic uniform [0, 1) from (column, salt) — xxhash64 is
    a pure JVM expression, so generation is seed-stable across
    partitionings, sessions, and cluster sizes."""
    return (F.abs(F.xxhash64(col, F.lit(salt))) % 1_048_576) / 1_048_576.0


def _zipfish(col, salt: str, n: int, power: float = 2.0):
    """1 + floor(n · u^power): mass concentrates on small values
    (density ∝ v^(1/power - 1)); power=1 is uniform."""
    return (1 + F.floor(F.lit(n) * F.pow(_u(col, salt), F.lit(power)))) \
        .cast("int")


def _mixture(col, salt: str, heavy: list[int], heavy_frac: float,
             n: int, power: float = 2.0):
    """With prob ``heavy_frac`` pick uniformly among ``heavy`` (the
    query-literal lump); else the Zipf-ish base over 1..n."""
    pick = F.element_at(
        F.array(*[F.lit(v) for v in heavy]),
        (1 + F.floor(F.lit(len(heavy)) * _u(col, salt + "_h")))
        .cast("int"))
    return F.when(_u(col, salt + "_m") < heavy_frac, pick) \
        .otherwise(_zipfish(col, salt + "_z", n, power)).cast("int")


def synth_job_light_tables(spark: SparkSession, scale: float = 1.0,
                           seed: int = 42) -> dict[str, DataFrame]:
    """The 6 JOB-light relations at ``scale``× the base size.  ``seed``
    folds into every salt, so two calls with equal (scale, seed) are
    bit-identical regardless of parallelism."""
    rows = {t: max(int(n * scale), 10) for t, n in _BASE_ROWS.items()}
    n_t = rows["title"]
    s = f"s{seed}"
    i = F.col("id")

    title = spark.range(1, n_t + 1).select(
        i.cast("int").alias("id"),
        _zipfish(i, s + "tk", 7, 3.0).alias("kind_id"),
        F.when(_u(i, s + "ty") < 0.8,
               1950 + F.floor(F.lit(66) * _u(i, s + "ty2")))
        .otherwise(1880 + F.floor(F.lit(140) * _u(i, s + "ty3")))
        .cast("int").alias("production_year"))

    # power 1.5 (density ∝ m^-1/3): popularity correlates across all 5
    # FK tables (blockbusters have more of everything), so per-edge
    # fanouts MULTIPLY into the UR join size — at power 2 the product
    # overshoots the real dataset's join/|cast_info| ratio (~5.9e4,
    # datasets.py:581 ÷ :49) by 300×; 1.5 lands within a decade
    # (measured 6.7e3 at scale=1.0) at a prep cost that fits the
    # per-round bench.
    def movie(col, salt):
        return _zipfish(col, s + salt, n_t, 1.5).alias("movie_id")

    cast_info = spark.range(rows["cast_info"]).select(
        movie(i, "cm"),
        _mixture(i, s + "cr", _ROLES, 0.5, 11).alias("role_id"))
    movie_info = spark.range(rows["movie_info"]).select(
        movie(i, "im"),
        _mixture(i, s + "ii", _INFO_TYPES, 0.6, 113)
        .alias("info_type_id"))
    movie_info_idx = spark.range(rows["movie_info_idx"]).select(
        movie(i, "xm"),
        _mixture(i, s + "xi", _INFO_TYPES, 0.6, 113)
        .alias("info_type_id"))
    movie_keyword = spark.range(rows["movie_keyword"]).select(
        movie(i, "km"),
        _mixture(i, s + "kk", _KEYWORDS, 0.3, 8_500)
        .alias("keyword_id"))
    movie_companies = spark.range(rows["movie_companies"]).select(
        movie(i, "om"),
        _mixture(i, s + "oc", [22_956], 0.02, 23_500)
        .alias("company_id"),
        F.when(_u(i, s + "ot") < 0.35, 2)
        .otherwise(1).cast("int").alias("company_type_id"))

    return {"title": title, "cast_info": cast_info,
            "movie_info": movie_info, "movie_info_idx": movie_info_idx,
            "movie_keyword": movie_keyword,
            "movie_companies": movie_companies}
