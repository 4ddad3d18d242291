"""Round-12 micro-profiler: where do the estimator stages and the
sampler preps actually spend time on THIS box?  Instrumentation only.

Usage: python tools/profile_r12.py [sf_dir] [stage ...]
  stages: est | jm_prep | pq | allpairs
"""
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "4")
os.environ.setdefault("OMP_NUM_THREADS", "4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
STAGES = sys.argv[2:] or ["est"]

from scardina_spark.session import get_spark  # noqa: E402

spark = get_spark("profile-r12")
spark.sparkContext.setLogLevel("ERROR")

marks: list[tuple[str, float]] = []
_t0 = [time.perf_counter()]


def mark(label: str):
    t = time.perf_counter()
    marks.append((label, t - _t0[0]))
    print(f"  {t - _t0[0]:7.2f}s  {label}", flush=True)
    _t0[0] = t


def section(name: str):
    print(f"== {name} ==", flush=True)
    _t0[0] = time.perf_counter()


from scardina_spark.catalog import build_tpch_schema, load_tables  # noqa: E402
from scardina_spark.estimators import SampleEstimator, prepare_tree_sample  # noqa: E402
from scardina_spark.estimators.sample import spanning_tree  # noqa: E402

tables = load_tables(spark, SF)
sg = build_tpch_schema()

if "est" in STAGES:
    section("estimate path split")
    from scardina_spark.benchmarks import job_light_suite
    from scardina_spark.queries import BENCH_QUERIES
    ts = prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                             "lineitem", seed=42)
    mark("prep (prereq)")
    est = SampleEstimator()
    est.add(ts)
    for rep in range(3):
        for name, sql in BENCH_QUERIES.items():
            t0 = time.perf_counter()
            est.estimate(sql)
            dt = time.perf_counter() - t0
            print(f"    rep{rep} {name}: {dt*1000:7.1f} ms", flush=True)
        mark(f"estimate_6_queries rep{rep}")
    suite = job_light_suite()
    for rep in range(2):
        t0 = time.perf_counter()
        batch = est.estimate_many(suite)
        mark(f"estimate_many({len(batch)}) rep{rep}")
    ts.sample.unpersist()

if "jm_prep" in STAGES:
    section("jm_prep (serial, per-tree)")
    from scardina_spark.jobm import (JM_HT_N_MAX, jm_sample_trees,
                                     load_jobm_tables)
    jm_tables = load_jobm_tables(spark, SF)
    mark("load_jobm_tables")
    for nm, t in zip(("t_from", "t_carrier"), jm_sample_trees()):
        ts = prepare_tree_sample(t, jm_tables, "shipments",
                                 n_max=JM_HT_N_MAX, seed=42)
        mark(f"{nm}: prepare_tree_sample (n={ts.n_sample})")
        ts.localize()
        mark(f"{nm}: localize")
        ts.sample.unpersist()

if "pq" in STAGES:
    section("pq split")
    from scardina_spark.catalog import load_table
    from scardina_spark.operators import similarity as SIM
    emb = load_table(spark, SF, "embeddings").cache()
    n = emb.count()
    mark(f"emb cache ({n})")
    books = SIM.pq_train(emb, m=8, k_codes=16, iters=2)
    mark("pq_train m=8")
    enc = SIM.pq_encode(emb, books).localCheckpoint()
    mark("pq_encode + checkpoint")
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = SIM.topk_cosine(emb, qv, 10)
    for tag, sl in (("50", 50), ("10pct", max(50, n // 10))):
        rer = SIM.pq_topk_rerank(enc, emb, books, qv, 10, shortlist=sl)
        SIM.ranking_metrics(rer, exact, 10).first()
        mark(f"rerank+metrics sl={tag}")
    e2 = emb.select("vec_id", "embedding")
    ivfx, pqx = SIM.ivfpq_build_index(e2, n_cells=8, m=16, k_codes=16,
                                      iters=2, residual=True)
    mark("ivfpq_build_index m=16")
    sl = max(50, n // 20)
    hyb = SIM.topk_cosine_ivfpq(ivfx, pqx, qv, e2, 10, nprobe=3,
                                shortlist=sl)
    SIM.ranking_metrics(hyb, exact, 10).first()
    mark("ivfpq probe + metrics")

if "allpairs" in STAGES:
    section("allpairs_sim_join")
    from scardina_spark.catalog import load_table
    from scardina_spark.operators.dedup import allpairs_sim_join
    docs = load_table(spark, SF, "documents")
    for rep in range(2):
        row = (allpairs_sim_join(docs, threshold=0.6)
               .agg(F.count(F.lit(1)).alias("n")).first())
        mark(f"allpairs rep{rep} (n={row['n']})")

print("\nTOTALS")
for lbl, dt in marks:
    print(f"  {dt:7.2f}s  {lbl}")
