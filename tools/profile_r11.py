"""Round-11 stage micro-profiler: time the SUB-STEPS of the bench's
hottest stages (sampler preps, NAR trainings) so optimization targets
the real cost, not a guess.  Instrumentation only — not part of the
bench contract.

Usage: python tools/profile_r11.py [sf_dir] [stage ...]
  stages: prep | jm_prep | imdb_prep | nar | pq
"""
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "4")
os.environ.setdefault("OMP_NUM_THREADS", "4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
STAGES = sys.argv[2:] or ["prep", "jm_prep", "imdb_prep", "nar", "pq"]

from scardina_spark.session import get_spark  # noqa: E402

spark = get_spark("profile-r11")
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
from scardina_spark.estimators import prepare_tree_sample  # noqa: E402
from scardina_spark.estimators.sample import spanning_tree  # noqa: E402

tables = load_tables(spark, SF)
sg = build_tpch_schema()

if "prep" in STAGES:
    section("prep_join_sample (lineitem root, uniform)")
    from scardina_spark.estimators.sample import attach_tree_adj_fanouts
    from scardina_spark.operators.sampler import join_sample
    from scardina_spark.operators.weights import WEIGHT
    tree = spanning_tree(sg, "lineitem")
    adj = attach_tree_adj_fanouts(tree, tables)
    mark("attach_tree_adj_fanouts (lazy)")
    join_size = tables["lineitem"].count()
    mark(f"root count ({join_size})")
    w = dict(adj)
    w["lineitem"] = w["lineitem"].withColumn(WEIGHT, F.lit(1.0))
    n = max(100_000, min(500_000, join_size))
    handles: list = []
    samp = join_sample(tree, w, "lineitem", n, seed=42, drop_weights=True,
                       uniform_root=True, cache_out=handles)
    mark("join_sample plan built (lazy)")
    samp = samp.repartition(max(4, n // 65536))
    samp = samp.cache()
    samp.count()
    mark("sample materialized")
    for h in handles:
        h.unpersist()
    samp.unpersist()

if "jm_prep" in STAGES:
    section("jm_prep_samples (shipments root, weighted)")
    from scardina_spark.estimators import SampleEstimator
    from scardina_spark.jobm import (JM_HT_N_MAX, jm_sample_trees,
                                     load_jobm_tables)
    jm_tables = load_jobm_tables(spark, SF)
    mark("load_jobm_tables")
    t_from, t_carrier = jm_sample_trees()
    # serial, instrumented (the bench overlaps the two from a pool)
    for nm, t in (("t_from", t_from), ("t_carrier", t_carrier)):
        from scardina_spark.estimators.sample import (
            attach_tree_adj_fanouts as _adj)
        from scardina_spark.operators.weights import compute_weights
        adj = _adj(t, jm_tables)
        mark(f"{nm}: adj fanouts (lazy)")
        w = compute_weights(t, adj, "shipments")
        row = w["shipments"].agg(F.sum("__weight__").alias("s")).collect()[0]
        mark(f"{nm}: weights + join_size agg ({int(row['s'])})")
        ts = prepare_tree_sample(t, jm_tables, "shipments",
                                 n_max=JM_HT_N_MAX, seed=42)
        mark(f"{nm}: prepare_tree_sample FULL (n={ts.n_sample})")
        ts.localize()
        mark(f"{nm}: localize")
        try:
            ts.sample.unpersist()
        except Exception:
            pass

if "imdb_prep" in STAGES:
    section("imdb_jl_prep (cast_info root)")
    import tempfile
    import shutil
    from scardina_spark.datasets_imdb import build_job_light_schema
    from scardina_spark.datasets_imdb_synth import synth_job_light_tables
    td = tempfile.mkdtemp(prefix="imdb_prof_")
    try:
        imdb_tables = {}
        for nme, df in synth_job_light_tables(spark, scale=1.0,
                                              seed=42).items():
            p = os.path.join(td, f"{nme}.parquet")
            df.write.parquet(p)
            imdb_tables[nme] = spark.read.parquet(p)
        mark("synth gen + write")
        imdb_sg = build_job_light_schema()
        tree = spanning_tree(imdb_sg, "cast_info")
        from scardina_spark.estimators.sample import (
            attach_tree_adj_fanouts as _adj)
        from scardina_spark.operators.weights import compute_weights
        adj = _adj(tree, imdb_tables)
        mark("adj fanouts (lazy)")
        w = compute_weights(tree, adj, "cast_info")
        row = w["cast_info"].agg(F.sum("__weight__").alias("s")).collect()[0]
        mark(f"weights + join_size agg ({int(row['s'])})")
        ts = prepare_tree_sample(tree, imdb_tables, "cast_info",
                                 n_max=200_000, seed=42)
        mark(f"prepare_tree_sample FULL (n={ts.n_sample})")
        try:
            ts.sample.unpersist()
        except Exception:
            pass
    finally:
        shutil.rmtree(td, ignore_errors=True)

if "nar" in STAGES:
    section("joblight_nar_train split")
    from scardina_spark.benchmarks import UR_MODEL_COLUMNS
    from scardina_spark.model import TrainConfig as _TC
    from scardina_spark.model.bridge import training_matrix
    ts = prepare_tree_sample(spanning_tree(sg, "lineitem"), tables,
                             "lineitem", seed=42)
    mark("prep (prereq, not the stage)")
    samp = ts.sample
    markers = [c for c in samp.columns if c.startswith("__in__:")]
    fanouts = [c for c in samp.columns if "__adj_fanout__:" in c]
    aggs = [F.countDistinct(F.col(f"`{c}`")).alias(c) for c in fanouts]
    n_distinct = samp.agg(*aggs).collect()[0].asDict() if fanouts else {}
    mark("countDistinct fanout agg")
    informative = [c for c in fanouts if n_distinct.get(c, 1) > 1]
    columns = list(UR_MODEL_COLUMNS) + markers + informative
    cfg = _TC(epochs=8, d_word=24, d_ff=64, batch_size=1024, seed=42)
    codes, domains = training_matrix(samp, columns, 64_000, cfg.seed,
                                     id_cols=["__sample_id__"])
    mark(f"training_matrix (shape {codes.shape})")
    from scardina_spark.model.join_bridge import train_join_estimator
    import numpy as np
    from scardina_spark.functions.factorize import factorization_spec
    from scardina_spark.model.nar import NarMLP
    bins, mat_cols = [], []
    for ci, c in enumerate(columns):
        dom = domains[c].dom_size if c in domains else 0
        spec = (factorization_spec(c, dom, 8)
                if c in UR_MODEL_COLUMNS else None)
        if spec is None or not spec.is_factorized:
            bins.append((c, dom))
            mat_cols.append(codes[:, ci])
            continue
        full = codes[:, ci].astype(np.int64)
        for sub in spec.sub_cols:
            bins.append((sub.name, sub.dist_size))
            mat_cols.append(((full >> sub.offset)
                             & ((1 << sub.window) - 1)) + 1)
    model = NarMLP(bins, cfg)
    mark("model init")
    model.fit(np.stack(mat_cols, axis=1))
    mark("numpy fit (8 epochs)")
    try:
        ts.sample.unpersist()
    except Exception:
        pass

if "pq" in STAGES:
    section("pq_train_encode_search split")
    from scardina_spark.catalog import load_table
    from scardina_spark.operators import similarity as SIM
    emb = load_table(spark, SF, "embeddings").cache()
    emb.count()
    mark("emb cache")
    books = SIM.pq_train(emb, m=8, k_codes=16, iters=2)
    mark("pq_train m=8")
    enc = SIM.pq_encode(emb, books).localCheckpoint()
    mark("pq_encode + checkpoint")
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = SIM.topk_cosine(emb, qv, 10)
    n = emb.count()
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

print("\nTOTALS")
for lbl, dt in marks:
    print(f"  {dt:7.2f}s  {lbl}")
