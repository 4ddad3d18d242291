"""Per-substage timing for the bench tail stages this round examines:
lsh_index_probe_fraction and pq_train_encode_search.  Run on a quiet
box; prints one line per substage."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scardina_spark.catalog import load_table  # noqa: E402
from scardina_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("profile-r12-tail")
t0 = time.time()


def mark(label, start):
    print(f"{label}: {time.time() - start:.2f}s", flush=True)
    return time.time()


emb = load_table(spark, SF_DIR, "embeddings").cache()
emb.count()
qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
t = mark("emb_cache+qv", t0)

# ---- lsh_index_probe_fraction substages ----
import glob
import tempfile

from scardina_spark.operators.similarity import (  # noqa: E402
    lsh_build_index, lsh_load_index, lsh_probe_set, topk_cosine_lsh_indexed)

for rep in range(2):
    with tempfile.TemporaryDirectory() as td:
        t = time.time()
        idx = lsh_build_index(emb, n_planes=8, seed=42)
        t = mark(f"lsh[{rep}] build_index (first() for dim)", t)
        idx.save(td)
        t = mark(f"lsh[{rep}] save (partitioned write + meta)", t)
        loaded = lsh_load_index(spark, td)
        t = mark(f"lsh[{rep}] load_index (meta first + read.parquet)", t)
        got = topk_cosine_lsh_indexed(loaded, qv, 10)
        n = got.count()
        t = mark(f"lsh[{rep}] probe topk count ({n})", t)
        probes = lsh_probe_set(loaded.planes, qv)
        all_files = glob.glob(os.path.join(td, "buckets", "bucket=*", "*.parquet"))
        t = mark(f"lsh[{rep}] glob ledger ({len(all_files)} files)", t)

# ---- pq_train_encode_search substages ----
from scardina_spark.operators.similarity import (  # noqa: E402
    ivfpq_build_index, pq_encode, pq_topk_rerank, pq_train,
    ranking_metrics, topk_cosine, topk_cosine_ivfpq, topk_cosine_ivfpq_many)
from scardina_spark.operators.storage import free_checkpoint  # noqa: E402

t = time.time()
books = pq_train(emb, m=8, k_codes=16, iters=2)
t = mark("pq train (m=8 k=16 iters=2)", t)
enc = pq_encode(emb, books).localCheckpoint()
t = mark("pq encode+checkpoint", t)
exact = topk_cosine(emb, qv, 10)
n = emb.count()
for tag, sl in (("50", 50), ("10pct", max(50, n // 10))):
    rer = pq_topk_rerank(enc, emb, books, qv, 10, shortlist=sl)
    r = ranking_metrics(rer, exact, 10).first()
    t = mark(f"pq rerank sl{tag} + metrics", t)
e2 = emb.select("vec_id", "embedding")
ivfx, pqx = ivfpq_build_index(e2, n_cells=8, m=16, k_codes=16,
                              iters=2, residual=True)
t = mark("ivfpq build_index (residual m=16)", t)
sl = max(50, n // 20)
hyb = topk_cosine_ivfpq(ivfx, pqx, qv, e2, 10, nprobe=3, shortlist=sl)
rh = ranking_metrics(hyb, exact, 10).first()
t = mark("ivfpq hybrid topk + metrics", t)
from bench import _exact_topk_sets_np  # noqa: E402

exact_sets = _exact_topk_sets_np(emb, range(10), 10)
t = mark("exact topk sets (numpy)", t)
qids = sorted(exact_sets)
many = topk_cosine_ivfpq_many(ivfx, pqx, [exact_sets[q][0] for q in qids],
                              e2, 10, nprobe=3, shortlist=sl).collect()
t = mark("ivfpq many (10 queries) collect", t)
pqx.release()
free_checkpoint(enc)
t = mark("release", t)
print(f"TOTAL: {time.time() - t0:.2f}s")
