"""Per-step dissection of ONE jm weighted prep (t_from): weights,
join_size, root draw, each edge pick, final materialization.
Instrumentation only."""
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "4")
os.environ.setdefault("OMP_NUM_THREADS", "4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from scardina_spark.session import get_spark  # noqa: E402

spark = get_spark("profile-r12-jm", extra_conf={
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": "/tmp/spark-events",
})
spark.sparkContext.setLogLevel("ERROR")
os.makedirs("/tmp/spark-events", exist_ok=True)

t0 = [time.perf_counter()]


def mark(label):
    t = time.perf_counter()
    print(f"  {t - t0[0]:7.2f}s  {label}", flush=True)
    t0[0] = t


from scardina_spark.estimators.sample import (  # noqa: E402
    attach_tree_adj_fanouts)
from scardina_spark.jobm import (JM_HT_N_MAX, jm_sample_trees,  # noqa: E402
                                 load_jobm_tables)
from scardina_spark.operators.sampler import (  # noqa: E402
    SAMPLE_ID, pick_one_child_per_sample, weighted_sample_with_replacement)
from scardina_spark.operators.weights import WEIGHT, compute_weights  # noqa: E402

jm_tables = load_jobm_tables(spark, SF)
mark("load_jobm_tables")
import sys as _s; tree = jm_sample_trees()[int(_s.argv[2]) if len(_s.argv)>2 else 0]
root = "shipments"
adj = attach_tree_adj_fanouts(tree, jm_tables)
w = dict(compute_weights(tree, adj, root))
w[root] = w[root].persist()
row = w[root].agg(F.sum(WEIGHT).alias("s")).collect()[0]
join_size = int(row["s"] or 0)
mark(f"weights + join_size agg ({join_size})")
n = max(100_000, min(JM_HT_N_MAX, join_size))
handles = [w[root]]
order = list(w[root].columns)
agg = weighted_sample_with_replacement(w[root], WEIGHT, order, n, seed=42,
                                       uniform=False, cache_out=handles)
sc = agg.sparkSession.sparkContext
if agg.rdd.getNumPartitions() < sc.defaultParallelism:
    agg = agg.repartition(sc.defaultParallelism)
agg = agg.select(
    F.col(SAMPLE_ID),
    *[F.col(f"`{c}`").alias(f"{root}.{c}") for c in w[root].columns],
).withColumn(f"__in__:{root}", F.lit(True))
mark("root draw plan (lazy)")

import hashlib
n_handles_seen = len(handles)
for parent, child, rel in tree.join_tree(root):
    parent_key = rel.pk_col if rel.pk_table == parent else rel.fk_col
    child_key = rel.fk_col if rel.fk_table == child else rel.pk_col
    many_to_one = rel.pk_table == child
    edge_id = f"{parent}.{parent_key}={child}.{child_key}"
    e_seed = (42 + int(hashlib.md5(edge_id.encode())
                       .hexdigest()[:8], 16)) % (2 ** 31)
    spark.sparkContext.setJobDescription(f"edge {edge_id}")
    agg = pick_one_child_per_sample(
        agg, f"{parent}.{parent_key}", w[child], child_key,
        child, weighted=not many_to_one, seed=e_seed,
        cache_out=handles, pick_broadcast=True)
    if len(handles) > n_handles_seen and len(handles) > 1:
        for h in handles[:-1]:
            h.unpersist()
        del handles[:-1]
    n_handles_seen = len(handles)
    mark(f"edge {edge_id} (weighted={not many_to_one})")

agg = agg.drop(*[c for c in agg.columns if c.endswith(WEIGHT)])
agg = agg.select(
    F.col(SAMPLE_ID),
    *[F.col(f"`{c}`") for c in sorted(c for c in agg.columns
                                      if c != SAMPLE_ID)])
spark.sparkContext.setJobDescription("final materialize")
samp = agg.repartition(max(4, n // 65536)).cache()
samp.count()
mark("final repartition+cache+count")
for h in handles:
    h.unpersist()
samp.unpersist()
print("done")
