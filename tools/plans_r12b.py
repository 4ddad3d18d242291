"""Capture plans/r12 evidence for the second half of the r12 round:
pagerank's checkpointed edge aggregate, pq_train's fused Lloyd update,
and the LSH index save layout.  Instrumentation only.

Usage: python tools/plans_r12b.py [sf_dir] [out_dir]
"""
import contextlib
import io
import os
import sys

os.environ.setdefault("OPENBLAS_NUM_THREADS", "4")
os.environ.setdefault("OMP_NUM_THREADS", "4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r12")
os.makedirs(OUT, exist_ok=True)

from scardina_spark.catalog import load_table  # noqa: E402
from scardina_spark.session import get_spark  # noqa: E402

spark = get_spark("plans-r12b")
spark.sparkContext.setLogLevel("ERROR")


def capture(df, name: str):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    plan = buf.getvalue()
    print(f"{name}: Exchange={plan.count('Exchange')} "
          f"Scan={plan.count('Scan parquet') + plan.count('Scan ExistingRDD')} "
          f"HashAggregate={plan.count('HashAggregate')} "
          f"Union={plan.count('Union')} -> {path}", flush=True)


# --- pagerank: the transition relation's lineage BEFORE (edge aggregate
# recomputed per consumer) vs AFTER (one checkpointed edge aggregate
# feeding trans/nodes/srcs) ---
orders = load_table(spark, SF, "orders")
lineitem = load_table(spark, SF, "lineitem")
edges = (lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
         .select(F.col("o_custkey").alias("src"),
                 (F.col("l_partkey") % 1000).alias("dst")))
ew_plain = (edges.groupBy("src", "dst").agg(F.sum(F.lit(1.0)).alias("w")))
out_w = ew_plain.groupBy("src").agg(F.sum("w").alias("ow"))
trans_before = (ew_plain.join(out_w, "src")
                .select("src", "dst", (F.col("w") / F.col("ow")).alias("p")))
capture(trans_before, "pagerank_trans_before")
ew_ckpt = ew_plain.localCheckpoint(eager=True)
out_w2 = ew_ckpt.groupBy("src").agg(F.sum("w").alias("ow"))
trans_after = (ew_ckpt.join(out_w2, "src")
               .select("src", "dst", (F.col("w") / F.col("ow")).alias("p")))
capture(trans_after, "pagerank_trans_after")
from scardina_spark.operators.storage import free_checkpoint  # noqa: E402

free_checkpoint(ew_ckpt)

# --- pq_train Lloyd update: BEFORE = per-subspace assign+aggregate
# branches unioned (m codegen functions + an m-way union per round)
# vs AFTER = one posexplode aggregate keyed (sub, cell, pos) ---
from scardina_spark.operators.similarity import (  # noqa: E402
    ivf_assign, pq_encode, pq_train)

emb = load_table(spark, SF, "embeddings").cache()
emb.count()
m, k_codes = 8, 16
books = pq_train(emb, m=m, k_codes=k_codes, iters=0)
d = len(emb.select("embedding").first()[0])
ds = d // m
sliced = [emb.withColumn("embedding", F.slice(F.col("embedding"),
                                              j * ds + 1, ds))
          for j in range(m)]
branches = []
for j in range(m):
    assigned = ivf_assign(sliced[j], books[j], vec_col="embedding")
    agg = (assigned
           .select("cell", F.posexplode(F.col("embedding")).alias("pos", "x"))
           .groupBy("cell", "pos")
           .agg(F.avg(F.col("x").cast("double")).alias("m"))
           .select(F.lit(j).alias("sub"), "cell", "pos", "m"))
    branches.append(agg)
un = branches[0]
for b in branches[1:]:
    un = un.unionAll(b)
capture(un, "pq_lloyd_before")

enc = pq_encode(emb, books, vec_col="embedding", out_col="__cells__",
                drop_vec=False)
rows = (enc.select(F.col("__cells__"),
                   F.posexplode(F.col("embedding")).alias("p", "x"))
        .select((F.col("p") / ds).cast("int").alias("sub"),
                F.expr("element_at(__cells__, "
                       f"CAST(p / {ds} AS INT) + 1)").alias("cell"),
                F.pmod(F.col("p"), F.lit(ds)).alias("pos"),
                F.col("x"))
        .groupBy("sub", "cell", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m")))
capture(rows, "pq_lloyd_after")

# --- LSH save: BEFORE = dynamic-partition write straight off the input
# partitioning; AFTER = pre-write hash-clustering by bucket, sized from
# the input and capped at the bucket count ---
from scardina_spark.operators.similarity import (  # noqa: E402
    hyperplanes, with_lsh_bucket)

planes = hyperplanes(64, 8, seed=42)
b = with_lsh_bucket(emb, planes, "embedding")
capture(b, "lsh_save_before")
p = min(1 << len(planes), max(8, b.rdd.getNumPartitions()))
capture(b.repartition(p, F.col("bucket")), "lsh_save_after")
print("done")
