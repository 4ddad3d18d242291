"""Capture plans/r12 evidence: explain("formatted") for the paths the
r12 optimization round touched, plus the r11 verdict's missing two-pass
argmax proof (before = one-pass max_by over the candidate join, after =
the shipped two-pass pick).  Instrumentation only.

Usage: python tools/plans_r12.py [sf_dir] [out_dir]
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

from scardina_spark.session import get_spark  # noqa: E402

spark = get_spark("plans-r12")
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
          f"SortAggregate={plan.count('SortAggregate')} "
          f"HashAggregate={plan.count('HashAggregate')} "
          f"MapInPandas={plan.count('MapInPandas')} -> {path}",
          flush=True)


from scardina_spark.estimators.sample import (  # noqa: E402
    attach_tree_adj_fanouts)
from scardina_spark.jobm import jm_sample_trees, load_jobm_tables  # noqa: E402
from scardina_spark.operators.sampler import (  # noqa: E402
    SAMPLE_ID, _q, join_sample)
from scardina_spark.operators.weights import WEIGHT, compute_weights  # noqa: E402

jm_tables = load_jobm_tables(spark, SF)
tree = jm_sample_trees()[0]   # t_from
root = "shipments"
adj = attach_tree_adj_fanouts(tree, jm_tables)
w = dict(compute_weights(tree, adj, root))

# --- whole prep plan (draw fusion + per-edge picks) ---
handles: list = []
samp = join_sample(tree, w, root, (100_000, 200_000), seed=42,
                   cache_out=handles)
capture(samp, "jm_prep_after")
for h in handles:
    h.unpersist()

# --- the A-Res pick in isolation: one-pass max_by (r11 BEFORE) vs the
# shipped two-pass argmax (AFTER).  The candidate join is identical in
# both; only the argmax differs. ---
child, child_key, sample_key = "lineitem", "l_orderkey", "orders.o_orderkey"
e_seed = 12345
n = 200_000
samples = join_sample(tree, w, root, n, seed=42).limit(0)
# build the pick over a REAL accumulated-sample shape: draw the root +
# m2o picks exactly as join_sample does, stopping before the weighted
# edge.  Simplest faithful stand-in: the root draw projected to the
# prefixed layout (the pick only reads __sample_id__ + the join key).
from scardina_spark.operators.sampler import (  # noqa: E402
    weighted_sample_with_replacement)

draw = weighted_sample_with_replacement(
    w[root], WEIGHT, list(w[root].columns), n, seed=42)
acc = draw.select(
    F.col(SAMPLE_ID),
    *[F.col(f"`{c}`").alias(f"{root}.{c}") for c in w[root].columns],
).withColumn(f"__in__:{root}", F.lit(True))
# attach orders first (m2o) so the weighted edge's parent key exists
from scardina_spark.operators.sampler import pick_one_child_per_sample  # noqa: E402

acc = pick_one_child_per_sample(
    acc, f"{root}.sh_orderkey", w["orders"], "o_orderkey", "orders",
    weighted=False, seed=1, pick_broadcast=True)

cdf = w[child]
pref = [F.col(f"`{c}`").alias(f"{child}.{c}") for c in cdf.columns]
c = cdf.select(*pref).withColumn(f"__in__:{child}", F.lit(True))
ckey = f"{child}.{child_key}"
cweight = f"{child}.{WEIGHT}"
acc = acc.localCheckpoint()
keys = F.broadcast(acc.select(_q(SAMPLE_ID), _q(sample_key)))
joined = keys.join(c, _q(sample_key) == _q(ckey))
u = (F.pmod(F.xxhash64(F.col(SAMPLE_ID), *[_q(cc) for cc in c.columns],
                       F.lit(e_seed)),
            F.lit(1 << 53)).cast("double") + F.lit(0.5)) / (1 << 53)
z = F.pow(u, F.lit(1.0) / F.greatest(_q(cweight).cast("double"),
                                     F.lit(1e-300)))
joined = joined.withColumn("__z__", z)
child_struct = F.struct(*[_q(cc).alias(cc) for cc in c.columns])

# BEFORE (r11 pre-016ce70): one-pass max_by over the full candidate set
picked_before = joined.groupBy(SAMPLE_ID).agg(
    F.max_by(child_struct, F.col("__z__")).alias("__c__"))
out_before = acc.join(F.broadcast(picked_before), SAMPLE_ID, "left_outer")
capture(out_before, "jm_pick_argmax_before")

# AFTER (shipped): codegen max(z) + equality re-join + draw-bounded
# max_by tie-break
mz = (joined.groupBy(SAMPLE_ID)
      .agg(F.max("__z__").alias("__mz__"))
      .select(F.col(SAMPLE_ID).alias("__mz_sid__"), F.col("__mz__")))
winners = joined.join(
    F.broadcast(mz), (_q(SAMPLE_ID) == _q("__mz_sid__"))
    & (F.col("__z__") == F.col("__mz__"))).drop("__mz_sid__", "__mz__")
picked_after = winners.groupBy(SAMPLE_ID).agg(
    F.max_by(child_struct, F.col("__z__")).alias("__c__"))
out_after = acc.join(F.broadcast(picked_after), SAMPLE_ID, "left_outer")
capture(out_after, "jm_pick_argmax_after")

from scardina_spark.operators.storage import free_checkpoint  # noqa: E402

free_checkpoint(acc)

# --- the weighted root draw: r11 two-pass pipeline (cum column
# materialized through one full-width Python round-trip, then a second
# Python pass searches it) vs the r12 fused single pass ---
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from collections.abc import Iterator  # noqa: E402

from pyspark.sql.types import LongType, StructField, StructType  # noqa: E402

from scardina_spark.operators.prefix import (  # noqa: E402
    CUM, PID, _safe_names, with_prefix_sum)

order_cols = list(w[root].columns)
pos = w[root].where(F.col(f"`{WEIGHT}`") > 0)
cached: list = []
cum = with_prefix_sum(pos, WEIGHT, order_cols, cache_out=cached)
total = float(cached[0].agg(
    F.sum(F.col(f"`{WEIGHT}`").cast("double"))).first()[0] or 0.0)
rs = np.random.RandomState(42)
targets = np.sort(rs.random_sample(n)) * total
b_t = spark.sparkContext.broadcast(targets)
safe, mapping = _safe_names(cum)
w_safe, cum_safe = mapping[WEIGHT], mapping[CUM]
schema = StructType(safe.schema.fields + [StructField(SAMPLE_ID, LongType())])


def draw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    t = b_t.value
    for pdf in batches:
        if len(pdf) == 0:
            continue
        c0 = pdf[cum_safe].to_numpy(dtype="float64")
        wv = pdf[w_safe].to_numpy(dtype="float64")
        lo = int(np.searchsorted(t, c0[0], side="left"))
        hi = int(np.searchsorted(t, c0[-1] + wv[-1], side="left"))
        if lo >= hi:
            continue
        idx = np.searchsorted(c0, t[lo:hi], side="right") - 1
        out = pdf.iloc[idx].copy()
        out[SAMPLE_ID] = np.arange(lo, hi, dtype="int64")
        yield out


old_draw = safe.mapInPandas(draw, schema)
for orig, s in mapping.items():
    old_draw = old_draw.withColumnRenamed(s, orig)
capture(old_draw.drop(PID, CUM), "jm_root_draw_before")
for h in cached:
    h.unpersist()

new_draw = weighted_sample_with_replacement(
    w[root], WEIGHT, order_cols, n, seed=42)
capture(new_draw, "jm_root_draw_after")
print("done")
