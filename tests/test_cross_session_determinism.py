"""Cross-PROCESS determinism of the seeded join sample.

Round-4 finding: identical seed+code produced 3+ distinct jm samples
across sessions (HT tail swinging 1.33-2.22) from two compounding
process dependencies — nx.bfs_successors edge order varies with the
per-process hash seed (re-seeding every per-edge draw), and F.rand
scores rows by within-partition position (varying with shuffle replay
order).  Both are fixed (sorted BFS in Subschema.join_tree; edge-id md5
seeds + content-hashed A-Res scores in the sampler); this test pins the
fix by drawing the same sample in two fresh interpreters with DIFFERENT
PYTHONHASHSEEDs and asserting bit-identical content.
"""

import hashlib
import os
import subprocess
import sys

_CHILD = r"""
import hashlib, os
from scardina_spark.session import get_spark
from scardina_spark.jobm import jm_sample_trees, load_jobm_tables
from scardina_spark.estimators.sample import prepare_tree_sample
spark = get_spark("xdet", shuffle_partitions=8)
tables = load_jobm_tables(spark, os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
tree = jm_sample_trees()[0]
print("EDGES:" + "|".join(f"{p}>{c}" for p, c, _ in
                          tree.join_tree("shipments")))
ts = prepare_tree_sample(tree, tables, "shipments",
                         n_min=2000, n_max=2000, seed=42).localize()
pdf = ts.local.sort_values(list(ts.local.columns)).reset_index(drop=True)
print("HASH:" + hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest())
"""


def _run(hash_seed: str) -> tuple[str, str]:
    env = dict(os.environ, PYTHONHASHSEED=hash_seed,
               PYTHONPATH="/root/repo")
    out = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = dict(ln.split(":", 1) for ln in out.stdout.splitlines()
                 if ":" in ln and ln.startswith(("EDGES", "HASH")))
    return lines["EDGES"], lines["HASH"]


def test_jm_sample_identical_across_hash_seeds():
    e1, h1 = _run("1")
    e2, h2 = _run("424242")
    assert e1 == e2, "join_tree edge order depends on the process"
    assert h1 == h2, "seeded sample content depends on the process"
