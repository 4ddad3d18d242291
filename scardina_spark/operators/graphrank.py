"""Distributed PageRank over a weighted edge relation (Page et al.,
"The PageRank Citation Ranking", Stanford 1999) — the graph-importance
primitive web-corpus curation pipelines run at host level (e.g.
Common-Crawl host ranking as a quality prior for document selection,
the same role the gopher/perplexity scores play at document level).

Scale story (100 TB / billions of nodes): the classic edge-relational
formulation — NO adjacency lists, no driver-side graph.  Per iteration:
one join of the node-sized rank relation with the edge-sized transition
relation on ``src`` (both hash-partitioned on the same key, so at scale
a pre-``repartition(src)`` of the transition relation is reused every
iteration and only the rank side re-shuffles), one map-side-combinable
``groupBy(dst).sum`` for contributions, plus two scalar aggregates
(dangling mass, node count) that broadcast.  Rank lineage is truncated
with an eager ``localCheckpoint`` per iteration — the
``connected_components`` lesson: without it Catalyst analysis grows
exponentially in the iteration count.

Semantics pinned here (and replayed by the x71 oracle as unrolled SQL):
* transition probability = edge weight / node out-weight,
* dangling nodes (no out-edges) spread their whole rank uniformly,
* rank' = (1-d)/N + d * (in-contributions + dangling_mass/N),
* fixed iteration count (deterministic; convergence monitoring is the
  caller's loop), ranks sum to 1 at every step (test-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, n_iter: int = 8, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             weight: str | None = None) -> DataFrame:
    """Rank every node of the weighted digraph ``edges(src, dst
    [, weight])``; returns ``(node, rank)`` with ranks summing to 1.
    ``weight=None`` counts parallel edges as weight 1 each."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    ew = (edges.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
          .agg(F.sum(w).alias("w")))
    # ew is the only pass over the (possibly expensive) edge lineage and
    # BOTH trans and nodes consume it — checkpoint the distinct-edge
    # aggregate once (r12) instead of re-running the upstream joins per
    # derived relation (§5: reused AND expensive; the relation itself is
    # distinct-edge-sized, tiny next to its lineage)
    ew = ew.localCheckpoint(eager=True)
    out_w = ew.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (ew.join(out_w, "src")
             .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
             .localCheckpoint(eager=True))
    nodes = (ew.select(F.col("src").alias("node"))
             .union(ew.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    srcs = trans.select("src").distinct().localCheckpoint(eager=True)
    from .storage import free_checkpoint

    free_checkpoint(ew)  # trans/nodes/srcs are materialized; ew is done
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    prev = None
    for _ in range(n_iter):
        # the dangling mass rides the update plan as a broadcast 1-row
        # relation — ONE job per iteration (the eager checkpoint), no
        # extra driver sync
        dang = (ranks.join(srcs, ranks["node"] == srcs["src"],
                           "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")))
        contrib = (ranks.join(trans, ranks["node"] == trans["src"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") * F.col("p")).alias("c")))
        ranks = (nodes.join(contrib, nodes["node"] == contrib["dst"],
                            "left_outer")
                 .crossJoin(F.broadcast(dang))
                 .select("node",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping)
                          * (F.coalesce(F.col("c"), F.lit(0.0))
                             + F.col("dm") / F.lit(float(n))))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
        # iteration k's checkpoint is fully materialized, so iteration
        # k-1's blocks are dead — release them NOW instead of pinning
        # n_iter node-sized copies for the session (guide §5; values
        # unchanged, the freed blocks are never read again)
        free_checkpoint(prev)
        prev = ranks
    # the helper relations fed only the (now checkpointed) final ranks
    for aux in (trans, nodes, srcs):
        free_checkpoint(aux)
    return ranks
