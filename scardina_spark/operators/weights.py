"""Bottom-up join-multiplicity weights over a subschema tree.

``__weight__`` of a base-table row = the number of rows of the sub-join it
participates in (with left-outer null-extension counting 1).  Computed
bottom-up over the BFS tree: a parent's weight is the product over child
edges of (sum of matching child weights, or 1 when no child matches).

Reference semantics (NOT code): scardina/datasets.py:296-357 — per edge,
``groupby(key)[__weight__].sum()`` outer-joined into the parent as
``__fanout__:<parent_key>=<child>.<child_key>``, NAs filled with 1,
``__weight__ *= fanout``.

Spark mapping: one ``groupBy(key).agg(sum)`` + ``left_outer`` join per
schema edge — a handful of passes, each a single shuffle on the join key;
no driver-side data movement.  Deviation: the reference's *outer* merge
fabricates phantom parent rows for unmatched child keys; we keep
left_outer (see operators/fanout.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schema import Relationship, Subschema
from .fanout import edge_fanout, fanout_col

WEIGHT = "__weight__"


def tree_edges_bottom_up(ss: Subschema, root: str
                         ) -> list[tuple[str, str, Relationship]]:
    """(parent, child, rel) edges in reverse-BFS order from ``root`` —
    children are weighted before their parents consume them."""
    return list(reversed(ss.join_tree(root)))


def compute_weights(ss: Subschema, tables: dict[str, DataFrame], root: str
                    ) -> dict[str, DataFrame]:
    """Attach ``__weight__`` (and per-edge ``__fanout__:...``) columns to
    every table of the subschema, bottom-up toward ``root``."""
    out = {t: tables[t] for t in ss.tables}
    weighted: set[str] = set()

    for parent, child, rel in tree_edges_bottom_up(ss, root):
        if child not in weighted:
            out[child] = out[child].withColumn(WEIGHT, F.lit(1).cast("double"))
            weighted.add(child)
        if parent not in weighted:
            out[parent] = out[parent].withColumn(WEIGHT, F.lit(1).cast("double"))
            weighted.add(parent)

        parent_key = rel.pk_col if rel.pk_table == parent else rel.fk_col
        child_key = rel.fk_col if rel.fk_table == child else rel.pk_col
        fcol = fanout_col(parent_key, child, child_key)

        fsum = edge_fanout(out[child], child_key).select(
            F.col(f"`{child_key}`").alias("__k__"), F.col("__fsum__"))
        p = out[parent].join(
            fsum, F.col(f"`{parent_key}`") == F.col("__k__"), "left_outer")
        p = p.withColumn(fcol, F.coalesce(F.col("__fsum__"), F.lit(1.0)))
        p = p.withColumn(WEIGHT, F.col(WEIGHT) * F.col(f"`{fcol}`"))
        out[parent] = p.drop("__k__", "__fsum__")

    return out


def join_size(ss: Subschema, tables: dict[str, DataFrame], root: str) -> int:
    """Exact sub-join cardinality = sum of root weights.  One aggregate —
    the Spark-native replacement for the reference's hard-coded exact sizes
    (scardina/datasets.py:786-806)."""
    w = compute_weights(ss, tables, root)
    row = w[root].agg(F.sum(WEIGHT).alias("s")).collect()[0]
    return int(row["s"] or 0)
