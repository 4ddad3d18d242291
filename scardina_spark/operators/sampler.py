"""Distributed unbiased weighted join sampling.

The reference materializes an unbiased sample of each sub-join by (a)
sampling root rows with replacement proportional to ``__weight__`` and (b)
walking the join tree, picking ONE matching child row per sample
proportional to the child's ``__weight__``, null-extending when no child
matches (reference semantics: scardina/join.py:73-245 — per-key Python
dict loops, single-node).  This module re-derives the operator as pure
DataFrame algebra so it scales:

* Root sampling: exact multinomial-with-replacement, shuffle-free.  One
  tiny job collects per-partition weight totals (one row per partition);
  the driver splits the n draws across partitions with a single
  multinomial draw (exactly proportional to each partition's weight
  mass), and every partition then draws its quota locally with numpy over
  Arrow batches.  No global sort, no prefix sum, no join — the two-level
  factorization Multinomial(n, partition masses) × per-partition weighted
  choice IS the row-level multinomial, and it scales as O(#partitions)
  driver state.

* Per-edge weighted pick: Efraimidis–Spirakis A-Res weighted reservoir —
  join samples to candidate children on the key, give every candidate an
  independent exponential-race score ``rand()^(1/w)``, and keep the argmax
  per sample (``max_by``).  This picks child ``j`` with probability
  ``w_j / Σ_k w_k`` exactly, with no per-key cumulative sums and no
  floating-point interval cracks.  Skewed join keys are handled by AQE
  skew-join splitting rather than a hand-rolled memo (the reference's
  ≤10-distinct-keys special case, scardina/join.py:166-206).

Output columns are prefixed ``<table>.<col>`` with ``__in__:<table>``
existence markers, matching the reference layout (scardina/join.py:86-87,
221-230): unmatched children contribute an all-NULL row with fanouts 1 and
``__in__ = False``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..schema import Subschema
from .prefix import PID, _safe_names
from .weights import WEIGHT

SAMPLE_ID = "__sample_id__"


def _q(name: str) -> F.Column:
    return F.col(f"`{name}`")


def weighted_sample_with_replacement(
    df: DataFrame, weight_col: str, order_cols: list[str] | None = None,
    n: int = 1, seed: int = 42, n_buckets: int | None = None,
    uniform: bool = False, cache_out: list | None = None,
) -> DataFrame:
    """Exactly ``n`` draws with replacement, P(row) ∝ ``weight_col``.

    Returns the sampled rows (original columns + ``__sample_id__``); a row
    drawn k times appears k times with distinct sample ids (dense 0..n-1).

    Two jobs, zero shuffles: per-partition weight totals → driver-side
    multinomial split of ``n`` → per-partition local weighted draws
    (Arrow-batched numpy).  A partition is materialized in pandas to draw
    from it, so partition sizing (``spark.sql.files.maxPartitionBytes``)
    bounds executor memory exactly as for any other Arrow exchange.
    ``order_cols`` stabilizes the draw: each partition batch is sorted by
    these columns before indexing, so the seeded draw is independent of
    within-partition ARRIVAL order — a partition recomputed after cache
    loss (shuffle outputs replay rows in nondeterministic order) yields
    the same rows.  Partition MEMBERSHIP is deterministic by itself
    (hash shuffles + scan splits).  ``n_buckets`` is accepted for API
    stability.

    ``uniform=True`` asserts every weight is the same positive constant
    (the fact-rooted fast path, where all weights are 1): the per-partition
    totals collapse to row counts (a column-pruned count job — for a
    parquet-backed table no data columns are read), the draw skips weight
    normalization, and no persist is needed because the caller guarantees
    deterministic partition membership (a scan, optionally behind the
    loader's sort-stabilized round-robin rebalance — no joins or
    aggregations upstream), so both passes see the same partition
    contents; the ``order_cols`` sort neutralizes any within-partition
    order difference between the passes.

    The weighted path persists the filtered input so the totals pass and
    the draw pass share one materialization (a performance choice — with
    the ``order_cols`` sort the draw is correct under recompute too).
    Pass ``cache_out`` (a list) to receive that handle — the caller
    should ``unpersist()`` it once the draw has materialized, or the
    (root-table-sized) cache lives for the session (the
    ``prefix.with_prefix_sum`` pattern).
    """
    if uniform:
        pos = df.withColumn(PID, F.spark_partition_id())
        part = pos.groupBy(PID).agg(F.count(F.lit(1)).alias("s")).collect()
    else:
        pos = (df.where(_q(weight_col) > 0)
                 .withColumn(PID, F.spark_partition_id())
                 .persist())
        if cache_out is not None:
            cache_out.append(pos)
        part = pos.groupBy(PID).agg(
            F.sum(_q(weight_col).cast("double")).alias("s")).collect()
    sums = {int(r[PID]): float(r["s"] or 0.0) for r in part}
    total = sum(sums.values())
    if not total or total <= 0:
        raise ValueError("weighted_sample_with_replacement: no positive weight")

    pids = sorted(sums)
    rs = np.random.RandomState(seed)
    counts = rs.multinomial(n, [sums[p] / total for p in pids])
    quota = {p: int(c) for p, c in zip(pids, counts)}
    offsets, running = {}, 0
    for p in pids:
        offsets[p] = running
        running += quota[p]

    sc = df.sparkSession.sparkContext
    b_quota = sc.broadcast(quota)
    b_off = sc.broadcast(offsets)

    safe, mapping = _safe_names(pos)
    w_safe, pid_safe = mapping[weight_col], mapping[PID]
    sort_safe = [mapping[c] for c in (order_cols or []) if c in mapping]
    schema = StructType(safe.schema.fields + [StructField(SAMPLE_ID, LongType())])

    def draw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True)
        if sort_safe:
            pdf = pdf.sort_values(sort_safe, kind="mergesort",
                                  ignore_index=True)
        pid = int(pdf[pid_safe].iloc[0])
        k = b_quota.value.get(pid, 0)
        if k <= 0:
            return
        prs = np.random.RandomState((seed * 1_000_003 + 7919 * pid) % (2**32))
        if uniform:
            idx = prs.randint(len(pdf), size=k)
        else:
            w = pdf[w_safe].to_numpy(dtype="float64")
            idx = prs.choice(len(pdf), size=k, replace=True, p=w / w.sum())
        out = pdf.iloc[idx].copy()
        out[SAMPLE_ID] = np.arange(b_off.value[pid], b_off.value[pid] + k,
                                   dtype="int64")
        yield out

    out = safe.mapInPandas(draw, schema)
    for orig, s in mapping.items():
        out = out.withColumnRenamed(s, orig)
    return out.drop(PID)


def pick_one_child_per_sample(
    samples: DataFrame, sample_key: str, child: DataFrame, child_key: str,
    child_table: str, weighted: bool, seed: int,
) -> DataFrame:
    """Attach exactly one child row (columns prefixed ``<child_table>.``) to
    every sample row, picked ∝ child ``__weight__`` when ``weighted`` (A-Res),
    else via the unique PK match; null-extend when no child matches."""
    pref = [F.col(f"`{c}`").alias(f"{child_table}.{c}") for c in child.columns]
    c = child.select(*pref).withColumn(f"__in__:{child_table}", F.lit(True))
    ckey = f"{child_table}.{child_key}"
    cweight = f"{child_table}.{WEIGHT}"

    cond = _q(sample_key) == _q(ckey)
    joined = samples.join(c, cond, "left_outer")

    if weighted:
        # A-Res score: u^(1/w) — max per sample picks ∝ w.  The uniform
        # u is HASH-derived from (sample_id, full candidate row), not
        # F.rand: rand() numbers rows by position within their partition,
        # and a shuffle join replays rows in nondeterministic order, so
        # seeded rand picks differed across sessions (measured: the jm
        # suite's sample hash changed run to run, q-error tail 1.33-2.22
        # at identical seed/code).  A hash of the row content is
        # layout-independent by construction — same inputs, same pick, on
        # any cluster.  Candidate rows within a sample are distinct in at
        # least their own PK column (whole child rows join in), so each
        # gets an independent race score.
        u = (F.pmod(F.xxhash64(F.col(SAMPLE_ID), *[_q(cc) for cc in c.columns],
                               F.lit(seed)),
                    F.lit(1 << 53)).cast("double") + F.lit(0.5)) / (1 << 53)
        z = F.when(
            _q(f"__in__:{child_table}").isNull(), F.lit(-1.0)
        ).otherwise(
            F.pow(u, F.lit(1.0) / F.greatest(_q(cweight).cast("double"),
                                             F.lit(1e-300)))
        )
        joined = joined.withColumn("__z__", z)
        child_struct = F.struct(*[_q(cc).alias(cc) for cc in c.columns])
        picked = joined.groupBy(SAMPLE_ID).agg(
            F.max_by(child_struct, F.col("__z__")).alias("__c__"))
        out = samples.join(picked, SAMPLE_ID)
        for cc in c.columns:
            out = out.withColumn(cc, F.col("__c__").getField(cc))
        out = out.drop("__c__")
    else:
        # many-to-one: the child key is a PK — at most one match
        out = joined

    out = out.withColumn(
        f"__in__:{child_table}",
        F.coalesce(_q(f"__in__:{child_table}"), F.lit(False)))
    # null-extended rows carry fanout 1 (reference: scardina/join.py:222-230)
    for cc in c.columns:
        if "__fanout__:" in cc or "__adj_fanout__:" in cc:
            out = out.withColumn(cc, F.coalesce(_q(cc), F.lit(1)).cast("long"))
    return out


def join_sample(
    ss: Subschema, weighted_tables: dict[str, DataFrame], root: str,
    n: int, seed: int = 42, drop_weights: bool = True,
    uniform_root: bool = False, cache_out: list | None = None,
) -> DataFrame:
    """Unbiased sample (size ``n``) of the sub-join, BFS from ``root``.

    ``weighted_tables`` must carry ``__weight__`` (operators/weights.py).
    ``uniform_root`` certifies all root weights equal (fact-rooted trees)
    so the root draw can skip weight scans and persist; otherwise
    ``cache_out`` receives the root draw's persist handle to release
    once the sample is materialized.
    """
    root_df = weighted_tables[root]
    order = [root_df.columns[0]]
    agg = weighted_sample_with_replacement(root_df, WEIGHT, order, n, seed=seed,
                                           uniform=uniform_root,
                                           cache_out=cache_out)
    # The draw inherits the root scan's partitioning, which can be narrow
    # (few files / single row group); the per-edge picks chain onto it as
    # one codegen stage, so rebalance the (narrow, n-row) drawn sample once
    # to give the whole join pipeline the session's full parallelism.
    sc = agg.sparkSession.sparkContext
    if agg.rdd.getNumPartitions() < sc.defaultParallelism:
        agg = agg.repartition(sc.defaultParallelism)
    agg = agg.select(
        F.col(SAMPLE_ID),
        *[F.col(f"`{c}`").alias(f"{root}.{c}") for c in root_df.columns],
    ).withColumn(f"__in__:{root}", F.lit(True))

    import hashlib
    for parent, child, rel in ss.join_tree(root):
        parent_key = rel.pk_col if rel.pk_table == parent else rel.fk_col
        child_key = rel.fk_col if rel.fk_table == child else rel.pk_col
        many_to_one = rel.pk_table == child
        # per-edge seed derived from the edge IDENTITY, not its position
        # in the BFS enumeration: a positional seed re-randomized every
        # edge whenever the enumeration order shifted (the pre-fix
        # join_tree did, per process), changing every seeded pick at
        # identical code+seed.  md5 (not hash()) so it is
        # process-independent.
        edge_id = f"{parent}.{parent_key}={child}.{child_key}"
        e_seed = (seed + int(hashlib.md5(edge_id.encode())
                             .hexdigest()[:8], 16)) % (2 ** 31)
        agg = pick_one_child_per_sample(
            agg, f"{parent}.{parent_key}", weighted_tables[child], child_key,
            child, weighted=not many_to_one, seed=e_seed)

    if drop_weights:
        agg = agg.drop(*[c for c in agg.columns if c.endswith(WEIGHT)])
    # deterministic column order, as the reference does
    # (scardina/datasets.py:362)
    return agg.select(
        _q(SAMPLE_ID), *[_q(c) for c in sorted(c for c in agg.columns if c != SAMPLE_ID)])
