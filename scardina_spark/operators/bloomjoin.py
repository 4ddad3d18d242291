"""Bloom-style runtime-filter semi join: prune the big (probe) side with a
broadcast hash-bucket membership filter before the exact join.

The scale problem: ``probe LEFT SEMI JOIN build`` shuffles the *entire*
probe side on the join key, even when only a sliver of probe rows have a
match.  Spark's own runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) attack the same
problem inside Catalyst; this operator expresses the pattern explicitly
at the DataFrame level so it also works where the optimizer won't inject
one (non-equi follow-ups, pre-3.3 clusters, manual tuning of the bucket
count).

Mechanics:

1. ``buckets = distinct(xxhash64(build.key) % num_buckets)`` — a
   one-column table of at most ``num_buckets`` ints, broadcastable even
   when ``build``'s distinct keys are far too large to broadcast.
2. Probe rows whose hashed key misses every bucket are dropped by a
   **broadcast** left-semi join (map-side, no shuffle of the probe).
3. The surviving slice joins ``build`` exactly (left semi), removing
   hash-collision false positives — output rows are exactly those of a
   plain semi join, which is what the DuckDB oracle checks.

False-positive rate ≈ ``distinct_keys(build) / num_buckets`` (single
hash; this is a 1-hash Bloom filter, i.e. a hash set of buckets — with
Spark expressions a k-hash variant is just a conjunction of k of these).

Reference parity: no analog (Scardina joins only via pandas ``merge``,
``join.py:141-219``); this is join infrastructure for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BUCKETS = 1 << 20


def _bucket(col: Column, num_buckets: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(num_buckets))


def bloom_filter_table(build: DataFrame, build_key: str,
                       num_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Distinct hash buckets occupied by ``build_key`` — the broadcastable
    membership filter (column ``__bucket``)."""
    return (build.select(_bucket(F.col(build_key), num_buckets)
                         .alias("__bucket"))
            .where(F.col("__bucket").isNotNull())
            .distinct())


def bloom_semi_join(probe: DataFrame, build: DataFrame,
                    probe_key: str, build_key: str,
                    num_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """``probe LEFT SEMI JOIN build ON probe_key = build_key``, with the
    probe side pre-pruned map-side by a broadcast bucket filter.

    Exact semi-join semantics (false positives removed by the final
    equi-semi-join); NULL probe keys never match, as in SQL.
    """
    filt = bloom_filter_table(build, build_key, num_buckets)
    pruned = probe.join(
        F.broadcast(filt),
        _bucket(F.col(probe_key), num_buckets) == F.col("__bucket"),
        "left_semi")
    keys = build.select(F.col(build_key).alias(probe_key)).distinct() \
        if build_key != probe_key else build.select(build_key).distinct()
    return pruned.join(keys, on=probe_key, how="left_semi")
