"""Slowly-changing-dimension (SCD Type 2) history construction from a
change-event stream — the CDC compaction every warehouse dimension load
runs, and the natural batch twin of the repo's latest-per-key operator
(``dedup.latest_per_key`` keeps only the current row; SCD2 keeps the
full validity history).

``scd2_history`` turns per-key attribute observations into validity
intervals: consecutive observations with the SAME attribute value
collapse into one ``[valid_from, valid_to)`` interval (gaps-and-islands),
``valid_to`` is the next interval's start (NULL on the current row), and
``n_events`` counts the collapsed observations — the audit trail.

Scale story (100 TB): ONE shuffle total — everything is windows over the
same ``partitionBy(key)`` ordering, so Catalyst plans a single Exchange
and every subsequent window/filter/projection reuses the sort.  The
island aggregation is NOT a groupBy (which would re-shuffle on
``(key, island)``): change rows carry their row number, and the island's
event count is the row-number distance to the next change row.  Skewed
keys behave like any window skew (a key's history must fit one
partition's sort spill — true for dimension keys by construction; fact
streams with million-event keys should pre-bucket by time first,
``operators/layout.py``).  Interval semantics follow Kimball's SCD2
(half-open, NULL-terminated current row); determinism comes from the
caller-supplied total order ``(ts, *tiebreak)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(df: DataFrame, key: str, attr: str, ts: str,
                 tiebreak: list[str] | None = None) -> DataFrame:
    """Collapse a change-event stream into SCD2 validity intervals.

    Returns ``(key, attr, valid_from, valid_to, n_events, is_current)``
    — one row per island of consecutive identical ``attr`` values per
    ``key`` under the ``(ts, *tiebreak)`` total order.  ``valid_to`` is
    the NEXT island's ``valid_from`` (half-open intervals that tile the
    key's observed history; NULL on the current island).  NULL ``attr``
    values are legitimate states (null-safe change detection), so a
    NULL→'x'→NULL history yields three intervals.
    """
    order = [F.col(ts)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    # change row = first observation of the key, or attr differs from
    # the previous observation (null-safe on both sides)
    prev = F.lag(F.col(attr)).over(w)
    prev_seen = F.lag(F.lit(1)).over(w)
    changed = prev_seen.isNull() | ~F.col(attr).eqNullSafe(prev)
    numbered = df.select(
        F.col(key), F.col(attr), F.col(ts),
        *[F.col(c) for c in (tiebreak or [])]).withColumn(
        "__rn__", F.row_number().over(w)).withColumn(
        "__n_key__", F.count(F.lit(1)).over(Window.partitionBy(key))
    ).withColumn("__chg__", changed)
    islands = numbered.where(F.col("__chg__"))
    # within the change rows (still ordered by __rn__), the next change
    # row bounds this island: its ts is valid_to, its rn the event count
    wi = Window.partitionBy(key).orderBy("__rn__")
    return (islands
            .withColumn("valid_to", F.lead(F.col(ts)).over(wi))
            .withColumn(
                "n_events",
                F.coalesce(F.lead("__rn__").over(wi),
                           F.col("__n_key__") + 1) - F.col("__rn__"))
            .select(F.col(key), F.col(attr),
                    F.col(ts).alias("valid_from"),
                    "valid_to", "n_events",
                    F.col("valid_to").isNull().alias("is_current")))


def scd2_merge(history: DataFrame, delta: DataFrame, key: str, attr: str,
               ts: str, tiebreak: list[str] | None = None) -> DataFrame:
    """Incrementally fold APPEND-ONLY change events into an existing
    SCD2 history — the CDC upsert path (the x62 lesson applied to
    dimensions: never rebuild the 99.9% of history a 0.1% delta cannot
    touch).  Returns the same schema as :func:`scd2_history`, and is
    BIT-IDENTICAL to a from-scratch rebuild over (original events ∪
    delta) — the x73 oracle pins exactly that.

    Precondition (validated with one key-domain-sized count, raising
    ``ValueError`` on violation): every delta event is strictly later
    than its key's current interval's ``valid_from`` — i.e. the delta
    is append-only per key, the CDC contract.  Out-of-order backfill
    inside closed intervals cannot be merged (their source events are
    gone) and must re-run ``scd2_history`` on the raw events.

    Scale story: untouched keys pass through via one anti join; touched
    keys' CLOSED intervals pass through via a semi join; only the open
    interval of each touched key is re-derived — it becomes a pseudo
    event (its state at its start) unioned with the delta, re-islanded
    by :func:`scd2_history` (delta-sized work), and its collapsed
    observation count is restored arithmetically.
    """
    tb = list(tiebreak or [])
    cur = history.where(F.col("is_current"))
    viol = (delta.join(cur.select(F.col(key), F.col("valid_from")), key)
            .where(F.col(ts) <= F.col("valid_from")).count())
    if viol:
        raise ValueError(
            f"{viol} delta event(s) at or before their key's current "
            f"interval start — scd2_merge requires per-key append-only "
            f"deltas; rebuild with scd2_history instead")
    touched = delta.select(key).distinct()
    untouched = history.join(touched, key, "left_anti")
    closed_t = (history.join(touched, key, "left_semi")
                .where(~F.col("is_current")))
    open_t = cur.join(touched, key, "left_semi")
    d_events = delta.select(F.col(key), F.col(attr), F.col(ts),
                            *[F.col(c) for c in tb])
    pseudo = open_t.select(
        F.col(key), F.col(attr), F.col("valid_from").alias(ts),
        *[F.lit(None).cast(d_events.schema[c].dataType).alias(c)
          for c in tb])
    tail = scd2_history(pseudo.unionByName(d_events), key, attr, ts, tb)
    # restore the open interval's collapsed count on the island that
    # starts where it started (the pseudo event contributed 1 of it)
    adj = open_t.select(F.col(key), F.col("valid_from").alias("__ovf__"),
                        F.col("n_events").alias("__oev__"))
    tail_adj = (tail.join(adj, key, "left_outer")
                .withColumn(
                    "n_events",
                    F.when(F.col("valid_from") == F.col("__ovf__"),
                           F.col("n_events") + F.col("__oev__") - 1)
                    .otherwise(F.col("n_events")))
                .drop("__ovf__", "__oev__"))
    return untouched.unionByName(closed_t).unionByName(tail_adj)
