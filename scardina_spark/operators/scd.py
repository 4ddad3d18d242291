"""Slowly-changing-dimension (SCD Type 2) history construction from a
change-event stream — the CDC compaction every warehouse dimension load
runs, and the natural batch twin of the repo's latest-per-key operator
(``dedup.keep_latest`` keeps only the current row; SCD2 keeps the
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
                 tiebreak: list[str] | None = None,
                 with_last_seen: bool = False) -> DataFrame:
    """Collapse a change-event stream into SCD2 validity intervals.

    Returns ``(key, attr, valid_from, valid_to, n_events, is_current)``
    — one row per island of consecutive identical ``attr`` values per
    ``key`` under the ``(ts, *tiebreak)`` total order.  ``valid_to`` is
    the NEXT island's ``valid_from`` (half-open intervals that tile the
    key's observed history; NULL on the current island).  NULL ``attr``
    values are legitimate states (null-safe change detection), so a
    NULL→'x'→NULL history yields three intervals.

    ``with_last_seen=True`` adds a ``last_seen`` column — the island's
    LAST observation timestamp (``valid_from`` records the first).
    Collapsed observations are otherwise unrecoverable from the
    intervals, so ``last_seen`` is what lets :func:`scd2_merge` enforce
    the append-only contract exactly instead of approximately: keep it
    on any history you plan to extend incrementally.  Cost: one extra
    max over a range frame keyed by the island index — same ``key``
    partitioning, so the plan still has ONE Exchange (an added Sort,
    no added shuffle).
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
    extra: list[str] = []
    if with_last_seen:
        # island index = running count of change rows; a range frame
        # over it spans exactly the island's peer rows, so max(ts)
        # is the island's last observation — still partitioned by key
        # alone (ONE Exchange; __isl__ is monotone in the event order)
        isl = F.sum(F.col("__chg__").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wl = (Window.partitionBy(key).orderBy("__isl__")
              .rangeBetween(Window.currentRow, Window.currentRow))
        numbered = (numbered.withColumn("__isl__", isl)
                    .withColumn("last_seen", F.max(F.col(ts)).over(wl)))
        extra = ["last_seen"]
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
                    F.col("valid_to").isNull().alias("is_current"),
                    *extra))


def scd2_merge(history: DataFrame, delta: DataFrame, key: str, attr: str,
               ts: str, tiebreak: list[str] | None = None,
               since: str | None = None) -> DataFrame:
    """Incrementally fold APPEND-ONLY change events into an existing
    SCD2 history — the CDC upsert path (the x62 lesson applied to
    dimensions: never rebuild the 99.9% of history a 0.1% delta cannot
    touch).  Returns the same schema as :func:`scd2_history` (including
    ``last_seen``, maintained, when the input history carries it), and
    is BIT-IDENTICAL to a from-scratch rebuild over (original events ∪
    delta) — the x73 oracle pins exactly that — PROVIDED every delta
    event lands after ALL of its key's original observations.

    That contract is enforced at one of three strengths (strongest
    available wins), raising ``ValueError`` on violation:

    - history carries ``last_seen`` (built ``with_last_seen=True``):
      every delta event must be strictly later than its key's open
      interval's ``last_seen``.  EXACT — sufficient as well as
      necessary, since ``last_seen`` is the open island's final
      observation.
    - ``since`` given (the CLI's ``--since`` ingest boundary): every
      delta event must be ``>= since`` and every history interval must
      start ``< since``.  Sufficient GIVEN the caller's guarantee that
      the original event feed was truncated at ``since`` — the half of
      that guarantee visible in the inputs is validated here.
    - neither: every delta event must be strictly later than its key's
      open interval's ``valid_from``.  NECESSARY BUT NOT SUFFICIENT —
      collapsed observations inside the open island have later
      timestamps than ``valid_from`` and are gone from the intervals,
      so a delta event slotted between ``valid_from`` and the island's
      last observation passes this gate yet silently diverges from the
      from-scratch rebuild.  Prefer either stronger mode for
      production CDC; this legacy gate survives for histories built
      without ``last_seen`` where no boundary is known.

    Out-of-order backfill inside closed intervals can never be merged
    (their source events are gone) and must re-run ``scd2_history`` on
    the raw events.

    Scale story: untouched keys pass through via one anti join; touched
    keys' CLOSED intervals pass through via a semi join; only the open
    interval of each touched key is re-derived — it becomes a pseudo
    event (its state at its start) unioned with the delta, re-islanded
    by :func:`scd2_history` (delta-sized work), and its collapsed
    observation count is restored arithmetically.  Each validation is
    one delta-sized count (plus one history-interval-sized count for
    the ``since`` boundary check).
    """
    tb = list(tiebreak or [])
    has_ls = "last_seen" in history.columns
    cur = history.where(F.col("is_current"))
    if has_ls:
        viol = (delta.join(cur.select(F.col(key), F.col("last_seen")),
                           key)
                .where(F.col(ts) <= F.col("last_seen")).count())
        if viol:
            raise ValueError(
                f"{viol} delta event(s) at or before their key's last "
                f"recorded observation (last_seen) — scd2_merge "
                f"requires per-key append-only deltas; rebuild with "
                f"scd2_history instead")
    elif since is not None:
        bound = F.lit(since).cast(history.schema["valid_from"].dataType)
        early = delta.where(F.col(ts) < bound).count()
        if early:
            raise ValueError(
                f"{early} delta event(s) before the --since ingest "
                f"boundary {since!r} — the delta feed must start at "
                f"the boundary the history was truncated at")
        late = history.where(F.col("valid_from") >= bound).count()
        if late:
            raise ValueError(
                f"{late} history interval(s) start at/after the "
                f"--since ingest boundary {since!r} — the history "
                f"already contains events past the boundary, so the "
                f"boundary (or the history) is wrong")
    else:
        viol = (delta.join(cur.select(F.col(key), F.col("valid_from")),
                           key)
                .where(F.col(ts) <= F.col("valid_from")).count())
        if viol:
            raise ValueError(
                f"{viol} delta event(s) at or before their key's "
                f"current interval start — scd2_merge requires per-key "
                f"append-only deltas; rebuild with scd2_history "
                f"instead (NB: this legacy gate cannot see collapsed "
                f"observations inside the open interval — build the "
                f"history with_last_seen=True or pass since= for an "
                f"exact check)")
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
    tail = scd2_history(pseudo.unionByName(d_events), key, attr, ts, tb,
                        with_last_seen=has_ls)
    # restore the open interval's collapsed count on the island that
    # starts where it started (the pseudo event contributed 1 of it);
    # with last_seen the same island's recomputed last observation only
    # saw the pseudo event (= valid_from), so restore the true one —
    # greatest() because a delta event merged into the island may be
    # later than the original last_seen
    adj_cols = [F.col(key), F.col("valid_from").alias("__ovf__"),
                F.col("n_events").alias("__oev__")]
    if has_ls:
        adj_cols.append(F.col("last_seen").alias("__ols__"))
    adj = open_t.select(*adj_cols)
    tail_adj = (tail.join(adj, key, "left_outer")
                .withColumn(
                    "n_events",
                    F.when(F.col("valid_from") == F.col("__ovf__"),
                           F.col("n_events") + F.col("__oev__") - 1)
                    .otherwise(F.col("n_events"))))
    if has_ls:
        tail_adj = tail_adj.withColumn(
            "last_seen",
            F.when(F.col("valid_from") == F.col("__ovf__"),
                   F.greatest(F.col("last_seen"), F.col("__ols__")))
            .otherwise(F.col("last_seen")))
    tail_adj = tail_adj.drop("__ovf__", "__oev__", "__ols__")
    return untouched.unionByName(closed_t).unionByName(tail_adj)
