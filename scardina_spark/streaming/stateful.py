"""Custom stateful streaming operator via applyInPandasWithState.

Streaming first-seen dedup: emit each key's earliest event once and
suppress every later occurrence — the streaming twin of exact dedup
(`operators/dedup.exact_dedup`), which a continuous ingestion pipeline
needs so re-sent or replayed documents don't re-enter the corpus.

This is the pattern Spark's built-in windows can't express (the state is
"have I ever emitted this key", unbounded in time), so it uses the
arbitrary-stateful API: one GroupState per key holding the emitted
row's identity.  State size is O(distinct keys) × a few bytes, spread
across the state store's shuffle partitions; at 100 TB scale you bound
it by passing ``state_timeout_ms`` (a ProcessingTimeTimeout matching
the replay horizon — keys idle past it are evicted and a later replay
re-emits as first-seen).

Batches inside a micro-batch arrive unordered — the function picks the
(ts, id) minimum across the batch iterator and compares it against
state, so results are deterministic regardless of partitioning or
trigger slicing (asserted in tests: one-file-per-trigger == one batch ==
batch SQL oracle).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_dedup_stream(events: DataFrame, key_col: str = "user_id",
                            ts_col: str = "ts", id_col: str = "event_id",
                            state_timeout_ms: int | None = None,
                            ) -> DataFrame:
    """One row per key: the earliest (ts, id) event ever seen on the
    stream.  Output mode must be ``update`` — a later micro-batch can
    revise a key's row only if it carries a strictly earlier event
    (possible when the source replays or is out of order).

    ``state_timeout_ms`` (optional) bounds state at the replay
    horizon: a key idle past it is evicted, so a much later replay
    re-emits as first-seen.  Default ``None`` = exact unbounded
    semantics (batch-oracle parity)."""

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = None  # (ts_epoch_int, id, original_ts_value)
        for pdf in pdfs:
            if pdf.empty:
                continue
            row = pdf.sort_values([ts_col, id_col]).iloc[0]
            cand = (int(pd.Timestamp(row[ts_col]).value),
                    int(row[id_col]), row[ts_col])
            if best is None or cand[:2] < best[:2]:
                best = cand
        if best is None:
            return
        if state.exists:
            prev = state.get
            if (prev[0], prev[1]) <= best[:2]:
                if state_timeout_ms is not None:
                    # any sighting extends the retention window
                    state.setTimeoutDuration(state_timeout_ms)
                return  # already emitted an earlier-or-equal event
        state.update(best[:2])
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame({
            key_col: [key[0]],
            id_col: [best[1]],
            ts_col: [best[2]],
        })

    out_schema = f"{key_col} bigint, {id_col} bigint, {ts_col} timestamp"
    state_schema = "ts_us bigint, id bigint"
    timeout = (GroupStateTimeout.NoTimeout if state_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", timeout))


def scd2_stream(events: DataFrame, key_col: str = "user_id",
                attr_col: str = "event_type", ts_col: str = "ts",
                id_col: str = "event_id",
                state_timeout_ms: int | None = None) -> DataFrame:
    """Streaming SCD Type 2: maintain each key's CURRENT validity
    interval in state and emit an interval the moment it CLOSES (the
    next state change arrives) — CDC dimension history built at ingest,
    the streaming twin of ``operators/scd.scd2_history`` (closed rows
    only; the open interval lives in state until its closing event).

    Contract (same as the batch ``scd2_merge``): per-key APPEND-ONLY
    arrival — events inside a micro-batch are sorted ``(ts, id)``
    before folding, and a later micro-batch's event that lands BEFORE
    the key's last folded observation is DROPPED (watermark-style
    late-data policy: out-of-order backfill cannot re-open an emitted
    interval — closed intervals are append-final, which is what makes
    append output mode correct — and silently folding it would corrupt
    the open one; the state keeps the last observed timestamp exactly
    so the regression is detectable, the streaming analogue of the
    batch ``with_last_seen`` gate).  State is one ``(attr, valid_from,
    n_events, last_ts)`` tuple per key; ``state_timeout_ms`` bounds it
    at the ingest horizon (an evicted key's open interval is silently
    dropped — the trade documented in the module docstring)."""

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        batch = pd.concat(frames).sort_values([ts_col, id_col])
        if state.exists:
            cur_attr, vf_ns, n, last_ns = state.get
            has_cur = True
        else:
            cur_attr, vf_ns, n, last_ns, has_cur = None, 0, 0, None, False
        closed: list[tuple] = []
        for _, row in batch.iterrows():
            a = row[attr_col]
            a = None if pd.isna(a) else a
            t_ns = int(pd.Timestamp(row[ts_col]).value)
            if has_cur and last_ns is not None and t_ns < last_ns:
                continue    # late arrival: older than the last folded
            last_ns = t_ns  # observation for this key -> drop
            if has_cur and a == cur_attr:
                n += 1
            else:
                if has_cur:
                    closed.append((cur_attr, vf_ns, t_ns, n))
                cur_attr, vf_ns, n, has_cur = a, t_ns, 1, True
        state.update((cur_attr, vf_ns, n, last_ns))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        if closed:
            yield pd.DataFrame({
                key_col: [key[0]] * len(closed),
                attr_col: [c[0] for c in closed],
                "valid_from": [pd.Timestamp(c[1]) for c in closed],
                "valid_to": [pd.Timestamp(c[2]) for c in closed],
                "n_events": [c[3] for c in closed],
            })

    out_schema = (f"{key_col} bigint, {attr_col} string, "
                  f"valid_from timestamp, valid_to timestamp, "
                  f"n_events bigint")
    state_schema = "attr string, vf_ns bigint, n bigint, last_ns bigint"
    timeout = (GroupStateTimeout.NoTimeout if state_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", timeout))


def rolling_features_stream(events: DataFrame, key_col: str = "user_id",
                            ts_col: str = "ts", val_col: str = "value",
                            id_col: str = "event_id",
                            alpha: float = 0.3,
                            state_timeout_ms: int | None = None
                            ) -> DataFrame:
    """Streaming per-key rolling features — the ingest-time twin of
    ``operators/features.rolling_features``, and the half of the
    duality the batch operator cannot have: the stream carries the
    EWMA state forward, so it computes the EXACT recursion
    ``s_i = alpha·x_i + (1-alpha)·s_{i-1}`` (seeded ``s_1 = x_1``, the
    standard convention) that the batch form deliberately TRUNCATES
    (a batch window can't see unboundedly far back without Python or
    overflowing prefix sums; state makes "unboundedly far back" one
    tuple per key).

    Emits one row per event — ``(key, id, ts, value, lag1, ewma)``,
    append mode (a row's features are final the moment its event is
    folded).  Events inside a micro-batch are sorted ``(ts, id)``;
    cross-batch regressions (an event older than the key's last folded
    one) are DROPPED, the same watermark-style late policy as
    ``scd2_stream`` — folding them would corrupt every later EWMA.
    State is ``(last_ts, last_val, ewma)`` per key;
    ``state_timeout_ms`` bounds it at the ingest horizon (an evicted
    key restarts its recursion — the documented trade)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        batch = pd.concat(frames).sort_values([ts_col, id_col])
        if state.exists:
            last_ns, last_val, ewma = state.get
            has = True
        else:
            last_ns, last_val, ewma, has = None, None, None, False
        out: list[tuple] = []
        for _, row in batch.iterrows():
            t_ns = int(pd.Timestamp(row[ts_col]).value)
            if has and t_ns < last_ns:
                continue                      # late arrival: drop
            x = float(row[val_col])
            ewma = x if not has else alpha * x + (1.0 - alpha) * ewma
            out.append((key[0], int(row[id_col]), row[ts_col], x,
                        last_val, ewma))
            last_ns, last_val, has = t_ns, x, True
        state.update((last_ns, last_val, ewma))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        if out:
            yield pd.DataFrame(out, columns=[
                key_col, id_col, ts_col, val_col, "lag1", "ewma"])

    out_schema = (f"{key_col} bigint, {id_col} bigint, "
                  f"{ts_col} timestamp, {val_col} double, "
                  f"lag1 double, ewma double")
    state_schema = "last_ns bigint, last_val double, ewma double"
    timeout = (GroupStateTimeout.NoTimeout if state_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", timeout))
