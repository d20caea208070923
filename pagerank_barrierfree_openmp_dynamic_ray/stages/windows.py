"""Windowed aggregates over the events stream table.

Tumbling windows are a plain keyed aggregate (see the events_window driver
query: per-batch partials -> one groupby).  Sliding windows need ordered
neighborhoods, so the shape is: partial-aggregate to one row per (key,
bucket) — the shuffle carries BUCKET rows, never raw events — then a
per-key ``map_groups`` computes the window function over the (small) sorted
bucket series.  Partitioning assumption: one key's OBSERVED bucket rows fit
a worker (the roll is sparse — a multi-year gap costs nothing); skewed keys
are already collapsed to buckets before the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum


def hourly_counts(events):
    """(event_type, hour, n_events): tumbling hourly counts via per-batch
    partials + one keyed aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # microseconds
        hour = ts // 3_600_000_000
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "hour": hour})
        g = df.groupby(["event_type", "hour"], sort=False).size().reset_index(name="n_part")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n_part", alias_name="n_events"))
    )


def sliding_hourly_mean(events, window: int = 3):
    """(event_type, hour, n_events, moving_avg): per-hour counts plus the
    trailing ``window``-hour moving average (missing hours count 0 — gaps in
    the series are real zeros, exactly ANSI-SQL RANGE framing semantics)."""
    counts = hourly_counts(events)

    def roll(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values("hour").reset_index(drop=True)
        hours = df["hour"].to_numpy().astype(np.int64)
        n = df["n_events"].to_numpy().astype(np.int64)
        # SPARSE trailing-window roll over the observed hours only (a key
        # with events years apart must not allocate the dense hour range —
        # VERDICT r03 item 8): exact integer window sums via cumsum over
        # observed buckets + searchsorted window starts, THEN one double
        # division — bit-identical to SQL's SUM(...RANGE w-1 PRECEDING) /
        # LEAST(w, hours-since-first+1) because missing hours contribute 0
        # to the sum either way.
        cs = np.concatenate([[0], np.cumsum(n)])
        j_lo = np.searchsorted(hours, hours - window + 1, side="left")
        msum = cs[1:] - cs[j_lo]
        div = np.minimum(hours - hours[0] + 1, window)
        avg = msum / div
        return pa.table(
            {
                "event_type": pa.array(
                    np.repeat(df["event_type"].iloc[0], len(hours))
                ),
                "hour": pa.array(hours),
                "n_events": pa.array(n),
                "moving_avg": pa.array(avg),
            }
        )

    return counts.groupby("event_type").map_groups(roll, batch_format="pyarrow")


def sessionize(events, key: str = "user_id", ts: str = "ts",
               gap_s: float = 1800.0, num_partitions: int = 32):
    """Gap-timeout sessionization: a key's events ordered by time belong to
    one session until a silence longer than ``gap_s`` seconds starts the
    next.  Returns one row per session: ``(key, session_idx, session_start,
    session_end, n_events)`` with ``session_idx`` counting a key's sessions
    from 0 in time order.

    Shape: per-batch part tag ``hash(key) % P`` -> ONE part groupby (never a
    per-key groupby) -> vectorized lexsort + diff-over-gap cumsum + segment
    reduce inside each part.  Session assignment is order-independent among
    equal timestamps (zero gap joins them), so the output is deterministic
    without a tie-break column.  Partitioning assumption: one part's event
    rows fit a worker; sessions are sequential chains per key, so a hot key
    cannot be sub-split without boundary carry (the asof-join time-split
    machinery would apply if one arises).
    """
    gap_us = np.int64(round(gap_s * 1e6))
    P = np.uint64(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([key, ts])
        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (k * np.uint64(2654435761)) % P
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def sessions(group: pa.Table) -> pa.Table:
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = group[ts].cast(pa.int64()).to_numpy()  # microseconds
        if not len(k):
            return pa.table({
                key: pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
            })
        order = np.lexsort((t, k))
        k, t = k[order], t[order]
        new_key = np.empty(len(k), bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
        starts = np.flatnonzero(new_sess)
        bounds = np.append(starts, len(k))
        n_ev = np.diff(bounds)
        # per-key session ordinal: session index minus the index of the
        # key's FIRST session (a running max over key-start positions)
        first_sess_of_key = np.maximum.accumulate(
            np.where(new_key[starts], np.arange(len(starts)), 0))
        sess_idx = np.arange(len(starts)) - first_sess_of_key
        out = pa.table({
            key: pa.array(k[starts]),
            "session_idx": pa.array(sess_idx.astype(np.int64)),
            "session_start": pa.array(t[starts]).cast(pa.timestamp("us")),
            "session_end": pa.array(t[bounds[1:] - 1]).cast(pa.timestamp("us")),
            "n_events": pa.array(n_ev.astype(np.int64)),
        })
        return out

    return (events.map_batches(tag, batch_format="pyarrow")
            .groupby("part").map_groups(sessions, batch_format="pyarrow"))
