"""Event-stream windowing: tumbling, sliding, and session windows.

Ray Data has no event-time/watermark machinery; the engine treats the
events table as an ordered partitioned log (partition by key, sort by ts
within the group) and implements windows inside ``groupby(key).map_groups``
with vectorized pandas — ordering assumption: one key's events fit one
group (they do by construction of a keyed groupby).  Late data cannot
exist in batch replay; checkpointed resume replaces incremental state
(SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .join import _with_part


def session_windows(ds, gap_minutes: int = 30, num_partitions: int = 16):
    """Per-user session stats: a session breaks when the gap to the
    previous event exceeds ``gap_minutes``.
    -> (user_id, n_sessions, n_events, max_session_events).

    Users shuffle inside COARSE hash partitions; within a part the whole
    sessionization is one vectorized pass over (user, ts)-sorted events —
    session starts are `user changed OR gap exceeded`, per-session sizes
    come from one bincount — instead of a per-user ``map_groups`` whose
    per-key Python dispatch dominates at millions of users."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        # shared partition-key scheme (same hash as the join stages)
        return _with_part(df, ["user_id"], num_partitions, "a")

    def sessionize_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=g["user_id"].dtype),
                "n_sessions": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
                "max_session_events": pd.Series(dtype=np.int64)})
        g = g.sort_values(["user_id", "ts"])
        users = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.concatenate(([True], users[1:] != users[:-1]))
        big_gap = np.concatenate(([True], np.diff(ts) > gap))
        starts = new_user | big_gap
        session_ids = np.cumsum(starts)          # 1-based, global in part
        sizes = np.bincount(session_ids)[1:]      # events per session
        # per-user reduction: first/last session id per user row-run
        run_starts = np.flatnonzero(new_user)
        run_ends = np.concatenate((run_starts[1:], [len(users)]))
        first_sid = session_ids[run_starts]
        last_sid = session_ids[run_ends - 1]
        max_sizes = np.maximum.reduceat(sizes, first_sid - 1)
        return pd.DataFrame({
            "user_id": users[run_starts],
            "n_sessions": (last_sid - first_sid + 1).astype(np.int64),
            "n_events": (run_ends - run_starts).astype(np.int64),
            "max_session_events": max_sizes.astype(np.int64),
        })

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(sessionize_part, batch_format="pandas"))


def sliding_window_counts(ds, window_minutes: int = 60, slide_minutes: int = 15):
    """Per-event-type sliding-window event counts (window w, slide s):
    each event lands in the w/s windows covering it — emitted per batch,
    merged by a keyed sum (combiner-before-shuffle)."""
    from ray.data.aggregate import Sum

    w_us = window_minutes * 60 * 1_000_000
    s_us = slide_minutes * 60 * 1_000_000
    # ceil, not floor: when the slide does not divide the window an event
    # is covered by up to ceil(w/s) starts (floor would silently drop one
    # covering window per event); the coverage mask below trims any
    # generated start whose window actually ends at or before the event
    per_event = -(-w_us // s_us)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        last = (ts // s_us) * s_us  # latest window start covering the event
        offs = np.arange(per_event) * s_us
        win_start = (last[:, None] - offs[None, :]).reshape(-1)
        ts_rep = np.repeat(ts, per_event)
        covered = win_start + w_us > ts_rep
        etype = np.repeat(df["event_type"].to_numpy(), per_event)
        out = pd.DataFrame({"event_type": etype[covered],
                            "window_start": win_start[covered]})
        return (out.groupby(["event_type", "window_start"], as_index=False)
                .size().rename(columns={"size": "partial"}))

    partials = ds.map_batches(expand, batch_format="pandas")
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("partial", alias_name="n_events"))
