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


def session_windows(ds, gap_minutes: int = 30):
    """Per-user session stats: a session breaks when the gap to the
    previous event exceeds ``gap_minutes``.
    -> (user_id, n_sessions, n_events, max_session_events)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy())
        starts = np.concatenate(([True], np.diff(ts) > gap))
        session_ids = np.cumsum(starts)
        sizes = np.bincount(session_ids)[1:]
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": np.array([int(starts.sum())], dtype=np.int64),
            "n_events": np.array([len(ts)], dtype=np.int64),
            "max_session_events": np.array([int(sizes.max())], dtype=np.int64),
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def sliding_window_counts(ds, window_minutes: int = 60, slide_minutes: int = 15):
    """Per-event-type sliding-window event counts (window w, slide s):
    each event lands in the w/s windows covering it — emitted per batch,
    merged by a keyed sum (combiner-before-shuffle)."""
    from ray.data.aggregate import Sum

    w_us = window_minutes * 60 * 1_000_000
    s_us = slide_minutes * 60 * 1_000_000
    per_event = w_us // s_us

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        last = (ts // s_us) * s_us  # latest window start covering the event
        offs = np.arange(per_event) * s_us
        win_start = (last[:, None] - offs[None, :]).reshape(-1)
        etype = np.repeat(df["event_type"].to_numpy(), per_event)
        out = pd.DataFrame({"event_type": etype, "window_start": win_start})
        return (out.groupby(["event_type", "window_start"], as_index=False)
                .size().rename(columns={"size": "partial"}))

    partials = ds.map_batches(expand, batch_format="pandas")
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("partial", alias_name="n_events"))
