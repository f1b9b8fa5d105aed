"""Watch-mode debounce policy (§2.8 analog of ``realtime_updater.py:88-163``).

The reference's watcher coalesces file events per path with a quiet-period
timer plus a max-wait override: an event (re)starts the quiet timer; when
``quiet_s`` elapses with no new event the path is processed (all pending
events coalesced, last-event-wins); a path receiving a continuous event
stream is force-processed ``max_wait_s`` after its FIRST pending event so
a chatty path can't starve forever.

Batch translation: this is incremental-recompute scheduling, not stream
processing (SURVEY.md §2.8) — given an event log, compute WHEN each path
would have been processed and how many events each processing coalesced.
Per-path ``map_groups`` over ts-sorted events, the same partitioning shape
as session windows; per-path event counts bound the sequential scan.
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset


def _debounce_one(ts: list[int], quiet_s: int, max_wait_s: int):
    """Sequential debounce over one path's sorted event times (int64 s).

    Returns rows (process_ts, n_events, forced). ``forced`` marks firings
    driven by the max-wait override rather than quiet-period expiry.
    """
    out = []
    pending_start: int | None = None
    last: int | None = None
    n = 0
    for t in ts:
        if pending_start is None:
            pending_start, last, n = t, t, 1
            continue
        fire_quiet = last + quiet_s
        fire_force = pending_start + max_wait_s
        fire = min(fire_quiet, fire_force)
        if t >= fire:
            out.append((fire, n, fire_force < fire_quiet))
            pending_start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    if pending_start is not None:
        fire_quiet = last + quiet_s
        fire_force = pending_start + max_wait_s
        fire = min(fire_quiet, fire_force)
        out.append((fire, n, fire_force < fire_quiet))
    return out


def debounce_events(
    events: Dataset,
    *,
    quiet_s: int,
    max_wait_s: int,
    path_col: str = "path",
    ts_col: str = "ts",
) -> Dataset:
    """events(path, ts) → (path, process_ts, n_events, forced).

    Timestamps are handled as int64 epoch seconds (timestamp columns change
    resolution across shuffle/pandas boundaries — NOTES.md invariant).
    """

    def per_path(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col]
        if str(ts.dtype).startswith("datetime"):
            # unit-safe epoch seconds: pandas may deliver datetime64[us]
            # (not [ns]) from Arrow, so a fixed // 1e9 would be off by 1000
            ts = ts.to_numpy().astype("datetime64[s]").astype("int64")
        fired = _debounce_one(sorted(int(t) for t in ts), quiet_s, max_wait_s)
        return pd.DataFrame(
            {path_col: [g[path_col].iloc[0]] * len(fired),
             "process_ts": [f[0] for f in fired],
             "n_events": [f[1] for f in fired],
             "forced": [f[2] for f in fired]}
        )

    return events.groupby(path_col).map_groups(per_path, batch_format="pandas")
