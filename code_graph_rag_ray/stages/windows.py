"""Event-stream windowed aggregates (streaming-shaped semantics, §2.8).

Ray Data has no event-time windows; per the reference's model (watch mode is
incremental recompute, not stream processing — ``realtime_updater.py``), a
"stream" here is an ordered, partitioned log: assign each event to a window
in a stateless vectorized pass, then aggregate (two-phase) — tumbling
windows need no cross-row state. Session windows sort within key groups
(``groupby(key).map_groups`` over ts-sorted events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.stages.relational import partial_groupby_sum


def tumbling_window_agg(
    events: Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_s: int = 3600,
) -> Dataset:
    """(key, window_start, n_events, sum_value) per tumbling window.

    ``window_start`` is int64 epoch SECONDS, epoch-aligned
    (``floor(epoch/window)*window``) — kept integral end-to-end because
    timestamp columns change resolution when they round-trip through
    shuffle/pandas boundaries (observed: us→s drift), and the DuckDB oracle
    (``floor(epoch(ts)/w)*w``) is integral too.
    """

    def assign(b: pa.Table) -> pa.Table:
        # normalize to µs explicitly before integer math — the parquet may
        # carry any timestamp resolution
        epoch_us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        win_s = (epoch_us // (window_s * 1_000_000)) * window_s
        return pa.table(
            {
                key_col: b[key_col],
                "window_start": pa.array(win_s, pa.int64()),
                value_col: b[value_col],
            }
        )

    assigned = events.map_batches(assign, batch_format="pyarrow")
    return partial_groupby_sum(
        assigned,
        [key_col, "window_start"],
        {value_col: "sum_value"},
        count_alias="n_events",
    )


def session_windows(
    events: Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_s: int = 1800,
) -> Dataset:
    """(key, session_start, session_end, n_events) with gap-based sessions.

    Partition by key, sort by ts within the group, split where the gap
    exceeds ``gap_s`` — the documented ordering assumption: all of one key's
    events co-locate in its group (ray_guide streaming-shaped pattern).
    """

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        # gap test at full µs precision; output floored to epoch seconds
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ts = ts_us // 1_000_000
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (ts_us[1:] - ts_us[:-1]) > gap_s * 1_000_000
        sid = np.cumsum(new_session)
        g = g.assign(__sid=sid, __ts_s=ts)
        out = (
            g.groupby("__sid")
            .agg(
                session_start=("__ts_s", "min"),
                session_end=("__ts_s", "max"),
                n_events=("__ts_s", "size"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return events.groupby(key_col).map_groups(sessions, batch_format="pandas")
