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


def hopping_window_agg(
    events: Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_s: int = 3600,
    hop_s: int = 900,
) -> Dataset:
    """(key, window_start, n_events, sum_value) per hopping/sliding window.

    Each event lands in every hop-aligned window covering it
    (``window_s / hop_s`` windows): membership is computed in integer µs
    (k ∈ [⌊(t−size)/hop⌋+1, ⌊t/hop⌋]) and the replication is one
    vectorized ``np.repeat`` — no per-row loop, no cross-row state — then
    the same two-phase grouped sum as tumbling. The expansion multiplies
    rows by size/hop BEFORE the combiner, but the partials stay one row
    per (key, window) per block, so the shuffle is no bigger than
    tumbling's at the same window granularity.
    """
    size_us = window_s * 1_000_000
    hop_us = hop_s * 1_000_000

    def assign(b: pa.Table) -> pa.Table:
        t_us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        k_hi = t_us // hop_us
        k_lo = (t_us - size_us) // hop_us + 1
        counts = k_hi - k_lo + 1
        total = int(counts.sum())
        rows = np.repeat(np.arange(len(t_us)), counts)
        starts = np.zeros(len(t_us), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        k = np.repeat(k_lo, counts) + (np.arange(total) - np.repeat(starts, counts))
        idx = pa.array(rows, pa.int64())
        return pa.table(
            {
                key_col: pc.take(b[key_col], idx),
                "window_start": pa.array(k * hop_s, pa.int64()),
                value_col: pc.take(b[value_col], idx),
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


def session_windows_chunked(
    events: Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_s: int = 1800,
    chunk_s: int = 86400,
    num_buckets: int | None = None,
) -> Dataset:
    """Skew-safe sessionization, bit-identical to :func:`session_windows`.

    A whale key (one user carrying a large share of the events) makes the
    per-key ``map_groups`` a single giant task. Standard two-phase split:

    1. sessionize within ``(key, time-chunk)`` groups — chunk = epoch-µs
       floor-divided by ``chunk_s`` (must be ≥ ``gap_s``), so the whale's
       events spread over ``span/chunk_s`` tasks; local sessions are maximal
       within their chunk and carry µs-precision bounds,
    2. merge per key over the SESSION summaries (3 ints each — bounded by
       session count, not event count): sorted by start, a session whose
       start is within ``gap_s`` of the previous end continues it (only
       chunk-boundary-adjacent sessions can merge, chained merges handle a
       session spanning many chunks).

    Output is floored to epoch seconds at the very end, like the plain
    version (µs precision is kept through BOTH phases — flooring before the
    merge would change gap decisions).
    """
    if chunk_s < gap_s:
        raise ValueError("chunk_s must be >= gap_s")

    gap_us = gap_s * 1_000_000
    from code_graph_rag_ray.functions.hashing import partition_ids

    if num_buckets is None:
        try:
            import ray

            num_buckets = max(32, 2 * int(ray.cluster_resources().get("CPU", 16)))
        except Exception:  # pragma: no cover
            num_buckets = 32

    # Both phases run as BUCKETED cogroups (one UDF call per hash bucket,
    # vectorized over every group inside) instead of per-(key,chunk)
    # map_groups: Ray's map_groups invokes the UDF once per GROUP, and at
    # ~4k groups the per-call pandas overhead dominated the whole stage
    # (measured 19 s → ~4 s on the sf0.01 events table).

    def assign_chunk(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        chunk = pc.divide(ts_us, chunk_s * 1_000_000)
        g = pc.binary_join_element_wise(
            pc.cast(b[key_col], pa.string()), pc.cast(chunk, pa.string()), "|"
        )
        return pa.table(
            {key_col: b[key_col], "__ts_us": ts_us, "__chunk": chunk,
             "__b": pa.array(partition_ids(g, num_buckets))}
        )

    def local_sessions(g: pd.DataFrame) -> pd.DataFrame:
        # whole bucket: many (key, chunk) groups, fully vectorized
        g = g.sort_values([key_col, "__chunk", "__ts_us"], kind="mergesort")
        ts = g["__ts_us"].to_numpy()
        kv = g[key_col].to_numpy()
        ch = g["__chunk"].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = (
            (kv[1:] != kv[:-1]) | (ch[1:] != ch[:-1])
            | ((ts[1:] - ts[:-1]) > gap_us)
        )
        st = np.flatnonzero(new)
        en = np.r_[st[1:], n] - 1
        return pd.DataFrame(
            {
                key_col: kv[st],
                "start_us": ts[st],
                "end_us": ts[en],
                "n_events": np.diff(np.r_[st, n]).astype(np.int64),
            }
        )

    def add_key_bucket(b: pa.Table) -> pa.Table:
        ids = partition_ids(pc.cast(b[key_col], pa.string()), num_buckets)
        return b.append_column("__b2", pa.array(ids))

    def merge_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "start_us", "end_us"], kind="mergesort")
        kv = g[key_col].to_numpy()
        starts = g["start_us"].to_numpy()
        ends = g["end_us"].to_numpy()
        nn = g["n_events"].to_numpy()
        # local sessions never overlap (chunk-disjoint), so within a key the
        # running-max of end == previous end in sorted order
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = (kv[1:] != kv[:-1]) | ((starts[1:] - ends[:-1]) > gap_us)
        st = np.flatnonzero(new)
        en = np.r_[st[1:], n] - 1
        return pd.DataFrame(
            {
                key_col: kv[st],
                "session_start": starts[st] // 1_000_000,
                "session_end": ends[en] // 1_000_000,
                "n_events": np.add.reduceat(nn, st).astype(np.int64),
            }
        )

    local = (
        events.map_batches(assign_chunk, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(local_sessions, batch_format="pandas")
    )
    return (
        local.map_batches(add_key_bucket, batch_format="pyarrow")
        .groupby("__b2")
        .map_groups(merge_sessions, batch_format="pandas")
    )


def sliding_time_sum(
    events: Dataset,
    *,
    id_col: str = "event_id",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value_cents",
    window_s: int = 3600,
    chunk_s: int | None = None,
) -> Dataset:
    """Per-key sliding-window sum: for every event, the sum of ``value_col``
    over that key's events in ``[ts - window, ts]`` (RANGE semantics — all
    equal-ts peers included, so the result is order-free and, with integer
    values, bit-exact vs ``sum(v) OVER (PARTITION BY key ORDER BY ts RANGE
    BETWEEN INTERVAL w PRECEDING AND CURRENT ROW)``).

    Scale shape: ONE shuffle. Events are bucketed by time chunk
    (``chunk_s ≥ window_s``, so a window spans at most the previous chunk);
    each row is also replicated as a context-only copy into the NEXT chunk
    iff its timestamp lies within ``window_s`` of the boundary (bounded ≤2×
    replication, usually far less). Each chunk group then answers all its
    real rows with a sorted prefix-sum + per-key searchsorted — vectorized,
    no per-row Python. A whale key spreads across time chunks, unlike a
    groupby(key) formulation.
    """
    if chunk_s is None:
        chunk_s = window_s
    if chunk_s < window_s:
        raise ValueError("chunk_s must be >= window_s (window spans ≤2 chunks)")
    w_us = window_s * 1_000_000
    c_us = chunk_s * 1_000_000

    def assign_chunk(b: pa.Table) -> pa.Table:
        epoch_us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        chunk = epoch_us // c_us
        base = pa.table(
            {
                "__chunk": pa.array(chunk, pa.int64()),
                "__real": pa.array(np.ones(len(chunk), np.int8)),
                id_col: b[id_col],
                key_col: b[key_col],
                "ts_us": pa.array(epoch_us, pa.int64()),
                value_col: b[value_col],
            }
        )
        # context copy into the next chunk, only for rows near the boundary
        need = epoch_us >= (chunk + 1) * c_us - w_us
        sel = pa.array(need)
        ctx = base.filter(sel)
        ctx = ctx.set_column(0, "__chunk", pc.add(ctx["__chunk"], 1))
        ctx = ctx.set_column(
            1, "__real", pa.array(np.zeros(ctx.num_rows, np.int8))
        )
        return pa.concat_tables([base, ctx])

    def answer(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "ts_us"], kind="mergesort").reset_index(drop=True)
        keys = g[key_col].to_numpy()
        ts = g["ts_us"].to_numpy(np.int64)
        vals = g[value_col].to_numpy(np.int64)
        csum = np.concatenate([[0], np.cumsum(vals)])
        n = len(g)
        out_rows = g["__real"].to_numpy() == 1
        # window [ts-w, ts]: left = first idx in the key segment with
        # ts >= ts_i - w; right = last idx with ts <= ts_i (peers included)
        lo = np.empty(n, np.int64)
        hi = np.empty(n, np.int64)
        new_key = np.ones(n, bool)
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            seg_ts = ts[s:e]
            lo[s:e] = s + np.searchsorted(seg_ts, seg_ts - w_us, side="left")
            hi[s:e] = s + np.searchsorted(seg_ts, seg_ts, side="right")
        w_sum = csum[hi] - csum[lo]
        w_n = hi - lo
        out = pd.DataFrame(
            {
                id_col: g[id_col],
                key_col: g[key_col],
                "ts_us": g["ts_us"],
                "w_sum": w_sum,
                "w_n": w_n.astype(np.int64),
            }
        )
        return out[out_rows].reset_index(drop=True)

    return (
        events.map_batches(assign_chunk, batch_format="pyarrow")
        .groupby("__chunk")
        .map_groups(answer, batch_format="pandas")
    )


def running_total_per_key(
    events: Dataset,
    *,
    id_col: str = "event_id",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value_c",
    chunk_s: int = 86400,
) -> Dataset:
    """Per-key cumulative running total: for every event, the sum of
    ``value_col`` over ALL of that key's events with ``ts' <= ts`` — SQL's
    ``sum(v) OVER (PARTITION BY key ORDER BY ts)`` with its default RANGE
    frame (equal-ts peers included), so the result is order-free and, with
    integer values, bit-exact vs the oracle.

    The unbounded-frame companion of :func:`sliding_time_sum`. An
    unbounded window cannot use bounded context replication, so the carry
    crosses time chunks as SUMMARIES instead (the asof-join carry
    discipline): one grouped sum builds per-(key, chunk) totals (rows =
    keys × chunks, never event-scale); a per-key exclusive prefix over
    those totals gives each chunk its carry-in offset; one bucketed join
    hands offsets back to the event rows; the local RANGE prefix is then
    computed INSIDE the join's bucket blocks (hash(key|chunk) cogroups
    arrive whole, so a ``batch_size=None`` map segments and cumsums
    vectorized — no second event-scale shuffle). A whale key spreads over
    its time chunks end to end.
    """
    from code_graph_rag_ray.stages.relational import bucketed_join, partial_groupby_sum

    c_us = chunk_s * 1_000_000

    def assign_chunk(b: pa.Table) -> pa.Table:
        epoch_us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        chunk = np.floor_divide(epoch_us, c_us)
        kc = pc.binary_join_element_wise(
            pc.cast(b[key_col], pa.string()),
            pa.array(chunk.astype("U"), pa.string()),
            "|",
        )
        return pa.table(
            {
                id_col: b[id_col],
                key_col: b[key_col],
                "__chunk": pa.array(chunk, pa.int64()),
                "__kc": kc,
                "ts_us": pa.array(epoch_us, pa.int64()),
                value_col: b[value_col],
            }
        )

    assigned = events.map_batches(assign_chunk, batch_format="pyarrow")

    totals = partial_groupby_sum(
        assigned.select_columns([key_col, "__chunk", value_col]),
        [key_col, "__chunk"],
        {value_col: "__tot"},
    )

    def offsets_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__chunk", kind="mergesort").reset_index(drop=True)
        tot = g["__tot"].to_numpy(np.int64)
        off = np.cumsum(tot) - tot  # exclusive prefix: carry-in per chunk
        return pd.DataFrame(
            {
                "__kc": g[key_col].astype(str) + "|" + g["__chunk"].astype(str),
                "__off": off.astype(np.int64),
            }
        )

    offsets = totals.groupby(key_col).map_groups(offsets_per_key, batch_format="pandas")

    joined = bucketed_join(
        assigned, offsets, on="__kc",
        left_schema=pa.schema(
            [(id_col, pa.int64()), (key_col, pa.int64()), ("__chunk", pa.int64()),
             ("__kc", pa.string()), ("ts_us", pa.int64()), (value_col, pa.int64())]
        ),
        right_schema=pa.schema([("__kc", pa.string()), ("__off", pa.int64())]),
    )

    def local_prefix(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 key_col: pd.Series([], dtype="int64"),
                 "ts_us": pd.Series([], dtype="int64"),
                 value_col: pd.Series([], dtype="int64"),
                 "run": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["__kc", "ts_us"], kind="mergesort").reset_index(drop=True)
        kc = g["__kc"].to_numpy()
        ts = g["ts_us"].to_numpy(np.int64)
        v = g[value_col].to_numpy(np.int64)
        n = len(g)
        cs = np.cumsum(v)
        # segment starts (per key|chunk group inside this bucket block)
        new_seg = np.ones(n, bool)
        new_seg[1:] = kc[1:] != kc[:-1]
        starts = np.flatnonzero(new_seg)
        lens = np.diff(np.r_[starts, n])
        seg_base = np.repeat(np.r_[0, cs[starts[1:] - 1]], lens)
        # RANGE peers: every row takes the cumsum at the LAST row of its
        # (segment, ts) run
        last = np.ones(n, bool)
        last[:-1] = (ts[1:] != ts[:-1]) | new_seg[1:]
        ends = np.flatnonzero(last)
        run_lens = np.diff(np.r_[-1, ends])
        local_run = np.repeat(cs[ends], run_lens) - seg_base
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(np.int64),
             key_col: g[key_col].to_numpy(np.int64),
             "ts_us": ts,
             value_col: v,
             "run": (local_run + g["__off"].to_numpy(np.int64)).astype(np.int64)}
        )

    return joined.map_batches(local_prefix, batch_format="pandas", batch_size=None)


def lag_per_key(
    events: Dataset,
    *,
    id_col: str = "event_id",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value_c",
    chunk_s: int = 86400,
    direction: str = "lag",
) -> Dataset:
    """Per-key LAG: for every event, the previous event's value under
    ``ORDER BY ts, id`` within the key (SQL ``lag(v) OVER (PARTITION BY
    key ORDER BY ts, id)``); the id tiebreak makes equal-ts order — and
    therefore the result — deterministic. Output ``prev`` is -1 for each
    key's first row (sentinel, dtype-stable like events_attribution).

    Chunked like :func:`running_total_per_key`, but the cross-chunk state
    is one BOUNDARY ROW per (key, chunk): a two-phase pick keeps each
    chunk's last (ts, id) row (batch-local pick first, so the exchange is
    O(keys × chunks)); a per-key pass over those summaries assigns each
    chunk its predecessor's boundary row; one bucketed join hands the
    carry back; the local lag then runs inside the join's bucket blocks.
    A whale key spreads over its time chunks end to end.

    ``direction="lead"`` flips every step (first boundary row per chunk,
    carry from the NEXT chunk, next-value local fold; output column
    ``next``) — SQL ``lead()`` under the same deterministic order.
    """
    assert direction in ("lag", "lead")
    lead = direction == "lead"
    out_name = "next" if lead else "prev"
    from code_graph_rag_ray.stages.relational import bucketed_join

    c_us = chunk_s * 1_000_000

    def assign_chunk(b: pa.Table) -> pa.Table:
        epoch_us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        chunk = np.floor_divide(epoch_us, c_us)
        kc = pc.binary_join_element_wise(
            pc.cast(b[key_col], pa.string()),
            pa.array(chunk.astype("U"), pa.string()),
            "|",
        )
        return pa.table(
            {
                id_col: b[id_col],
                key_col: b[key_col],
                "__chunk": pa.array(chunk, pa.int64()),
                "__kc": kc,
                "ts_us": pa.array(epoch_us, pa.int64()),
                value_col: b[value_col],
            }
        )

    assigned = events.map_batches(assign_chunk, batch_format="pyarrow")

    def local_last(b: pa.Table) -> pa.Table:
        # batch-local: keep each (key, chunk)'s max-(ts, id) row
        if b.num_rows == 0:
            return pa.table(
                {key_col: pa.array([], pa.int64()),
                 "__chunk": pa.array([], pa.int64()),
                 "__ord": pa.array([], pa.int64()),
                 "__id": pa.array([], pa.int64()),
                 "__bv": pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            b, sort_keys=[(key_col, "ascending"), ("__chunk", "ascending"),
                          ("ts_us", "ascending"), (id_col, "ascending")]
        )
        s = b.take(idx)
        keys = s[key_col].to_numpy(zero_copy_only=False)
        chunks = s["__chunk"].to_numpy(zero_copy_only=False)
        sel = np.ones(s.num_rows, bool)
        if lead:  # FIRST (min ts, id) row of each (key, chunk) run
            sel[1:] = (keys[1:] != keys[:-1]) | (chunks[1:] != chunks[:-1])
        else:  # LAST row of each run
            sel[:-1] = (keys[1:] != keys[:-1]) | (chunks[1:] != chunks[:-1])
        f = s.filter(pa.array(sel))
        return pa.table(
            {key_col: f[key_col], "__chunk": f["__chunk"],
             "__ord": f["ts_us"], "__id": f[id_col], "__bv": f[value_col]}
        )

    partial_last = assigned.map_batches(local_last, batch_format="pyarrow")

    def pick_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__ord", "__id"], kind="mergesort")
        return g.head(1) if lead else g.tail(1)

    bounds = partial_last.groupby([key_col, "__chunk"]).map_groups(
        pick_last, batch_format="pandas"
    )

    def carries_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__chunk", kind="mergesort").reset_index(drop=True)
        if len(g) < 2:
            return pd.DataFrame({"__kc": pd.Series([], dtype="object"),
                                 "__cts": pd.Series([], dtype="int64"),
                                 "__cid": pd.Series([], dtype="int64"),
                                 "__cv": pd.Series([], dtype="int64")})
        # chunk i receives its predecessor's boundary row (successor's
        # for lead)
        kc_all = g[key_col].astype(str) + "|" + g["__chunk"].astype(str)
        kc_side = kc_all.iloc[:-1] if lead else kc_all.iloc[1:]
        val_slice = slice(1, None) if lead else slice(None, -1)
        return pd.DataFrame(
            {"__kc": kc_side.to_numpy(),
             "__cts": g["__ord"].iloc[val_slice].to_numpy(np.int64),
             "__cid": g["__id"].iloc[val_slice].to_numpy(np.int64),
             "__cv": g["__bv"].iloc[val_slice].to_numpy(np.int64)}
        )

    carries = bounds.groupby(key_col).map_groups(carries_per_key, batch_format="pandas")

    joined = bucketed_join(
        assigned, carries, on="__kc", how="left",
        left_schema=pa.schema(
            [(id_col, pa.int64()), (key_col, pa.int64()), ("__chunk", pa.int64()),
             ("__kc", pa.string()), ("ts_us", pa.int64()), (value_col, pa.int64())]
        ),
        right_schema=pa.schema(
            [("__kc", pa.string()), ("__cts", pa.int64()),
             ("__cid", pa.int64()), ("__cv", pa.int64())]
        ),
    )

    def local_lag(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 key_col: pd.Series([], dtype="int64"),
                 "ts_us": pd.Series([], dtype="int64"),
                 value_col: pd.Series([], dtype="int64"),
                 out_name: pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["__kc", "ts_us", id_col], kind="mergesort").reset_index(drop=True)
        kc = g["__kc"].to_numpy()
        v = g[value_col].to_numpy(np.int64)
        nbr = np.empty(len(g), np.int64)
        edge = np.ones(len(g), bool)  # rows that take the carry
        if lead:
            nbr[:-1] = v[1:]
            edge[:-1] = kc[1:] != kc[:-1]  # last row of each segment
        else:
            nbr[1:] = v[:-1]
            edge[1:] = kc[1:] != kc[:-1]   # first row of each segment
            edge[0] = True
        # carry (__cv) is per-__kc constant; -1 when absent (key edge)
        cv = g["__cv"].to_numpy()
        carry = np.where(np.isnan(cv.astype(np.float64)), -1,
                         np.nan_to_num(cv.astype(np.float64))).astype(np.int64)
        nbr[edge] = carry[edge]
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(np.int64),
             key_col: g[key_col].to_numpy(np.int64),
             "ts_us": g["ts_us"].to_numpy(np.int64),
             value_col: v,
             out_name: nbr}
        )

    return joined.map_batches(local_lag, batch_format="pandas", batch_size=None)


def entity_timeline(
    ds: Dataset,
    *,
    entity_col: str = "surface",
    ts_col: str = "ts_us",
    weight_col: str | None = None,
    window_s: int = 86_400,
) -> Dataset:
    """Temporal bookkeeping per entity — first/last sighting, total
    mentions, and the number of DISTINCT tumbling windows the entity is
    active in (burst-vs-evergreen signal for KG curation; the reference
    tracks per-node updated_at bookkeeping on every re-ingest, this is the
    corpus-wide batch analog).

    One composite-key two-phase pass, no joins: batch combiner folds
    (entity, window) → (min, max, sum), the grouped reduce folds windows,
    then a second window-scale groupby folds per entity — so a whale
    entity exchanges O(blocks × its windows) rows, never its mention
    count, and the distinct-window count falls out of the first fold for
    free. Timestamps are int64 epoch µs throughout (NOTES.md: timestamp
    columns drift resolution across shuffle/pandas boundaries).

    Output: (entity, first_us, last_us, n_mentions, n_windows).
    """
    from ray.data.aggregate import Max, Min, Sum

    win_us = int(window_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks() if isinstance(b[ts_col], pa.ChunkedArray) else b[ts_col]
        ts64 = pc.cast(ts, pa.int64())
        win = pc.divide(ts64, win_us)  # ts ≥ 0: trunc == floor division
        w = (pc.cast(b[weight_col], pa.int64()) if weight_col
             else pa.array(np.ones(b.num_rows, np.int64)))
        t = pa.table({entity_col: b[entity_col], "win": win,
                      "ts": ts64, "n": w})
        g = pa.TableGroupBy(t, [entity_col, "win"], use_threads=False).aggregate(
            [("ts", "min"), ("ts", "max"), ("n", "sum")])
        return pa.table({
            entity_col: g[entity_col], "win": g["win"],
            "mn": g["ts_min"], "mx": g["ts_max"],
            "n": pc.cast(g["n_sum"], pa.int64()),
        })

    per_window = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([entity_col, "win"])
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
                   Sum("n", alias_name="n"))
    )

    def fold(b: pa.Table) -> pa.Table:
        # batch combiner: per-entity partials (an entity's window rows can
        # straddle blocks after the shuffle, so a grouped reduce follows)
        g = pa.TableGroupBy(b, [entity_col], use_threads=False).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum"), ([], "count_all")])
        return pa.table({
            entity_col: g[entity_col],
            "first_us": g["mn_min"], "last_us": g["mx_max"],
            "n_mentions": pc.cast(g["n_sum"], pa.int64()),
            "n_windows": pc.cast(g["count_all"], pa.int64()),
        })

    return (
        per_window.map_batches(fold, batch_format="pyarrow")
        .groupby(entity_col)
        .aggregate(Min("first_us", alias_name="first_us"),
                   Max("last_us", alias_name="last_us"),
                   Sum("n_mentions", alias_name="n_mentions"),
                   Sum("n_windows", alias_name="n_windows"))
    )


def cohort_retention(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    window_s: int = 7 * 86_400,
) -> Dataset:
    """Cohort retention matrix: users bucketed by FIRST-SEEN window, counted
    as active per (cohort, activity-window) — the classic retention
    triangle, distributed.

    Two-phase shape, no whale exposure: (key, window) pairs dedup in a
    batch combiner then ONE grouped min computes both each key's cohort
    (min window) and its distinct activity windows; a second combiner-first
    count folds (cohort, window) cells. The key→cohort attachment is a
    bucketed cogroup join (both sides key-scale — never a broadcast).
    Output: (cohort_win, win, n_active) int64 window indices (µs // window).
    """
    from ray.data.aggregate import Min

    from code_graph_rag_ray.stages.relational import bucketed_join, partial_groupby_sum

    win_us = int(window_s) * 1_000_000

    def pairs(b: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: b[key_col],
            "win": pc.divide(pc.cast(b[ts_col], pa.int64()), win_us),
        })
        g = pa.TableGroupBy(t, [key_col, "win"], use_threads=False).aggregate([])
        return g

    from code_graph_rag_ray.stages.materialize import exact_dedup

    kw = exact_dedup(
        ds.map_batches(pairs, batch_format="pyarrow"),
        keys=[key_col, "win"], columns=[key_col, "win"],
    ).materialize()  # distinct (key, window); feeds both branches below
    cohorts = (
        kw.groupby(key_col).aggregate(Min("win", alias_name="cohort_win"))
    )
    joined = bucketed_join(
        kw, cohorts, on=key_col,
        left_schema=pa.schema([(key_col, pa.int64()), ("win", pa.int64())]),
        right_schema=pa.schema([(key_col, pa.int64()),
                                ("cohort_win", pa.int64())]),
    )
    return partial_groupby_sum(
        joined.select_columns(["cohort_win", "win"]),
        ["cohort_win", "win"], {}, count_alias="n_active",
    )


def transition_counts(
    events: Dataset,
    *,
    id_col: str = "event_id",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    count_alias: str = "n_transitions",
    chunk_s: int = 86400,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-key Markov transition matrix: counts of (previous type → type)
    over each key's event sequence under ``ORDER BY ts, id`` (SQL
    ``lag(type) OVER (PARTITION BY key ORDER BY ts, id)`` → group count).

    Bigram counting doesn't need a per-event LAG: counting commutes with
    chunking, so ONE (key, time-chunk)-bucketed exchange co-locates each
    key-chunk's events, a vectorized in-group pass emits the chunk-local
    (prev, next) counts PLUS one boundary row per (key, chunk) — its
    first and last type under the deterministic (ts, id) order — and a
    second, O(keys × chunks)-sized pass stitches consecutive nonempty
    chunks of the same key into the cross-chunk transitions. Counts fold
    through the two-phase grouped sum. Compare :func:`lag_per_key`
    (which this replaced here): that design hands a carry row back to
    every event via a bucketed join — a second O(events) exchange this
    query never needs (measured 19 s → ~4 s at sf0.1, 32 cpus).

    A whale key spreads over its time chunks end to end (same
    ``chunk_s`` contract as the other chunked window ops). NULL types
    are excluded up front — SQL's lag/GROUP BY would keep NULL rows;
    adjacency bridges across the dropped rows (the documented semantics;
    the oracle drops them inside its lagged CTE too).

    cgr analog: call-sequence edges — the reference links each call site
    to its predecessor in the function body (``call_processor``'s ordered
    call list); re-targeted as the event-stream bigram/transition counts
    a session-modeling pipeline needs.
    """
    from code_graph_rag_ray.functions.hashing import partition_ids

    if num_buckets is None:
        try:
            import ray

            num_buckets = 2 * int(ray.cluster_resources().get("CPU", 16))
        except Exception:  # pragma: no cover
            num_buckets = 32
    c_us = chunk_s * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b[type_col]))
        epoch_us = pc.cast(
            pc.cast(f[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        chunk = np.floor_divide(epoch_us, c_us)
        kc = pc.binary_join_element_wise(
            pc.cast(f[key_col], pa.string()),
            pa.array(chunk.astype("U"), pa.string()), "|",
        )
        return pa.table(
            {key_col: pc.cast(f[key_col], pa.string()),
             "__chunk": pa.array(chunk, pa.int64()),
             "ts_us": pa.array(epoch_us, pa.int64()),
             id_col: f[id_col], type_col: f[type_col],
             "__bk": pa.array(partition_ids(kc, num_buckets), pa.int32())}
        )

    def local_bigrams(g: pd.DataFrame) -> pd.DataFrame:
        # one frame, two row kinds (a mixed-type union would fail at
        # execution, NOTES facts 14/23): kind "c" = chunk-local counts,
        # kind "b" = per-(key, chunk) boundary first/last types
        g = g.sort_values([key_col, "__chunk", "ts_us", id_col],
                          kind="mergesort")
        k = g[key_col].to_numpy()
        c = g["__chunk"].to_numpy()
        t = g[type_col].to_numpy()
        same = np.zeros(0, bool)
        if len(g) > 1:
            same = (k[1:] == k[:-1]) & (c[1:] == c[:-1])
        cnt = pd.DataFrame({"prev_type": t[:-1][same],
                            "next_type": t[1:][same]})
        cnt = cnt.groupby(["prev_type", "next_type"], as_index=False).agg(
            n=("prev_type", "size"))
        starts = np.ones(len(g), bool)
        ends = np.ones(len(g), bool)
        if len(g) > 1:
            starts[1:] = ~same
            ends[:-1] = ~same
        bnd = pd.DataFrame(
            {key_col: k[starts], "__chunk": c[starts],
             "first_type": t[starts], "last_type": t[ends]}
        )
        return pd.concat([
            pd.DataFrame(
                {"kind": "c", "prev_type": cnt["prev_type"],
                 "next_type": cnt["next_type"],
                 "n": cnt["n"].astype(np.int64),
                 key_col: None, "__chunk": np.int64(0),
                 "first_type": None, "last_type": None}),
            pd.DataFrame(
                {"kind": "b", "prev_type": None, "next_type": None,
                 "n": np.int64(0), key_col: bnd[key_col],
                 "__chunk": bnd["__chunk"], "first_type": bnd["first_type"],
                 "last_type": bnd["last_type"]}),
        ], ignore_index=True)

    # the ONLY O(events) exchange; its output is O(buckets × T² +
    # keys × chunks) — small — so materializing lets the two consumers
    # below split it without re-running the shuffle
    mixed = (
        events.map_batches(prep, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(local_bigrams, batch_format="pandas")
        .materialize()
    )

    local_cnt = mixed.map_batches(
        lambda df: df.loc[df["kind"] == "c",
                          ["prev_type", "next_type", "n"]],
        batch_format="pandas",
    )

    def stitch(df: pd.DataFrame) -> pd.DataFrame:
        # consecutive NONEMPTY chunks of a key: last(type) → first(type)
        df = df.sort_values([key_col, "__chunk"], kind="mergesort")
        k = df[key_col].to_numpy()
        if len(df) < 2:
            return pd.DataFrame(
                {"prev_type": pd.Series([], dtype=object),
                 "next_type": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)})
        same = k[1:] == k[:-1]
        cnt = pd.DataFrame(
            {"prev_type": df["last_type"].to_numpy()[:-1][same],
             "next_type": df["first_type"].to_numpy()[1:][same]})
        return cnt.groupby(["prev_type", "next_type"], as_index=False).agg(
            n=("prev_type", "size")).astype({"n": np.int64})

    cross_cnt = (
        mixed.map_batches(
            lambda df: df.loc[df["kind"] == "b",
                              [key_col, "__chunk", "first_type",
                               "last_type"]].assign(
                __kb=lambda d: pd.util.hash_array(
                    d[key_col].to_numpy(dtype=object)
                ).astype(np.int64) % 32),
            batch_format="pandas",
        )
        .groupby("__kb")
        .map_groups(stitch, batch_format="pandas")
    )

    return partial_groupby_sum(
        local_cnt.union(cross_cnt), ["prev_type", "next_type"],
        {"n": count_alias},
    )


def strict_funnel(
    events: Dataset,
    steps: list[str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets: int = 64,
) -> Dataset:
    """Strict-order funnel: how many keys performed step 1, then step 2
    STRICTLY after their first step 1, then step 3 strictly after that
    first step 2, … (SQL: chained ``min(ts) … WHERE ts > prev_step_ts``
    per key). Returns one row per step: (step, n_keys), step labelled
    ``<i>_<type>`` so the output orders by funnel position.

    Scale shape: rows not in the step set are dropped at the scan; ONE
    key-hash bucket shuffle (64-ish groups — never a per-key group, NOTES
    fact 25); inside each bucket the chained first-occurrence times are
    pure vectorized pandas groupby-mins + merges; per-bucket partial
    counts fold through the two-phase grouped sum.
    """
    from code_graph_rag_ray.functions.hashing import partition_ids
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    step_set = pa.array(steps, pa.string())

    def prep(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b[type_col], value_set=step_set))
        bk = partition_ids(pc.cast(f[key_col], pa.string()), num_buckets)
        return pa.table(
            {key_col: f[key_col], ts_col: f[ts_col], type_col: f[type_col],
             "__bk": pa.array(bk, pa.int32())}
        )

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        cur = None  # per-key time of the previous step's first occurrence
        out_steps, out_n = [], []
        for i, st in enumerate(steps):
            rows = g[g[type_col] == st]
            if cur is not None:
                rows = rows.merge(cur, on=key_col)
                rows = rows[rows[ts_col] > rows["__prev"]]
            first = rows.groupby(key_col, as_index=False)[ts_col].min()
            out_steps.append(f"{i + 1}_{st}")
            out_n.append(len(first))
            cur = first.rename(columns={ts_col: "__prev"})
        return pd.DataFrame(
            {"step": out_steps, "n_p": np.asarray(out_n, np.int64)}
        )

    parts = (
        events.map_batches(prep, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(funnel, batch_format="pandas")
    )
    # constant zero seed per step: SQL's chained-CTE funnel always emits
    # one row per step even when NO step-type events exist; without it
    # this would return an empty dataset on that degenerate input. Seed
    # is a pandas block — map_groups emits pandas, and a mixed-type union
    # fails at execution (NOTES.md facts 14/23).
    import ray.data as rd

    seed = rd.from_pandas(pd.DataFrame(
        {"step": [f"{i + 1}_{st}" for i, st in enumerate(steps)],
         "n_p": np.zeros(len(steps), np.int64)}
    ))
    return partial_groupby_sum(parts.union(seed), ["step"], {"n_p": "n_keys"})



def decayed_score(
    events: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    now: str = "2024-01-31 00:00:00",
    half_life_s: int = 86400,
    scale: int = 10**6,
    max_shift: int = 62,
) -> Dataset:
    """Exponential time-decay scoring with EXACT integer arithmetic: each
    event contributes ``scale >> min(age // half_life, max_shift)`` —
    halving per elapsed half-life, quantized to whole half-lives so the
    whole fold is a BIGINT shift on both sides (a float exp() would
    diverge libm-by-libm). Events after ``now`` clamp to shift 0 (full
    weight). Returns (key, n_events, decayed) — the recency-weighted
    engagement score every feed/ranking pipeline keeps per user.

    Scale shape: stateless per-row contribution + ONE two-phase grouped
    sum — no window state, no sort; a whale user pre-reduces per block.

    cgr analog: the reference ranks retrieval candidates with a
    recency-weighted touch count on graph nodes (graph_updater.py
    last-seen bookkeeping); this is the streaming-aggregate form.
    """
    import pandas as _pd

    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    now_us = int(_pd.Timestamp(now).value // 1000)
    hl_us = half_life_s * 10**6

    def contrib(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key_col: pa.array([], b[key_col].type),
                             "one": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        ts = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        shift = np.clip((now_us - ts) // hl_us, 0, max_shift).astype(np.int64)
        c = np.right_shift(np.int64(scale), shift)
        return pa.table(
            {key_col: b[key_col],
             "one": pa.array(np.ones(b.num_rows, np.int64)),
             "c": pa.array(c)}
        )

    return partial_groupby_sum(
        events.map_batches(contrib, batch_format="pyarrow"),
        [key_col], {"one": "n_events", "c": "decayed"},
    )
