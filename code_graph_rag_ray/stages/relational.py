"""Reusable relational operators: broadcast joins, two-phase aggregates,
semi/anti joins, top-k — the generic engine surface the DuckDB oracle
exercises over the TPC-H-ish tables.

Design rules (SURVEY.md §4 + ray_guide):
- small side broadcast via ``ray.put`` + per-batch vectorized lookup
  (pandas merge / numpy take) — no shuffle,
- large-large joins go through ``Dataset.join`` (hash-partitioned) with
  ``num_partitions`` sized to the cluster,
- aggregates pre-reduce inside ``map_batches`` (one partial row per key per
  batch) before the groupby, so hot keys exchange O(blocks) not O(rows).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


#: driver-side cache of concat'd broadcast sides, keyed on block ref ids:
#: key -> (concat ObjectRef, estimated input bytes). Bounded by TOTAL
#: ESTIMATED BYTES (``GRAFT_BROADCAST_CACHE_BUDGET``, default 2 GiB) with
#: a 32-entry FIFO backstop for refs whose size the store can't report —
#: an entry-count bound alone lets 8 near-budget tables pin ~2 GiB even
#: after their joins finish. Entries pin their concat'd table in the
#: object store for the driver's lifetime, so long multi-query sessions
#: should still call :func:`clear_broadcast_cache` between queries —
#: bench.py and the catalog checker do.
_BROADCAST_CONCAT_CACHE: dict = {}
_BROADCAST_CACHE_MAX_ENTRIES = 32


def _broadcast_cache_budget() -> int:
    import os

    return int(os.environ.get("GRAFT_BROADCAST_CACHE_BUDGET",
                              2 * 1024 ** 3))


def clear_broadcast_cache() -> None:
    """Drop all cached broadcast-side concat refs, releasing their pinned
    object-store copies. Safe at any time: the next broadcast_join simply
    rebuilds its side. Call between queries in long-lived sessions."""
    _BROADCAST_CONCAT_CACHE.clear()


def _concat_body(*tables):
    # Ray 2.49's to_arrow_refs takes its zero-copy path whenever the
    # DATASET-level schema reports Arrow — but a mixed-block dataset
    # (pandas merge outputs ∪ schema-typed Arrow empties, the
    # bucketed_join shape per NOTES facts 23/27) then leaks its PANDAS
    # blocks through unconverted, and WHICH block the schema probe lands
    # on is session/parallelism dependent. Normalize per block here.
    norm = []
    for t in tables:
        if t is None:
            continue
        if not isinstance(t, pa.Table):
            if len(getattr(t, "columns", ())) == 0:
                continue  # schema-less empty pandas sort partition
            t = pa.Table.from_pandas(t, preserve_index=False)
        norm.append(t)
    tbls = [t for t in norm if t.num_rows > 0]
    if not tbls:
        return norm[0] if norm else pa.table({})
    return pa.concat_tables(tbls, promote_options="default")


def _get_concat_task():
    """Lazily wrap the concat body as a Ray task (module import must not
    require an initialized Ray)."""
    global _concat_tables_task
    if _concat_tables_task is None:
        import ray

        _concat_tables_task = ray.remote(_concat_body)
    return _concat_tables_task


_concat_tables_task = None


def broadcast_join(
    ds: Dataset,
    small: pd.DataFrame | Dataset,
    *,
    on: str,
    how: str = "inner",
    right_on: str | None = None,
) -> Dataset:
    """Map-side hash join: the small side shipped once, looked up per batch
    with a pandas merge (vectorized).

    ``small`` may be a pandas frame (driver-resident dimension — shipped
    via ``ray.put``) or a **Dataset** — e.g. the output of an upstream
    distributed join. The Dataset path never lands on the driver: its
    blocks stay in the object store (``to_arrow_refs``), a Ray task concats
    them into one shared object, and each worker fetches + indexes that
    object once (worker-global cache). Use it when the small side fits a
    worker heap but must not transit the driver; beyond that, use
    :func:`bucketed_join`.
    """
    import ray

    from code_graph_rag_ray.functions.broadcast import get_broadcast_transformed

    rkey = right_on or on

    if isinstance(small, Dataset):
        refs = small.to_arrow_refs()  # blocks stay in the object store
        # concat ONCE per distinct materialized block set: iterative
        # stages (pagerank rounds) re-broadcast the same static side every
        # call, which would rebuild and re-pin an identical full-table
        # object per iteration. Keyed on the block ref ids; bounded FIFO.
        key = tuple(r.hex() for r in refs)
        entry = _BROADCAST_CONCAT_CACHE.get(key)
        if entry is None:
            # bytes-aware eviction: estimate this side's size from the
            # store's block metadata (0 when unreported — the FIFO entry
            # backstop covers that case), then evict oldest-first until
            # the running total fits the budget
            try:
                locs = ray.experimental.get_object_locations(refs)
                est = sum(int((locs.get(r) or {}).get("object_size") or 0)
                          for r in refs)
            except Exception:  # pragma: no cover - location API unavailable
                est = 0
            budget = _broadcast_cache_budget()
            cache = _BROADCAST_CONCAT_CACHE
            while cache and (
                len(cache) >= _BROADCAST_CACHE_MAX_ENTRIES
                or sum(b for _, b in cache.values()) + est > budget
            ):
                cache.pop(next(iter(cache)))
            ref = _get_concat_task().remote(*refs)
            cache[key] = (ref, est)
        else:
            ref = entry[0]

        def to_frame(obj):
            return obj.to_pandas() if isinstance(obj, pa.Table) else obj
    else:
        ref = ray.put(small)

        def to_frame(obj):
            return obj

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        small_df = get_broadcast_transformed(ref, "pandas", to_frame)
        # SQL null semantics: a null join key never matches — pandas
        # merge would match NaN==NaN, which made the result depend on the
        # physical plan (the bucketed path drops null keys per SQL).
        # Dropping null-key rows from the SMALL side is sufficient: left
        # null keys then match nothing (inner drops them, left keeps them
        # unmatched) — exactly SQL on both paths.
        if len(small_df) and small_df[rkey].isna().any():
            small_df = small_df[small_df[rkey].notna()]
        return batch.merge(small_df, how=how, left_on=on, right_on=rkey)

    # plain task fn + worker-global cache: no per-stage actor startup
    return ds.map_batches(join, batch_format="pandas")


def broadcast_semi_join(ds: Dataset, keys: set, *, on: str, anti: bool = False) -> Dataset:
    """Semi (or anti) join against a broadcast key set — filter, no shuffle."""
    import ray

    import pyarrow.compute as pc

    from code_graph_rag_ray.functions.broadcast import get_broadcast

    ref = ray.put(pa.array(sorted(keys)))

    def semi(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[on], value_set=get_broadcast(ref))
        if anti:
            m = pc.invert(m)
        return batch.filter(m)

    return ds.map_batches(semi, batch_format="pyarrow")


def _pack_side(
    key_col: str, keep_cols: list[str], side: int, num_buckets: int,
    drop_null_keys: bool,
):
    """Batch fn: rows → one (bucket, side, ipc-blob) row per bucket present
    in the batch. The blob is the Arrow-IPC serialization of that bucket's
    sub-table (``__key`` + this side's payload columns only) — the shuffle
    ships exactly the real data, never a null-padded superset of both
    schemas, and the exchanged ROW count is O(batches × buckets), not
    O(input rows)."""
    import numpy as np

    import pyarrow.compute as pc

    from code_graph_rag_ray.functions.hashing import partition_ids

    def pack(b: pa.Table) -> pa.Table:
        key = pc.cast(b[key_col], pa.string())
        if drop_null_keys and b.num_rows:
            valid = pc.is_valid(key)
            if not (pc.all(valid).as_py() or False):
                b = b.filter(valid)
                key = pc.cast(b[key_col], pa.string())
        empty = pa.table(
            {"__bucket": pa.array([], pa.int32()),
             "__side": pa.array([], pa.int8()),
             "__blob": pa.array([], pa.binary())}
        )
        if b.num_rows == 0:
            return empty
        missing = [c for c in keep_cols if c not in b.column_names]
        if missing:
            # almost always a stale schema PROBE on a filter/select plan
            # (NOTES fact 31) — tell the caller the deterministic fix
            raise KeyError(
                f"bucketed_join pack: columns {missing} not in batch schema "
                f"{b.column_names}; the side's inferred schema is stale — "
                "pass left_schema/right_schema explicitly at the call site"
            )
        sub = pa.table({"__key": key, **{c: b[c] for c in keep_cols}})
        buckets = partition_ids(key, num_buckets)
        order = np.argsort(buckets, kind="stable")
        sorted_tbl = sub.take(pa.array(order, pa.int64()))
        sb = buckets[order]
        uniq, starts = np.unique(sb, return_index=True)
        ends = np.append(starts[1:], len(sb))
        blobs = []
        for s, e in zip(starts, ends):
            t = sorted_tbl.slice(int(s), int(e - s))
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, t.schema) as w:
                w.write_table(t)
            blobs.append(sink.getvalue().to_pybytes())
        return pa.table(
            {"__bucket": pa.array(uniq.astype("int32")),
             "__side": pa.array([side] * len(uniq), pa.int8()),
             "__blob": pa.array(blobs, pa.binary())}
        )

    return pack


def _arrow_schema(ds: Dataset) -> pa.Schema:
    """Dataset schema as a ``pa.Schema`` — a dataset whose last stage ran in
    pandas format reports a PandasBlockSchema (numpy dtypes), which cannot
    parameterize Arrow empty tables. Object dtype maps to string (join keys
    and payloads here are scalars)."""
    s = ds.schema(fetch_if_missing=False)  # free when the plan already knows it
    if s is None:
        s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append((name, t))
        else:
            try:
                fields.append((name, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((name, pa.string()))
    return pa.schema(fields)


def bucketed_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str | list[str],
    right_on: str | list[str] | None = None,
    num_buckets: int | None = None,
    how: str = "inner",
    coalesce: bool = True,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 22,
) -> Dataset:
    """Large-large equi-join as an explicit bucketed cogroup hash join.

    ``bloom_prefilter=True`` (inner/semi only) folds the right keys into
    an m-bit bloom bitmap first and drops non-hitting LEFT rows BEFORE
    the shuffle — when the build side is selective, the probe side's
    exchange shrinks by its miss rate at the cost of one broadcast bitmap
    (no false drops, so the result is identical). The right side is
    pinned (materialize) so the bloom fold does not execute it twice;
    use when right is the smaller side, as in fact⋈dimension joins.

    ``on`` / ``right_on`` may be LISTS for composite keys: a derived
    ``\\x1f``-joined string key is minted on both sides before the
    shuffle (null if ANY part is null — SQL composite-equality
    semantics) and dropped from the output; the individual right key
    columns then ride as ordinary payload (``_r``-suffixed on collision).

    Each side's batches are packed into per-bucket Arrow-IPC blobs
    (:func:`_pack_side`); the union is grouped by bucket and each group
    deserializes its blobs and does ONE vectorized pandas merge. This is the
    portable partitioned-hash-join pattern (ray_guide «Joins») used instead
    of ``Dataset.join`` because Ray 2.49's join emits schema-less empty hash
    partitions that break on sparse keys (see stages/components.py).

    Scale properties: the shuffle payload is exactly each side's own
    columns (no null-padding to the union schema — the round-1 version
    shipped ~2× width), and ``num_buckets`` defaults to 2×cluster-CPUs
    (min 32) instead of a fixed constant; size it as input_bytes/256 MB on
    a real cluster so one bucket's merge fits a worker. Hot keys: all rows
    of one key share a bucket but the merge is columnar; raise
    ``num_buckets`` or pre-salt a known whale key if a bucket outgrows a
    worker.

    Null keys follow SQL semantics: null never equals null, so null-key
    rows are dropped on both sides for inner joins (and on the right for
    left joins) BEFORE the shuffle — a pandas merge would otherwise match
    NaN keys to each other.

    Column collision: right-side columns that clash with left names get a
    ``_r`` suffix (except the join key, which is dropped from the right).

    ``how="semi"`` / ``"anti"`` give EXACT large-large existence joins
    (the decontamination shape when both sides outgrow a broadcast and a
    bloom pre-filter isn't enough): only the right side's KEY column
    crosses the shuffle, output is the left schema, anti keeps null-key
    left rows (NOT EXISTS semantics).
    """
    if num_buckets is None:
        try:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 16))
        except Exception:  # pragma: no cover - no cluster yet
            ncpu = 16
        num_buckets = max(32, 2 * ncpu)

    if isinstance(on, list):
        lkeys = on
        rkeys = right_on if right_on is not None else on
        assert isinstance(rkeys, list) and len(rkeys) == len(lkeys)

        def mint(keys: list[str]):
            def add(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                # null-if-any-null: emulate with a validity mask, since
                # binary_join propagates nulls already
                jk = pc.binary_join_element_wise(
                    *[pc.cast(b[k], pa.string()) for k in keys], "\x1f"
                )
                return b.append_column("__jk", jk)

            return add

        ls = rs = None
        if left_schema is not None:
            ls = pa.schema(list(zip(left_schema.names, left_schema.types))
                           + [("__jk", pa.string())])
        if right_schema is not None:
            rs = pa.schema(list(zip(right_schema.names, right_schema.types))
                           + [("__jk", pa.string())])
        out = bucketed_join(
            left.map_batches(mint(lkeys), batch_format="pyarrow"),
            right.map_batches(mint(rkeys), batch_format="pyarrow"),
            on="__jk", num_buckets=num_buckets, how=how, coalesce=coalesce,
            left_schema=ls, right_schema=rs,
            bloom_prefilter=bloom_prefilter, bloom_bits=bloom_bits,
        )
        return out.map_batches(
            lambda b: b.drop_columns([c for c in ("__jk",) if c in b.column_names]),
            batch_format="pyarrow",
        )

    rkey = right_on or on
    if bloom_prefilter and how in ("inner", "semi"):
        import ray as _ray

        from code_graph_rag_ray.functions.broadcast import get_broadcast
        from code_graph_rag_ray.stages.bloom import bloom_build, bloom_contains

        right = right.materialize()  # the bloom fold must not re-execute it
        rk = right.map_batches(
            lambda b: pa.table({"__k": pc.cast(b[rkey], pa.string())}),
            batch_format="pyarrow",
        )
        bits_ref = _ray.put(bloom_build(rk, "__k", m_bits=bloom_bits))
        mb = bloom_bits

        def lfilter(b: pa.Table) -> pa.Table:
            key = pc.cast(b[on], pa.string())
            mask = bloom_contains(get_broadcast(bits_ref), key, m_bits=mb, k=3)
            # null keys may land either way here — inner/semi drop them
            # at pack time regardless
            return b.filter(pa.array(mask))

        left = left.map_batches(lfilter, batch_format="pyarrow")

    # ``how="outer"`` (FULL OUTER): unmatched rows of BOTH sides survive
    # with nulls on the other side. The right key column is KEPT (as
    # ``<rkey>`` or ``<rkey>_r``) so right-only rows still carry their key
    # — coalesce(left_on, right_key) downstream. Null-key rows are
    # unmatched by SQL semantics but PRESERVED on both sides.
    # Schema hints matter when a side has an all-to-all upstream
    # (groupby/sort): the ds.schema() probe otherwise EXECUTES that whole
    # upstream once for the names (limit-1 truncates only post-sort
    # stages) — 2× cost plus the limit-cancellation refcount crash
    # (NOTES.md fact 22). Types only parameterize the one-side-absent
    # empty-table fallback, so approximate types are harmless.
    lschema = left_schema if left_schema is not None else _arrow_schema(left)
    rschema = right_schema if right_schema is not None else _arrow_schema(right)
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != rkey or how == "outer"]
    rename_r = {c: (c + "_r" if c in lcols else c) for c in rcols}
    lblob_schema = pa.schema(
        [("__key", pa.string())] + [(c, lschema.field(c).type) for c in lcols]
    )
    rblob_schema = pa.schema(
        [("__key", pa.string())] + [(c, rschema.field(c).type) for c in rcols]
    )
    out_cols = lcols if how in ("semi", "anti") else (
        lcols + [rename_r[c] for c in rcols]
    )
    if how in ("semi", "anti"):
        # only the key column of the right side needs to cross the shuffle
        rcols = []
        rblob_schema = pa.schema([("__key", pa.string())])

    tagged = left.map_batches(
        # null keys: never match (SQL), so they leave inner/semi before the
        # shuffle; anti follows NOT EXISTS semantics — null-key rows are
        # kept (a null key cannot be proven present on the right)
        _pack_side(on, lcols, 0, num_buckets,
                   drop_null_keys=(how in ("inner", "semi", "right"))),
        batch_format="pyarrow",
    ).union(
        right.map_batches(
            _pack_side(rkey, rcols, 1, num_buckets,
                       drop_null_keys=(how != "outer")),
            batch_format="pyarrow",
        )
    )
    if coalesce:
        # The groupby's sort stage pays a fixed cost PER INPUT BLOCK
        # (measured: identical tiny data, 200 blocks → 5.8 s, 8 blocks →
        # 0.2 s). Packing emits one small block per upstream task, so
        # coalescing the blob rows to ~2×CPUs blocks first removes that
        # floor for one extra streaming pass over the packed payload.
        # On a real multi-node run with fat (≥100 MB) packed blocks the
        # extra pass costs more than it saves — pass ``coalesce=False``.
        try:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 16))
        except Exception:  # pragma: no cover
            ncpu = 16
        tagged = tagged.repartition(max(16, 2 * ncpu))

    def _read_side(blobs, schema: pa.Schema) -> pd.DataFrame:
        tabs = [pa.ipc.open_stream(pa.py_buffer(x)).read_all() for x in blobs]
        if not tabs:
            tabs = [schema.empty_table()]
        return pa.concat_tables(tabs).to_pandas()

    # typed empty output for matchless buckets: an EMPTY pandas frame's
    # object columns trip Ray's block-size sampler (np.vectorize on size-0
    # input → one logged warning per bucket) and its inferred arrow schema
    # would be NULL-typed (NOTES fact 26). Nonempty results stay pandas —
    # their dtypes come from the real IPC blob schemas, so block schemas
    # agree either way.
    _types = {c: lblob_schema.field(c).type for c in lblob_schema.names}
    _types.update({c: rblob_schema.field(k).type
                   for k, c in rename_r.items() if k in rblob_schema.names})
    out_empty = (
        pa.schema([(c, _types[c]) for c in out_cols]).empty_table()
        if how != "outer" else None
    )

    def merge(g: pd.DataFrame):
        lf = _read_side(g.loc[g["__side"] == 0, "__blob"], lblob_schema)
        rf = _read_side(g.loc[g["__side"] == 1, "__blob"], rblob_schema).rename(
            columns=rename_r
        )
        if how in ("semi", "anti"):
            present = lf["__key"].isin(set(rf["__key"]))
            # anti keeps null-key rows: null is never "present" on the right
            keep = present if how == "semi" else ~present
            out = lf.loc[keep, out_cols]
            return out_empty if out_empty is not None and len(out) == 0 else out
        if how == "outer":
            # pandas merge matches NaN==NaN; SQL says null never matches —
            # split null-key rows out, merge the rest, re-append unmatched
            ln, rn = lf["__key"].isna(), rf["__key"].isna()
            m = lf[~ln].merge(rf[~rn], on="__key", how="outer")
            m = pd.concat([m, lf[ln], rf[rn]], ignore_index=True)
            # NOTES fact 15: unmatched rows upcast int→float64, and only in
            # the groups that HAVE unmatched rows (per-group dtype drift →
            # block schema mismatch at union). Unify every source-int
            # column to nullable Int64 from the SOURCE dtypes, which are
            # identical in every group.
            for src in (lf, rf):
                for c, dt in src.dtypes.items():
                    if c in m.columns and pd.api.types.is_integer_dtype(dt):
                        m[c] = m[c].astype("Int64")
            return m[out_cols]
        m = lf.merge(rf, on="__key", how=how)
        if out_empty is not None and len(m) == 0:
            return out_empty
        return m[out_cols]

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")


#: default worker-heap budget for a broadcast join side. One broadcast
#: copy is pinned per worker process, so the budget must be a fraction of
#: a worker's heap, not of the node: 256 MB keeps 8-16 workers/node safe.
BROADCAST_BUDGET_BYTES = 256 << 20


def adaptive_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    broadcast_budget_bytes: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    num_buckets: int | None = None,
) -> Dataset:
    """Equi-join that PICKS its physical plan from the right side's
    measured size: broadcast (map-side hash lookup, zero shuffle of the
    left) when the right side fits ``broadcast_budget_bytes``, else the
    bucketed cogroup shuffle join — so the scale-safe plan is the
    default, not a comment telling the user to switch.

    The right side is materialized once to measure it; both physical
    plans consume those same object-store blocks (the broadcast path
    reads them via ``to_arrow_refs``, the bucketed path re-streams them),
    so the probe costs no extra pass — only pinning, which the object
    store spills if the side turns out large. At 10^12-doc scale a
    fact-scale right side blows the budget and the plan degrades to the
    bucketed exchange automatically; on a laptop-scale run the broadcast
    fast path wins. Only ``inner``/``left`` are eligible for broadcast
    (a broadcast right side cannot produce right-unmatched rows).

    Env override ``GRAFT_BROADCAST_BUDGET`` (bytes) tunes the threshold
    without code changes — set it per deployment to ~1/8 of a worker
    heap.
    """
    import os

    if broadcast_budget_bytes is None:
        broadcast_budget_bytes = int(
            os.environ.get("GRAFT_BROADCAST_BUDGET", BROADCAST_BUDGET_BYTES)
        )
    right = right.materialize()
    size = right.size_bytes() or 0
    if how in ("inner", "left") and size <= broadcast_budget_bytes:
        rkey = right_on or on
        # match bucketed_join's collision contract: overlapping non-key
        # right columns come out `_r`-suffixed on BOTH physical plans —
        # pandas merge would otherwise suffix _x/_y, making the output
        # schema depend on the right side's SIZE
        if left_schema is not None:
            lnames = set(left_schema.names)
        else:
            # non-forcing probe only: executing a lazy left upstream for
            # its names costs a full extra pass (NOTES fact 22). Unknown
            # names ⇒ skip collision detection (pre-fix behavior).
            s = left.schema(fetch_if_missing=False)
            lnames = set(s.names) if s is not None else set()
        rnames = (right_schema or _arrow_schema(right)).names
        if rkey != on and rkey in lnames:
            # pandas merge would suffix BOTH key columns; the bucketed
            # plan keeps the left's — take that plan instead of fixing up
            return bucketed_join(
                left, right, on=on, right_on=right_on, how=how,
                left_schema=left_schema, right_schema=right_schema,
                num_buckets=num_buckets,
            )
        collide = {c: c + "_r" for c in rnames if c != rkey and c in lnames}
        if collide:
            right = right.map_batches(
                lambda b, m=collide: b.rename_columns(
                    [m.get(c, c) for c in b.column_names]),
                batch_format="pyarrow",
            ).materialize()
        out = broadcast_join(left, right, on=on, right_on=rkey, how=how)
        if rkey != on:
            # the right key column is redundant with the left's and
            # dropped, so both physical plans present one schema
            out = out.map_batches(
                lambda df: df.drop(columns=[rkey], errors="ignore"),
                batch_format="pandas",
            )
        return out
    return bucketed_join(
        left, right, on=on, right_on=right_on, how=how,
        left_schema=left_schema, right_schema=right_schema,
        num_buckets=num_buckets,
    )


def partial_groupby_sum(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str],
    *,
    count_alias: str | None = None,
) -> Dataset:
    """Two-phase grouped sum/count: Arrow group_by per batch (combiner),
    then a global groupby over the much smaller partials.

    ``sums`` maps input column → output alias. The partial stage emits one
    row per key per batch; the final stage sums partials.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums]
        gb = pa.TableGroupBy(b, keys, use_threads=False)
        if count_alias:
            aggs.append(([], "count_all"))
        t = gb.aggregate(aggs)
        names = list(keys) + [f"{alias}__p" for alias in sums.values()]
        if count_alias:
            names.append(f"{count_alias}__p")
        # pyarrow returns key cols last or first depending on version — map by name
        colmap = {}
        for c, alias in sums.items():
            colmap[f"{c}_sum"] = f"{alias}__p"
        if count_alias:
            colmap["count_all"] = f"{count_alias}__p"
        arrays, out_names = [], []
        for name in t.column_names:
            out = colmap.get(name, name)
            arrays.append(t[name])
            out_names.append(out)
        return pa.Table.from_arrays([a.combine_chunks() for a in arrays], names=out_names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # partials are one row per key per input block — hundreds of TINY
    # blocks. The groupby's sort stage pays a fixed cost per input block
    # (NOTES.md fact 6), so coalesce the partial rows first; the extra
    # pass moves only the partial aggregate rows, never the input.
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 16))
    except Exception:  # pragma: no cover
        ncpu = 16
    partials = partials.repartition(max(8, ncpu // 2))
    aggs = [Sum(f"{alias}__p", alias_name=alias) for alias in sums.values()]
    if count_alias:
        aggs.append(Sum(f"{count_alias}__p", alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def top_k(ds: Dataset, by: str, k: int, *, descending: bool = True) -> Dataset:
    """Global top-k: per-batch local top-k (partial), coalesce the ≤
    blocks×k survivors to ONE block, final exact top-k there.

    Avoids a full distributed sort of the input AND avoids
    ``sort().limit(k)``: a LimitOperator early-cancels in-flight upstream
    tasks, which both wastes the already-paid sort and races Ray 2.49's
    reference counting (observed ``reference_count.cc:581`` check-failure
    crash after a limit-truncated sort plan — NOTES.md fact 22)."""

    def local(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = "descending" if descending else "ascending"
        idx = pc.sort_indices(b, sort_keys=[(by, order)])[: k]
        return b.take(idx)

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local, batch_format="pyarrow", batch_size=None)
    )


def grouped_top_k(
    ds: Dataset,
    group: str,
    by: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak: str | None = None,
) -> Dataset:
    """Per-group top-k without sorting whole groups through the shuffle.

    Phase 1 (map): each block is sorted once and truncated to k rows PER
    GROUP (vectorized run-boundary arithmetic) — at most k × groups-in-block
    rows leave any block, so a whale group exchanges O(blocks × k), not its
    full row count. Phase 2: survivors hash into ~64 group buckets
    (groups whole within a bucket) and the SAME vectorized truncation
    re-runs once per bucket — a per-GROUP map_groups would pay Ray's
    sort-aggregate per-group overhead at high group cardinality (NOTES
    fact 25). ``tiebreak`` (ascending) makes the result deterministic
    under ties at the k boundary — REQUIRED for exact oracle comparison;
    without it rows tied at rank k are arbitrary."""
    import numpy as np

    import pyarrow.compute as pc

    order = "descending" if descending else "ascending"
    sort_keys = [(group, "ascending"), (by, order)]
    if tiebreak:
        sort_keys.append((tiebreak, "ascending"))

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        t = b.take(pc.sort_indices(b, sort_keys=sort_keys))
        g = np.asarray(t[group].to_pandas(), dtype=object)
        first = np.ones(len(g), bool)
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        grp_id = np.cumsum(first) - 1
        pos = np.arange(len(g)) - starts[grp_id]
        return t.filter(pa.array(pos < k))

    from code_graph_rag_ray.functions.hashing import partition_ids

    def bucketize(b: pa.Table) -> pa.Table:
        # NOTES fact 25: a per-GROUP phase-2 merge pays Ray's sort-
        # aggregate per-group overhead; co-locate ~64 hash buckets of
        # groups instead and re-run the vectorized truncation per bucket
        # (groups are whole inside a bucket, so the result is identical)
        bk = partition_ids(b[group], 64)
        return b.append_column("__bk", pa.array(bk, pa.int32()))

    def merge_bucket(g: pa.Table) -> pa.Table:
        return local(g.drop_columns("__bk"))

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def grouped_collect(
    ds: Dataset,
    group: str,
    order_by: str,
    val: str,
    k: int,
    *,
    sep: str = ",",
    descending: bool = False,
    tiebreak: str | None = None,
) -> Dataset:
    """Per-group ordered collect of the first ``k`` values — SQL's
    ``string_agg(val, sep ORDER BY order_by) FILTER (rn <= k)`` as a
    distributed operator.

    The cap is the scale contract: an UNCAPPED ordered collect of a whale
    group is a single unbounded string — the cgr analog (per-pattern rel
    grouping, ``graph_service.py:126-128``) buffers bounded batches for the
    same reason. Phase 1 reuses the ``grouped_top_k`` block-local
    truncation (each block contributes ≤ k rows per group), so the shuffle
    carries O(blocks × k) rows per group; phase 2 re-sorts the survivors
    and joins the head-k values. ``tiebreak`` makes boundary ties
    deterministic — REQUIRED for exact oracle comparison.

    Output: (group, collected:string, n_collected:int64).
    """
    import numpy as np

    order = "descending" if descending else "ascending"
    sort_keys = [(group, "ascending"), (order_by, order)]
    if tiebreak:
        sort_keys.append((tiebreak, "ascending"))

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        t = b.take(pc.sort_indices(b, sort_keys=sort_keys))
        g = np.asarray(t[group].to_pandas(), dtype=object)
        first = np.ones(len(g), bool)
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        pos = np.arange(len(g)) - starts[np.cumsum(first) - 1]
        return t.filter(pa.array(pos < k))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        by_cols = [order_by] + ([tiebreak] if tiebreak else [])
        asc = [not descending] + ([True] if tiebreak else [])
        head = df.sort_values(by_cols, ascending=asc, kind="mergesort").head(k)
        return pd.DataFrame({
            group: [df[group].iloc[0]],
            "collected": [sep.join(head[val].astype(str))],
            "n_collected": np.array([len(head)], np.int64),
        })

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(group)
        .map_groups(merge, batch_format="pandas")
    )


def grouped_trimmed_sum(
    ds: Dataset,
    group: str,
    val: str,
    k: int,
    *,
    tiebreak: str,
) -> Dataset:
    """Exact k-trimmed grouped aggregate (robust mean): per group, drop the
    k smallest and k largest values under the total order (val, tiebreak)
    and sum/count the remainder — outlier-resistant corpus accounting
    without shipping whole groups.

    One shuffle: each block contributes per group its k smallest + k
    largest rows (the union provably contains the GLOBAL extremes) plus a
    single (sum, count) summary row, so a whale group exchanges
    O(blocks × 2k + blocks) rows, never its size. The merge re-sorts the
    survivors, takes the k head/tail — disjoint because they come from one
    total order — and subtracts from the summary totals. Groups with
    n ≤ 2k are DROPPED (trimming is undefined there; the oracle's
    ``HAVING n > 2k`` mirrors it). Values must be int64 (the fixed-point
    convention: float partial sums would not be exactly re-aggregatable);
    ``trimmed_mean`` is the single final IEEE division, bit-exact vs SQL.
    """
    import numpy as np

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group: b[group], val: b[val],
                             tiebreak: b[tiebreak],
                             "__sum": pa.array([], pa.int64()),
                             "__n": pa.array([], pa.int64())})
        t = b.select([group, val, tiebreak])
        t = t.take(pc.sort_indices(
            t, sort_keys=[(group, "ascending"), (val, "ascending"),
                          (tiebreak, "ascending")]))
        g = np.asarray(t[group].to_pandas(), dtype=object)
        first = np.ones(len(g), bool)
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        lens = ends - starts
        pos = np.arange(len(g)) - np.repeat(starts, lens)
        keep = (pos < k) | (pos >= np.repeat(lens, lens) - k)
        kept = t.filter(pa.array(keep))
        vals = np.asarray(t[val].to_numpy(zero_copy_only=False), np.int64)
        sums = np.add.reduceat(vals, starts).astype(np.int64)
        summary = pa.table({
            group: pa.array(g[first], type=t[group].type),
            val: pa.array(np.zeros(len(starts), np.int64)),
            tiebreak: pa.nulls(len(starts), t[tiebreak].type),
            "__sum": pa.array(sums),
            "__n": pa.array(lens.astype(np.int64)),
        })
        kept = kept.append_column("__sum", pa.nulls(kept.num_rows, pa.int64()))
        kept = kept.append_column("__n", pa.nulls(kept.num_rows, pa.int64()))
        return pa.concat_tables([kept, summary])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        s = df[df["__n"].notna()]
        total, n = int(s["__sum"].sum()), int(s["__n"].sum())
        if n <= 2 * k:
            return pd.DataFrame({group: [], "trimmed_sum": [], "n_kept": [],
                                 "trimmed_mean": []})
        rows = df[df["__n"].isna()].sort_values([val, tiebreak],
                                                kind="mergesort")
        cut = int(rows[val].head(k).sum() + rows[val].tail(k).sum())
        ts, nk = total - cut, n - 2 * k
        return pd.DataFrame({
            group: [df[group].iloc[0]],
            "trimmed_sum": np.array([ts], np.int64),
            "n_kept": np.array([nk], np.int64),
            "trimmed_mean": np.array([ts / nk], np.float64),
        })

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(group)
        .map_groups(merge, batch_format="pandas")
    )
