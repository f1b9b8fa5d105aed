"""Reshaping aggregates: ROLLUP (hierarchical subtotal cascade) and PIVOT
(long → wide conditional aggregation).

Both are everyday corpus-accounting shapes ("triples per host per pred,
with per-host and grand totals"; "event value matrix by type"). The scale
story is the same for each: ONE two-phase grouped aggregation touches the
input; everything coarser derives from the (small) finest-level output, so
adding subtotal levels or pivot columns costs no extra pass over the data.

Reference parity: the reference's stats pass aggregates node/edge counts
per label then totals them in process (``graph_service.py`` summary
queries); these are the distributed equivalents.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.stages.relational import partial_groupby_sum

# sentinel for rolled-up key levels — matches SQL ROLLUP's NULL fill
ROLLUP_ALL = None

# Internal stand-in for "this key is rolled up" while the rows ride a
# groupby (Ray's sort shuffle mishandles genuinely-null keys); converted
# back to SQL NULL in the final map. Contains \x00 so no real key collides.
_ALL = "\x00\x01__ROLLUP_ALL__\x01\x00"


def grouping_sets_sum(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    sets: list[tuple[str, ...]],
    *,
    out_col: str = "total",
) -> Dataset:
    """SUM(value) GROUP BY GROUPING SETS(sets) in ONE two-phase pass.

    Each input batch is locally aggregated once per grouping set (Arrow
    group_by combiner), rolled-up keys filled with a sentinel string, and
    all sets' partials ride a SINGLE global groupby — one shuffle total,
    regardless of how many sets there are, and the exchange carries only
    (sets × groups-per-batch) partial rows, never the input. The earlier
    design (one cascade aggregation per level + union) paid k+1 shuffles
    and emitted schema-less empty blocks from the tiny unions; this one is
    warning-clean and strictly cheaper.

    SQL semantics pinned: the ``()`` grand-total set (when present) always
    emits exactly one row, even over EMPTY input (sum NULL then) — a
    typed seed row with a NULL partial rides the same groupby and is
    ignored by the null-skipping Sum otherwise.

    Key columns must be castable to string (SQL ROLLUP's NULL fill is
    typed here as string nulls); values must be int64 (the engine's
    fixed-point convention — exactly re-aggregatable partial sums).

    Reference parity: the reference's stats pass aggregates node/edge
    counts per label then totals them in process (``graph_service.py``
    summary queries); this is the distributed equivalent.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    sets = [tuple(s) for s in sets]
    p_col = f"{out_col}__p"

    def _empty() -> pa.Table:
        return pa.table(
            {**{k: pa.array([], pa.string()) for k in keys},
             p_col: pa.array([], pa.int64())}
        )

    def partial_sets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty()
        parts: list[pa.Table] = []
        for kept in sets:
            if kept:
                t = pa.TableGroupBy(
                    b.select(list(kept) + [value_col]), list(kept),
                    use_threads=False,
                ).aggregate([(value_col, "sum")])
                n = t.num_rows
                vals = pc.cast(t[f"{value_col}_sum"], pa.int64())
                kept_cols = {k: pc.cast(t[k], pa.string()) for k in kept}
            else:
                n = 1
                vals = pa.array([pc.sum(b[value_col]).as_py()], pa.int64())
                kept_cols = {}
            cols = {
                k: kept_cols[k] if k in kept_cols
                else pa.array([_ALL] * n, pa.string())
                for k in keys
            }
            cols[p_col] = vals
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    partials = ds.map_batches(partial_sets, batch_format="pyarrow")
    if () in sets:
        # seed guarantees the grand-total row exists on empty input (its
        # NULL partial is otherwise ignored by the null-skipping Sum)
        seed = pa.table(
            {**{k: pa.array([_ALL], pa.string()) for k in keys},
             p_col: pa.array([None], pa.int64())}
        )
        partials = partials.union(rd.from_arrow(seed))
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 16))
    except Exception:  # pragma: no cover
        ncpu = 16
    # partials are tiny (one row per set per group per block) — coalesce
    # before the groupby (per-input-block sort cost, NOTES.md fact 6)
    partials = partials.repartition(max(8, ncpu // 2))
    agg = partials.groupby(keys).aggregate(Sum(p_col, alias_name=out_col))

    def unsentinel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or not b.column_names:
            return pa.table(
                {**{k: pa.array([], pa.string()) for k in keys},
                 out_col: pa.array([], pa.int64())}
            )
        cols = {
            k: pc.if_else(pc.equal(b[k], pa.scalar(_ALL)),
                          pa.scalar(None, pa.string()), b[k])
            for k in keys
        }
        cols[out_col] = b[out_col]
        return pa.table(cols)

    return agg.map_batches(unsentinel, batch_format="pyarrow")


def rollup_sum(
    ds: Dataset, keys: list[str], value_col: str, *, out_col: str = "total"
) -> Dataset:
    """SUM(value) GROUP BY ROLLUP(keys): one row per prefix level of
    ``keys``, coarser levels carrying NULL in the rolled-up columns
    (SQL ROLLUP semantics). One two-phase pass over the input — all k+1
    levels ride a single shuffle (see grouping_sets_sum)."""
    sets = [tuple(keys[:d]) for d in range(len(keys), -1, -1)]
    return grouping_sets_sum(ds, keys, value_col, sets, out_col=out_col)


def cube_sum(
    ds: Dataset, keys: list[str], value_col: str, *, out_col: str = "total"
) -> Dataset:
    """SUM(value) GROUP BY CUBE(keys): one row per SUBSET of ``keys``
    (all 2^k grouping sets), absent keys NULL-filled — ROLLUP's
    all-subsets sibling, again in ONE two-phase pass (grouping_sets_sum);
    2^k sets only multiply the tiny partial rows, never the input."""
    n = len(keys)
    sets = [
        tuple(k for i, k in enumerate(keys) if mask & (1 << i))
        for mask in range(2**n - 1, -1, -1)
    ]
    return grouping_sets_sum(ds, keys, value_col, sets, out_col=out_col)


def pivot_sum(
    ds: Dataset,
    index: str,
    column: str,
    value_col: str,
    column_values: list[str],
) -> Dataset:
    """Long → wide: one row per ``index``, one output column per value in
    ``column_values`` holding SUM(value) for that slice (0 when absent —
    SQL's coalesce(sum(...),0)). ``column_values`` must be the closed set
    of expected columns (schema must be static for a Dataset); values
    outside it are ignored.

    Single two-phase pass: the partial stage pre-aggregates
    (index, column) per block, the final groupby is on index only with the
    conditional sums widened per batch — no per-column scans."""
    pre = partial_groupby_sum(ds, [index, column], {value_col: "v"})

    def widen(b: pa.Table) -> pa.Table:
        cols = {index: b[index]}
        for cv in column_values:
            mask = pc.equal(b[column], pa.scalar(cv))
            cols[cv] = pc.if_else(mask, b["v"], pa.scalar(0, b["v"].type))
        return pa.table(cols)

    from ray.data.aggregate import Sum

    wide = pre.map_batches(widen, batch_format="pyarrow")
    return wide.groupby(index).aggregate(
        *[Sum(cv, alias_name=cv) for cv in column_values]
    )


def unpivot(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    name_col: str = "measure",
    value_col: str = "value",
    value_type: pa.DataType | None = None,
) -> Dataset:
    """Wide → long UNPIVOT (the inverse of :func:`pivot_sum` — SQL
    ``UNPIVOT`` / pandas ``melt``): every input row emits one
    (id_cols…, measure, value) row per entry of ``value_cols``, measures
    ordered as given.

    Scale shape: stateless row-expanding ``map_batches`` — zero-copy
    column slices concatenated with a constant dictionary-scale measure
    name per slice; no shuffle, no state. Output rows = input ×
    len(value_cols) — the operator's inherent expansion, same contract
    as chunk_documents. ``value_type`` pins the output value dtype (all
    value columns are cast to it; default: the first value column's
    type).

    cgr analog: the reference reshapes per-node attribute maps into
    per-attribute rows when exporting to Memgraph properties
    (graph_updater.py node-property writes); this is the relational
    form.
    """

    def melt(b: pa.Table) -> pa.Table:
        vt = value_type or b.schema.field(value_cols[0]).type
        if b.num_rows == 0:
            cols = {c: pa.array([], b.schema.field(c).type) for c in id_cols}
            cols[name_col] = pa.array([], pa.string())
            cols[value_col] = pa.array([], vt)
            return pa.table(cols)
        parts = []
        for vc in value_cols:
            cols = {c: b[c] for c in id_cols}
            cols[name_col] = pa.array([vc] * b.num_rows, pa.string())
            cols[value_col] = pc.cast(b[vc], vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")
