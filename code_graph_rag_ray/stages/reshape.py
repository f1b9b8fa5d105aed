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


def rollup_sum(
    ds: Dataset, keys: list[str], value_col: str, *, out_col: str = "total"
) -> Dataset:
    """SUM(value) GROUP BY ROLLUP(keys): one row per prefix level of
    ``keys``, coarser levels carrying NULL in the rolled-up columns
    (SQL ROLLUP semantics). The base data is aggregated ONCE (two-phase);
    each coarser level re-aggregates the previous level's output — already
    group-cardinality-sized, so the cascade is near-free.

    Sums must be exactly re-aggregatable: use int64 values (the engine's
    fixed-point convention) — float partial sums would drift between
    levels.

    Key columns must be strings (SQL ROLLUP's NULL fill is typed here as
    string nulls). Each level is materialized — group-cardinality-sized,
    NOT input-sized — because it feeds both the union and the next-coarser
    aggregation; without it the lazy base pipeline would re-execute per
    level."""
    finest = partial_groupby_sum(ds, keys, {value_col: out_col}).materialize()
    levels = [
        finest.map_batches(
            lambda b: b.select(keys + [out_col]), batch_format="pyarrow"
        )
    ]
    prev = finest
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        if kept:
            coarser = partial_groupby_sum(
                prev, kept, {out_col: out_col}
            ).materialize()
        else:
            from ray.data.aggregate import Sum

            total = prev.aggregate(Sum(out_col, alias_name=out_col))[out_col]
            coarser = None
        rolled = keys[depth:]

        def fill(b: pa.Table, _rolled=tuple(rolled), _kept=tuple(kept)) -> pa.Table:
            cols = {k: b[k] for k in _kept}
            for k in _rolled:
                cols[k] = pa.nulls(len(b), pa.string())
            cols[out_col] = b[out_col]
            return pa.table(cols)

        if coarser is not None:
            levels.append(
                coarser.map_batches(fill, batch_format="pyarrow")
            )
            prev = coarser
        else:
            grand = pa.table(
                {**{k: pa.nulls(1, pa.string()) for k in keys},
                 out_col: pa.array([total])}
            )
            import ray.data as rd

            levels.append(rd.from_arrow(grand))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    # normalize block types (NOTES.md fact 14) and column order
    return out.map_batches(
        lambda b: b.select(keys + [out_col]), batch_format="pyarrow"
    )


def cube_sum(
    ds: Dataset, keys: list[str], value_col: str, *, out_col: str = "total"
) -> Dataset:
    """SUM(value) GROUP BY CUBE(keys): one row per SUBSET of ``keys``
    (all 2^k grouping sets), absent keys NULL-filled — ROLLUP's
    all-subsets sibling. Same scale story: the input is aggregated ONCE
    into the finest level; every other grouping set re-aggregates the
    finest output (group-cardinality-sized), so 2^k sets cost 2^k cheap
    passes over the SMALL table, never over the data. Key columns must be
    strings; values int64 (exactly re-aggregatable)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    finest = partial_groupby_sum(ds, keys, {value_col: out_col}).materialize()
    levels = [
        finest.map_batches(
            lambda b: b.select(keys + [out_col]), batch_format="pyarrow"
        )
    ]
    n = len(keys)
    for mask in range(2**n - 2, -1, -1):  # every proper subset, incl. {}
        kept = [k for i, k in enumerate(keys) if mask & (1 << i)]
        dropped = [k for k in keys if k not in kept]
        if kept:
            sub = partial_groupby_sum(finest, kept, {out_col: out_col})

            def fill(b: pa.Table, _kept=tuple(kept), _dropped=tuple(dropped)) -> pa.Table:
                cols = {}
                for k in keys:
                    cols[k] = b[k] if k in _kept else pa.nulls(len(b), pa.string())
                cols[out_col] = b[out_col]
                return pa.table(cols)

            levels.append(sub.map_batches(fill, batch_format="pyarrow"))
        else:
            total = finest.aggregate(Sum(out_col, alias_name=out_col))[out_col]
            grand = pa.table(
                {**{k: pa.nulls(1, pa.string()) for k in keys},
                 out_col: pa.array([total])}
            )
            levels.append(rd.from_arrow(grand))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out.map_batches(
        lambda b: b.select(keys + [out_col]), batch_format="pyarrow"
    )


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
