"""Exact distributed quantiles for CONTINUOUS columns — iterative
histogram-refinement selection (the classic distributed k-th-element
algorithm), the missing sibling of ``stages/quantiles.py``.

The value-count-histogram operators there are exact-and-cheap only for
discrete-ish columns (their shuffled state is the distinct-value
histogram; for doubles it degenerates to row count). This module instead
finds the exact rank-r value with NO shuffle at all: each round is one
streaming aggregate pass that folds a fixed ``bins``-wide count histogram
over the current value bracket (per-block partials, int64 vector adds —
associative/commutative, so the result is bit-exact at any parallelism
and any merge-tree shape); the driver narrows the bracket to the bin
containing the target rank and repeats. When a bracket's population falls
under ``pull_threshold`` the survivors are pulled and selected exactly.
log_bins(n) rounds ⇒ 2-3 passes for any realistic corpus; driver state is
O(quantiles × bins) ints.

Float-boundary discipline: bin edges are computed in floats, so a value's
bin index and an interval test can disagree by 1 ulp. Every refined
bracket is therefore WIDENED by one bin on each side (the target value
cannot escape a 3-bin window around its bin), ``#values < lo`` is
recounted from scratch every round against the actual filter applied (one
extra counter — never carried across rounds), and the final pull computes
its own exact below-count in the same pass it collects survivors, so the
selected rank never depends on histogram/filter agreement.

Selection rule = DuckDB ``quantile_disc``: smallest value whose
cumulative count satisfies ``cum/n >= q`` under one int/int IEEE double
division — reduced here to an integer target rank r(q, n) computed once,
which is what makes the oracle comparison bit-exact on doubles.

NaNs, NULLs and ±inf are excluded (NaN/NULL per SQL aggregate
semantics; non-finite values would poison the float bin arithmetic —
pre-clamp infinities upstream if they must participate).

cgr analog: the reference's analyzers compute summary statistics on
in-process lists (``analyzers/`` metrics); this is the cluster-scale
bounded-memory equivalent. Scale note: the input pipeline re-executes
once per round — hand this operator a materialized/checkpointed dataset
(or a raw parquet read, where a pass is cheap) rather than a long lazy
chain.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _target_rank(q: float, n: int) -> int:
    """Smallest integer r in [1, n] with r/n >= q (IEEE double division) —
    the quantile_disc rank."""
    r = max(1, min(n, int(np.floor(q * n))))
    while r / n < q and r < n:
        r += 1
    while r > 1 and (r - 1) / n >= q:
        r -= 1
    return r


def _clean(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    v = pc.drop_null(col).to_numpy(zero_copy_only=False).astype(np.float64)
    return v[np.isfinite(v)]


def quantile_select(
    ds: Dataset,
    *,
    value_col: str,
    qs: dict[str, float],
    bins: int = 2048,
    pull_threshold: int = 65536,
    max_rounds: int = 8,
) -> dict[str, float | int]:
    """Exact ``quantile_disc`` values of a double column, driver-side dict
    ``{"n": row_count, alias: value, ...}`` (empty input → ``{"n": 0}``)."""
    from ray.data.aggregate import AggregateFn

    # ---- pass 0: count / min / max ----
    def acc0(state, block):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        v = _clean(tbl[value_col])
        if len(v) == 0:
            return state
        return np.array(
            [state[0] + len(v), min(state[1], v.min()), max(state[2], v.max())],
            np.float64,
        )

    base = AggregateFn(
        init=lambda _: np.array([0.0, np.inf, -np.inf]),
        accumulate_block=acc0,
        merge=lambda a, b: np.array(
            [a[0] + b[0], min(a[1], b[1]), max(a[2], b[2])], np.float64
        ),
        name="mm",
    )
    n_f, gmin, gmax = ds.aggregate(base)["mm"]
    n = int(n_f)
    if n == 0:
        return {"n": 0}

    aliases = list(qs)
    # pending[j] = (lo, hi, target_rank); brackets are CLOSED intervals
    pending: dict[int, tuple[float, float, int]] = {
        j: (float(gmin), float(gmax), _target_rank(qs[a], n))
        for j, a in enumerate(aliases)
    }
    to_pull: dict[int, tuple[float, float, int]] = {}
    result: dict[str, float | int] = {"n": n}

    for _ in range(max_rounds):
        if not pending:
            break
        js = sorted(pending)
        los = np.array([pending[j][0] for j in js])
        his = np.array([pending[j][1] for j in js])
        ws = (his - los) / bins

        def acc(state, block, los=los, his=his, ws=ws):
            tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            v = _clean(tbl[value_col])
            out = state.copy()
            for i in range(len(los)):
                out[i, 0] += np.count_nonzero(v < los[i])
                if ws[i] > 0:
                    m = v[(v >= los[i]) & (v <= his[i])]
                    b = np.minimum((m - los[i]) / ws[i], bins - 1).astype(np.int64)
                    np.add.at(out[i], 1 + b, 1)
                else:  # degenerate width: everything in-bracket is bin 0
                    out[i, 1] += np.count_nonzero((v >= los[i]) & (v <= his[i]))
            return out

        agg = AggregateFn(
            init=lambda _, k=len(js): np.zeros((k, bins + 1), np.int64),
            accumulate_block=acc,
            merge=lambda a, b: a + b,
            name="hist",
        )
        hists = ds.aggregate(agg)["hist"]

        for i, j in enumerate(js):
            lo, hi, r = pending[j]
            below = int(hists[i, 0])
            cum = hists[i, 1:].cumsum()
            w = ws[i]
            if lo == hi:  # single representable value: no pull needed
                result[aliases[j]] = lo
                del pending[j]
                continue
            if w == 0 or int(cum[-1]) <= pull_threshold:
                to_pull[j] = (lo, hi, r)
                del pending[j]
                continue
            k = int(np.searchsorted(cum, r - below, side="left"))
            # widen by one bin each side: 1-ulp bin/interval disagreement
            # can never push the target outside a 3-bin window
            nlo = lo if k <= 1 else lo + (k - 1) * w
            nhi = hi if k >= bins - 2 else lo + (k + 2) * w
            pop3 = int(
                hists[i, 1 + max(0, k - 1): 1 + min(bins, k + 2)].sum()
            )
            if pop3 <= pull_threshold:
                to_pull[j] = (nlo, nhi, r)
                del pending[j]
            else:
                pending[j] = (nlo, nhi, r)

    # anything still pending after max_rounds: pull its (wide) bracket
    to_pull.update(pending)
    pending.clear()

    if to_pull:
        pjs = sorted(to_pull)
        plos = np.array([to_pull[j][0] for j in pjs])
        phis = np.array([to_pull[j][1] for j in pjs])

        def grab(b: pa.Table, pjs=pjs, plos=plos, phis=phis) -> pa.Table:
            v = _clean(b[value_col])
            out_j, out_c, out_v = [], [], []
            for i in range(len(pjs)):
                out_j.append(pjs[i])
                out_c.append(int(np.count_nonzero(v < plos[i])))
                out_v.append(v[(v >= plos[i]) & (v <= phis[i])].tolist())
            return pa.table(
                {"j": pa.array(out_j, pa.int64()),
                 "c": pa.array(out_c, pa.int64()),
                 "v": pa.array(out_v, pa.list_(pa.float64()))}
            )

        below_by_j: dict[int, int] = {j: 0 for j in pjs}
        vals_by_j: dict[int, list[float]] = {j: [] for j in pjs}
        for row in ds.map_batches(grab, batch_format="pyarrow").take_all():
            below_by_j[row["j"]] += row["c"]
            vals_by_j[row["j"]].extend(row["v"])
        for j in pjs:
            _lo, _hi, r = to_pull[j]
            vs = np.sort(np.asarray(vals_by_j[j], np.float64))
            result[aliases[j]] = float(vs[r - below_by_j[j] - 1])
    return result


def quantile_select_table(
    ds: Dataset, *, value_col: str, qs: dict[str, float], **kw
) -> pa.Table:
    """One-row Arrow table (n, <alias...>) — the ``queries()`` adapter."""
    res = quantile_select(ds, value_col=value_col, qs=qs, **kw)
    cols: dict[str, pa.Array] = {"n": pa.array([res["n"]], pa.int64())}
    for a in qs:
        cols[a] = pa.array([res.get(a)], pa.float64())
    return pa.table(cols)


def grouped_quantile_select(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    bins: int = 2048,
    pull_threshold: int = 65536,
    max_rounds: int = 8,
) -> pa.Table:
    """Per-GROUP exact ``quantile_disc`` of a double column — the grouped
    completion of :func:`quantile_select` for dictionary-scale group
    columns (event types, languages; NOT ids).

    Same histogram-refinement discipline, with one bracket per
    (group, quantile): pass 0 folds per-group (n, min, max) via a
    vectorized Arrow group_by per block; each round folds ONE
    (brackets × bins) int64 matrix (group membership selected by Arrow
    masks per block); pulls collect per-bracket survivors plus their
    exact below-counts in a single pass. Driver state is
    O(groups × quantiles × bins) ints — the operator is wrong for
    id-cardinality groups, use the discrete histogram or a sketch there.

    Returns one row per group: (group, n, <alias...>), empty groups
    impossible by construction (a group exists only if it has rows).
    NULL group keys are excluded (SQL keeps a NULL group — filter or
    fill upstream if that group matters).
    """
    from ray.data.aggregate import AggregateFn

    aliases = list(qs)

    # ---- pass 0: per-group count/min/max ----
    def acc0(state: dict, block) -> dict:
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        t = pa.table({"g": tbl[group_col], "v": tbl[value_col]})
        t = t.filter(pc.and_(
            pc.is_valid(t["g"]),  # NULL group keys excluded (docstring)
            pc.and_(pc.is_valid(t["v"]),
                    pc.is_finite(pc.cast(t["v"], pa.float64()))),
        ))
        if t.num_rows == 0:
            return state
        g = pa.TableGroupBy(t, ["g"], use_threads=False).aggregate(
            [("v", "count"), ("v", "min"), ("v", "max")]
        )
        out = dict(state)
        for row in g.to_pylist():
            key = row["g"]
            cur = out.get(key)
            st = (int(row["v_count"]), float(row["v_min"]), float(row["v_max"]))
            if cur is None:
                out[key] = st
            else:
                out[key] = (cur[0] + st[0], min(cur[1], st[1]),
                            max(cur[2], st[2]))
        return out

    def merge0(a: dict, b: dict) -> dict:
        out = dict(a)
        for k, st in b.items():
            cur = out.get(k)
            out[k] = st if cur is None else (
                cur[0] + st[0], min(cur[1], st[1]), max(cur[2], st[2])
            )
        return out

    base = AggregateFn(init=lambda _: {}, accumulate_block=acc0,
                       merge=merge0, name="gmm")
    stats = ds.aggregate(base)["gmm"]
    if not stats:
        return pa.table(
            {group_col: pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             **{a: pa.array([], pa.float64()) for a in aliases}}
        )

    groups = sorted(stats)
    # bracket key = (group, alias); pending → (lo, hi, r)
    pending: dict[tuple, tuple[float, float, int]] = {}
    result: dict[tuple, float] = {}
    for g in groups:
        n, lo, hi = stats[g]
        for a in aliases:
            pending[(g, a)] = (lo, hi, _target_rank(qs[a], n))
    to_pull: dict[tuple, tuple[float, float, int]] = {}

    for _ in range(max_rounds):
        for key in [k for k, (lo, hi, _r) in pending.items() if lo == hi]:
            result[key] = pending.pop(key)[0]
        if not pending:
            break
        keys = sorted(pending)
        klo = np.array([pending[k][0] for k in keys])
        khi = np.array([pending[k][1] for k in keys])
        kws = (khi - klo) / bins
        kgroups = [k[0] for k in keys]

        def acc(state, block, keys=keys, klo=klo, khi=khi, kws=kws,
                kgroups=kgroups):
            tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            gcol = tbl[group_col].to_numpy(zero_copy_only=False)
            v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            ok = np.isfinite(v)
            out = state.copy()
            for i in range(len(keys)):
                sel = ok & (gcol == kgroups[i])
                vi = v[sel]
                if len(vi) == 0:
                    continue
                out[i, 0] += np.count_nonzero(vi < klo[i])
                if kws[i] > 0:
                    m = vi[(vi >= klo[i]) & (vi <= khi[i])]
                    b = np.minimum((m - klo[i]) / kws[i], bins - 1).astype(np.int64)
                    np.add.at(out[i], 1 + b, 1)
                else:
                    out[i, 1] += np.count_nonzero((vi >= klo[i]) & (vi <= khi[i]))
            return out

        agg = AggregateFn(
            init=lambda _, k=len(keys): np.zeros((k, bins + 1), np.int64),
            accumulate_block=acc,
            merge=lambda a, b: a + b,
            name="ghist",
        )
        hists = ds.aggregate(agg)["ghist"]

        for i, key in enumerate(keys):
            lo, hi, r = pending[key]
            below = int(hists[i, 0])
            cum = hists[i, 1:].cumsum()
            w = kws[i]
            if lo == hi:
                result[key] = lo
                del pending[key]
                continue
            if w == 0 or int(cum[-1]) <= pull_threshold:
                to_pull[key] = (lo, hi, r)
                del pending[key]
                continue
            k = int(np.searchsorted(cum, r - below, side="left"))
            nlo = lo if k <= 1 else lo + (k - 1) * w
            nhi = hi if k >= bins - 2 else lo + (k + 2) * w
            pop3 = int(hists[i, 1 + max(0, k - 1): 1 + min(bins, k + 2)].sum())
            if pop3 <= pull_threshold:
                to_pull[key] = (nlo, nhi, r)
                del pending[key]
            else:
                pending[key] = (nlo, nhi, r)

    to_pull.update(pending)
    pending.clear()

    if to_pull:
        pkeys = sorted(to_pull)
        plos = np.array([to_pull[k][0] for k in pkeys])
        phis = np.array([to_pull[k][1] for k in pkeys])
        pgroups = [k[0] for k in pkeys]

        def grab(b: pa.Table, pkeys=pkeys, plos=plos, phis=phis,
                 pgroups=pgroups) -> pa.Table:
            gcol = b[group_col].to_numpy(zero_copy_only=False)
            v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            ok = np.isfinite(v)
            out_i, out_c, out_v = [], [], []
            for i in range(len(pkeys)):
                vi = v[ok & (gcol == pgroups[i])]
                out_i.append(i)
                out_c.append(int(np.count_nonzero(vi < plos[i])))
                out_v.append(vi[(vi >= plos[i]) & (vi <= phis[i])].tolist())
            return pa.table(
                {"i": pa.array(out_i, pa.int64()),
                 "c": pa.array(out_c, pa.int64()),
                 "v": pa.array(out_v, pa.list_(pa.float64()))}
            )

        below_by: dict[int, int] = {i: 0 for i in range(len(pkeys))}
        vals_by: dict[int, list[float]] = {i: [] for i in range(len(pkeys))}
        for row in ds.map_batches(grab, batch_format="pyarrow").take_all():
            below_by[row["i"]] += row["c"]
            vals_by[row["i"]].extend(row["v"])
        for i, key in enumerate(pkeys):
            _lo, _hi, r = to_pull[key]
            vs = np.sort(np.asarray(vals_by[i], np.float64))
            result[key] = float(vs[r - below_by[i] - 1])

    cols: dict[str, list] = {group_col: groups,
                             "n": [stats[g][0] for g in groups]}
    for a in aliases:
        cols[a] = [result[(g, a)] for g in groups]
    return pa.table(
        {group_col: pa.array(cols[group_col]),
         "n": pa.array(cols["n"], pa.int64()),
         **{a: pa.array(cols[a], pa.float64()) for a in aliases}}
    )
