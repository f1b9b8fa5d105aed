"""Exact distributed grouped quantiles (discrete / percentile_disc semantics).

Shape: two-phase value-count histogram (per-batch Arrow combiner → small
global groupby over (key, value) partials — a hot value exchanges
O(blocks) rows, not O(rows)), then a per-key ``map_groups`` walks the
sorted histogram and picks each requested quantile.

Selection rule = SQL ``percentile_disc`` / DuckDB ``quantile_disc``:
the smallest value whose cumulative distribution ``cum/n >= q``, with
``cum/n`` computed as ONE int/int IEEE-754 double division — verified
empirically to reproduce DuckDB bit-for-bit including the q=0.9, n=10
case where a float ``ceil(q*n)`` rule diverges (0.9*10 rounds above 9).

Scale note: the shuffled state is the per-group distinct-value histogram,
so this is exact AND cheap for discrete-ish columns (lengths, counts,
scores on a grid). For continuous doubles the histogram degenerates to
row count — pre-bin (e.g. ``round(x, 3)``) or switch to a sketch before
reaching for this operator.

cgr analog: the findings/metrics summarizer (analyzers aggregate stats
per module, M12); re-targeted as corpus length/score distribution
profiling for curation cutoffs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def grouped_quantiles(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    qs: dict[str, float],
) -> Dataset:
    """Per-``key`` exact quantiles of ``value_col``.

    ``qs`` maps output column name → quantile in (0, 1]. Returns one row
    per key: (key, n, <alias...>) with aliases in ``qs`` insertion order.
    """
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    hist = partial_groupby_sum(
        ds.select_columns([key, value_col]), [key, value_col], {}, count_alias="cnt"
    )

    aliases = list(qs)
    probs = np.array([qs[a] for a in aliases], dtype=np.float64)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="mergesort")
        vals = g[value_col].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = cum[-1]
        # cume_dist comparison, elementwise over the histogram × quantiles
        cd = cum.astype(np.float64) / np.float64(n)
        idx = np.argmax(cd[:, None] >= probs[None, :], axis=0)
        out = {key: [g[key].iloc[0]], "n": np.array([n], dtype=np.int64)}
        for j, alias in enumerate(aliases):
            out[alias] = vals[idx[j] : idx[j] + 1]
        return pd.DataFrame(out)

    return hist.groupby(key).map_groups(pick, batch_format="pandas")


def grouped_quantiles_cont(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    qs: dict[str, float],
) -> Dataset:
    """Per-``key`` INTERPOLATED quantiles (``percentile_cont`` semantics):
    position p = q·(n−1) over the sorted rows, result =
    v[⌊p⌋] + (p − ⌊p⌋)·(v[⌊p⌋+1] − v[⌊p⌋]).

    Same two-phase value-count-histogram shape as
    :func:`grouped_quantiles` (a hot value exchanges O(blocks) rows); the
    per-key pick walks cumulative counts to the two neighbor ROW indices
    and interpolates. The oracle does NOT use the engine-internal
    ``quantile_cont`` (whose interpolation op order is unspecified) — it
    replays this exact expression with window SQL, so the single
    multiply-add is bit-identical on both sides.
    """
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    hist = partial_groupby_sum(
        ds.select_columns([key, value_col]), [key, value_col], {}, count_alias="cnt"
    )

    aliases = list(qs)
    probs = np.array([qs[a] for a in aliases], dtype=np.float64)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="mergesort")
        vals = g[value_col].to_numpy().astype(np.float64)
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        out = {key: [g[key].iloc[0]], "n": np.array([n], dtype=np.int64)}
        for j, alias in enumerate(aliases):
            p = probs[j] * np.float64(n - 1)
            lo = np.floor(p)
            hi = min(int(lo) + 1, n - 1)
            # value at sorted row index r = first histogram bucket with
            # cum >= r+1 (well-defined under duplicate values)
            vlo = vals[np.searchsorted(cum, int(lo) + 1, side="left")]
            vhi = vals[np.searchsorted(cum, hi + 1, side="left")]
            out[alias] = np.array([vlo + (p - lo) * (vhi - vlo)], np.float64)
        return pd.DataFrame(out)

    return hist.groupby(key).map_groups(pick, batch_format="pandas")


def grouped_mad_outliers(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> Dataset:
    """Robust per-group outlier rows: ``|x − median| > k × MAD`` (median
    absolute deviation), the standard heavy-tail-safe alternative to
    z-scores for corpus curation cutoffs (doc lengths are power-law-ish;
    mean/stddev are dragged by the tail, median/MAD are not).

    Two rounds of :func:`grouped_quantiles` (each a two-phase value-count
    histogram — scale-safe for integer-ish columns), the per-group
    median/MAD tables are group-cardinality-sized and broadcast via the
    object store (never the driver); everything else is a vectorized
    Arrow filter. Integer in → integer comparisons → bit-exact vs a SQL
    ``quantile_disc`` oracle.

    cgr analog: the findings analyzers' per-module statistical cutoffs
    (M12, ``analyzers/``) — re-targeted as distribution-based document
    filtering.
    """
    from code_graph_rag_ray.stages.relational import broadcast_join

    base = ds.select_columns([id_col, key, value_col])
    med = grouped_quantiles(base, key=key, value_col=value_col,
                            qs={"med": 0.5}).select_columns([key, "med"])

    def adev(b: pa.Table) -> pa.Table:
        d = pc.abs(pc.subtract(b[value_col], b["med"]))
        return pa.table(
            {id_col: b[id_col], key: b[key], value_col: b[value_col],
             "adev": pc.cast(d, pa.int64())}
        )

    dev = broadcast_join(base, med, on=key).map_batches(
        adev, batch_format="pyarrow"
    )
    mad = grouped_quantiles(dev, key=key, value_col="adev",
                            qs={"mad": 0.5}).select_columns([key, "mad"])

    def flag(b: pa.Table) -> pa.Table:
        m = pc.greater(b["adev"], pc.multiply(pa.scalar(k, pa.int64()), b["mad"]))
        f = b.filter(m)
        return pa.table(
            {id_col: f[id_col], key: f[key], value_col: f[value_col],
             "adev": f["adev"], "mad": pc.cast(f["mad"], pa.int64())}
        )

    return broadcast_join(dev, mad, on=key).map_batches(
        flag, batch_format="pyarrow"
    )
