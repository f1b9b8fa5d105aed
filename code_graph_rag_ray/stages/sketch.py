"""HyperLogLog distinct-count sketch — the mergeable "how many uniques"
operator for corpus accounting (distinct users per event type, distinct
hosts per shard) where an exact count-distinct would shuffle every key.

Registers, not floats, are the distributed product: per (group, bucket)
the max of rho(hash suffix), computed two-phase (block-local max → grouped
max), so merges are associative/commutative and the register table is
bit-exact at any parallelism. The float estimate is a driver-side
``hll_estimate`` over the tiny register table. Hashes are md5-low64 — the
SQL-recomputable family — and rho uses integer bit-smearing (never
floor(log2(w)), whose float rounding can disagree across libms near 2^53).

Reference parity: the reference counts uniques by materializing full sets
in process memory (e.g. ``graph_updater.py`` seen-file sets); this is the
bounded-memory sketch analog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _md5_low64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5((v or "").encode()).digest()[:8], "big")
            for v in arr.to_pylist()
        ),
        dtype=np.uint64,
        count=len(arr),
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x[:, None].copy().view(np.uint8), axis=1).sum(
        axis=1
    ).astype(np.int64)


def _rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho): bucket = top p bits; rho = 1-based position of the
    first set bit of the (64-p)-bit suffix (w == 0 → 64-p+1)."""
    wbits = 64 - p
    bucket = (h >> np.uint64(wbits)).astype(np.int64)
    w = h & np.uint64((1 << wbits) - 1)
    s = w.copy()
    for sh in (1, 2, 4, 8, 16, 32):
        s |= s >> np.uint64(sh)
    rho = wbits + 1 - _popcount64(s)  # popcount(smeared) = bit_length(w)
    return bucket, rho


def hll_registers(
    ds: Dataset, key_col: str, *, group_col: str, p: int = 11
) -> Dataset:
    """(group, key) rows → (group, bucket, reg) non-empty HLL registers."""

    def partial(b: pa.Table) -> pa.Table:
        bucket, rho = _rho(_md5_low64(b[key_col]), p)
        t = pa.table(
            {group_col: b[group_col], "bucket": pa.array(bucket),
             "reg": pa.array(rho)}
        )
        gb = pa.TableGroupBy(t, [group_col, "bucket"], use_threads=False)
        out = gb.aggregate([("reg", "max")])
        # map by name — pyarrow's key-column position varies by version
        return pa.table({group_col: out[group_col], "bucket": out["bucket"],
                         "reg": out["reg_max"]})

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .aggregate(Max("reg", alias_name="reg"))
    )


def cms_counts(
    ds: Dataset, key_col: str, *, depth: int = 4, width: int = 256,
    weight_col: str | None = None,
) -> Dataset:
    """Count-min sketch: (d, col, cnt) counter matrix over a key column.

    The mergeable frequency sketch (point queries / heavy-hitter screens
    when the exact two-phase top-k is too wide): row d hashes the key with
    double hashing (h1 + d·h2 mod width, md5 family — SQL-recomputable),
    counters fold by SUM, so the matrix is a plain two-phase grouped sum —
    bit-exact at any parallelism and merge order. ``weight_col`` counts
    weighted occurrences (int64). Estimate = min over depths
    (``cms_estimate``), an overestimate with the usual ε = e/width bound."""
    from code_graph_rag_ray.stages.bloom import _h1_h2

    def partial(b: pa.Table) -> pa.Table:
        h1, h2 = _h1_h2(b[key_col], "md5")
        if weight_col is not None:
            wts = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            wts = np.ones(len(b), np.int64)
        ds_, cols, vals = [], [], []
        for d in range(depth):
            col = ((h1 + np.uint64(d) * h2) % np.uint64(width)).astype(np.int64)
            ds_.append(np.full(len(col), d, np.int64))
            cols.append(col)
            vals.append(wts)
        t = pa.table({"d": pa.array(np.concatenate(ds_)),
                      "col": pa.array(np.concatenate(cols)),
                      "cnt": pa.array(np.concatenate(vals))})
        gb = pa.TableGroupBy(t, ["d", "col"], use_threads=False)
        out = gb.aggregate([("cnt", "sum")])
        return pa.table({"d": out["d"], "col": out["col"],
                         "cnt": out["cnt_sum"]})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "col"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_estimate(counts: list[dict], keys: list[str], *, depth: int = 4,
                 width: int = 256) -> dict:
    """Point-frequency estimates (min over depths) from the sketch rows."""
    import hashlib

    table: dict = {}
    for r in counts:
        table[(r["d"], r["col"])] = r["cnt"]
    out = {}
    for kk in keys:
        dig = hashlib.md5(kk.encode()).digest()
        h1, h2 = int.from_bytes(dig[:4], "big"), int.from_bytes(dig[4:8], "big")
        out[kk] = min(
            table.get((d, (h1 + d * h2) % width), 0) for d in range(depth)
        )
    return out


def hll_estimate(registers: list[dict], *, p: int = 11,
                 group_col: str | None = None) -> dict:
    """Standard HLL estimate (with linear-counting small-range correction)
    from register rows — driver-side, the register table is tiny (≤ 2^p
    rows per group)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    groups: dict = {}
    for r in registers:
        g = r[group_col] if group_col else None
        groups.setdefault(g, {})[r["bucket"]] = r["reg"]
    out = {}
    for g, regs in groups.items():
        ssum = sum(2.0 ** -v for v in regs.values()) + (m - len(regs))
        est = alpha * m * m / ssum
        zeros = m - len(regs)
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out[g] = est
    return out


def heavy_hitters(ds: Dataset, col: str, m: int) -> Dataset:
    """Exact φ-frequent items: every value whose count exceeds N/m (N =
    non-null rows), with its EXACT count — the two-pass heavy-hitter
    algorithm, the shuffle-free answer to "top share-of-traffic keys" that
    a plain groupby would solve by exchanging every distinct key.

    Pass 1 (candidates): per batch, an Arrow group-count keeps only values
    with local count·m > n_batch. The averaging argument makes that a
    guaranteed superset of the global answer — if count(x)·m > N then some
    batch has count_b(x)·m > n_b (otherwise summing the ≤ gives a
    contradiction) — and at most m−1 values per batch can pass, so the
    candidate stream is O(batches·m) rows, combined down by a two-phase
    grouped sum (which also folds the per-batch totals, carried as one
    null-key row per batch, into N). Pass 2 (verify): candidates broadcast
    via ``ray.put`` + the worker-global cache, an ``is_in`` filter and the
    same combiner-first grouped sum produce exact counts; the final filter
    count·m > N makes the output independent of batch boundaries.

    The input executes twice (it's a two-pass algorithm) — feed it a base
    read or a cheap transform, or checkpoint first. Null values are
    ignored (oracle: ``WHERE col IS NOT NULL``).

    cgr analog: the reference surfaces "most referenced symbols" by full
    in-memory count maps (function_registry.py simple_name_lookup); this
    is the bounded-exchange exact variant.
    """
    import ray

    from code_graph_rag_ray.functions.broadcast import get_broadcast
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    if m < 2:
        raise ValueError("m must be ≥ 2")

    def _filler(t: pa.DataType) -> pa.Array:
        # totals ride as (is_tot=1, filler-key) rows — Ray's sort-based
        # groupby cannot order null keys, so the flag column (first in the
        # key tuple) keeps them apart from any real value instead
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""], type=t)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return pa.array([b""], type=t)
        return pa.array([0]).cast(t)

    def candidates(b: pa.Table) -> pa.Table:
        vals = b[col].combine_chunks() if isinstance(b[col], pa.ChunkedArray) else b[col]
        vals = vals.drop_null()
        n_b = len(vals)
        total = pa.table({"is_tot": pa.array([1], pa.int8()),
                          col: _filler(vals.type),
                          "n": pa.array([n_b], pa.int64())})
        if n_b == 0:
            return total
        g = pa.TableGroupBy(pa.table({col: vals}), [col],
                            use_threads=False).aggregate([([], "count_all")])
        cnt = pc.cast(g["count_all"], pa.int64())
        keep = pc.greater(pc.multiply(cnt, m), n_b)
        kept = pa.table({"is_tot": pa.nulls(len(g), pa.int8()).fill_null(0),
                         col: g[col], "n": cnt}).filter(keep)
        return pa.concat_tables([kept, total])

    rows = ds.map_batches(candidates, batch_format="pyarrow")
    small = partial_groupby_sum(rows, ["is_tot", col], {"n": "n"}).take_all()
    n_total = sum(r["n"] for r in small if r["is_tot"] == 1)
    cand = sorted(r[col] for r in small if r["is_tot"] == 0)
    if not cand or n_total == 0:
        import ray.data as rd

        # rare branch; schema probe is fine on the base-read inputs this
        # op is documented for (NOTES.md fact 22 on all-to-all plans)
        vt = ds.schema().base_schema.field(col).type
        return rd.from_arrow(
            pa.schema([(col, vt), ("n", pa.int64())]).empty_table())
    ref = ray.put(pa.array(cand))

    def verify(b: pa.Table) -> pa.Table:
        vals = b[col].combine_chunks() if isinstance(b[col], pa.ChunkedArray) else b[col]
        vals = vals.drop_null()
        mask = pc.is_in(vals, value_set=get_broadcast(ref))
        hits = vals.filter(mask)
        if len(hits) == 0:
            return pa.table({col: pa.array([], vals.type),
                             "n": pa.array([], pa.int64())})
        g = pa.TableGroupBy(pa.table({col: hits}), [col],
                            use_threads=False).aggregate([([], "count_all")])
        return pa.table({col: g[col], "n": pc.cast(g["count_all"], pa.int64())})

    exact = partial_groupby_sum(ds.map_batches(verify, batch_format="pyarrow"),
                                [col], {"n": "n"})
    return exact.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(t["n"], m), n_total)),
        batch_format="pyarrow",
    )


def hdr_bucket_lower_bounds(vi: np.ndarray, sub_bits: int) -> np.ndarray:
    """HDR-histogram bucket LOWER BOUND per nonnegative int64 value:
    values below 2^sub_bits map to themselves (exact); larger values keep
    their top ``sub_bits+1`` significant bits (the rest zeroed), giving a
    relative error ≤ 2^-sub_bits. Pure integer ops — bit_length via the
    smear+popcount identity (NOTES.md fact 17), so DuckDB replays the
    exact buckets with bit_count."""
    vi = np.maximum(vi, 0).astype(np.int64)
    x = vi.astype(np.uint64)
    for sh in (1, 2, 4, 8, 16, 32):
        x = x | (x >> np.uint64(sh))
    e = _popcount64(x) - 1  # bit_length(vi) - 1; -1 for vi == 0
    shift = np.maximum(e - sub_bits, 0)
    return (vi >> shift) << shift


def hdr_histogram(
    ds: Dataset,
    col: str,
    *,
    scale: int = 1000,
    sub_bits: int = 7,
) -> Dataset:
    """Mergeable HDR-style quantile-sketch histogram: (lb, c) rows, one
    per occupied bucket. The double column is fixed-pointed to
    ``floor(value·scale)`` integer units, bucketed by
    :func:`hdr_bucket_lower_bounds`, and folded through the standard
    partial-count shuffle. Bucket count is bounded (≈ 2^sub_bits ·
    (64 − sub_bits)) regardless of input size — the 100 TB path where the
    exact selection's refinement rounds are too many passes. Negative
    values clamp into bucket 0 (document the domain); DETERMINISTIC and
    merge-order independent by construction (buckets are pure functions
    of values, merging is addition), unlike t-digest/KLL whose centroids
    depend on compaction order."""
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    def bucket(b: pa.Table) -> pa.Table:
        arr = b[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        vi = np.floor(v[keep] * scale).astype(np.int64)
        lb = hdr_bucket_lower_bounds(vi, sub_bits)
        return pa.table({"lb": pa.array(lb)})

    return partial_groupby_sum(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["lb"], {}, count_alias="c",
    )


def hdr_quantiles(
    ds: Dataset,
    col: str,
    qs: dict[str, float],
    *,
    scale: int = 1000,
    sub_bits: int = 7,
):
    """One-row quantile estimates off the mergeable histogram: for each
    q the SMALLEST bucket lower bound whose cumulative count reaches
    ceil(q·n) (quantile_disc's rank rule applied to bucket bounds).
    Estimates are in fixed-point units (``<name>_milli`` at the default
    scale) with relative error ≤ 2^-sub_bits; the finish reads only the
    bounded bucket table."""
    import pandas as pd

    rows = hdr_histogram(ds, col, scale=scale, sub_bits=sub_bits).take_all()
    if not rows:
        return pd.DataFrame([{"n": 0, **{k: 0 for k in qs}}])
    lbs = np.asarray([r["lb"] for r in rows], np.int64)
    cs = np.asarray([r["c"] for r in rows], np.int64)
    order = np.argsort(lbs)
    lbs, cs = lbs[order], cs[order]
    cum = np.cumsum(cs)
    n = int(cum[-1])
    out = {"n": n}
    for name, q in qs.items():
        rank = int(np.ceil(q * n))
        out[name] = int(lbs[int(np.searchsorted(cum, max(rank, 1)))])
    return pd.DataFrame([out])


def hdr_quantiles_grouped(
    ds: Dataset,
    col: str,
    group: str,
    qs: dict[str, float],
    *,
    scale: int = 1000,
    sub_bits: int = 7,
):
    """Per-group quantile estimates off the mergeable HDR histogram —
    one row per group value. Same determinism/error contract as
    :func:`hdr_quantiles`; the shuffle folds (group, lb) partial counts
    and the finish reads only |groups| × bounded-buckets rows."""
    import pandas as pd

    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    def bucket(b: pa.Table) -> pa.Table:
        arr = b[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        vi = np.floor(v[keep] * scale).astype(np.int64)
        g = pc.cast(b[group], pa.string())
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        g = g.filter(pa.array(keep))
        return pa.table({group: g,
                         "lb": pa.array(hdr_bucket_lower_bounds(vi, sub_bits))})

    rows = partial_groupby_sum(
        ds.map_batches(bucket, batch_format="pyarrow"),
        [group, "lb"], {}, count_alias="c",
    ).take_all()
    if not rows:
        return pd.DataFrame(columns=[group, "n", *qs]).astype({"n": "int64"})
    df = pd.DataFrame(rows).sort_values([group, "lb"], kind="mergesort")
    out = []
    for gval, gdf in df.groupby(group, sort=True):
        cum = gdf["c"].to_numpy(np.int64).cumsum()
        lbs = gdf["lb"].to_numpy(np.int64)
        n = int(cum[-1])
        row = {group: gval, "n": n}
        for name, q in qs.items():
            rank = max(int(np.ceil(q * n)), 1)
            row[name] = int(lbs[int(np.searchsorted(cum, rank))])
        out.append(row)
    return pd.DataFrame(out)
