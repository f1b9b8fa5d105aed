"""HLL sketch: register table invariant to block layout (merge is an
associative max-fold), estimate accuracy within HLL's theoretical error,
and rho correctness against a scalar bit_length replay."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.sketch import hll_estimate, hll_registers


def _ds(n_users, per_group, blocks=8):
    rows = [
        {"g": g, "key": f"user-{(i * 7919 + len(g) * 5) % n_users[g]}"}
        for g in n_users
        for i in range(per_group)
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(blocks)


def test_registers_layout_invariant_and_rho_exact():
    truth = {"a": 70, "b": 350}
    regs1 = hll_registers(_ds(truth, 1000, blocks=1), "key", group_col="g")
    regs9 = hll_registers(_ds(truth, 1000, blocks=9), "key", group_col="g")
    r1 = sorted((r["g"], r["bucket"], r["reg"]) for r in regs1.take_all())
    r9 = sorted((r["g"], r["bucket"], r["reg"]) for r in regs9.take_all())
    assert r1 == r9 and r1
    # scalar replay: every register equals max rho over that bucket's keys
    seen: dict = {}
    for g, n in truth.items():
        keys = {f"user-{(i * 7919 + len(g) * 5) % n}" for i in range(1000)}
        for kk in keys:
            h = int.from_bytes(hashlib.md5(kk.encode()).digest()[:8], "big")
            b, w = h >> 53, h & ((1 << 53) - 1)
            rho = 53 - w.bit_length() + 1
            kkey = (g, b)
            seen[kkey] = max(seen.get(kkey, 0), rho)
    assert dict(((g, b), v) for g, b, v in r1) == seen


def test_estimate_within_error_bound():
    truth = {"small": 40, "mid": 900, "big": 20000}
    rows = [{"g": g, "key": f"{g}/{i}"} for g, n in truth.items()
            for i in range(n)]
    # duplicate every row 3x — cardinality must ignore multiplicity
    ds = rd.from_arrow(pa.Table.from_pylist(rows * 3)).repartition(12)
    regs = hll_registers(ds, "key", group_col="g", p=11).take_all()
    est = hll_estimate(regs, p=11, group_col="g")
    for g, n in truth.items():
        rel = abs(est[g] - n) / n
        # 1.04/sqrt(2048) ≈ 2.3% std error; allow 4 sigma
        assert rel < 0.10, (g, est[g], n)


def test_cms_overestimates_and_is_layout_invariant():
    from code_graph_rag_ray.stages.sketch import cms_counts, cms_estimate

    truth = {"hot": 500, "warm": 60, "cold": 3}
    rows = [{"key": k} for k, n in truth.items() for _ in range(n)]
    rows += [{"key": f"noise-{i}"} for i in range(200)]
    a = cms_counts(rd.from_arrow(pa.Table.from_pylist(rows)).repartition(1),
                   "key", depth=4, width=256).take_all()
    b = cms_counts(rd.from_arrow(pa.Table.from_pylist(rows)).repartition(9),
                   "key", depth=4, width=256).take_all()
    assert sorted((r["d"], r["col"], r["cnt"]) for r in a) == \
           sorted((r["d"], r["col"], r["cnt"]) for r in b)
    est = cms_estimate(a, list(truth), depth=4, width=256)
    for k, n in truth.items():
        assert est[k] >= n                      # CMS never underestimates
        assert est[k] <= n + len(rows) * 0.05   # e/width error bound (loose)


def test_heavy_hitters_exact_and_batch_invariant():
    from code_graph_rag_ray.stages.sketch import heavy_hitters

    # 1000 rows: "hot" 300, "warm" 150, 55 distinct cold keys 10 each,
    # plus nulls (ignored). m=5 → threshold N/5 = 200 → only "hot".
    rows = (
        [{"k": "hot"}] * 300 + [{"k": "warm"}] * 150
        + [{"k": f"cold-{i}"} for i in range(55) for _ in range(10)]
        + [{"k": None}] * 40
    )
    t = pa.Table.from_pylist(rows)
    for blocks in (1, 13):
        out = heavy_hitters(rd.from_arrow(t).repartition(blocks),
                            "k", 5).take_all()
        assert {(r["k"], r["n"]) for r in out} == {("hot", 300)}
    # m=4 → threshold 250: still only hot; m=6 → 166.7: hot + warm... no,
    # warm=150 < 166.7.  m=7 → 142.9: hot + warm.
    out = heavy_hitters(rd.from_arrow(t).repartition(7), "k", 7).take_all()
    assert {(r["k"], r["n"]) for r in out} == {("hot", 300), ("warm", 150)}


def test_heavy_hitters_empty_answer_and_int_keys():
    from code_graph_rag_ray.stages.sketch import heavy_hitters

    # uniform int keys: nothing exceeds N/m for m < distinct count
    rows = [{"k": i % 50} for i in range(500)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(6)
    out = heavy_hitters(ds, "k", 40).take_all()
    assert out == []
    # every key passes at m=51 (each freq 1/50 > 1/51), counts exact
    out = heavy_hitters(ds, "k", 51).take_all()
    assert sorted((r["k"], r["n"]) for r in out) == [(i, 10) for i in range(50)]


def test_hdr_quantiles_error_bound_and_layout_invariance():
    from code_graph_rag_ray.stages.sketch import hdr_quantiles

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.lognormal(3.0, 1.2, 4000),      # heavy tail
        rng.uniform(0, 0.05, 500),          # sub-milli values → bucket 0
    ])
    tbl = pa.table({"value": pa.array(vals, pa.float64())})
    qs = {"p50": 0.50, "p90": 0.90, "p99": 0.99}
    out = hdr_quantiles(rd.from_arrow(tbl), "value", qs).iloc[0]
    assert out["n"] == len(vals)
    vi = np.floor(vals * 1000).astype(np.int64)
    for name, q in qs.items():
        exact = np.sort(vi)[int(np.ceil(q * len(vi))) - 1]
        est = out[name]
        # lower bound of the true value's bucket: within 2^-7 relative
        assert est <= exact
        assert exact - est <= max(exact, 1) / 128 + 1, (name, est, exact)
    # merge-order / layout invariance: different block structure, same row
    out2 = hdr_quantiles(rd.from_arrow(tbl).repartition(13), "value", qs).iloc[0]
    assert (out2 == out).all()


def test_hdr_small_values_are_exact():
    from code_graph_rag_ray.stages.sketch import hdr_quantiles

    # all fixed-point values < 2^7 map to themselves: sketch == exact
    vals = np.array([0.001, 0.002, 0.05, 0.1, 0.127]) * 1.0
    tbl = pa.table({"value": pa.array(np.repeat(vals, 20), pa.float64())})
    out = hdr_quantiles(rd.from_arrow(tbl), "value", {"p50": 0.5}).iloc[0]
    vi = np.sort(np.floor(np.repeat(vals, 20) * 1000).astype(np.int64))
    assert out["p50"] == vi[int(np.ceil(0.5 * len(vi))) - 1]


def test_hdr_grouped_matches_global_per_group():
    from code_graph_rag_ray.stages.sketch import hdr_quantiles, hdr_quantiles_grouped

    rng = np.random.default_rng(9)
    tbl = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], 3000).tolist(), pa.string()),
        "value": pa.array(rng.lognormal(2.0, 1.0, 3000), pa.float64()),
    })
    ds = rd.from_arrow(tbl)
    grouped = hdr_quantiles_grouped(ds, "value", "g", {"p50": 0.5, "p90": 0.9})
    df = tbl.to_pandas()
    for _, row in grouped.iterrows():
        sub = pa.table({"value": pa.array(
            df[df["g"] == row["g"]]["value"].to_numpy(), pa.float64())})
        solo = hdr_quantiles(rd.from_arrow(sub), "value",
                             {"p50": 0.5, "p90": 0.9}).iloc[0]
        assert row["n"] == solo["n"]
        assert row["p50"] == solo["p50"] and row["p90"] == solo["p90"]
