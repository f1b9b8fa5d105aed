"""Deterministic split / stratified-sample tests (training-data curation).

The invariants that matter at 100 TB: assignment is a pure function of the
id (order/partitioning independent — re-running over a reshuffled corpus
yields the identical split), fractions land near their targets, and the
per-stratum policy is honored exactly.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.sampling import hash_split, stratified_sample


def _docs(n=2000, blocks=1):
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en" if i % 3 else "fr" for i in range(n)]),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_hash_split_deterministic_and_partitioning_independent():
    a = hash_split(_docs(blocks=1), id_col="doc_id").to_pandas()
    b = hash_split(_docs(blocks=13), id_col="doc_id").to_pandas()
    ma = dict(zip(a.doc_id, a.split))
    mb = dict(zip(b.doc_id, b.split))
    assert ma == mb
    frac = a.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac.get("val", 0) - 0.05) < 0.02
    assert abs(frac.get("test", 0) - 0.05) < 0.02


def test_hash_split_custom_ratios_cover_all_rows():
    out = hash_split(
        _docs(500), id_col="doc_id", splits={"a": 0.5, "b": 0.5}
    ).to_pandas()
    assert set(out.split) == {"a", "b"}
    assert len(out) == 500


def test_stratified_sample_policy_exact():
    ds = _docs(3000)
    out = stratified_sample(
        ds, id_col="doc_id", strata_col="lang",
        fractions={"fr": 1.0, "en": 0.25},
    ).to_pandas()
    src = _docs(3000).to_pandas()
    n_fr = (src.lang == "fr").sum()
    # fr keeps EVERY row (threshold = buckets); en lands near 25%
    assert (out.lang == "fr").sum() == n_fr
    en_frac = (out.lang == "en").sum() / (src.lang == "en").sum()
    assert abs(en_frac - 0.25) < 0.05
    # keep decision is id-pure: re-run yields the identical row set
    out2 = stratified_sample(
        _docs(3000), id_col="doc_id", strata_col="lang",
        fractions={"fr": 1.0, "en": 0.25},
    ).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_stratified_sample_default_fraction_zero_drops_unknown():
    out = stratified_sample(
        _docs(300), id_col="doc_id", strata_col="lang", fractions={"fr": 1.0}
    ).to_pandas()
    assert set(out.lang) == {"fr"}


def test_cross_split_leaks_planted():
    """Planted identical prefixes spanning splits must surface; fingerprints
    confined to one split must not."""
    from code_graph_rag_ray.stages.sampling import cross_split_leaks, hash_split

    shared = "the quick brown fox jumps over the lazy dog tail one"
    n = 400
    texts = [f"unique {i} text body with distinct tokens {i*7} here okay" for i in range(n)]
    # plant the shared prefix on MANY ids so both sides of the 90/10 split
    # get some deterministically
    for i in range(0, n, 4):
        texts[i] = shared + f" suffix {i}"
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
    })
    splits = {"train": 0.5, "test": 0.5}
    leaks = cross_split_leaks(
        rd.from_arrow(t), id_col="doc_id", text_col="text",
        splits=splits, prefix_tokens=8,
    ).to_pandas()
    import hashlib
    fp = hashlib.md5(" ".join(shared.split()[:8]).encode()).hexdigest()
    assert fp in set(leaks.fingerprint)
    row = leaks[leaks.fingerprint == fp].iloc[0]
    assert row.n_train + row.n_test == 100 and row.n_train > 0 and row.n_test > 0
    # every reported fingerprint genuinely spans both splits
    assert ((leaks.n_train > 0) & (leaks.n_test > 0)).all()
    # sanity: counts reconcile with a direct recomputation
    assigned = hash_split(rd.from_arrow(t), id_col="doc_id", splits=splits).to_pandas()
    planted_ids = set(range(0, n, 4))
    exp_train = (assigned[assigned.doc_id.isin(planted_ids)].split == "train").sum()
    assert row.n_train == exp_train


def test_weighted_sample_monotone_and_replayable():
    import hashlib

    from code_graph_rag_ray.stages.sampling import weighted_sample

    rows = [{"doc_id": i, "w": float((i * 37) % 2500)} for i in range(600)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(7)
    kept = {r["doc_id"]
            for r in weighted_sample(ds, id_col="doc_id", weight_col="w",
                                     rate_per_unit=0.0005).take_all()}
    # scalar replay of the documented rule (half-up rounding)
    import math
    exp = set()
    for r in rows:
        bk = int.from_bytes(
            hashlib.md5(str(r["doc_id"]).encode()).digest()[:4], "big") % 10000
        thr = math.floor(min(r["w"] * 0.0005, 1.0) * 10000 + 0.5)
        if bk < thr:
            exp.add(r["doc_id"])
    assert kept == exp
    # p=1 rows (w >= 2000) are ALWAYS kept; w=0 rows never
    assert all(r["doc_id"] in kept for r in rows if r["w"] >= 2000)
    assert all(r["doc_id"] not in kept for r in rows if r["w"] == 0)
    # monotone: doubling every weight only adds rows
    kept2 = {r["doc_id"]
             for r in weighted_sample(ds, id_col="doc_id", weight_col="w",
                                      rate_per_unit=0.001).take_all()}
    assert kept <= kept2


def test_negative_samples_filtered_and_layout_invariant():
    import hashlib

    from code_graph_rag_ray.stages.sampling import negative_samples

    urls = [f"https://c/{i}" for i in range(20)]
    # star + chain: node 0 is linked by everyone (whale), plus i -> i+1
    pos = [("https://c/%d" % i, "https://c/0") for i in range(1, 20)]
    pos += [("https://c/%d" % i, "https://c/%d" % (i + 1)) for i in range(19)]
    edges_t = pa.table({"src_url": pa.array([e[0] for e in pos]),
                        "dst_url": pa.array([e[1] for e in pos])})
    nodes_t = pa.table({"url": pa.array(urls)})
    edge_set = set(pos)
    ordered = sorted(urls)

    def expect():
        out = set()
        for s, d in pos:
            for j in range(3):
                h = int.from_bytes(
                    hashlib.md5(f"{s}|{d}|{j}".encode()).digest()[:8], "big")
                neg = ordered[h % len(urls)]
                if (s, neg) not in edge_set:
                    out.add((s, d, j, neg))
        return out

    for blocks in (1, 5):
        got = negative_samples(
            rd.from_arrow(edges_t).repartition(blocks),
            rd.from_arrow(nodes_t).repartition(blocks), k=3,
        ).take_all()
        tup = {(r["src"], r["dst"], r["neg_ix"], r["neg"]) for r in got}
        assert tup == expect()
        assert len(got) == len(tup)  # no duplicate rows for distinct edges
        assert all((r["src"], r["neg"]) not in edge_set for r in got)


def test_source_mix_binding_source_kept_whole():
    import pyarrow as pa
    import ray.data as rd

    from code_graph_rag_ray.stages.sampling import source_mix_sample

    # heavy:light sizes 10:1 but target ratio 1:1 -> light is binding
    # (kept whole), heavy thinned to ~1/10
    rows = [{"doc_id": i, "source": "heavy", "n": 100} for i in range(200)]
    rows += [{"doc_id": 1000 + i, "source": "light", "n": 100} for i in range(20)]
    ds = rd.from_arrow(pa.Table.from_pylist(
        rows, schema=pa.schema([("doc_id", pa.int64()),
                                ("source", pa.string()), ("n", pa.int64())])))
    out = source_mix_sample(ds, id_col="doc_id", source_col="source",
                            size_col="n",
                            weights={"heavy": 1, "light": 1}).to_pandas()
    assert len(out) == 220
    g = out.groupby("source")["sampled"].agg(["sum", "size"])
    assert g.loc["light", "sum"] == 20  # binding source fully kept
    frac = g.loc["heavy", "sum"] / 200
    assert 0.03 < frac < 0.2  # ~10% by the hash policy


def test_source_mix_missing_weight_raises():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from code_graph_rag_ray.stages.sampling import source_mix_sample

    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 1, "source": "x", "n": 5}],
        schema=pa.schema([("doc_id", pa.int64()),
                          ("source", pa.string()), ("n", pa.int64())])))
    with pytest.raises(ValueError, match="no target weight"):
        source_mix_sample(ds, id_col="doc_id", source_col="source",
                          size_col="n", weights={"y": 1}).materialize()
