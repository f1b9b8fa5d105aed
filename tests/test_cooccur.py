"""Entity co-occurrence: pair counts and integer lift vs a scalar replay,
invariant to block layout and to duplicate mention rows."""

from __future__ import annotations

from itertools import combinations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.cooccur import entity_cooccurrence

DOCS = {
    1: ["apple", "banana", "cherry"],
    2: ["apple", "banana"],
    3: ["banana", "cherry", "apple"],
    4: ["date"],
    5: ["apple", "date"],
    6: ["banana"],
}


def _expected(scale=10**6):
    n = len(DOCS)
    marg: dict = {}
    for ents in DOCS.values():
        for e in set(ents):
            marg[e] = marg.get(e, 0) + 1
    pairs: dict = {}
    for ents in DOCS.values():
        for a, b in combinations(sorted(set(ents)), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {
        k: (c, (c * n * scale) // (marg[k[0]] * marg[k[1]]))
        for k, c in pairs.items()
    }


def test_cooccurrence_matches_replay_with_dups_and_layouts():
    rows = [
        {"doc_id": d, "surface": e}
        for d, ents in DOCS.items()
        for e in ents
    ]
    rows += rows[:5]  # duplicate mention rows must not change anything
    exp = _expected()
    for blocks in (1, 6):
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(blocks)
        got = {
            (r["a"], r["b"]): (r["c_ab"], r["lift_fp"])
            for r in entity_cooccurrence(ds).take_all()
        }
        assert got == exp


def test_lift_orders_association():
    rows = [{"doc_id": d, "surface": e} for d, ents in DOCS.items()
            for e in ents]
    out = {(r["a"], r["b"]): r["lift_fp"]
           for r in entity_cooccurrence(rd.from_arrow(
               pa.Table.from_pylist(rows))).take_all()}
    # (apple,banana) co-occur 3/6 docs with marginals 4,4 → lift 1.125;
    # (apple,date) 1/6 with marginals 4,2 → lift 0.75
    assert out[("apple", "banana")] == 1_125_000
    assert out[("apple", "date")] == 750_000
    assert out[("apple", "banana")] > out[("apple", "date")]


def test_item_cocitation_distributed_marginals():
    """Co-citation over (group, item) edges: hand-checked counts + lift,
    marginals joined distributed (no driver dict)."""
    import pyarrow as pa
    import ray.data as rd

    from code_graph_rag_ray.stages.cooccur import item_cocitation

    edges = pa.table({
        "g": pa.array(["g1", "g1", "g2", "g2", "g3", "g3"], pa.string()),
        "i": pa.array(["A", "B", "A", "B", "B", "C"], pa.string()),
    })
    out = item_cocitation(
        rd.from_arrow(edges).repartition(3), group_col="g", item_col="i"
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    got = {(r.a, r.b): (int(r.c_ab), int(r.lift_fp)) for r in out.itertuples()}
    # marg A=2 B=3 C=1, n_groups=3:
    #   (A,B): c_ab=2, lift = 2*3*1e6 // (2*3) = 1_000_000
    #   (B,C): c_ab=1, lift = 1*3*1e6 // (3*1) = 1_000_000
    assert got == {("A", "B"): (2, 1_000_000), ("B", "C"): (1, 1_000_000)}


def test_cooccurrence_plan_parity_broadcast_vs_bucketed():
    """budget=0 forces the bucketed-join marginal plan; it must be
    bit-identical to the broadcast plan (VERDICT r03 #2)."""
    rows = [{"doc_id": d, "surface": e} for d, ents in DOCS.items()
            for e in ents]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    exp = _expected()
    got_bucketed = {
        (r["a"], r["b"]): (r["c_ab"], r["lift_fp"])
        for r in entity_cooccurrence(ds, broadcast_budget_bytes=0).take_all()
    }
    assert got_bucketed == exp
