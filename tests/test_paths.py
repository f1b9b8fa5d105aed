"""K-hop pattern matching + bounded reachability (stages/paths.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from code_graph_rag_ray.stages.paths import (
    bounded_reachability,
    count_pattern,
    match_pattern,
    parse_pattern,
    path_counts,
)


def _edges(rows):
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_parse_pattern_basics():
    v, p = parse_pattern("(a)-[join]->(b)-[merge|filter]->(c)")
    assert v == ["a", "b", "c"]
    assert p == [(["join"], 1, 1), (["merge", "filter"], 1, 1)]
    v, p = parse_pattern("(x)-[*]->(y)-[]->(z)")
    assert p == [(None, 1, 1), (None, 1, 1)]
    v, p = parse_pattern("(a)-[join*1..3]->(b)-[*1..2]->(c)")
    assert p == [(["join"], 1, 3), (None, 1, 2)]
    with pytest.raises(ValueError, match="unique"):
        parse_pattern("(a)-[p]->(a)")
    with pytest.raises(ValueError, match="bad hop range"):
        parse_pattern("(a)-[p*3..2]->(b)")
    with pytest.raises(ValueError):
        parse_pattern("(a)-[p]-(b)")
    with pytest.raises(ValueError):
        parse_pattern("just text")


def test_match_pattern_variable_length():
    # chain a->b->c->d on pred p, plus a shortcut a->c on q
    e = _edges([("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
                ("a", "q", "c")])
    got = match_pattern(e, "(x)-[p*1..3]->(y)").to_pandas()
    pairs = sorted(map(tuple, got[["x", "y"]].values.tolist()))
    # 1 hop: ab, bc, cd; 2 hops: ac, bd; 3 hops: ad — q edge excluded
    assert pairs == sorted([("a", "b"), ("b", "c"), ("c", "d"),
                            ("a", "c"), ("b", "d"), ("a", "d")])
    # variable segment composes with a fixed hop; anonymous vars projected
    got2 = match_pattern(e, "(x)-[q]->(y)-[p*1..2]->(z)").to_pandas()
    assert list(got2.columns) == ["x", "y", "z"]
    assert sorted(map(tuple, got2[["x", "y", "z"]].values.tolist())) == [
        ("a", "c", "d")]


def test_match_pattern_two_hop_counts():
    e = _edges([
        ("a", "join", "b"), ("b", "merge", "c"),
        ("a", "join", "x"), ("x", "merge", "c"),
        ("a", "sort", "b"),          # wrong pred: excluded
        ("c", "merge", "a"),         # not reachable from a join edge head
    ])
    got = path_counts(
        match_pattern(e, "(u)-[join]->(v)-[merge]->(w)"), "u", "w"
    ).to_pandas()
    assert got.set_index(["u", "w"])["n_paths"].to_dict() == {("a", "c"): 2}


def test_match_pattern_cycle_exclusion():
    # a -> b -> a is a valid 2-hop walk but NOT a simple path
    e = _edges([("a", "p", "b"), ("b", "p", "a"), ("b", "p", "c")])
    simple = match_pattern(e, "(x)-[p]->(y)-[p]->(z)").to_pandas()
    walks = match_pattern(e, "(x)-[p]->(y)-[p]->(z)",
                          distinct_nodes=False).to_pandas()
    assert sorted(map(tuple, simple[["x", "y", "z"]].values.tolist())) == [
        ("a", "b", "c")]
    assert ("a", "b", "a") in set(map(tuple, walks[["x", "y", "z"]].values.tolist()))


def test_match_pattern_any_pred_and_alternation():
    e = _edges([("a", "p", "b"), ("b", "q", "c"), ("b", "r", "d")])
    got = match_pattern(e, "(x)-[*]->(y)-[q|r]->(z)").to_pandas()
    assert sorted(map(tuple, got[["x", "y", "z"]].values.tolist())) == [
        ("a", "b", "c"), ("a", "b", "d")]


def test_count_pattern_equals_materialized_path_counts():
    """The factorized binding-multiplicity chain must count exactly what
    path_counts(match_pattern(...)) counts — incl. parallel edges (the
    multiplicity case it exists for), cycles, and varlen segments."""
    rows = (
        [("a", "p", "b")] * 3 + [("b", "q", "c")] * 2   # 6 parallel 2-hop paths
        + [("a", "p", "c"), ("c", "q", "a"),              # cycle back
           ("b", "q", "d"), ("d", "p", "b"), ("a", "q", "d")]
    )
    e = _edges(rows)
    for pat in ("(x)-[p]->(y)-[q]->(z)",
                "(x)-[*]->(y)-[*]->(z)",
                "(x)-[p|q*1..2]->(y)"):
        src, dst = ("x", "z") if "(z)" in pat else ("x", "y")
        want = path_counts(match_pattern(e, pat), src, dst).to_pandas()
        got = count_pattern(e, pat).to_pandas()
        w = want.set_index([src, dst])["n_paths"].to_dict()
        g = got.set_index([src, dst])["n_paths"].to_dict()
        assert g == w, (pat, g, w)


def _py_reachability(rows, seeds, k):
    """Reference BFS for the oracle check."""
    adj: dict = {}
    for s, _p, o in rows:
        adj.setdefault(s, set()).add(o)
    want = {}
    for src in seeds:
        dist = {src: 0}
        frontier = [src]
        for h in range(1, k + 1):
            nxt = []
            for n in frontier:
                for m in adj.get(n, ()):
                    if m not in dist:
                        dist[m] = h
                        nxt.append(m)
            frontier = nxt
        for n, d in dist.items():
            want[(src, n)] = d
    return want


def test_bounded_reachability_matches_reference_bfs():
    rows = [
        ("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("d", "p", "e"),
        ("b", "p", "a"),                   # cycle back
        ("a", "p", "c"),                   # shortcut: c settles at 1, not 2
        ("z", "p", "z"),                   # self-loop seedless node
    ]
    seeds_list = ["a", "b", "q"]           # q has no edges at all
    e = _edges(rows)
    seeds = rd.from_arrow(pa.table({"node": pa.array(seeds_list, pa.string())}))
    got = bounded_reachability(e, seeds, k=3).to_pandas()
    gmap = {(r.src, r.node): r.hops for r in got.itertuples()}
    assert gmap == _py_reachability(rows, seeds_list, 3)
    # q reaches only itself (hops=0); the a→c shortcut makes e 3 hops away
    assert gmap[("q", "q")] == 0
    assert gmap[("a", "e")] == 3


def test_bounded_reachability_early_stop_past_diameter():
    rows = [("a", "p", "b")]
    e = _edges(rows)
    seeds = rd.from_arrow(pa.table({"node": pa.array(["a"], pa.string())}))
    got = bounded_reachability(e, seeds, k=5).to_pandas()
    gmap = {(r.src, r.node): r.hops for r in got.itertuples()}
    assert gmap == {("a", "a"): 0, ("a", "b"): 1}
