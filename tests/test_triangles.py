"""Triangle listing: planted structures (K5, star, chain) and layout
invariance — each triangle listed exactly once with sorted vertices."""

from __future__ import annotations

from itertools import combinations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.graph_metrics import triangles


def _edges(pairs, blocks=4):
    rows = [{"a": min(x, y), "b": max(x, y)} for x, y in pairs]
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(blocks)


def _run(pairs, blocks=4):
    out = triangles(_edges(pairs, blocks)).take_all()
    tri = [(r["ta"], r["tb"], r["tc"]) for r in out]
    assert len(tri) == len(set(tri))  # each triangle exactly once
    return set(tri)


def test_k5_lists_all_10_triangles():
    nodes = [f"n{i}" for i in range(5)]
    k5 = list(combinations(nodes, 2))
    exp = {tuple(sorted(t)) for t in combinations(nodes, 3)}
    for blocks in (1, 4):
        assert _run(k5, blocks) == exp


def test_star_and_chain_have_none():
    star = [("hub", f"leaf{i}") for i in range(50)]  # whale node, 0 wedges
    assert _run(star) == set()
    chain = [(f"c{i}", f"c{i+1}") for i in range(20)]
    assert _run(chain) == set()


def test_two_triangles_sharing_an_edge():
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("c", "d")]
    assert _run(pairs) == {("a", "b", "c"), ("b", "c", "d")}


def test_clustering_coefficient_exact():
    from code_graph_rag_ray.stages.graph_metrics import clustering_coefficient

    # bowtie: triangle a-b-c + pendant d on b + triangle-free edge d-e
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("d", "e")]
    for blocks in (1, 4):
        out = {r["node"]: (r["deg"], r["n_tri"], r["cc_micro"])
               for r in clustering_coefficient(_edges(pairs, blocks)).take_all()}
        assert out == {
            "a": (2, 1, 1000000),          # closed pair
            "b": (3, 1, (2 * 10**6) // 6),  # 1 of 3 pairs closed
            "c": (2, 1, 1000000),
            "d": (2, 0, 0),                 # open wedge
            "e": (1, 0, 0),                 # deg < 2
        }
