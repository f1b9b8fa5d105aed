"""Label propagation: equivalence to a naive synchronous reference,
two planted communities, isolated nodes, and layout invariance."""

from collections import Counter

import pyarrow as pa
import ray

from code_graph_rag_ray.stages.graph_metrics import label_propagation


def _ref_lpa(edges, nodes, iters):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nbrs: dict = {n: [] for n in nodes}
    for s, d in und:
        nbrs[d].append(s)  # d receives s's label
    lab = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            cnt = Counter(lab[m] for m in nbrs[n])
            cand = [(-c, l) for l, c in cnt.items()] + [(0, lab[n])]
            new[n] = min(cand)[1]
        lab = new
    return lab


EDGES = (
    # clique a1-a2-a3 plus tail a4; clique b1-b2-b3; duplicate + self edges
    [("a1", "a2"), ("a2", "a3"), ("a3", "a1"), ("a3", "a4"),
     ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
     ("a1", "a2"), ("b2", "b2")]
)
NODES = ["a1", "a2", "a3", "a4", "b1", "b2", "b3", "iso"]


def _run(edges, nodes, iters, parallelism=3):
    e = ray.data.from_arrow(pa.table(
        {"src": pa.array([x for x, _ in edges], pa.string()),
         "dst": pa.array([y for _, y in edges], pa.string())}
    )).repartition(parallelism)
    n = ray.data.from_arrow(pa.table(
        {"node": pa.array(nodes, pa.string())}
    )).repartition(2)
    out = label_propagation(e, n, iters=iters).take_all()
    return {r["node"]: r["community"] for r in out}


def test_lpa_matches_reference():
    for iters in (1, 2, 4):
        assert _run(EDGES, NODES, iters) == _ref_lpa(EDGES, NODES, iters)


def test_lpa_two_communities_and_isolated():
    got = _run(EDGES, NODES, 4)
    assert len({got[n] for n in ("a1", "a2", "a3", "a4")}) == 1
    assert len({got[n] for n in ("b1", "b2", "b3")}) == 1
    assert got["a1"] != got["b1"]
    assert got["iso"] == "iso"


def test_lpa_layout_invariant():
    a = _run(EDGES, NODES, 3, parallelism=1)
    b = _run(list(reversed(EDGES)), list(reversed(NODES)), 3, parallelism=7)
    assert a == b
