"""PageRank + degree stats vs a single-process integer reference.

The fixed-point recurrence (graph_metrics.pagerank docstring) is exact
integer arithmetic, so the distributed result must match the reference
BIT-FOR-BIT regardless of block layout — that is the whole design point."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.graph_metrics import degree_stats, pagerank

SCALE = 10**12


def ref_pagerank(edges, nodes, iters=4, dn=85, dd=100, scale=SCALE):
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = ((dd - dn) * scale) // (dd * n)
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += (dn * r[a]) // (dd * deg[a])
        dang = sum(r[v] for v in nodes if v not in deg)
        share = (dn * dang) // (dd * n)
        r = {v: base + share + s[v] for v in nodes}
    return r


def _run(edges, nodes, iters=4):
    e = rd.from_items(
        [{"src": a, "dst": b} for a, b in edges], override_num_blocks=7
    )
    nd = rd.from_items([{"node": v} for v in nodes], override_num_blocks=5)
    out = pagerank(e, nd, iters=iters)
    return {r["node"]: r["rank"] for r in out.take_all()}


def test_pagerank_with_dangling_matches_reference():
    nodes = ["a", "b", "c", "d", "e"]
    # d and e are dangling (no out-edges); e also has no in-edges
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")]
    got = _run(edges, nodes)
    want = ref_pagerank(edges, nodes)
    assert got == want
    # sanity: total mass stays within floor-loss of scale
    assert 0 < sum(got.values()) <= SCALE


def test_pagerank_whale_hub_exact():
    n = 400
    nodes = [f"n{i}" for i in range(n)] + ["hub"]
    edges = [(f"n{i}", "hub") for i in range(n)] + [("hub", "n0")]
    got = _run(edges, nodes, iters=3)
    want = ref_pagerank(edges, nodes, iters=3)
    assert got == want
    assert got["hub"] == max(got.values())


def test_pagerank_self_loop_chain():
    # the fixture's doc graph shape: i -> i//2, including the 0 -> 0 self-loop
    nodes = [str(i) for i in range(64)]
    edges = [(str(i), str(i // 2)) for i in range(64)]
    got = _run(edges, nodes)
    want = ref_pagerank(edges, nodes)
    assert got == want
    assert got["0"] == max(got.values())


def test_degree_stats():
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "a")]
    e = rd.from_items([{"src": a, "dst": b} for a, b in edges],
                      override_num_blocks=3)
    rows = {r["node"]: (r["out_deg"], r["in_deg"])
            for r in degree_stats(e).take_all()}
    assert rows == {"a": (2, 2), "b": (1, 1), "c": (2, 2)}
    assert all(isinstance(v[0], (int, np.integer)) for v in rows.values())


def test_bfs_hops_tree_layers_and_bound():
    import pyarrow as pa
    import ray.data as rd

    from code_graph_rag_ray.stages.graph_metrics import bfs_hops

    # binary-heap tree edges i -> i//2 (i = 1..19), BFS from leaf n19
    edges = rd.from_arrow(pa.table({
        "src": pa.array([f"n{i}" for i in range(1, 20)], pa.string()),
        "dst": pa.array([f"n{i//2}" for i in range(1, 20)], pa.string()),
    })).repartition(3)
    out = {r["node"]: int(r["hops"]) for r in
           bfs_hops(edges, ["n19"], max_hops=6).take_all()}
    # brute-force undirected BFS reference
    import collections
    adj = collections.defaultdict(set)
    for i in range(1, 20):
        adj[f"n{i}"].add(f"n{i//2}")
        adj[f"n{i//2}"].add(f"n{i}")
    want, frontier = {"n19": 0}, ["n19"]
    for d in range(1, 7):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in want:
                    want[v] = d
                    nxt.append(v)
        frontier = nxt
    assert out == want
    assert max(out.values()) == 6  # bound reached, never exceeded
    # multi-source: both leaves seed at 0; distances are the min over seeds
    out2 = {r["node"]: int(r["hops"]) for r in
            bfs_hops(edges, ["n19", "n15"], max_hops=3).take_all()}
    assert out2["n19"] == 0 and out2["n15"] == 0
    assert out2["n7"] == 1 and out2["n9"] == 1
    assert all(d <= 3 for d in out2.values())


def test_k_core_peels_tails_and_keeps_clique():
    import pyarrow as pa
    import ray.data as rd

    from code_graph_rag_ray.stages.graph_metrics import k_core

    # K4 clique (a..d) with a pendant path d-e-f and a star hub g->h,i,j
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("e", "f"),
             ("g", "h"), ("g", "i"), ("g", "j")]
    edges = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.string()),
        "b": pa.array([p[1] for p in pairs], pa.string()),
    })).repartition(3)

    core3 = {r["node"]: int(r["deg"]) for r in k_core(edges, k=3).take_all()}
    # 3-core = the K4 clique alone (peeling must cascade: e survives the
    # first degree count? no — deg(e)=2 < 3; then d drops to 3 ✓)
    assert core3 == {"a": 3, "b": 3, "c": 3, "d": 3}

    core2 = {r["node"] for r in k_core(edges, k=2).take_all()}
    # 2-core: path tail f (deg 1) peels, then e (deg 1) peels, then d's
    # degree is still 3; star g,h,i,j all peel (leaves first, then hub)
    assert core2 == {"a", "b", "c", "d"}

    core5 = k_core(edges, k=5).take_all()
    assert core5 == []


def test_bfs_hops_cogroup_fallback_matches_broadcast():
    """The big-frontier cogroup path and the small-frontier broadcast probe
    must produce identical distances (broadcast_frontier_limit=0 forces the
    cogroup shape on every round)."""
    import pyarrow as pa
    import ray.data as rd

    from code_graph_rag_ray.stages.graph_metrics import bfs_hops

    edges = rd.from_arrow(pa.table({
        "src": pa.array([f"n{i}" for i in range(1, 20)], pa.string()),
        "dst": pa.array([f"n{i//2}" for i in range(1, 20)], pa.string()),
    })).repartition(3)
    fast = {r["node"]: int(r["hops"]) for r in
            bfs_hops(edges, ["n19"], max_hops=4).take_all()}
    slow = {r["node"]: int(r["hops"]) for r in
            bfs_hops(edges, ["n19"], max_hops=4,
                     broadcast_frontier_limit=0).take_all()}
    assert fast == slow


def test_hits_hand_checked_and_layout_invariant():
    import pyarrow as pa
    import ray.data as rd

    from code_graph_rag_ray.stages.graph_metrics import hits

    # A->C, B->C, C->D: after 2 unnormalized rounds
    #   a1 = indeg {C:2, D:1}; h1 = {A:2, B:2, C:1}
    #   a2 = {C: h1(A)+h1(B)=4, D: h1(C)=1}; h2 = {A:4, B:4, C:1}
    edges = pa.table({"src": pa.array(["A", "B", "C"], pa.string()),
                      "dst": pa.array(["C", "C", "D"], pa.string())})
    nodes = pa.table({"node": pa.array(["A", "B", "C", "D"], pa.string())})
    want = {"A": (4, 0), "B": (4, 0), "C": (1, 4), "D": (0, 1)}
    for parts in (1, 3):
        out = hits(rd.from_arrow(edges).repartition(parts),
                   rd.from_arrow(nodes), iters=2).to_pandas()
        got = {r.node: (int(r.hub), int(r.auth)) for r in out.itertuples()}
        assert got == want, got


def _bellman_ford_bounded(edges, seeds, max_hops):
    dist = {s: 0 for s in seeds}
    for _ in range(max_hops):
        new = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < new.get(d, 1 << 60):
                new[d] = dist[s] + w
        dist = new
    return dist


def test_sssp_bounded_weighted_improvement_and_truncation():
    from code_graph_rag_ray.stages.graph_metrics import sssp_bounded

    # A->B direct w=10 gets IMPROVED via A->C->B (1+2) a round later;
    # D reachable only at hop 3 (via B->D); E unreachable.
    edges = [("A", "B", 10), ("A", "C", 1), ("C", "B", 2),
             ("B", "D", 1), ("X", "E", 1)]
    t = pa.table({"src": pa.array([e[0] for e in edges]),
                  "dst": pa.array([e[1] for e in edges]),
                  "wt": pa.array([e[2] for e in edges], pa.int64())})
    for hops in (1, 2, 3):
        exp = {k: v for k, v in
               _bellman_ford_bounded(edges, ["A"], hops).items()}
        for limit in (100_000, 0):   # broadcast-probe path and cogroup path
            got = {r["node"]: r["dist"] for r in sssp_bounded(
                rd.from_arrow(t).repartition(3), ["A"], max_hops=hops,
                broadcast_frontier_limit=limit).take_all()}
            assert got == exp, (hops, limit, got, exp)
    # hop-2 answer specifically: B improved to 3, D still at 11 (A->B->D)
    got2 = {r["node"]: r["dist"] for r in sssp_bounded(
        rd.from_arrow(t), ["A"], max_hops=2).take_all()}
    assert got2 == {"A": 0, "C": 1, "B": 3, "D": 11}


def test_neighbor_agg_hand_graph():
    import pandas as pd
    import ray.data as rd

    from code_graph_rag_ray.stages.graph_metrics import neighbor_agg

    edges = pd.DataFrame(
        {"src": ["a", "c", "b", "a"], "dst": ["b", "b", "d", "d"]}
    )
    out = {
        r["src"]: (r["n_out"], r["sum_nbr_in_deg"])
        for r in neighbor_agg(rd.from_pandas(edges).repartition(3)).take_all()
    }
    # in-degrees: b=2, d=2
    assert out == {"a": (2, 4), "c": (1, 2), "b": (1, 2)}


def ref_ppr(edges, nodes, seeds, iters=4, dn=85, dd=100, scale=SCALE):
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ss = set(seeds)
    k = len(ss)
    r = {v: (scale // k if v in ss else 0) for v in nodes}
    base = ((dd - dn) * scale) // (dd * k)
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += (dn * r[a]) // (dd * deg[a])
        dang = sum(r[v] for v in nodes if v not in deg)
        share = (dn * dang) // (dd * k)
        r = {v: (base + share if v in ss else 0) + s[v] for v in nodes}
    return r


def _run_ppr(edges, nodes, seeds, iters=4):
    from code_graph_rag_ray.stages.graph_metrics import personalized_pagerank

    e = rd.from_items(
        [{"src": a, "dst": b} for a, b in edges], override_num_blocks=7
    )
    nd = rd.from_items([{"node": v} for v in nodes], override_num_blocks=5)
    out = personalized_pagerank(e, nd, seeds, iters=iters)
    return {r["node"]: r["rank"] for r in out.take_all()}


def test_ppr_matches_reference_and_localizes():
    # two components: a triangle around the seed, and a far chain
    nodes = ["s", "x", "y", "far1", "far2", "far3"]
    edges = [("s", "x"), ("x", "y"), ("y", "s"),
             ("far1", "far2"), ("far2", "far3")]
    got = _run_ppr(edges, nodes, ["s"])
    assert got == ref_ppr(edges, nodes, ["s"])
    # all mass stays in the seed's component; unreachable nodes get zero
    assert got["far1"] == got["far2"] == got["far3"] == 0
    assert got["s"] > 0 and got["x"] > 0 and got["y"] > 0


def test_ppr_multi_seed_with_dangling():
    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")]
    got = _run_ppr(edges, nodes, ["a", "d"], iters=3)
    assert got == ref_ppr(edges, nodes, ["a", "d"], iters=3)


def test_ppr_duplicate_seeds_deduped():
    nodes = ["a", "b", "c"]
    edges = [("a", "b"), ("b", "c")]
    assert _run_ppr(edges, nodes, ["a", "a", "b"]) == \
        _run_ppr(edges, nodes, ["a", "b"])
