"""connected_components operator tests (union-find canonicalization analog)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.components import component_sizes, connected_components


def _cc(pairs):
    t = pa.Table.from_pylist([{"src": a, "dst": b} for a, b in pairs])
    labels = connected_components(rd.from_arrow(t), num_partitions=4)
    df = labels.to_pandas()
    return dict(zip(df["node"], df["component"]))


def test_two_components():
    got = _cc([("a", "b"), ("b", "c"), ("x", "y")])
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == "x"
    assert got["a"] != got["x"]


def test_chain_beyond_one_round():
    # a path graph needs several propagation rounds
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)]
    got = _cc(chain)
    assert set(got.values()) == {"n00"}


def test_component_sizes():
    t = pa.Table.from_pylist([{"src": a, "dst": b} for a, b in [("a", "b"), ("x", "y"), ("y", "z")]])
    labels = connected_components(rd.from_arrow(t), num_partitions=2)
    sizes = {r["component"]: r["size"] for r in component_sizes(labels).to_pandas().to_dict("records")}
    assert sizes == {"a": 2, "x": 3}
