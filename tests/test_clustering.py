"""Fixed-point k-means: determinism across block layouts, planted-cluster
recovery, and exact agreement with a single-process numpy Lloyd replay.

Reference parity note: the reference has no clustering, but its retrieval
layer buckets the corpus by qualified-name prefix (`function_registry_trie.py`)
— k-means over embeddings is the web-corpus analog of that organizing pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from code_graph_rag_ray.stages.clustering import kmeans_fixed_point


def _planted(n_per: int = 40, k: int = 3, dim: int = 8, seed: int = 11):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, size=(k, dim)) * 5
    pts = [centers[c] + rng.normal(0, 0.05, size=(n_per, dim)) for c in range(k)]
    # interleave ids across groups (id % k = group) so the deterministic
    # smallest-id seeding picks one seed per planted cluster
    rows = [
        {"vec_id": i * k + c, "embedding": [float(x) for x in pts[c][i]]}
        for i in range(n_per)
        for c in range(k)
    ]
    return rows, centers


def _numpy_lloyd(rows, k, iters, scale):
    """Single-process replay of the exact integer recurrence."""
    ids = np.array([r["vec_id"] for r in rows])
    q = np.round(np.array([r["embedding"] for r in rows], np.float64) * scale)
    q = q.astype(np.int64)
    cent = q[np.argsort(ids)][:k]  # k smallest ids, id order
    cent_ids = np.arange(k)
    for _ in range(iters):
        d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cl = cent_ids[np.argmin(d, axis=1)]
        uniq = np.unique(cl)
        cent = np.stack(
            [np.floor_divide(q[cl == u].sum(axis=0), (cl == u).sum()) for u in uniq]
        )
        cent_ids = uniq
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    j = np.argmin(d, axis=1)
    return {int(i): (int(cent_ids[jj]), int(d[row, jj]))
            for row, (i, jj) in enumerate(zip(ids, j))}


@pytest.mark.parametrize("blocks", [1, 7])
def test_kmeans_matches_numpy_replay_any_layout(blocks):
    rows, _ = _planted()
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(blocks)
    out = kmeans_fixed_point(ds, k=3, iters=2, scale=1000).take_all()
    exp = _numpy_lloyd(rows, k=3, iters=2, scale=1000)
    assert len(out) == len(rows)
    for r in out:
        assert (r["cluster"], r["dist"]) == exp[r["vec_id"]]


def test_kmeans_recovers_planted_clusters():
    rows, _ = _planted(n_per=50, k=3)
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
    out = kmeans_fixed_point(ds, k=3, iters=3, scale=1000).take_all()
    # every planted group (id % 3) must land in ONE cluster
    by_group = {}
    for r in out:
        by_group.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(v) == 1 for v in by_group.values()), by_group
    # and the three groups in three distinct clusters
    assert len({next(iter(v)) for v in by_group.values()}) == 3
