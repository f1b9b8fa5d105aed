"""Fact fusion / truth discovery (stages/fusion.py)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.fusion import fuse_facts


def _edges(rows):
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_majority_vote_wins():
    rows = ([("s", "p", "x")] * 3 + [("s", "p", "y")] * 1
            + [("s", "q", "z")] * 2)
    got = (fuse_facts(_edges(rows)).to_pandas()
           .set_index(["subj", "pred"]).sort_index())
    r = got.loc[("s", "p")]
    assert r["obj"] == "x" and r["votes"] == 3
    assert r["total_votes"] == 4 and r["n_objs"] == 2
    assert r["dominance_micro"] == 750000
    r2 = got.loc[("s", "q")]
    assert r2["obj"] == "z" and r2["n_objs"] == 1
    assert r2["dominance_micro"] == 1000000


def test_ties_break_by_object_text_not_arrival_order():
    # equal votes: 'a' < 'b' must win regardless of row order
    for rows in ([("s", "p", "b"), ("s", "p", "a")],
                 [("s", "p", "a"), ("s", "p", "b")]):
        got = fuse_facts(_edges(rows)).to_pandas()
        assert got.iloc[0]["obj"] == "a"
        assert got.iloc[0]["dominance_micro"] == 500000


def test_groups_span_batches():
    # same (subj, pred) split across many blocks still fuses to one row
    rows = [("s", "p", "x")] * 5 + [("s", "p", "y")] * 7
    ds = _edges(rows).repartition(6)
    got = fuse_facts(ds).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["obj"] == "y" and got.iloc[0]["votes"] == 7
