"""DSIR importance scoring: planted-signal sanity, layout invariance,
and the integer bit_length helper's exactness."""

import numpy as np
import pyarrow as pa
import ray

from code_graph_rag_ray.stages.dsir import _bit_length_u64, dsir_scores


def _mk(rows, parallelism=4):
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(parallelism)


ROWS = (
    [{"doc_id": i, "lang": "en",
      "text": f"quantum flux lattice spectrum d{i}"} for i in range(8)]
    + [{"doc_id": 100 + i, "lang": "de",
        "text": f"der markt preis aktie b{i}"} for i in range(8)]
    # raw docs: one looks like the target domain, one does not
    + [{"doc_id": 200, "lang": "fr", "text": "quantum flux lattice spectrum"},
       {"doc_id": 201, "lang": "fr", "text": "der markt preis aktie"},
       {"doc_id": 202, "lang": "fr", "text": ""}]
)


def test_bit_length_matches_python():
    xs = np.array([0, 1, 2, 3, 65535, 65536, 2**52 - 1, 2**52, 2**62],
                  dtype=np.uint64)
    got = _bit_length_u64(xs)
    assert got.tolist() == [int(x).bit_length() for x in xs.tolist()]


def test_dsir_planted_signal():
    out = {r["doc_id"]: r for r in
           dsir_scores(_mk(ROWS), target_value="en").take_all()}
    assert len(out) == len(ROWS)
    # target-looking raw doc outscores the raw-looking one
    assert out[200]["dsir_score"] > out[201]["dsir_score"]
    # empty text: zero features, zero score, still emitted
    assert out[202]["n_feats"] == 0 and out[202]["dsir_score"] == 0
    assert out[0]["in_target"] and not out[200]["in_target"]
    # n_feats = unigrams + adjacent bigrams = 2n-1
    assert out[200]["n_feats"] == 7


def test_dsir_layout_invariant():
    a = sorted(dsir_scores(_mk(ROWS, 1), target_value="en").take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(dsir_scores(_mk(list(reversed(ROWS)), 7),
                           target_value="en").take_all(),
               key=lambda r: r["doc_id"])
    assert a == b


def test_dsir_fast_family_same_shape():
    rows = dsir_scores(_mk(ROWS), target_value="en",
                       hash_family="fast").take_all()
    by_id = {r["doc_id"]: r for r in rows}
    # fast family changes bucket assignment but not feature counts
    assert by_id[200]["n_feats"] == 7
    assert by_id[200]["dsir_score"] > by_id[201]["dsir_score"]
