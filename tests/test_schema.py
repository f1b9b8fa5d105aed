"""Typed node labels + relation-legality matrix (M7/T3 / graph-schema
analogs: ``constants/graph.py:87-172``, ``docs/architecture/
graph-schema.md:40-68``)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.canonicalize import canonicalize_entities, entity_type_map
from code_graph_rag_ray.stages.linking import MENTION_SCHEMA
from code_graph_rag_ray.stages.schema import validate_edges

_TYPED_ALIAS = pa.Table.from_pylist(
    [
        {"alias": "Acme Systems", "entity_id": "E0", "prior": 1.0, "etype": "Org"},
        {"alias": "Jane Doe", "entity_id": "E1", "prior": 1.0, "etype": "Person"},
        {"alias": "Widget", "entity_id": "E2", "prior": 1.0, "etype": None},
    ],
    schema=pa.schema([("alias", pa.string()), ("entity_id", pa.string()),
                      ("prior", pa.float64()), ("etype", pa.string())]),
)


def test_entity_type_map_defaults():
    assert entity_type_map(_TYPED_ALIAS) == {"E0": "Org", "E1": "Person"}
    # absent column → empty map (every entity defaults to Entity downstream)
    assert entity_type_map(_TYPED_ALIAS.drop_columns(["etype"])) == {}


def test_canonicalize_emits_typed_labels():
    rows = [
        {"url": "https://x/1", "start": 0, "end": 5, "surface": "Acme Systems",
         "entity_id": "E0", "method": "exact", "rel": "acquired",
         "obj_entity_id": "ext::zorp co", "lang": "en"},
        {"url": "https://x/1", "start": 20, "end": 27, "surface": "Zorp Co",
         "entity_id": "ext::zorp co", "method": "external", "rel": None,
         "obj_entity_id": None, "lang": "en"},
    ]
    mentions = rd.from_arrow(pa.Table.from_pylist(rows, schema=MENTION_SCHEMA))
    nodes = canonicalize_entities(mentions, _TYPED_ALIAS).to_pandas()
    by_id = nodes.set_index("entity_id")
    assert by_id.loc["E0", "label"] == "Org"
    assert by_id.loc["E1", "label"] == "Person"
    assert by_id.loc["E2", "label"] == "Entity"  # null etype → default
    assert by_id.loc["ext::zorp co", "label"] == "ExternalEntity"


def _edges():
    return rd.from_arrow(pa.Table.from_pylist(
        [
            # employs: Org → Person (legal)
            {"subj": "E0", "pred": "employs", "obj": "E1", "provenance_url": "u1"},
            # employs: Person subject (illegal)
            {"subj": "E1", "pred": "employs", "obj": "E1", "provenance_url": "u2"},
            # employs: external object (illegal — ExternalEntity not allowed)
            {"subj": "E0", "pred": "employs", "obj": "ext::zorp co", "provenance_url": "u3"},
            # unconstrained predicate — always legal
            {"subj": "E1", "pred": "mentions", "obj": "ext::zorp co", "provenance_url": "u4"},
        ]
    ))


_LEGALITY = {"employs": (frozenset({"Org"}), frozenset({"Person"}))}


def test_validate_edges_modes():
    flagged = validate_edges(_edges(), _TYPED_ALIAS, _LEGALITY).to_pandas()
    v = flagged.set_index("provenance_url")["violation"]
    assert pd.isna(v["u1"]) and pd.isna(v["u4"])
    assert v["u2"] == "subj-label"
    assert v["u3"] == "obj-label"

    kept = validate_edges(_edges(), _TYPED_ALIAS, _LEGALITY, mode="drop").to_pandas()
    assert sorted(kept.provenance_url) == ["u1", "u4"]
    assert "violation" not in kept.columns

    viols = validate_edges(_edges(), _TYPED_ALIAS, _LEGALITY, mode="violations").to_pandas()
    assert sorted(viols.provenance_url) == ["u2", "u3"]


def test_induce_schema_dominant_pairs_ties_and_externals():
    from code_graph_rag_ray.stages.schema import induce_schema

    rows = [
        # pred "works_at": Person→Org twice, Org→Org once → dominant Person→Org
        {"subj": "E1", "pred": "works_at", "obj": "E0", "provenance_url": "u1"},
        {"subj": "E1", "pred": "works_at", "obj": "E0", "provenance_url": "u2"},
        {"subj": "E0", "pred": "works_at", "obj": "E0", "provenance_url": "u3"},
        # pred "ships": exact tie Org→Entity vs Person→Org → label-text
        # ascending wins (Org < Person)
        {"subj": "E0", "pred": "ships", "obj": "E2", "provenance_url": "u4"},
        {"subj": "E1", "pred": "ships", "obj": "E0", "provenance_url": "u5"},
        # pred "cites": ext:: endpoint → ExternalEntity label
        {"subj": "ext::x", "pred": "cites", "obj": "E1", "provenance_url": "u6"},
    ]
    edges = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (
        induce_schema(edges, _TYPED_ALIAS)
        .to_pandas()
        .set_index("pred")
        .sort_index()
    )
    assert out.loc["works_at", ["subj_label", "obj_label"]].tolist() == ["Person", "Org"]
    assert out.loc["works_at", "support"] == 2 and out.loc["works_at", "total"] == 3
    assert out.loc["works_at", "support_micro"] == 666_666
    assert out.loc["ships", ["subj_label", "obj_label"]].tolist() == ["Org", "Entity"]
    assert out.loc["ships", "support_micro"] == 500_000
    assert out.loc["cites", "subj_label"] == "ExternalEntity"


def test_kg_edge_diff_directions(tmp_path):
    """Edge-granularity corpus diff: v2-only edges tag 'added', v1-only
    'removed', shared edges vanish — both directions via composite-key
    anti joins (the CDC-at-the-KG-level operator)."""
    import pyarrow.parquet as pq

    from code_graph_rag_ray.pipelines.catalog import kg_edge_diff

    rows = []
    for i in range(1, 36):
        rows.append({"doc_id": i, "text": "batch join data key merge row",
                     "lang": "en", "source": "s"})
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = kg_edge_diff(str(tmp_path)).to_pandas()
    assert set(out["change"]) == {"added", "removed"}
    # docs with doc_id%7==0 (and %5!=0) exist only in v2 → their edges added
    added_docs = {int(u.rsplit("/", 1)[1]) for u in
                  out.loc[out["change"] == "added", "provenance_url"]}
    removed_docs = {int(u.rsplit("/", 1)[1]) for u in
                    out.loc[out["change"] == "removed", "provenance_url"]}
    assert added_docs and all(d % 7 == 0 and d % 5 != 0 for d in added_docs)
    assert removed_docs and all(d % 5 == 0 and d % 7 != 0 for d in removed_docs)


def test_kg_path_2hop_counts(tmp_path):
    """(a)-[join]->(b)-[merge]->(c) pattern counts: two docs plant
    'key join data' and 'data merge row' twice → 2 paths key→row."""
    import pyarrow.parquet as pq

    from code_graph_rag_ray.pipelines.catalog import kg_path_2hop

    rows = [
        {"doc_id": 1, "text": "key join data x data merge row", "lang": "en",
         "source": "s"},
        {"doc_id": 2, "text": "key join data y data merge row", "lang": "en",
         "source": "s"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = kg_path_2hop(str(tmp_path)).to_pandas()
    got = out.set_index(["a", "c"])["n_paths"].to_dict()
    # each doc contributes one (key join data) and one (data merge row):
    # join edges: 2 × (key, data); merge edges: 2 × (data, row) → 4 paths
    assert got[("key", "row")] == 4
