"""Entity canonicalization — node table, variant suffixes, name families.

Implements the reference's MERGE-identity semantics over the linked-mention
stream (SURVEY.md §2.5):

- per-entity node rows aggregated from mentions (A1: node MERGE dedup keyed
  on the per-label unique key — here ``entity_id``),
- the duplicate-identity rule: distinct entities whose canonical names
  normalize identically keep BOTH rows, the first (by entity id) keeps the
  plain name and later ones get a deterministic ``@k`` variant suffix —
  cgr's ``register_unique_qn`` (``function_registry.py:69-93``), made
  order-free by deriving rank from the sorted entity id, never arrival
  order,
- ``name_family``: connected components over the alias↔entity bipartite
  graph (A3 generalized — iterative union-find via
  :mod:`code_graph_rag_ray.stages.components`).

Aggregation is two-phase everywhere (batch-local partials before the
groupby) so head entities (the wikipedia.org case) reduce per block before
the exchange — the skew discipline from SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count

from code_graph_rag_ray.stages.components import connected_components
from code_graph_rag_ray.stages.linking import normalize_surface


def canonical_name_map(alias_tbl: pa.Table) -> dict[str, str]:
    """entity_id → canonical display name.

    The canonical name is the entity's best alias by (prior, length, text) —
    deterministic; for the generated corpus this is always the full name.
    """
    best: dict[str, tuple[float, int, str]] = {}
    for row in alias_tbl.to_pylist():
        key = (row["prior"], len(row["alias"]), row["alias"])
        if row["entity_id"] not in best or key > best[row["entity_id"]]:
            best[row["entity_id"]] = key
    return {eid: k[2] for eid, k in best.items()}


def canonicalize_entities(
    mentions: Dataset,
    alias_tbl: pa.Table,
    *,
    num_partitions: int = 16,
) -> Dataset:
    """Linked mentions → node table.

    Output: (entity_id, label, name, norm_name, n_mentions, name_family).
    ``label`` ∈ {Entity, ExternalEntity} (cgr node-label analog: internal
    definitions vs ExternalModule, ``constants/graph.py:87-109``).
    """
    import ray.data as rd

    # DISTRIBUTED part 1: mention counts per entity — the only input that
    # scales with the corpus. Output is bounded by |dictionary ∪ observed
    # externals| (dictionary-scale).
    counts_df = (
        mentions.groupby("entity_id")
        .aggregate(Count(alias_name="n_mentions"))
        .to_pandas()
    )

    # DISTRIBUTED part 2: name families — CC over the alias↔entity bipartite
    # graph (A3 analog). NOTE: Dataset.join is deliberately NOT used
    # anywhere here: in Ray 2.49 a join materializes empty hash partitions
    # with NO schema, which breaks pyarrow's join for sparse keys
    # (ArrowInvalid: No match for FieldRef) — observed deterministically.
    # The assembly below is dictionary-scale, so vectorized pandas merges on
    # the driver are the honest equivalent of cgr's in-memory registry
    # (function_registry.py); at a scale where externals outgrow the driver,
    # swap these merges for the cogroup pattern in stages/components.py.
    fam_df = None
    alias_edges_rows = [
        {"src": "s::" + normalize_surface(r["alias"]), "dst": r["entity_id"]}
        for r in alias_tbl.to_pylist()
    ]
    if alias_edges_rows:
        alias_edges = rd.from_arrow(pa.Table.from_pylist(alias_edges_rows))
        comp = connected_components(alias_edges, num_partitions=num_partitions)
        fam_df = comp.to_pandas().rename(
            columns={"node": "entity_id", "component": "name_family"}
        )

    # node universe = every DICTIONARY entity (cgr: every registered
    # definition gets a node whether or not it is referenced,
    # function_registry.py:18-60) ∪ observed External entities
    names = canonical_name_map(alias_tbl)
    base = pd.DataFrame(
        {"entity_id": sorted(names), "name": [names[k] for k in sorted(names)]}
    )
    ext_ids = counts_df[counts_df.entity_id.str.startswith("ext::")].entity_id
    ext = pd.DataFrame(
        {"entity_id": ext_ids, "name": ext_ids.str[len("ext::"):]}
    )
    nodes = pd.concat([base, ext], ignore_index=True)
    nodes = nodes.merge(counts_df, how="left", on="entity_id")
    nodes["n_mentions"] = nodes["n_mentions"].fillna(0).astype("int64")
    nodes["label"] = np.where(
        nodes.entity_id.str.startswith("ext::"), "ExternalEntity", "Entity"
    )
    nodes["norm_name"] = nodes["name"].map(normalize_surface)

    # duplicate-identity variant suffix: deterministic rank within norm_name
    # (sorted by entity id — content-determined, never arrival order)
    nodes = nodes.sort_values(["norm_name", "entity_id"], kind="mergesort")
    rank = nodes.groupby("norm_name").cumcount()
    nodes["name"] = np.where(
        rank > 0, nodes["name"] + "@" + rank.astype(str), nodes["name"]
    )

    if fam_df is not None:
        nodes = nodes.merge(fam_df, how="left", on="entity_id")
    else:
        nodes["name_family"] = None
    nodes = nodes.reset_index(drop=True)
    return rd.from_arrow(
        pa.Table.from_pandas(
            nodes[["entity_id", "name", "label", "norm_name", "n_mentions", "name_family"]],
            preserve_index=False,
        )
    )
