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

    counts = mentions.groupby("entity_id").aggregate(Count(alias_name="n_mentions"))

    # Node universe = every DICTIONARY entity (cgr: every registered
    # definition gets a node whether or not it is referenced,
    # function_registry.py:18-60) ∪ observed External entities.
    names = canonical_name_map(alias_tbl)
    base = rd.from_arrow(
        pa.Table.from_pylist(
            [{"entity_id": eid, "name": nm} for eid, nm in sorted(names.items())],
            schema=pa.schema([("entity_id", pa.string()), ("name", pa.string())]),
        )
    )

    ext = counts.map_batches(
        lambda b: (
            lambda m: pa.table(
                {"entity_id": b.filter(m)["entity_id"],
                 "name": pa.array(
                     [e[len("ext::"):] for e in b.filter(m)["entity_id"].to_pylist()],
                     pa.string(),
                 )}
            )
        )(pa.compute.starts_with(b["entity_id"], "ext::")),
        batch_format="pyarrow",
    )

    universe = base.union(ext)
    joined = universe.join(
        counts,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("entity_id",),
    )

    def attach(batch: pa.Table) -> pa.Table:
        eids = batch["entity_id"].to_pylist()
        label_col = [
            "ExternalEntity" if e.startswith("ext::") else "Entity" for e in eids
        ]
        norm_col = [normalize_surface(n) for n in batch["name"].to_pylist()]
        n_m = pa.compute.fill_null(batch["n_mentions"], 0)
        return pa.table(
            {
                "entity_id": batch["entity_id"],
                "name": batch["name"],
                "label": pa.array(label_col, pa.string()),
                "norm_name": pa.array(norm_col, pa.string()),
                "n_mentions": n_m,
            }
        )

    nodes = joined.map_batches(attach, batch_format="pyarrow")

    # duplicate-identity variant suffix: deterministic rank within norm_name
    def suffix_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("entity_id", kind="mergesort").reset_index(drop=True)
        if len(g) > 1:
            for k in range(1, len(g)):
                g.loc[k, "name"] = f"{g.loc[k, 'name']}@{k}"
        return g

    nodes = nodes.groupby("norm_name").map_groups(suffix_group, batch_format="pandas")

    # name families: CC over alias↔entity bipartite graph (dictionary-driven)
    alias_edges_rows = [
        {"src": "s::" + normalize_surface(r["alias"]), "dst": r["entity_id"]}
        for r in alias_tbl.to_pylist()
    ]
    if alias_edges_rows:
        import ray.data as rd

        alias_edges = rd.from_arrow(pa.Table.from_pylist(alias_edges_rows))
        comp = connected_components(alias_edges, num_partitions=num_partitions)
        comp = comp.map_batches(
            lambda b: pa.table({"entity_id": b["node"], "name_family": b["component"]}),
            batch_format="pyarrow",
        )
        nodes = nodes.join(
            comp,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("entity_id",),
        )
    return nodes
