"""Connected components over an edge Dataset — iterative min-label propagation.

Generalizes the reference's partial-group canonicalization
(``graph_updater.py:435-463``: C# partial type declarations grouped by a
stronger symbol identity — SURVEY.md §2.5 A3 calls this the closest thing to
union-find canonicalization) into a reusable distributed operator, also used
by the near-duplicate clustering operators.

Algorithm: every node starts labeled with itself; each round every node
takes the min label over itself and its neighbors; converged when no label
changes. A round is expressed as a **cogroup join** (union the tagged edge
and label tables, ``groupby(node).map_groups``) followed by a groupby-min —
i.e. two hash shuffles on the node key. We deliberately avoid
``Dataset.join`` inside the loop: in Ray 2.49 a join's empty hash partitions
emit schema-less blocks that poison the schema of downstream joins
(observed: ``ArrowInvalid: No match ... FieldRef.Name(node)``); the cogroup
formulation keeps every intermediate schema explicit.

Rounds are bounded (``max_iter``) with an early-exit convergence check.
Diameter of alias/near-dup graphs is small in practice (2-4), so few rounds
suffice; pathological chains fall back to the bound.

Skew note: a head component (every page mentioning wikipedia.org) makes one
groupby key hot; the groupby-min pre-reduces per block (combiner), so hot
keys shrink to one row per block before the exchange — the two-phase shape
from SURVEY.md §4. The per-node cogroup fan-out is bounded by node degree,
not component size, so head components don't concentrate on one task.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min


def _symmetrize(edges: Dataset, src: str, dst: str) -> Dataset:
    def both(b: pa.Table) -> pa.Table:
        fwd = pa.table({"node": b[src].cast(pa.string()), "nbr": b[dst].cast(pa.string())})
        rev = pa.table({"node": b[dst].cast(pa.string()), "nbr": b[src].cast(pa.string())})
        return pa.concat_tables([fwd, rev])

    return edges.map_batches(both, batch_format="pyarrow")


_NUM_BUCKETS = 32


def _with_bucket(ds: Dataset, col: str) -> Dataset:
    """Add ``bucket = crc32(col) % B`` — co-locates equal keys so the
    cogroup below is a bucketed hash join: one vectorized pandas merge per
    bucket instead of one Python call per key (per-key map_groups does not
    survive million-node graphs)."""
    from code_graph_rag_ray.functions.hashing import partition_ids

    def add(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(partition_ids(b[col], _NUM_BUCKETS), pa.int32())
        )

    return ds.map_batches(add, batch_format="pyarrow")


def _propagate_round(sym: Dataset, labels: Dataset) -> Dataset:
    """One message round: every node sends its label to every neighbor.

    Implemented as a bucketed cogroup join: edge rows and label rows are
    tagged, bucketed by the join key's hash, and merged with ONE pandas
    merge per bucket group — vectorized, skew-bounded (a head node's edges
    hash to one bucket but the merge is columnar, and the follow-up
    groupby-min pre-reduces per block)."""
    edge_rows = _with_bucket(
        sym.map_batches(
            lambda b: pa.table(
                {"key": b["node"], "nbr": b["nbr"],
                 "label": pa.nulls(b.num_rows, pa.string())}
            ),
            batch_format="pyarrow",
        ),
        "key",
    )
    label_rows = _with_bucket(
        labels.map_batches(
            lambda b: pa.table(
                {"key": b["node"], "nbr": pa.nulls(b.num_rows, pa.string()),
                 "label": b["label"]}
            ),
            batch_format="pyarrow",
        ),
        "key",
    )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        edges = g[g["label"].isna()][["key", "nbr"]]
        labs = g[g["nbr"].isna()][["key", "label"]]
        # neighbor messages: one vectorized merge on the key
        msgs = edges.merge(labs, on="key")[["nbr", "label"]].rename(
            columns={"nbr": "node"}
        )
        selfm = labs.rename(columns={"key": "node"})[["node", "label"]]
        return pd.concat([msgs, selfm], ignore_index=True)

    msgs = (
        edge_rows.union(label_rows)
        .groupby("bucket")
        .map_groups(send, batch_format="pandas")
    )
    return msgs.groupby("node").aggregate(Min("label", alias_name="label"))


def _compress(labels: Dataset) -> Dataset:
    """Pointer jumping: label(node) ← label(label(node)).

    Contracts label chains exponentially (the union-find path-compression
    analog), so total rounds are O(log diameter) instead of O(diameter).
    Implemented as one cogroup on the label value: every node asks the
    "directory" row of its current label for THAT node's label.
    """
    requests = _with_bucket(
        labels.map_batches(
            lambda b: pa.table(
                {"key": b["label"], "asker": b["node"],
                 "label": pa.nulls(b.num_rows, pa.string())}
            ),
            batch_format="pyarrow",
        ),
        "key",
    )
    directory = _with_bucket(
        labels.map_batches(
            lambda b: pa.table(
                {"key": b["node"], "asker": pa.nulls(b.num_rows, pa.string()),
                 "label": b["label"]}
            ),
            batch_format="pyarrow",
        ),
        "key",
    )

    def answer(g: pd.DataFrame) -> pd.DataFrame:
        reqs = g[g["asker"].notna()][["key", "asker"]]
        dirs = g[g["asker"].isna()][["key", "label"]].drop_duplicates("key")
        out = reqs.merge(dirs, on="key", how="left")
        # every label value is itself a node id, so a directory row exists;
        # fall back to the key (self-rooted) defensively
        out["label"] = out["label"].fillna(out["key"])
        return out.rename(columns={"asker": "node"})[["node", "label"]]

    return (
        requests.union(directory)
        .groupby("bucket")
        .map_groups(answer, batch_format="pandas")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )


def _count_changed(old: Dataset, new: Dataset) -> int:
    a = _with_bucket(
        old.map_batches(
            lambda b: pa.table({"node": b["node"], "old": b["label"],
                                "new": pa.nulls(b.num_rows, pa.string())}),
            batch_format="pyarrow",
        ),
        "node",
    )
    b_ = _with_bucket(
        new.map_batches(
            lambda b: pa.table({"node": b["node"], "old": pa.nulls(b.num_rows, pa.string()),
                                "new": b["label"]}),
            batch_format="pyarrow",
        ),
        "node",
    )

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["old"].notna()][["node", "old"]]
        n = g[g["new"].notna()][["node", "new"]]
        m = o.merge(n, on="node")
        return pd.DataFrame({"c": [int((m["old"] != m["new"]).sum())]})

    out = a.union(b_).groupby("bucket").map_groups(diff, batch_format="pandas").sum("c")
    return int(out or 0)


def connected_components(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 8,
    num_partitions: int = 16,  # kept for API symmetry; shuffles are groupbys
) -> Dataset:
    """edges(src, dst) → (node, component) with component = min node id.

    Node ids are compared as strings. The result covers every node that
    appears in at least one edge.
    """
    del num_partitions
    sym = _symmetrize(edges, src, dst).materialize()
    labels = (
        sym.groupby("node")
        .aggregate(Min("nbr", alias_name="label"))
        .map_batches(
            lambda b: pa.table(
                {"node": b["node"], "label": pc.min_element_wise(b["node"], b["label"])}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(max_iter):
        new = _compress(_propagate_round(sym, labels)).materialize()
        changed = _count_changed(labels, new)
        labels = new
        if changed == 0:
            break
    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )


def component_sizes(labels: Dataset) -> Dataset:
    return labels.groupby("component").aggregate(Count(alias_name="size"))
