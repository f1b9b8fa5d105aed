"""Skew-aware salted aggregation for non-algebraic per-key work.

Algebraic aggregates (sum/count/min) are already skew-proof here via
batch-local partials (``relational.partial_groupby_sum``). This module
covers the remaining case the north star names — a head key (the
wikipedia.org entity) whose GROUP processing itself is heavy: salt the hot
key into ``salt_factor`` sub-groups, run the per-group function on each
sub-group in parallel, then merge the sub-results per key. Requires the
per-key computation to be decomposable (partial + merge) — the classic
two-phase contract.

Concrete operator: :func:`salted_topk_per_key` (top-N provenance urls per
entity by mention count) — top-k is mergeable, so the salted two-phase is
exact.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from code_graph_rag_ray.functions.hashing import crc32_array


def global_topk(
    ds: Dataset,
    *,
    item: str,
    n_col: str = "n",
    k: int = 20,
) -> Dataset:
    """(item, n, rank): global top-k rows by ``n_col`` (heavy hitters).

    Local top-k per block (each block can only contribute k survivors)
    → coalesce the ≤ blocks×k partials to one block → final exact top-k
    with rank. Ties break by ``item`` ascending (content-determined).
    Exact when each item's total count lives on one row (i.e. ``ds`` is
    already an aggregated (item, n) table, e.g. from
    ``partial_groupby_sum``) — the single merged block holds O(blocks·k)
    rows, never the vocabulary.
    """

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            b, sort_keys=[(n_col, "descending"), (item, "ascending")]
        )
        return b.take(idx[:k])

    def final_topk(b: pa.Table) -> pa.Table:
        t = local_topk(b)
        return t.append_column("rank", pa.array(range(1, t.num_rows + 1), pa.int64()))

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


def salted_topk_per_key(
    ds: Dataset,
    *,
    key: str,
    item: str,
    k: int = 10,
    salt_factor: int = 16,
) -> Dataset:
    """(key, item, n, rank): top-k items per key by occurrence count.

    Phase 1 groups by ``(key, salt)`` where ``salt = crc32(item) % F`` —
    a head key's rows spread over F parallel sub-groups (salting on the
    ITEM hash keeps equal items in one sub-group, so sub-counts are exact).
    Phase 2 merges the F sub-top-k lists per key (top-k of exact counts is
    mergeable when each item's full count lives in exactly one sub-group).
    """

    def add_salt(b: pa.Table) -> pa.Table:
        return b.append_column(
            "salt", pa.array(crc32_array(b[item]) % salt_factor, pa.int32())
        )

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def sub_topk(g: pd.DataFrame) -> pd.DataFrame:
        counts = (
            g.groupby(item).size().reset_index(name="n")
            .sort_values(["n", item], ascending=[False, True], kind="mergesort")
            .head(k)
        )
        counts.insert(0, key, g[key].iloc[0])
        return counts

    partial = salted.groupby([key, "salt"]).map_groups(sub_topk, batch_format="pandas")

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        top = (
            g.sort_values(["n", item], ascending=[False, True], kind="mergesort")
            .head(k)
            .reset_index(drop=True)
        )
        top["rank"] = range(1, len(top) + 1)
        return top[[key, item, "n", "rank"]]

    return partial.groupby(key).map_groups(merge_topk, batch_format="pandas")
