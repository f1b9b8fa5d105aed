"""Entity co-occurrence graph with fixed-point association lift.

The KG-construction step after mention extraction: which entities appear in
the same documents, and how much more often than chance? Edges weighted by
**lift** = P(a,b) / (P(a)·P(b)) = c_ab·N / (c_a·c_b) — the exp-scale of PMI
— emitted as a floor fixed-point integer (``lift_fp`` = lift × 10^6) so the
result is bit-exact at any parallelism and replayable in SQL with pure
integer arithmetic (log-based PMI would hinge on libm ulp agreement).

Reference parity: the reference materializes CALLS edges between co-located
code entities (``graph_updater.py`` relationship pass); co-occurrence is
the statistical web-text analog (SURVEY.md §2.5 A2 pattern grouping).

Scale shape:
- pair expansion: ``groupby(doc).map_groups`` — fan-out is C(k,2) on the
  per-doc DISTINCT entity count k (vocabulary-bounded), never corpus-sized;
- pair counts and entity marginals: two-phase grouped sums;
- marginals are dictionary-scale, so they broadcast (``ray.put`` once) —
  for open vocabularies swap the broadcast for a bucketed join on ``a``.

Overflow: lift_fp fits int64 while c_ab·N·scale < 2^63 — N ≤ ~3M docs at
scale=10^6. Larger corpora: lower ``scale`` or compute per-shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from code_graph_rag_ray.stages.relational import partial_groupby_sum


def entity_cooccurrence(
    mentions: Dataset,
    *,
    doc_col: str = "doc_id",
    ent_col: str = "surface",
    scale: int = 10**6,
) -> Dataset:
    """mentions(doc, entity) → (a, b, c_ab, lift_fp) for a < b.

    Input rows need not be distinct per (doc, entity) — duplicates are
    collapsed inside the per-doc group before pair expansion."""
    import ray

    def pairs(g: pa.Table) -> pa.Table:
        ents = sorted(set(g[ent_col].to_pylist()))
        k = len(ents)
        if k < 2:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        ia, ib = np.triu_indices(k, 1)
        arr = np.array(ents, dtype=object)
        return pa.table({"a": pa.array(arr[ia]), "b": pa.array(arr[ib])})

    pair_rows = mentions.groupby(doc_col).map_groups(
        pairs, batch_format="pyarrow"
    )
    pair_counts = partial_groupby_sum(pair_rows, ["a", "b"], {},
                                      count_alias="c_ab")

    # entity marginals (distinct docs per entity) + corpus size N: the
    # distinct-collapse and counts are two-phase; only vocabulary-sized
    # results reach the driver
    def distinct_de(b: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(
            b.select([doc_col, ent_col]), [doc_col, ent_col],
            use_threads=False,
        ).aggregate([])
        return t.rename_columns([doc_col, ent_col])

    de = mentions.map_batches(distinct_de, batch_format="pyarrow")
    de = de.groupby([doc_col, ent_col]).count().drop_columns(["count()"])
    marg_rows = partial_groupby_sum(de, [ent_col], {}, count_alias="c").take_all()
    marg = {r[ent_col]: r["c"] for r in marg_rows}
    # N = distinct docs: two-phase collapse, then a scalar count — no
    # corpus-sized rows ever reach the driver
    n_docs = (
        partial_groupby_sum(de, [doc_col], {}, count_alias="x")
        .select_columns([doc_col])
        .count()
    )
    marg_ref = ray.put(marg)

    def score(b: pa.Table) -> pa.Table:
        from code_graph_rag_ray.functions.broadcast import get_broadcast

        m = get_broadcast(marg_ref)
        ca = np.array([m[x] for x in b["a"].to_pylist()], np.int64)
        cb = np.array([m[x] for x in b["b"].to_pylist()], np.int64)
        c_ab = b["c_ab"].to_numpy(zero_copy_only=False).astype(np.int64)
        lift = (c_ab * np.int64(n_docs) * np.int64(scale)) // (ca * cb)
        return b.append_column("lift_fp", pa.array(lift))

    return pair_counts.map_batches(score, batch_format="pyarrow")
