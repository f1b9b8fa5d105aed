"""Graph schema: typed node labels + relation legality validation.

The reference declares a fixed, code-maintained graph schema: 21 node
labels (``constants/graph.py:87-109``), 25 relationship types with a
source→rel→target legality matrix (``docs/architecture/graph-schema.md:
40-68``), and a schema audit (``AuditCheck``, ``constants/graph.py:
274-307``). Web-text analog:

- node labels come from the alias dictionary's optional ``etype`` column
  (see :func:`~code_graph_rag_ray.stages.canonicalize.entity_type_map`);
  minted externals are always ``ExternalEntity`` — derivable from the
  ``ext::`` id prefix alone,
- a per-predicate **legality matrix** ``{pred: (allowed_subj_labels,
  allowed_obj_labels)}`` (``None`` side = unconstrained) validates edge
  endpoints.

Scale shape: the label map is dictionary-scale → broadcast once (``ray.put``
+ per-worker cache) and looked up inside one stateless ``map_batches``;
external labels need no lookup at all. Validation is a single streaming
pass — no join, no shuffle — vectorized per rule (few rules, pandas masks),
never a per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from code_graph_rag_ray.functions.broadcast import get_broadcast_transformed
from code_graph_rag_ray.stages.canonicalize import entity_type_map

# legality matrix type: pred -> (allowed subj labels | None, allowed obj
# labels | None); preds absent from the matrix are unconstrained
Legality = dict[str, tuple[frozenset[str] | None, frozenset[str] | None]]


def _labels_for(col: pd.Series, types: dict[str, str]) -> np.ndarray:
    ext = col.str.startswith("ext::").to_numpy()
    mapped = col.map(types).fillna("Entity").to_numpy()
    return np.where(ext, "ExternalEntity", mapped)


def validate_edges(
    edges: Dataset,
    alias_ref,
    legality: Legality,
    *,
    mode: str = "flag",
) -> Dataset:
    """Validate edge endpoints against the legality matrix.

    ``alias_ref`` is a ``ray.ObjectRef`` to the alias table (broadcast once)
    or a plain ``pa.Table`` (tests). ``mode``:

    - ``"flag"``: append a ``violation`` column (``subj-label`` /
      ``obj-label`` / null) — the audit shape (``AuditCheck`` analog),
    - ``"drop"``: keep only legal edges (cgr drops illegal emissions at the
      ingest choke point, ``services/filtering.py:9-53``),
    - ``"violations"``: keep only the offending edges (findings feed).
    """
    if mode not in ("flag", "drop", "violations"):
        raise ValueError(f"unknown mode {mode!r}")
    rules = {
        p: (frozenset(s) if s is not None else None,
            frozenset(o) if o is not None else None)
        for p, (s, o) in legality.items()
    }

    def check(df: pd.DataFrame) -> pd.DataFrame:
        types = get_broadcast_transformed(alias_ref, "etype_map", entity_type_map)
        viol = pd.Series([None] * len(df), index=df.index, dtype=object)
        slab = olab = None
        for pred, (src_ok, dst_ok) in rules.items():
            m = (df["pred"] == pred).to_numpy()
            if not m.any():
                continue
            if src_ok is not None:
                if slab is None:
                    slab = _labels_for(df["subj"], types)
                bad = m & ~np.isin(slab, list(src_ok))
                viol[bad & viol.isna().to_numpy()] = "subj-label"
            if dst_ok is not None:
                if olab is None:
                    olab = _labels_for(df["obj"], types)
                bad = m & ~np.isin(olab, list(dst_ok))
                viol[bad & viol.isna().to_numpy()] = "obj-label"
        df = df.assign(violation=viol)
        if mode == "drop":
            return df[df["violation"].isna()].drop(columns=["violation"])
        if mode == "violations":
            return df[df["violation"].notna()]
        return df

    return edges.map_batches(check, batch_format="pandas")


def induce_schema(edges: Dataset, alias_ref) -> Dataset:
    """Schema INDUCTION — the learned counterpart of :func:`validate_edges`'
    fixed legality matrix (reference: the hand-written per-relation
    endpoint constraints, ``docs/architecture/graph-schema.md:40-68``):
    mine each predicate's dominant ``(subj_label, obj_label)`` signature
    from the edge table itself, with support counts, so constraint tables
    can be bootstrapped from data instead of authored.

    Output per predicate: ``(pred, subj_label, obj_label, support,
    total, support_micro)`` — the most frequent label pair (ties broken
    by label text, deterministic), its edge count, the predicate's total
    edge count, and the integer-exact dominance ratio in micro-units.

    Scale shape: one streaming pass folds batch-local ``(pred, slabel,
    olabel)`` counts (pandas value_counts per batch), a grouped sum
    merges the partials, and — because the merged table is SCHEMA-scale
    (≤ |preds| × |labels|², dictionary-bounded, not corpus-bounded) —
    the argmax/total finish runs vectorized in one block. The edge table
    itself never leaves the streaming pass.
    """
    import pyarrow as pa

    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        types = get_broadcast_transformed(alias_ref, "etype_map", entity_type_map)
        out = pd.DataFrame(
            {"pred": df["pred"],
             "subj_label": _labels_for(df["subj"], types),
             "obj_label": _labels_for(df["obj"], types)}
        )
        g = (out.groupby(["pred", "subj_label", "obj_label"], sort=False)
                .size().rename("n").reset_index())
        return g

    counts = partial_groupby_sum(
        edges.map_batches(partial, batch_format="pandas"),
        ["pred", "subj_label", "obj_label"], {"n": "support"},
    )

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("pred", pa.string()), ("subj_label", pa.string()),
             ("obj_label", pa.string()), ("support", pa.int64()),
             ("total", pa.int64()), ("support_micro", pa.int64())]
        ).empty_table()
        if b.num_rows == 0:
            return empty
        df = b.to_pandas()
        df["total"] = df.groupby("pred")["support"].transform("sum")
        df = df.sort_values(
            ["pred", "support", "subj_label", "obj_label"],
            ascending=[True, False, True, True], kind="mergesort",
        )
        dom = df.drop_duplicates("pred", keep="first").reset_index(drop=True)
        support = dom["support"].to_numpy(np.int64)
        total = dom["total"].to_numpy(np.int64)
        micro = (support.astype(object) * 10**6) // total  # exact int
        return pa.table(
            {"pred": pa.array(dom["pred"], pa.string()),
             "subj_label": pa.array(dom["subj_label"], pa.string()),
             "obj_label": pa.array(dom["obj_label"], pa.string()),
             "support": pa.array(support),
             "total": pa.array(total),
             "support_micro": pa.array(micro.astype(np.int64))}
        )

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )
