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
