"""Structure pass (M4 analog): url → containment hierarchy edges.

The reference's Pass 1 walks directories emitting Package/Folder nodes and
``CONTAINS_PACKAGE/FOLDER/FILE`` edges (``parsers/structure_processor.py:
61-165``). Web-text translation: every page url implies a containment
chain host → path-prefix folders → page; container nodes repeat across
pages, so the edge set is exact-deduped (the ``groupby(host).first``
shape SURVEY.md §2.2 M4 prescribes).

Host/path parsing is one vectorized ``extract_regex``; the per-row prefix
chain emit is a short Python walk over pre-split segments (≤ max_depth+1
appends per page — orders of magnitude lighter than the linker stage that
shares the scan).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_URL_RE = r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/]+)(?P<path>/.*)?$"


def structure_edges_batch(batch: pa.Table, max_depth: int = 2) -> pa.Table:
    """pages(url, …) → (parent, child, rel) containment rows (with
    within-batch duplicates — global dedup happens in
    :func:`structure_edges`). Rows whose url doesn't parse are skipped
    (deterministic degradation)."""
    m = pc.extract_regex(batch["url"], pattern=_URL_RE)
    host = pc.struct_field(m, "host")
    valid = pc.is_valid(host)
    host_np = pc.drop_null(host).to_pylist()
    path_np = pc.filter(
        pc.fill_null(pc.struct_field(m, "path"), ""), valid
    ).to_pylist()
    url_np = pc.filter(batch["url"].combine_chunks(), valid).to_pylist()

    p_out: list[str] = []
    c_out: list[str] = []
    r_out: list[str] = []
    for h, p, u in zip(host_np, path_np, url_np):
        segs = [x for x in p.split("/") if x]
        dirs = segs[:-1][:max_depth] if segs else []
        parent = h
        for d in dirs:
            child = parent + "/" + d
            p_out.append(parent)
            c_out.append(child)
            r_out.append("CONTAINS_FOLDER")
            parent = child
        p_out.append(parent)
        c_out.append(u)
        r_out.append("CONTAINS_PAGE")
    return pa.table(
        {"parent": pa.array(p_out, pa.string()),
         "child": pa.array(c_out, pa.string()),
         "rel": pa.array(r_out, pa.string())}
    )


def structure_edges(pages: Dataset, *, max_depth: int = 2) -> Dataset:
    """Deduped containment edge set over a pages Dataset."""
    from code_graph_rag_ray.stages.materialize import exact_dedup

    raw = pages.map_batches(
        lambda b: structure_edges_batch(b, max_depth), batch_format="pyarrow"
    )
    return exact_dedup(
        raw, keys=["parent", "child", "rel"],
        columns=["parent", "child", "rel"],
    )
