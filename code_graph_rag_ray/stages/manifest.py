"""Page-manifest extraction — the dependency-manifest reader analog (S7).

The reference parses dependency manifests (``pyproject.toml`` /
``package.json`` / ``go.mod`` / ``.csproj``) into ExternalPackage nodes and
``DEPENDS_ON_EXTERNAL`` edges carrying a ``version_spec`` property
(dispatch ``graph_updater.py:598-602, 1875-1876``; parse
``parsers/dependency_parser.py``; node/edge emit
``definition_processor.py:451-478``).

Web-text translation: the page-level manifest is the ``<head>`` declaration
block — ``<meta name="..." content="...">`` rows are the page's declared
metadata, and dependency-shaped declarations (``name@spec`` values, npm
caret style) become ``(url, dep_name, version_spec)`` DEPENDS_ON edges plus
an aggregated ExternalPackage node table. Extraction is fully vectorized
(one Arrow ``split_pattern`` on the ``<meta name="`` literal + one
``extract_regex`` for the attribute pair), mirroring
:mod:`code_graph_rag_ray.stages.links` — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from code_graph_rag_ray.functions.html import decode_html_binary

# attribute pair after the '<meta name="' split point; values may not
# contain '"' (same grammar the tag-strip regex in extract_text assumes)
_META_RE = r'^(?P<k>[^"]*)" content="(?P<v>[^"]*)"'
# dependency-shaped manifest value: <package>@<version_spec>
_DEP_RE = r"^(?P<name>[^@]+)@(?P<spec>.+)$"


def extract_meta(html: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """Vectorized (key, value, source-row-index) triples from an html STRING
    array — every well-formed ``<meta name="K" content="V">`` occurrence.
    Malformed declarations (missing content, unterminated quote) are
    dropped: deterministic degradation, one bad tag never fails a task.
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    html = pc.fill_null(html, "")
    parts = pc.split_pattern(html, pattern='<meta name="')
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    offsets = np.asarray(parts.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    if len(flat) == 0:
        empty = pa.array([], pa.string())
        return empty, empty, np.empty(0, dtype=np.int64)
    row_idx_all = np.repeat(np.arange(len(counts)), counts)
    pos_in_row = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], counts)
    keep = np.flatnonzero(pos_in_row > 0)  # element 0 = text before first meta
    cand = pc.take(flat, pa.array(keep, pa.int64()))
    m = pc.extract_regex(cand, pattern=_META_RE)
    keys = pc.struct_field(m, "k")
    vals = pc.struct_field(m, "v")
    valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
    sel = pa.array(np.flatnonzero(valid), pa.int64())
    return pc.take(keys, sel), pc.take(vals, sel), row_idx_all[keep][valid]


def extract_manifest_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html, …) → (url, key, value) manifest rows."""
    decoded, _errs = decode_html_binary(batch["html"])
    keys, vals, row_idx = extract_meta(decoded)
    urls = pc.take(batch["url"], pa.array(row_idx, pa.int64()))
    return pa.table({"url": urls, "key": keys, "value": vals})


def extract_manifest(pages: Dataset) -> Dataset:
    """Runs on RAW html (before extract_text drops the markup)."""
    return pages.map_batches(extract_manifest_batch, batch_format="pyarrow")


def manifest_deps_batch(batch: pa.Table) -> pa.Table:
    """(url, key, value) manifest rows → (url, dep_name, version_spec)
    DEPENDS_ON_EXTERNAL edges. Two sources, mirroring the reference's
    per-ecosystem dispatch: ``requires`` values are ``name@spec`` pairs
    (npm-style); ``generator`` values are ``name version`` pairs (the
    build-tool dependency every manifest carries).
    """
    def parse(sub: pa.Table, pattern: str) -> pa.Table:
        m = pc.extract_regex(sub["value"], pattern=pattern)
        names = pc.struct_field(m, "name")
        ok = pc.is_valid(names).to_numpy(zero_copy_only=False)
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        return pa.table({
            "url": pc.take(sub["url"], sel),
            "dep_name": pc.take(names, sel),
            "version_spec": pc.take(pc.struct_field(m, "spec"), sel),
        })

    keys = batch["key"]
    req_t = parse(batch.filter(pc.equal(keys, "requires")), _DEP_RE)
    gen_t = parse(batch.filter(pc.equal(keys, "generator")),
                  r"^(?P<name>\S+) (?P<spec>.+)$")
    return pa.concat_tables([req_t, gen_t])


def manifest_deps(manifest: Dataset) -> Dataset:
    return manifest.map_batches(manifest_deps_batch, batch_format="pyarrow")


def external_packages(deps: Dataset) -> Dataset:
    """ExternalPackage node table: one node per dep_name with its dependent
    count — the MERGE-aggregated analog of ``definition_processor.py:
    451-478``. Partial count inside each batch, then a dictionary-scale
    groupby (package universe << corpus)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        return (
            pa.TableGroupBy(b.select(["dep_name"]), ["dep_name"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["dep_name", "n"])
        )

    return (
        deps.map_batches(partial, batch_format="pyarrow")
        .groupby("dep_name")
        .aggregate(Sum("n", alias_name="n_dependents"))
    )
