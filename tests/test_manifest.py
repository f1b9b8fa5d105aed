"""Page-manifest extraction tests (S7 dependency-manifest reader analog).

The documents-derived pages plant three closed-form <meta> declarations per
page (``sources/pages.py:_docs_to_pages_batch``); extraction must recover
them exactly, dependency parsing must split name@spec / "name version"
pairs, and malformed declarations must degrade row-locally (never a task
failure) — the reference's per-file parse-error recovery rule
(``definition_processor.py:447-449``).
"""

from __future__ import annotations

import pyarrow as pa

from code_graph_rag_ray.stages.manifest import (
    extract_manifest_batch,
    extract_meta,
    external_packages,
    manifest_deps,
    manifest_deps_batch,
)


def test_extract_meta_edge_cases():
    html = pa.array(
        [
            '<meta name="a" content="1"><meta name="b" content="two">',
            "no declarations",
            '<meta name="unterminated content missing',  # malformed → dropped
            '<meta name="k" content="unclosed',  # no closing quote → dropped
            "",
            None,
            '<meta name="solo" content="v">',
        ]
    )
    keys, vals, rows = extract_meta(html)
    assert keys.to_pylist() == ["a", "b", "solo"]
    assert vals.to_pylist() == ["1", "two", "v"]
    assert rows.tolist() == [0, 0, 6]


def test_manifest_roundtrip_on_derived_pages():
    from code_graph_rag_ray.sources.pages import _docs_to_pages_batch

    docs = pa.table(
        {
            "doc_id": pa.array([0, 7, 23], pa.int64()),
            "text": ["alpha beta", "gamma", "delta"],
            "lang": ["en", "fr", "de"],
            "source": ["s1", "s2", "s1"],
        }
    )
    pages = _docs_to_pages_batch(docs)
    man = extract_manifest_batch(pages).to_pylist()
    # 3 declarations per page, closed-form values
    assert len(man) == 9
    by_page = {}
    for r in man:
        by_page.setdefault(r["url"], {})[r["key"]] = r["value"]
    m7 = by_page["https://s2.example.org/doc/7"]
    assert m7 == {
        "generator": "gen-2 1.1.7",
        "language": "fr",
        "requires": "lib-3@^2.1",
    }

    deps = manifest_deps_batch(extract_manifest_batch(pages)).to_pylist()
    got = {(r["url"], r["dep_name"], r["version_spec"]) for r in deps}
    assert ("https://s2.example.org/doc/7", "lib-3", "^2.1") in got
    assert ("https://s2.example.org/doc/7", "gen-2", "1.1.7") in got
    assert len(deps) == 6  # requires + generator per page; language is not a dep


def test_manifest_deps_skips_non_spec_values():
    man = pa.table(
        {
            "url": ["u1", "u1", "u2"],
            "key": ["requires", "generator", "requires"],
            "value": ["noatsign", "bare", "ok@^1.0"],
        }
    )
    deps = manifest_deps_batch(man).to_pylist()
    assert deps == [{"url": "u2", "dep_name": "ok", "version_spec": "^1.0"}]


def test_external_packages_aggregate():
    import ray.data as rd

    man = rd.from_arrow(
        pa.table(
            {
                "url": [f"u{i}" for i in range(6)],
                "key": ["requires"] * 6,
                "value": ["a@1", "a@1", "b@2", "a@3", "b@2", "c@1"],
            }
        )
    )
    nodes = external_packages(manifest_deps(man)).to_pandas()
    got = dict(zip(nodes["dep_name"], nodes["n_dependents"]))
    assert got == {"a": 3, "b": 2, "c": 1}
