"""Property-based fuzz over the extraction invariants (cgr's fuzz tier,
``tests/fuzz_test_parsers.py`` analog): arbitrary — including malformed —
input must never raise, and extraction must be deterministic and
batch-layout independent."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from code_graph_rag_ray.functions.html import (
    decode_html_binary,
    extract_text,
    extract_text_array,
)

html_fragments = st.lists(
    st.one_of(
        st.text(max_size=40),
        st.sampled_from(
            ["<p>", "</p>", "<div class='x'>", "</div>", "<script>var x;</script>",
             "<style>a{}</style>", "<!-- c -->", "<br/>", "&amp;", "&lt;", "&nbsp;",
             "<a href='u'>t</a>", "<p unclosed", "< stray", "<>", "</", "\n", "\t",
             "<sCrIpT>mixed</sCrIpT>"]
        ),
    ),
    max_size=12,
).map("".join)


@settings(max_examples=150, deadline=None)
@given(html_fragments)
def test_extract_never_raises_and_is_deterministic(html):
    a = extract_text(html)
    b = extract_text(html)
    assert a == b
    # no markup survives complete tags; output has collapsed whitespace
    assert "  " not in a
    assert "\n\n" not in a


@settings(max_examples=60, deadline=None)
@given(st.lists(html_fragments, min_size=1, max_size=8))
def test_extract_batch_equals_scalar(htmls):
    batch = extract_text_array(pa.array(htmls, pa.string())).to_pylist()
    scalars = [extract_text(h) for h in htmls]
    assert batch == scalars


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(max_size=60), min_size=1, max_size=6))
def test_decode_binary_never_raises(payloads):
    text, errors = decode_html_binary(pa.array(payloads, pa.binary()))
    assert len(text) == len(payloads)
    for t, e, p in zip(text.to_pylist(), errors.to_pylist(), payloads):
        try:
            p.decode("utf-8")
            assert e is None
        except UnicodeDecodeError:
            assert e == "utf8-decode-error"
        assert t is not None


meta_fragments = st.lists(
    st.one_of(
        st.text(max_size=30),
        st.sampled_from(
            ['<meta name="', '" content="', '">', '<meta name="k" content="v">',
             '<meta name="unterminated', 'content="loose"', '<a href="u">',
             "<head>", "</head>", '"', "\n"]
        ),
    ),
    max_size=10,
).map("".join)


@settings(max_examples=100, deadline=None)
@given(st.lists(meta_fragments, min_size=1, max_size=6))
def test_manifest_extraction_never_raises_and_is_row_isolated(htmls):
    """Manifest extraction over arbitrary/malformed markup: never raises,
    deterministic, and batch-composition independent (each row's manifest
    rows depend only on that row — the per-row invariant)."""
    from code_graph_rag_ray.stages.manifest import extract_meta

    keys, vals, rows = extract_meta(pa.array(htmls, pa.string()))
    keys2, vals2, rows2 = extract_meta(pa.array(htmls, pa.string()))
    assert keys.to_pylist() == keys2.to_pylist()
    assert vals.to_pylist() == vals2.to_pylist()
    assert rows.tolist() == rows2.tolist()
    # batch == per-row singleton composition
    per_row: list[tuple] = []
    for i, h in enumerate(htmls):
        k1, v1, _ = extract_meta(pa.array([h], pa.string()))
        per_row.extend((i, k, v) for k, v in zip(k1.to_pylist(), v1.to_pylist()))
    got = list(zip(rows.tolist(), keys.to_pylist(), vals.to_pylist()))
    assert got == per_row
