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


# --- grouped-operator properties (few examples: each one is a Ray run) ---

grouped_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=-50, max_value=50)),
    min_size=1, max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(grouped_rows, st.integers(min_value=1, max_value=3),
       st.integers(min_value=1, max_value=5))
def test_grouped_trimmed_sum_matches_reference(rows, k, blocks):
    import ray.data as rd

    from code_graph_rag_ray.stages.relational import grouped_trimmed_sum

    t = pa.table({
        "g": pa.array([r[0] for r in rows]),
        "v": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array(list(range(len(rows))), pa.int64()),
    })
    got = {r["g"]: (r["trimmed_sum"], r["n_kept"])
           for r in grouped_trimmed_sum(
               rd.from_arrow(t).repartition(blocks), "g", "v", k,
               tiebreak="id").take_all()}
    want = {}
    by = {}
    for i, (g, v) in enumerate(rows):
        by.setdefault(g, []).append((v, i))
    for g, vs in by.items():
        vs.sort()
        if len(vs) > 2 * k:
            kept = vs[k:-k]
            want[g] = (sum(v for v, _ in kept), len(kept))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(grouped_rows, st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=5))
def test_grouped_collect_matches_reference(rows, k, blocks):
    import ray.data as rd

    from code_graph_rag_ray.stages.relational import grouped_collect

    t = pa.table({
        "g": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array(list(range(len(rows))), pa.int64()),
        "val": pa.array([f"x{r[1]}" for r in rows]),
    })
    got = {r["g"]: (r["collected"], r["n_collected"])
           for r in grouped_collect(
               rd.from_arrow(t).repartition(blocks), "g", "ts", "val", k,
               tiebreak="id").take_all()}
    want = {}
    by = {}
    for i, (g, v) in enumerate(rows):
        by.setdefault(g, []).append((v, i))
    for g, vs in by.items():
        vs.sort()
        head = vs[:k]
        want[g] = (",".join(f"x{v}" for v, _ in head), len(head))
    assert got == want
