"""URL canonicalization tests (the normalized J8 join key)."""

from __future__ import annotations

import pyarrow as pa

from code_graph_rag_ray.functions.urls import normalize_url, normalize_urls


def test_normalize_cases():
    cases = {
        # scheme+host lowercased, path case KEPT
        "HTTPS://WWW.Example.ORG/Path/X": "https://www.example.org/Path/X",
        # default ports dropped, non-default kept
        "https://a.org:443/x": "https://a.org/x",
        "http://a.org:80/x": "http://a.org/x",
        "https://a.org:80/x": "https://a.org:80/x",  # 80 is not https default
        "http://a.org:8080/x": "http://a.org:8080/x",
        # fragment dropped
        "https://a.org/x#frag": "https://a.org/x",
        "https://a.org/x?q=1#frag": "https://a.org/x?q=1",
        # utm params stripped wherever they sit; separator repaired
        "https://a.org/x?utm_source=f": "https://a.org/x",
        "https://a.org/x?utm_source=f&b=2": "https://a.org/x?b=2",
        "https://a.org/x?a=1&utm_medium=m&b=2": "https://a.org/x?a=1&b=2",
        "https://a.org/x?a=1&utm_a=1&utm_b=2": "https://a.org/x?a=1",
        # non-utm params untouched
        "https://a.org/x?a=1&b=2": "https://a.org/x?a=1&b=2",
        # literal & in a query-less path passes through (malformed, not ours
        # to fix)
        "https://a.org/a&b": "https://a.org/a&b",
        # everything at once
        "HTTPS://A.Org:443/Doc/3?utm_source=feed#s": "https://a.org/Doc/3",
        # non-URLs pass through unchanged
        "not a url": "not a url",
        "/relative/path": "/relative/path",
        "": "",
    }
    got = normalize_urls(pa.array(list(cases), pa.string())).to_pylist()
    assert got == list(cases.values())


def test_normalize_null_passthrough():
    out = normalize_urls(pa.array([None, "HTTP://X.Y:80/"], pa.string()))
    assert out.to_pylist() == [None, "http://x.y/"]


def test_normalize_idempotent():
    samples = [
        "HTTPS://A.Org:443/Doc/3?utm_source=feed&x=1#s",
        "http://b.net:80/p?utm_a=1&utm_b=2",
        "https://c.io/q?a=1",
        "ftp://Weird.Host:21/f",
        "not a url",
    ]
    once = normalize_urls(pa.array(samples, pa.string())).to_pylist()
    twice = [normalize_url(u) for u in once]
    assert once == twice
