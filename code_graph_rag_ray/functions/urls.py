"""Vectorized URL canonicalization.

The reference's endpoint linking joins request URLs against endpoint
Resources on a NORMALIZED URL key (``graph_updater.py:1023-1047``,
``parsers/endpoints.py`` — both sides are canonicalized before the equi-join
so superficial spelling differences don't break resolution). The web-text
analog: raw ``<a href>`` targets vary in case, default ports, fragments and
tracking parameters, so the link graph must join on canonical forms.

``normalize_urls`` is a fixed sequence of Arrow regex rewrites (zero
Python-per-row work) implementing the standard, semantics-preserving
canonicalization steps:

1. lowercase the scheme and host (authority is case-insensitive per RFC
   3986 §6.2.2.1; the path is NOT touched — it is case-sensitive),
2. drop the fragment (``#…`` — client-side only, never part of the
   resource identity),
3. drop the default port (``:443`` for https, ``:80`` for http — RFC 3986
   §6.2.3),
4. strip ``utm_*`` tracking parameters, repairing the query separator when
   the first parameter was removed.

Rows that don't parse as ``scheme://authority…`` pass through unchanged —
deterministic degradation, same policy as extract_text on malformed markup.
The transform is idempotent (property-tested), so it is safe to apply to
BOTH join sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_URL_PARTS = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]+)(?P<rest>[^#]*)"
)


def normalize_urls(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonicalize an Arrow string array of absolute URLs (see module doc)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m = pc.extract_regex(arr, pattern=_URL_PARTS)
    ok = pc.is_valid(m)
    scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(m, "scheme"), ""))
    host = pc.utf8_lower(pc.fill_null(pc.struct_field(m, "host"), ""))
    rest = pc.fill_null(pc.struct_field(m, "rest"), "")

    https443 = pc.and_(pc.equal(scheme, "https"), pc.ends_with(host, pattern=":443"))
    http80 = pc.and_(pc.equal(scheme, "http"), pc.ends_with(host, pattern=":80"))
    host = pc.if_else(
        https443,
        pc.replace_substring_regex(host, pattern=":443$", replacement=""),
        pc.if_else(
            http80,
            pc.replace_substring_regex(host, pattern=":80$", replacement=""),
            host,
        ),
    )

    # strip utm_* params; a removed FIRST param leaves "&rest" where
    # "?rest" belongs — repair the separator, but ONLY on rows that had a
    # utm param (a literal '&' in a query-less path — malformed, should be
    # %26 — must pass through untouched)
    had_utm = pc.match_substring_regex(rest, pattern=r"[?&]utm_")
    stripped = pc.replace_substring_regex(rest, pattern=r"[?&]utm_[^&]*", replacement="")
    repaired = pc.replace_substring_regex(stripped, pattern=r"^([^?]*)&", replacement=r"\1?")
    rest = pc.if_else(had_utm, repaired, rest)

    norm = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    return pc.if_else(ok, norm, arr)


def normalize_url(url: str) -> str:
    """Scalar convenience wrapper (tests / fixtures)."""
    return normalize_urls(pa.array([url], pa.string()))[0].as_py()
