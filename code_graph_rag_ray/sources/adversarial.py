"""Adversarial corpus mutations + the messy-input robustness eval.

The reference validates on an ORGANIC corpus (execution-traced CALLS recall
and retrieval-vs-grep over a real repository, ``evals/README.md:61-141``);
no organic web corpus ships in this environment, so the analog is a
DETERMINISTIC adversarial degradation study: mutate the seeded fixture with
realistic web-text damage and measure how pipeline precision/recall decay
as the mutation rate rises. Every mutation is a pure function of
``(seed, url)`` (md5-driven), so the curve is bit-reproducible.

Mutation kinds (chosen per page by hash, mirroring real crawl damage):

- ``case``     — the whole page is uppercased (teletype/headline shouting;
  the PreciseLinker tier exists for exactly this — the eval shows the
  two-tier pipeline degrades measurably less than the cheap tier),
- ``typo``     — one character transposition inside the first capitalized
  body word (OCR/typo noise; breaks exact dictionary detection and can
  demote a full-name mention to its ambiguous bare-noun suffix),
- ``truncate`` — the html is cut in half (interrupted fetches; deterministic
  extraction degradation, mentions after the cut are lost),
- ``distract`` — a plausible fact sentence about UNKNOWN entities is
  injected (spam/boilerplate; must only ever mint External edges — internal
  precision must hold, and the eval pins that).

``mutate_pages`` is a pure ``pa.Table → pa.Table`` function, usable inside
``map_batches`` for corpus-scale studies; the eval below runs it on the
fixture table directly (fixture-scale, like ``kg_fixture_pr``).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

KINDS = ("case", "typo", "truncate", "distract")

_CAP_WORD = re.compile(r"[A-Z][a-z]{3,}")
_DISTRACTOR = "<p>Zzyx Corp acquired Qqux Inc .</p>"


def _page_hash(url: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}|{url}".encode()).hexdigest()[:12], 16)


def _mutate_one(s: str, kind: str) -> str:
    if kind == "case":
        return s.upper()
    if kind == "typo":
        body = s.find("<body>")
        m = _CAP_WORD.search(s, body if body >= 0 else 0)
        if m is None:
            return s
        w, i = m.group(), m.start()
        return s[:i] + w[0] + w[2] + w[1] + w[3:] + s[m.end():]
    if kind == "truncate":
        return s[: len(s) // 2]
    if kind == "distract":
        if "</body>" in s:
            return s.replace("</body>", _DISTRACTOR + "</body>", 1)
        return s + _DISTRACTOR
    raise ValueError(kind)


def mutate_pages(
    pages: pa.Table,
    rate: float,
    *,
    seed: int = 0,
    kinds: tuple[str, ...] = KINDS,
) -> tuple[pa.Table, pa.Table]:
    """Deterministically damage ``rate`` of the pages.

    Returns ``(mutated_pages, log)`` where ``log`` is (url, kind) for every
    mutated page. Pages whose html is empty or not valid UTF-8 are left
    untouched (they are already the fixture's error-isolation rows).
    """
    urls = pages["url"].to_pylist()
    htmls = pages["html"].to_pylist()
    out: list[bytes | None] = []
    log: list[dict] = []
    for url, html in zip(urls, htmls):
        h = _page_hash(url, seed)
        if not html or (h % 1_000_000) / 1_000_000 >= rate:
            out.append(html)
            continue
        try:
            s = html.decode("utf-8")
        except UnicodeDecodeError:
            out.append(html)
            continue
        kind = kinds[(h // 1_000_000) % len(kinds)]
        out.append(_mutate_one(s, kind).encode())
        log.append({"url": url, "kind": kind})
    mutated = pages.set_column(
        pages.column_names.index("html"), "html", pa.array(out, pa.binary())
    )
    log_tbl = pa.Table.from_pylist(
        log, schema=pa.schema([("url", pa.string()), ("kind", pa.string())])
    )
    return mutated, log_tbl


def robustness_curve(
    rates: tuple[float, ...] = (0.0, 0.2, 0.5),
    *,
    n_pages: int = 300,
    fixture_seed: int = 42,
    mutation_seed: int = 0,
    shouty_two_tier: bool = True,
    kinds: tuple[str, ...] = KINDS,
):
    """P/R degradation curve of the FULL pipeline (host priors + precise
    tier) under rising mutation rates, scored against the unmutated gold.
    Returns a pandas frame (rate, n_mutated, precision, recall) — the
    messy-input eval the planted fixture alone cannot provide."""
    import pandas as pd
    import ray.data as rd

    from code_graph_rag_ray.functions.scoring import score_sets
    from code_graph_rag_ray.pipelines.kg import build_kg
    from code_graph_rag_ray.sources.pages import generate_pages

    fx = generate_pages(n_pages, fixture_seed)
    gold = {(r["subj"], r["pred"], r["obj"], r["url"])
            for r in fx.expected_triples.to_pylist()}
    rows = []
    for rate in rates:
        mutated, log = mutate_pages(fx.pages, rate, seed=mutation_seed,
                                    kinds=kinds)
        kg = build_kg(rd.from_arrow(mutated), fx.alias_dict,
                      build_nodes=False, host_priors=True,
                      shouty_two_tier=shouty_two_tier)
        edges = kg["edges"].to_pandas()
        pred = set(map(tuple, edges[
            ["subj", "pred", "obj", "provenance_url"]].itertuples(index=False)))
        s = score_sets(pred, gold)
        rows.append({"rate": rate, "n_mutated": log.num_rows,
                     "precision": round(s.precision, 4),
                     "recall": round(s.recall, 4)})
    return pd.DataFrame(rows)


def organic_robustness_curve(
    rates: tuple[float, ...] = (0.0, 0.2, 0.5),
    *,
    n_pages: int = 300,
    fixture_seed: int = 7,
    mutation_seed: int = 0,
    shouty_two_tier: bool = True,
    kinds: tuple[str, ...] = KINDS,
):
    """The robustness curve run on the SECOND fixture family
    (`sources/organic.py` — Zipf popularity, article-shaped html): same
    deterministic damage, same scoring, a structurally different corpus.
    Together with :func:`robustness_curve` this pins that degradation
    behavior is a property of the pipeline, not of one generator's
    shape."""
    import pandas as pd
    import ray.data as rd

    from code_graph_rag_ray.functions.scoring import score_sets
    from code_graph_rag_ray.pipelines.kg import build_kg
    from code_graph_rag_ray.sources.organic import generate_organic_pages

    fx = generate_organic_pages(n_pages, seed=fixture_seed)
    gold = {(r["subj"], r["pred"], r["obj"], r["url"])
            for r in fx.expected_triples.to_pylist()}
    rows = []
    for rate in rates:
        mutated, log = mutate_pages(fx.pages, rate, seed=mutation_seed,
                                    kinds=kinds)
        kg = build_kg(rd.from_arrow(mutated), fx.alias_dict,
                      build_nodes=False, shouty_two_tier=shouty_two_tier)
        edges = kg["edges"].to_pandas()
        pred = set(map(tuple, edges[
            ["subj", "pred", "obj", "provenance_url"]].itertuples(index=False)))
        s = score_sets(pred, gold)
        rows.append({"rate": rate, "n_mutated": log.num_rows,
                     "precision": round(s.precision, 4),
                     "recall": round(s.recall, 4)})
    return pd.DataFrame(rows)
