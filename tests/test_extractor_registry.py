"""Per-content-type extractor registry tests (M11 / §2.9 analog).

The reference dispatches a pluggable per-language spec registry
(``language_spec.py``, ``models.py:80-95``) with a YAML fallback tier for
spec-less languages (``ast_grep_tier.py:38-62``). Here: pages carrying a
``lang`` route through that lang's :class:`ExtractorSpec` relation table
(default ∪ lang spec), unknown langs fall back to the default tier.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.linking import (
    DEFAULT_REGISTRY,
    ExtractorSpec,
    MentionLinker,
    link_mentions,
)

_ALIAS = pa.Table.from_pylist(
    [
        {"alias": "Acme Systems", "entity_id": "E0", "prior": 1.0},
        {"alias": "Orbit Labs", "entity_id": "E1", "prior": 1.0},
    ],
    schema=pa.schema(
        [("alias", pa.string()), ("entity_id", pa.string()), ("prior", pa.float64())]
    ),
)


def _pages(text: str, lang: str) -> pa.Table:
    return pa.table(
        {"url": pa.array(["https://x/1"]), "text": pa.array([text]),
         "lang": pa.array([lang])}
    )


def _triples(linker: MentionLinker, text: str, lang: str):
    out = linker(_pages(text, lang)).to_pandas()
    return set(
        map(tuple, out[out.rel.notna()][["entity_id", "rel", "obj_entity_id"]]
            .itertuples(index=False))
    )


def test_fr_pages_link_through_fr_extractor():
    linker = MentionLinker(_ALIAS)
    text = "Acme Systems a acquis Orbit Labs ."
    assert _triples(linker, text, "fr") == {("E0", "acquired", "E1")}
    # the default (en) extractor alone does NOT pair the French surface —
    # the registry dispatch is what makes it link
    assert _triples(linker, text, "en") == set()


def test_de_spec_and_default_fallback_tier():
    linker = MentionLinker(_ALIAS)
    de = "Acme Systems übernahm Orbit Labs ."
    assert _triples(linker, de, "de") == {("E0", "acquired", "E1")}
    # lang spec EXTENDS the default: English surfaces still pair on fr pages
    en_shaped = "Acme Systems acquired Orbit Labs ."
    assert _triples(linker, en_shaped, "fr") == {("E0", "acquired", "E1")}
    # unknown lang falls back to the default tier
    assert _triples(linker, en_shaped, "zz") == {("E0", "acquired", "E1")}


def test_user_registry_plug_point():
    reg = {"xx": ExtractorSpec((("zorbed", "acquired"),))}
    linker = MentionLinker(_ALIAS, registry=reg)
    text = "Acme Systems zorbed Orbit Labs ."
    assert _triples(linker, text, "xx") == {("E0", "acquired", "E1")}
    assert _triples(linker, text, "en") == set()
    assert "fr" not in linker._rel_by_lang  # user registry replaces built-in


def test_registry_through_dataset_stage():
    ds = rd.from_arrow(_pages("Acme Systems a fondé Orbit Labs .", "fr"))
    out = link_mentions(ds, _ALIAS, registry=DEFAULT_REGISTRY).to_pandas()
    got = out[out.rel.notna()]
    assert len(got) == 1 and got.iloc[0].rel == "founded"


def test_two_tier_routing_matches_single_tier():
    """M13/M14 routing analog: precise-tier (actor pool, full registry)
    union cheap-tier (tasks, default relations) must equal one full-registry
    pass over everything — routing changes execution, not semantics."""
    texts = [
        ("Acme Systems acquired Orbit Labs .", "en"),
        ("Acme Systems a acquis Orbit Labs .", "fr"),
        ("Acme Systems übernahm Orbit Labs .", "de"),
        ("Acme Systems founded Orbit Labs .", "zz"),
    ]
    tbl = pa.table(
        {"url": pa.array([f"https://x/{i}" for i in range(len(texts))]),
         "text": pa.array([t for t, _ in texts]),
         "lang": pa.array([l for _, l in texts])}
    )
    ds = rd.from_arrow(tbl).materialize()

    from code_graph_rag_ray.stages.linking import link_mentions_two_tier

    two = link_mentions_two_tier(
        ds, _ALIAS, precise_langs={"fr", "de"}, registry=DEFAULT_REGISTRY,
        precise_concurrency=2,
    ).to_pandas()
    one = link_mentions(ds, _ALIAS, registry=DEFAULT_REGISTRY).to_pandas()

    key = ["url", "start", "end", "entity_id", "rel", "obj_entity_id"]
    assert (
        set(map(tuple, two[key].itertuples(index=False)))
        == set(map(tuple, one[key].itertuples(index=False)))
    )
    # all four pages produced a triple (fr/de via the precise tier)
    assert set(two[two.rel.notna()].url) == {f"https://x/{i}" for i in range(4)}


def test_precise_linker_detection():
    """M13/M14 heavy tier: the PreciseLinker's normalized token-trie
    detection catches case- and punctuation-mangled dictionary mentions
    the cheap alternation regex cannot, while reproducing the base output
    bit-for-bit on normal-cased pages (base spans take precedence)."""
    from code_graph_rag_ray.stages.linking import PreciseLinker

    pl = PreciseLinker(_ALIAS)
    ml = MentionLinker(_ALIAS)

    def run(linker, text):
        return linker(pa.table({
            "url": pa.array(["https://x/1"]), "text": pa.array([text]),
            "lang": pa.array(["en"])})).to_pandas()

    # ALL-CAPS page: the cheap tier sees one giant cap-run (garbage
    # external, dropped), the precise tier recovers the triple
    shouty = "ACME SYSTEMS ACQUIRED ORBIT LABS ."
    assert len(run(ml, shouty)) == 0
    p = run(pl, shouty)
    assert set(p.entity_id) == {"E0", "E1"}
    assert (p.rel == "acquired").sum() == 1
    assert list(p.method.unique()) == ["exact"]
    # hyphen-mangled lowercase surface
    p2 = run(pl, "acme-systems acquired Orbit Labs .")
    assert (p2.rel == "acquired").sum() == 1
    # normal-cased page: identical to the base tier
    norm = "Acme Systems acquired Orbit Labs . Today was quiet ."
    assert run(ml, norm).equals(run(pl, norm))


def test_two_tier_shouty_routing(ray_session):
    """Shouty pages route to the precise actor pool; everything else takes
    the cheap tier — the union resolves both, and a pure-cheap pass loses
    exactly the shouty page's triple."""
    from code_graph_rag_ray.stages.linking import link_mentions_two_tier

    tbl = pa.table({
        "url": pa.array(["https://x/0", "https://x/1"]),
        "text": pa.array(["Acme Systems acquired Orbit Labs .",
                          "ACME SYSTEMS ACQUIRED ORBIT LABS ."]),
        "lang": pa.array(["en", "en"]),
    })
    ds = rd.from_arrow(tbl).materialize()
    two = link_mentions_two_tier(
        ds, _ALIAS, shouty_to_precise=True, precise_concurrency=1,
    ).to_pandas()
    assert set(two[two.rel.notna()].url) == {"https://x/0", "https://x/1"}
    one = link_mentions(ds, _ALIAS).to_pandas()
    assert set(one[one.rel.notna()].url) == {"https://x/0"}


def test_fixture_shouty_plants_roundtrip(ray_session):
    """generate_pages(shouty_plants=N) plants ALL-CAPS pages resolvable
    only via the precise tier; the full composition (host priors + shouty
    two-tier) meets the exact gate, the cheap-only run loses exactly the
    shouty triples."""
    import ray.data as rd2

    from code_graph_rag_ray.functions.scoring import score_sets
    from code_graph_rag_ray.pipelines.kg import build_kg
    from code_graph_rag_ray.sources.pages import generate_pages

    fx = generate_pages(120, 11, shouty_plants=3)
    gold = {(r["subj"], r["pred"], r["obj"], r["url"])
            for r in fx.expected_triples.to_pylist()}
    shouty_urls = {r["url"] for r in fx.expected_text.to_pylist()
                   if r["text"] == r["text"].upper() and r["text"]}

    cheap = build_kg(rd2.from_arrow(fx.pages), fx.alias_dict,
                     build_nodes=False, host_priors=True)["edges"].to_pandas()
    cheap_set = set(map(tuple, cheap[
        ["subj", "pred", "obj", "provenance_url"]].itertuples(index=False)))
    missing = gold - cheap_set
    assert len(missing) == 3
    assert {u for _, _, _, u in missing} <= shouty_urls

    full = build_kg(rd2.from_arrow(fx.pages), fx.alias_dict,
                    build_nodes=False, host_priors=True,
                    shouty_two_tier=True)["edges"].to_pandas()
    full_set = set(map(tuple, full[
        ["subj", "pred", "obj", "provenance_url"]].itertuples(index=False)))
    s = score_sets(full_set, gold)
    assert s.precision == 1.0 and s.recall == 1.0
