"""Entity-mention detection + candidate-link scoring (Pass 3 analog).

The reference resolves each call-site/mention against a process-global
registry trie with a preference cascade (``parsers/call_resolver.py:297-318``
exact qn → receiver-type chain → suffix fallback; registry
``function_registry.py:18-283``). Here that becomes:

- the **alias dictionary** is broadcast ONCE via ``ray.put`` and each
  :class:`MentionLinker` actor rehydrates it in ``__init__`` — never
  re-shipped per batch (SURVEY.md §2.3 T1 mapping),
- mention **detection** is one compiled alternation regex (longest-alias
  first, word-bounded) — compiled once per actor, the analog of cgr loading
  tree-sitter parsers once per process (``parser_loader.py:482``),
- the **cascade** (the analog of the reference's six-step resolver,
  ``parsers/call_resolver.py:297-318``): for dictionary aliases —
  unique candidate (exact qn) → page-local *suffix* recency antecedent
  (the trie ``find_ending_with`` analog) → **unique-seen redirect**: an
  ambiguous alias whose candidate set contains exactly ONE entity already
  resolved on this page links to it (the interface→unique-concrete-
  implementer redirect, ``call_resolver.py:2596-2682``) → highest-prior
  candidate with deterministic entity-id tie-break; for unknown
  proper-noun runs —
  builtin-table gate (capitalized function words are never entities;
  the builtin-table tier + fallback gates, ``call_resolver.py:33-44``)
  → page-local *prefix* antecedent (single token matching the first
  token of an earlier full mention, the registry's prefix-query analog,
  ``function_registry.py:18-283``) → page-local *acronym* antecedent
  (all-caps token matching the initials of an earlier full mention —
  the J3 receiver-type-chain analog for web text,
  ``parsers/type_inference.py``; 'Acme Systems … AS sued X')
  → External minting,
- **unknown** proper-noun runs surviving both gates and participating in
  a relation pattern mint ``ext::<normalized>`` External entities (cgr's
  deferred-import rule: unknown target ⇒ ExternalModule node,
  ``import_processor.py:861-983``),
- the **host-prior tier** (cross-page J3 context — the web analog of the
  reference's cross-file receiver-type propagation,
  ``parsers/type_inference.py`` feeding ``call_resolver.py``): a first
  corpus pass mines host-scoped mention→entity frequencies from the
  CONFIDENT cascade tiers (:func:`mine_host_priors`), and a second pass
  consults that side table — after every page-local signal, before the
  global-prior fallback (known aliases) / External minting (unknown runs).
  Page-local evidence always outranks corpus evidence, mirroring the
  reference's local-scope-first resolution order,
- **triple pairing** happens in the same pass: consecutive mentions whose
  gap text strips to a known relation surface form a triple, attached to
  the subject mention row (``rel``/``obj_*`` columns) so downstream stages
  never need the page text again.

Output schema (one row per detected mention):
    url, start, end, surface, entity_id, method, rel, obj_entity_id, lang
``method`` ∈ {exact, recency, unique, context, acronym, host_prior, prior,
external}.
"""

from __future__ import annotations

import re
from bisect import bisect_left
from dataclasses import dataclass

import pyarrow as pa

from code_graph_rag_ray.sources.pages import RELATIONS

_CAP_RUN = re.compile(r"\b[A-Z][a-zA-Z0-9]*(?: [A-Z][a-zA-Z0-9]*)*\b")

# Builtin surface table — the reference cascade's last tier is a builtin
# lookup table plus fallback gates that stop spurious linking
# (``call_resolver.py:33-44``, step 6 of ``:297-318``). Web-text analog:
# capitalized function words / temporal adverbs are never entity mentions;
# without this gate they mint spurious ``ext::`` externals and pair into
# false triples ("Today acquired X"). Applies only to UNKNOWN cap-runs —
# a user dictionary alias always wins over the gate.
BUILTIN_SURFACES = frozenset({
    "The", "A", "An", "It", "He", "She", "They", "We", "You", "I",
    "This", "That", "These", "Those", "There", "Here", "But", "And", "Or",
    "Today", "Yesterday", "Tomorrow", "Meanwhile", "However", "Moreover",
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
    "Sunday", "January", "February", "March", "April", "June", "July",
    "August", "September", "October", "November", "December",
})


@dataclass(frozen=True)
class ExtractorSpec:
    """Per-content-type extraction spec — the analog of cgr's pluggable
    ``LanguageSpec`` registry (``models.py:80-95``, ``language_spec.py``)
    and its YAML ast-grep tier dispatched per language
    (``ast_grep_tier.py:38-62``): drop a spec into the registry and pages
    carrying that ``lang`` get their own relation-surface table.

    ``relations`` maps in-text relation surfaces to predicate ids. At link
    time a page's effective table is ``default ∪ lang_spec`` (lang-specific
    surfaces EXTEND the default tier — unknown langs fall back to the
    default alone, mirroring cgr's fallback tier for spec-less languages).
    """

    relations: tuple[tuple[str, str], ...]


# Built-in registry: the default (en-shaped) tier plus two non-English
# specs proving the plug point.
DEFAULT_REGISTRY: dict[str, ExtractorSpec] = {
    "fr": ExtractorSpec(
        (("a acquis", "acquired"), ("a fondé", "founded"),
         ("s'est associé à", "partnered_with"),
         ("a investi dans", "invested_in"), ("a poursuivi", "sued"))
    ),
    "de": ExtractorSpec(
        (("übernahm", "acquired"), ("gründete", "founded"),
         ("kooperierte mit", "partnered_with"),
         ("investierte in", "invested_in"), ("verklagte", "sued"))
    ),
}


def _registry_key(registry: dict[str, ExtractorSpec] | None) -> tuple | None:
    if registry is None:
        return None
    return tuple(
        (lang, registry[lang].relations) for lang in sorted(registry)
    )

MENTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("surface", pa.string()),
        ("entity_id", pa.string()),
        ("method", pa.string()),
        ("rel", pa.string()),
        ("obj_entity_id", pa.string()),
        ("lang", pa.string()),
    ]
)


def normalize_surface(s: str) -> str:
    """Canonical surface form: casefold + whitespace collapse (A1 analog)."""
    return " ".join(s.casefold().split())


def build_alias_index(alias_tbl: pa.Table) -> dict[str, list[tuple[str, float]]]:
    """alias_dict(alias, entity_id, prior) → alias → [(entity_id, prior)…]
    sorted by (-prior, entity_id) so index 0 is the deterministic argmax."""
    idx: dict[str, list[tuple[str, float]]] = {}
    for row in alias_tbl.to_pylist():
        idx.setdefault(row["alias"], []).append((row["entity_id"], row["prior"]))
    for alias, cands in idx.items():
        cands.sort(key=lambda c: (-c[1], c[0]))
    return idx


class MentionLinker:
    """Actor-pool stage: pages(text) batches → linked-mention rows.

    ``alias_ref`` is a ``ray.ObjectRef`` to the alias table (broadcast once)
    or a plain ``pa.Table`` (tests). All setup — dictionary rehydration and
    regex compilation — happens here in ``__init__``, once per actor.
    """

    def __init__(
        self,
        alias_ref,
        relations: dict[str, str] | None = None,
        registry: dict[str, ExtractorSpec] | None = None,
        host_prior_ref=None,
    ):
        import ray

        alias_tbl = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        self.index = build_alias_index(alias_tbl)
        # host-prior side table (second broadcast, J3 cross-page context):
        # (host, surface) → entity_id. None/empty disables the tier.
        hp_tbl = (
            ray.get(host_prior_ref)
            if host_prior_ref is not None and isinstance(host_prior_ref, ray.ObjectRef)
            else host_prior_ref
        )
        self.host_prior: dict[tuple[str, str], str] = {}
        if hp_tbl is not None and hp_tbl.num_rows:
            for h, s, e in zip(
                hp_tbl["host"].to_pylist(),
                hp_tbl["surface"].to_pylist(),
                hp_tbl["entity_id"].to_pylist(),
            ):
                self.host_prior[(h, s)] = e
        # longest alias first → leftmost-longest match in Python's re
        alts = sorted(self.index, key=len, reverse=True)
        self.alias_re = (
            re.compile(r"\b(?:" + "|".join(re.escape(a) for a in alts) + r")\b")
            if alts
            else None
        )
        self.relations = dict(RELATIONS) if relations is None else dict(relations)
        # per-lang effective tables precomputed once per actor/worker
        # (default ∪ lang spec; unknown langs use the default alone)
        self.registry = DEFAULT_REGISTRY if registry is None else registry
        self._rel_by_lang = {
            lang: {**self.relations, **dict(spec.relations)}
            for lang, spec in self.registry.items()
        }
        # normalized relation tables are a precise-tier feature (see
        # PreciseLinker); the base tier keeps them empty so its pairing
        # semantics — and every oracle built on them — are unchanged
        self._rel_norm_by_lang: dict = {}
        self._rel_norm_default = None

    # -- detection hooks (overridden by the precise tier) -------------------
    def _extra_spans(
        self, text: str, spans: list[tuple[int, int, str, list | None]]
    ) -> None:
        """Append additional KNOWN spans (with their candidate lists) the
        base alternation regex cannot find. Base tier: none."""

    # -- per-page resolution ------------------------------------------------
    def _link_page(self, url: str, text: str, lang: str, out: "_Cols") -> None:
        if not text:
            return
        # span = (start, end, surface, candidates-or-None); None = unknown
        spans: list[tuple[int, int, str, list | None]] = []
        index = self.index
        if self.alias_re is not None:
            for m in self.alias_re.finditer(text):
                s = m.group()
                spans.append((m.start(), m.end(), s, index[s]))
        self._extra_spans(text, spans)
        spans.sort()
        # overlap check against the KNOWN spans: sorted and non-overlapping
        # by construction — the only candidate overlap for a cap-run match
        # is the last known span starting before its end (bisect, O(log n)
        # instead of the quadratic any() scan)
        known_starts = [s for s, _, _, _ in spans]
        known_ends = [e for _, e, _, _ in spans]
        builtins = BUILTIN_SURFACES
        for m in _CAP_RUN.finditer(text):
            if m.group() in builtins:
                continue
            i = bisect_left(known_starts, m.end())
            if i and known_ends[i - 1] > m.start():
                continue
            spans.append((m.start(), m.end(), m.group(), None))
        spans.sort()

        # cascade link for dictionary mentions — parallel local arrays (a
        # dict per mention dominated the profile)
        recent_full: dict[str, str] = {}    # suffix token -> entity_id
        recent_prefix: dict[str, str] = {}  # first token  -> entity_id
        recent_acr: dict[str, str] = {}     # initials     -> entity_id
        seen: set[str] = set()              # entity ids resolved on this page
        host_prior = self.host_prior
        host = ""
        if host_prior:
            # scheme://host/... → host (cheap string ops, once per page)
            i0 = url.find("://")
            rest = url[i0 + 3 :] if i0 >= 0 else url
            host = rest.split("/", 1)[0]
        n = len(spans)
        eids: list[str] = [""] * n
        methods: list[str] = [""] * n
        rels: list[str | None] = [None] * n
        objs: list[str | None] = [None] * n
        for i, (start, end, surface, cands) in enumerate(spans):
            if cands is None:
                # prefix-antecedent step: a bare capitalized token matching
                # the FIRST token of an earlier full mention on this page
                # resolves to that entity (registry prefix query analog);
                # then the acronym-antecedent step: an all-caps token
                # matching the INITIALS of an earlier full mention resolves
                # to it (the J3 context feature — the receiver-type-chain
                # analog for web text: 'Acme Systems … AS sued X'; the
                # most recent binding wins, like the other recency maps) —
                # only then does External minting apply
                eid = None
                if " " not in surface:
                    eid = recent_prefix.get(surface)
                    if eid is not None:
                        eids[i] = eid
                        methods[i] = "context"
                    elif len(surface) >= 2 and surface.isupper():
                        eid = recent_acr.get(surface)
                        if eid is not None:
                            eids[i] = eid
                            methods[i] = "acronym"
                if eid is None and host_prior:
                    # host-prior tier (J3 cross-page context): the corpus-
                    # mined host-scoped expansion of this surface — consulted
                    # only after every page-local antecedent missed, before
                    # External minting
                    eid = host_prior.get((host, surface))
                    if eid is not None:
                        eids[i] = eid
                        methods[i] = "host_prior"
                if eid is None:
                    eids[i] = "ext::" + normalize_surface(surface)
                    methods[i] = "external"
                continue
            if len(cands) == 1:
                eid, method = cands[0][0], "exact"
            elif " " not in surface and surface in recent_full:
                eid, method = recent_full[surface], "recency"
            else:
                # unique-seen redirect: exactly one candidate was already
                # resolved on this page → it wins over the global prior
                # (interface → unique concrete implementer,
                # call_resolver.py:2596-2682)
                hit: str | None = None
                for c, _p in cands:
                    if c in seen:
                        if hit is None:
                            hit = c
                        elif hit != c:
                            hit = None
                            break
                if hit is not None:
                    eid, method = hit, "unique"
                else:
                    # host-prior tier for KNOWN ambiguous aliases: the
                    # corpus-mined host-scoped winner outranks the global
                    # dictionary prior, but only if it is actually a
                    # candidate of this alias (the dictionary constrains)
                    hp = host_prior.get((host, surface)) if host_prior else None
                    if hp is not None and any(c == hp for c, _ in cands):
                        eid, method = hp, "host_prior"
                    else:
                        eid, method = cands[0][0], "prior"
            if " " in surface:
                recent_full[surface.rsplit(" ", 1)[1]] = eid
                recent_prefix[surface.split(" ", 1)[0]] = eid
                # acronym binding: initials of every known multi-word
                # mention (must stay bit-identical to sources/pages._acronym)
                recent_acr["".join(t[0] for t in surface.split())] = eid
            seen.add(eid)
            eids[i] = eid
            methods[i] = method

        # triple pairing: gap between consecutive mentions == relation
        # surface — dispatched per content type (lang) through the registry
        in_triple = bytearray(n)
        relations = self._rel_by_lang.get(lang, self.relations)
        # precise tier only: normalized relation-surface fallback (base
        # linkers carry no normalized tables, so this stays None for them
        # and the hot loop is unchanged)
        rel_norm = self._rel_norm_by_lang.get(lang, self._rel_norm_default)
        for i in range(n - 1):
            gap = text[spans[i][1] : spans[i + 1][0]].strip()
            pred = relations.get(gap)
            if pred is None and rel_norm is not None:
                pred = rel_norm.get(normalize_surface(gap))
            if pred is not None:
                rels[i] = pred
                objs[i] = eids[i + 1]
                in_triple[i] = 1
                in_triple[i + 1] = 1

        # keep external mentions only when they participate in a triple.
        # The column lists are bound to locals: 9 direct C-level appends
        # per mention, no per-mention method-call frame (the ``add()``
        # method was ~30% of the round-1 profile) and no end-of-batch
        # transpose (a zip(*rows) rebuild measured just as expensive).
        (c_url, c_start, c_end, c_surface, c_eid, c_method, c_rel, c_obj,
         c_lang) = out.cols
        for i in range(n):
            if methods[i] == "external" and not in_triple[i]:
                continue
            start, end, surface, _ = spans[i]
            c_url.append(url)
            c_start.append(start)
            c_end.append(end)
            c_surface.append(surface)
            c_eid.append(eids[i])
            c_method.append(methods[i])
            c_rel.append(rels[i])
            c_obj.append(objs[i])
            c_lang.append(lang)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _Cols()
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(urls)
        for url, text, lang in zip(urls, texts, langs):
            self._link_page(url, text or "", lang, out)
        return out.to_table()


class _Cols:
    """Columnar mention accumulator: one Python list per output column,
    appended via locally-bound references in the hot loop (see
    ``_link_page``), one ``pa.array`` per column at batch end."""

    __slots__ = ("cols",)

    def __init__(self):
        self.cols: tuple[list, ...] = tuple([] for _ in MENTION_SCHEMA)

    def to_table(self) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(col, f.type) for col, f in zip(self.cols, MENTION_SCHEMA)],
            schema=MENTION_SCHEMA,
        )


_TOKEN = re.compile(r"[A-Za-z0-9]+")


class PreciseLinker(MentionLinker):
    """The genuinely heavy precise tier (M13/M14 analog — the place the
    reference pays for a libclang/Roslyn subprocess frontend,
    ``graph_updater.py:320-497``): a case- and punctuation-insensitive
    token-trie matcher layered over the base detection.

    Heavy per-actor state, built once in ``__init__`` (the actor-pool
    justification): a trie over the NORMALIZED token sequences of every
    dictionary alias, plus normalized relation-surface tables per lang.
    Per page it tokenizes the text and greedily longest-matches the trie
    over token runs the base regex left uncovered — catching mentions the
    cheap tier structurally cannot see (ALL-CAPS headline text, case- or
    hyphen-mangled surfaces: ``ACME SYSTEMS``, ``acme-systems``), at
    roughly 2× the per-page cost. Precedence: base exact spans win over
    trie spans; trie spans win over unknown cap-runs (on a shouty page
    the whole sentence is one capitalized run — without the trie tier it
    would mint one garbage External and lose every triple).

    The cascade is shared with the base class (spans carry their candidate
    lists), so resolution semantics — including the host-prior tier — are
    identical; only DETECTION is stronger.
    """

    def __init__(
        self,
        alias_ref,
        relations: dict[str, str] | None = None,
        registry: dict[str, ExtractorSpec] | None = None,
        host_prior_ref=None,
    ):
        super().__init__(alias_ref, relations, registry, host_prior_ref)
        # trie over normalized alias token tuples: node = {token: node},
        # terminal candidates under the None key
        root: dict = {}
        for alias, cands in self.index.items():
            node = root
            for tok in _TOKEN.findall(alias.lower()):
                node = node.setdefault(tok, {})
            node[None] = cands
        self._trie = root
        self._rel_norm_by_lang = {
            lang: {normalize_surface(s): p for s, p in tbl.items()}
            for lang, tbl in self._rel_by_lang.items()
        }
        self._rel_norm_default = {
            normalize_surface(s): p for s, p in self.relations.items()
        }

    def _extra_spans(
        self, text: str, spans: list[tuple[int, int, str, list | None]]
    ) -> None:
        # base spans come sorted & non-overlapping (finditer); bisect for
        # the overlap test like the cap-run scan does
        known_starts = [s for s, _, _, _ in spans]
        known_ends = [e for _, e, _, _ in spans]
        toks = [(m.start(), m.end(), m.group().lower())
                for m in _TOKEN.finditer(text)]
        trie = self._trie
        extra: list[tuple[int, int, str, list]] = []
        i, n = 0, len(toks)
        while i < n:
            node = trie.get(toks[i][2])
            j = i
            best = None  # (end_token_idx, cands) of the LONGEST terminal
            while node is not None:
                if None in node:
                    best = (j, node[None])
                j += 1
                node = node.get(toks[j][2]) if j < n else None
            if best is None:
                i += 1
                continue
            jend, cands = best
            start, end = toks[i][0], toks[jend][1]
            k = bisect_left(known_starts, end)
            if k and known_ends[k - 1] > start:
                i += 1  # base detection already covers this region
                continue
            extra.append((start, end, text[start:end], cands))
            i = jend + 1
        spans.extend(extra)


# per-worker-process linker cache: state (dictionary index + compiled
# alternation regex) is built once per worker per alias table, exactly like
# an actor's __init__ — but task pools reuse warm worker processes, so no
# per-execution actor startup cost (measured: actor ramp was a fixed ~2-4s
# per pipeline run)
_LINKER_CACHE: dict[tuple, MentionLinker] = {}


def _table_content_key(tbl: pa.Table) -> tuple:
    """Content digest of a (dictionary-scale) table — plain tables must NOT
    be keyed by ``id()``: CPython reuses ids after GC, so a different alias
    table could silently hit a stale cached linker."""
    import hashlib

    h = hashlib.md5()
    for batch in tbl.to_batches():
        for col in batch.columns:
            for buf in col.buffers():
                if buf is not None:
                    h.update(buf)
    return (tbl.num_rows, h.hexdigest())


def _cached_linker(
    alias_ref,
    relations: dict[str, str] | None,
    registry: dict[str, ExtractorSpec] | None = None,
    host_prior_ref=None,
    linker_cls: type = MentionLinker,
) -> MentionLinker:
    import ray

    def _ref_key(ref):
        if ref is None:
            return None
        return ref.hex() if isinstance(ref, ray.ObjectRef) else _table_content_key(ref)

    key = (
        _ref_key(alias_ref),
        None if relations is None else tuple(sorted(relations.items())),
        _registry_key(registry),
        _ref_key(host_prior_ref),
        linker_cls.__qualname__,
    )
    linker = _LINKER_CACHE.get(key)
    if linker is None:
        linker = linker_cls(alias_ref, relations, registry, host_prior_ref)
        _LINKER_CACHE[key] = linker
    return linker


def link_mentions(
    pages_text_ds,
    alias_ref,
    *,
    relations: dict[str, str] | None = None,
    registry: dict[str, ExtractorSpec] | None = None,
    concurrency: int | None = None,
    batch_size: int | None = None,
    host_prior_ref=None,
    linker_cls: type = MentionLinker,
):
    """Wire the linking stage: pages-with-text Dataset → mentions Dataset.

    Default = stateless tasks with a per-worker cached ``MentionLinker``
    (broadcast dictionary fetched once per worker; regex compiled once per
    worker). Pass ``concurrency`` to switch to a bounded actor pool — right
    when the per-actor state is heavy (a model, a large index) and you must
    cap how many copies exist.

    ``batch_size=None`` (default) batches per upstream block: when this
    stage fuses with upstream maps, Ray bundles *input* rows to reach a
    numeric batch_size — with row-expanding upstream stages that coalesces
    many blocks into one task and serializes the pool (observed: a 200-block
    input collapsed to 1 task). Per-block batching keeps task granularity =
    input block granularity.
    """
    if concurrency is not None:
        return pages_text_ds.map_batches(
            linker_cls,
            fn_constructor_args=(alias_ref, relations, registry, host_prior_ref),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

    def link(batch: pa.Table) -> pa.Table:
        return _cached_linker(
            alias_ref, relations, registry, host_prior_ref, linker_cls
        )(batch)

    return pages_text_ds.map_batches(link, batch_format="pyarrow", batch_size=batch_size)


def link_mentions_two_tier(
    pages_text_ds,
    alias_ref,
    *,
    precise_langs: set[str] = frozenset(),
    registry: dict[str, ExtractorSpec] | None = None,
    relations: dict[str, str] | None = None,
    precise_concurrency: int = 2,
    shouty_to_precise: bool = False,
    host_prior_ref=None,
):
    """Two-tier extraction routing (M13/M14 analog).

    cgr layers optional heavyweight frontends (libclang C++,
    ``graph_updater.py:320-383``; Roslyn C#, ``:384-497``) over the cheap
    tree-sitter default, routing inputs by predicate and merging results.
    Here two content predicates route to a bounded ACTOR-POOL
    :class:`PreciseLinker` (normalized token-trie detection — the
    genuinely heavier frontend):

    - ``lang ∈ precise_langs`` — per-language registry dispatch, and
    - ``shouty_to_precise`` — pages whose text equals its own uppercase
      image (ALL-CAPS headline/teletype content): the cheap tier's
      case-sensitive alternation structurally cannot match a dictionary
      surface there, and its cap-run fallback sees the whole sentence as
      one run — so these pages are exactly the ones worth the heavy tier.

    Everything else takes the cheap stateless-task tier. The union feeds
    the same downstream derivation. Both tiers filter the same upstream;
    materialize the input first if the scan is expensive enough that two
    passes matter.
    """
    import pyarrow.compute as pc

    langs_arr = pa.array(sorted(precise_langs), pa.string())

    def precise_mask(b: pa.Table):
        m = pc.is_in(b["lang"], value_set=langs_arr)
        if shouty_to_precise:
            t = b["text"]
            shouty = pc.and_(
                pc.equal(t, pc.utf8_upper(t)),      # no lowercase letters
                pc.not_equal(t, pc.utf8_lower(t)),  # …but has letters
            )
            m = pc.or_kleene(m, shouty)
        return pc.fill_null(m, False)

    def precise_rows(b: pa.Table) -> pa.Table:
        return b.filter(precise_mask(b))

    def cheap_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(precise_mask(b)))

    # when routing is purely lang-based, the cheap tier never sees a
    # spec-lang page, so it can skip the registry entirely (original
    # behavior); shouty routing sends pages of ANY lang to the precise
    # tier, so the cheap tier keeps the registry for the rest
    cheap_registry = registry if shouty_to_precise else {}
    cheap = link_mentions(
        pages_text_ds.map_batches(cheap_rows, batch_format="pyarrow"),
        alias_ref, relations=relations, registry=cheap_registry,
        host_prior_ref=host_prior_ref,
    )
    precise = link_mentions(
        pages_text_ds.map_batches(precise_rows, batch_format="pyarrow"),
        alias_ref, relations=relations, registry=registry,
        concurrency=precise_concurrency, host_prior_ref=host_prior_ref,
        linker_cls=PreciseLinker,
    )
    return cheap.union(precise)


# ---------------------------------------------------------------------------
# host-prior mining (J3 cross-page context, pass 1 → side table)
# ---------------------------------------------------------------------------

#: cascade methods whose resolutions count as corpus evidence. ``prior`` is
#: deliberately excluded (it is the fallback the mined table improves on —
#: counting it would launder the global prior into the host prior), and so
#: are ``external``/``host_prior`` (no entity grounding / pass-2-only).
CONFIDENT_METHODS = ("exact", "recency", "unique", "context", "acronym")

HOST_PRIOR_SCHEMA = pa.schema(
    [("host", pa.string()), ("surface", pa.string()),
     ("entity_id", pa.string()), ("n", pa.int64())]
)


def mine_host_priors(
    mentions,
    *,
    min_count: int = 2,
    num_buckets: int = 64,
):
    """Mine host-scoped alias priors from a pass-1 mentions Dataset.

    The J3 cross-page context feature (receiver-type-propagation analog,
    ``parsers/type_inference.py``): for every (host, surface) pair, count
    how CONFIDENT cascade tiers resolved that surface across the host's
    pages, and keep the winner iff it has ``min_count`` sightings AND a
    strict margin over the runner-up (no-margin pairs stay unmined — an
    ambiguous host signal must not override the global prior).

    Scale shape: batch-local Arrow combiner (one row per (host, surface,
    entity) per block) → two-phase grouped sum → ONE hash-bucket cogroup
    over the count table for the vectorized winner/margin scan. Output is
    bounded by hosts × confidently-seen surfaces — dictionary-scale per
    host; at 100 TB cap delivery with the broadcast budget (see
    :func:`link_mentions_two_pass`).

    Returns a Dataset with schema ``HOST_PRIOR_SCHEMA``.
    """
    import numpy as np
    import pyarrow.compute as pc

    from code_graph_rag_ray.functions.hashing import partition_ids
    from code_graph_rag_ray.stages.relational import partial_groupby_sum

    methods = pa.array(CONFIDENT_METHODS, pa.string())

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b["method"], value_set=methods))
        if f.num_rows == 0:
            return pa.table(
                {"host": pa.array([], pa.string()),
                 "surface": pa.array([], pa.string()),
                 "entity_id": pa.array([], pa.string()),
                 "one": pa.array([], pa.int64())}
            )
        # scheme://host/... → host, vectorized
        host = pc.replace_substring_regex(
            f["url"], pattern=r"^[a-z0-9+.-]+://([^/]*).*$", replacement=r"\1"
        )
        t = pa.table(
            {"host": host, "surface": f["surface"],
             "entity_id": f["entity_id"],
             "one": pa.array(np.ones(f.num_rows, np.int64))}
        )
        g = pa.TableGroupBy(t, ["host", "surface", "entity_id"],
                            use_threads=False).aggregate([("one", "sum")])
        return pa.table(
            {"host": g["host"], "surface": g["surface"],
             "entity_id": g["entity_id"],
             "one": pc.cast(g["one_sum"], pa.int64())}
        )

    counts = partial_groupby_sum(
        mentions.map_batches(partial, batch_format="pyarrow"),
        ["host", "surface", "entity_id"], {"one": "n"},
    )

    def bucketize(b: pa.Table) -> pa.Table:
        g = pc.binary_join_element_wise(b["host"], b["surface"], "|")
        return b.append_column(
            "__bk", pa.array(partition_ids(g, num_buckets), pa.int32())
        )

    def winners(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return HOST_PRIOR_SCHEMA.empty_table()
        t = g.take(pc.sort_indices(
            g, sort_keys=[("host", "ascending"), ("surface", "ascending"),
                          ("n", "descending"), ("entity_id", "ascending")]
        ))
        h = np.asarray(t["host"].to_pandas(), dtype=object)
        s = np.asarray(t["surface"].to_pandas(), dtype=object)
        n = t["n"].to_numpy(zero_copy_only=False)
        first = np.ones(len(h), bool)
        first[1:] = (h[1:] != h[:-1]) | (s[1:] != s[:-1])
        idx = np.flatnonzero(first)
        # strict margin: winner count > runner-up count (single-candidate
        # groups have no runner-up → margin holds by definition)
        nxt = np.r_[idx[1:], len(h)]
        has_runner = (nxt - idx) > 1
        runner_n = np.where(has_runner, n[np.minimum(idx + 1, len(n) - 1)], -1)
        keep = (n[idx] >= min_count) & (n[idx] > runner_n)
        sel = idx[keep]
        out = t.take(pa.array(sel, pa.int64()))
        return pa.table(
            {"host": out["host"], "surface": out["surface"],
             "entity_id": out["entity_id"], "n": out["n"]},
            schema=HOST_PRIOR_SCHEMA,
        )

    return (
        counts.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(lambda g: winners(g.drop_columns("__bk")),
                    batch_format="pyarrow")
    )


def link_mentions_two_pass(
    pages_text_ds,
    alias_ref,
    *,
    relations: dict[str, str] | None = None,
    registry: dict[str, ExtractorSpec] | None = None,
    concurrency: int | None = None,
    min_count: int = 2,
    max_prior_rows: int = 1_000_000,
    shouty_two_tier: bool = False,
    precise_concurrency: int = 2,
):
    """Two-pass linking with corpus-mined host priors (J3 cross-page
    context). Pass 1 links with page-local context only; the confident
    resolutions are mined into a (host, surface) → entity side table; pass
    2 re-links with that table as a SECOND broadcast consulted after every
    page-local signal.

    Delivery is a driver-side table → ``ray.put`` broadcast, so its size
    must stay within the broadcast budget: the table is bounded by hosts ×
    confidently-evidenced surfaces, and ``max_prior_rows`` enforces a hard
    cap by keeping the most-evidenced rows (deterministic order: n desc,
    host, surface) and logging the truncation — the degrade mode loses the
    least-attested priors first, never correctness (an unmined pair simply
    falls back to pass-1 behavior).

    Cost model: the corpus is scanned twice (the reference pays the same
    shape — its pass 2 re-walks every AST with the registry built by pass
    1, ``graph_updater.py`` two-phase ingest). Materialize the text
    upstream if extraction dominates and memory allows; by default both
    passes stream.
    """
    import ray

    def _link(host_prior_ref=None):
        if shouty_two_tier:
            return link_mentions_two_tier(
                pages_text_ds, alias_ref, relations=relations,
                registry=registry, precise_concurrency=precise_concurrency,
                shouty_to_precise=True, host_prior_ref=host_prior_ref,
            )
        return link_mentions(
            pages_text_ds, alias_ref, relations=relations, registry=registry,
            concurrency=concurrency, host_prior_ref=host_prior_ref,
        )

    pass1 = _link()
    priors_ds = mine_host_priors(pass1, min_count=min_count)

    def cap_local(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_rows <= max_prior_rows:
            return b
        idx = pc.sort_indices(
            b, sort_keys=[("n", "descending"), ("host", "ascending"),
                          ("surface", "ascending")]
        )[:max_prior_rows]
        return b.take(idx)

    capped = (
        priors_ds.map_batches(cap_local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(cap_local, batch_format="pyarrow", batch_size=None)
    )
    # take_all, not to_arrow_refs: the latter issues a schema probe
    # (limit=1 plan) that EXECUTES the whole mining pipeline a second time
    # and races Ray 2.49's limit-cancellation refcount bug (NOTES fact 22)
    tbl = pa.Table.from_pylist(capped.take_all(), schema=HOST_PRIOR_SCHEMA)
    if tbl.num_rows >= max_prior_rows:
        import logging

        logging.getLogger(__name__).warning(
            "host-prior table hit max_prior_rows=%d — least-attested priors "
            "dropped (raise the cap or min_count)", max_prior_rows,
        )
    hp_ref = ray.put(tbl)
    return _link(host_prior_ref=hp_ref)
