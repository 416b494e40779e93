"""Automatic ontology-map construction for unknown artifact types.

The reference maps a NEW artifact type to real UCO classes/facets with an
LLM researcher + synthesizer (``agents/ontology_researcher.py:42-171`` walks
the ontology with list/analyze tool calls; ``agents/ontology_synthesizer.py:
199-291`` parses the report into the frozen-map shape of ``schemas.py:9-17``).
This module is the deterministic distillation of that loop: score the
record's field names against the vendored ontology index's property
vocabulary, pick the class whose properties cover the fields best, derive
the Observable class + Facet pair from it, and emit exactly the map/alias
structures the engine's frozen types use — so an auto-mapped type flows
through the SAME compiled ``ArtifactMapper`` path (and the same reference
deterministic golden check, see ``scripts/gen_goldens.py`` browser case).

Matching rule ("scores strongly"): a field matches a property only when the
token overlap covers MORE than half of both names' tokens
(``quality = |f∩p| / max(|f|,|p|) > 0.5``) — strict enough that the engine's
existing custom-facet fixtures (``SecurityId``→``securityAttributes`` 0.5,
``EntryNumber``→``entryID`` 0.5, ``active``→``isActive`` 0.5) keep falling
through to the dfc-ext extension path, while genuine vocabulary hits
(``VisitCount``→``visitCount`` 1.0, ``LastVisitTime``→``lastVisit`` 0.67)
clear it. A map is built only when >= ``min_mapped`` fields and >=
``min_fraction`` of the eligible fields match one owner class.

Entry-level flattening: when the best-covering owner is a non-facet class
(UCO models URL history as URLHistory -> URLHistoryFacet -> urlHistoryEntry
-> URLHistoryEntry), the properties are attached to the name-stem facet
(``URLHistoryFacet``) — the same pragmatic flattening the reference's
synthesized maps apply (its validator checks map-declared properties, not
deep SHACL nesting; see ``agents/graph_generator.py:151-156``).
"""

from __future__ import annotations

from ..config import RESERVED_RECORD_KEYS
from ..functions.naming import normalize_key, tokenize
from .index import OntologyIndex, load_default_index


def _match_quality(ftoks: frozenset, ptoks: frozenset) -> float:
    inter = len(ftoks & ptoks)
    if not inter:
        return 0.0
    return inter / max(len(ftoks), len(ptoks))


def build_ontology_map(
    artifact_type: str,
    field_names: list[str],
    index: OntologyIndex | None = None,
    min_mapped: int = 3,
    min_fraction: float = 0.6,
    min_quality: float = 0.5,
) -> tuple[dict | None, dict[str, list[str]]]:
    """Deterministic researcher/synthesizer: (ontology_map, alias_map) for an
    unknown artifact type, or (None, {}) when no UCO class covers the fields
    strongly enough (caller falls back to the dfc-ext custom-facet path).

    The alias map (``normalize_key(field) -> [property]``) routes each mapped
    field to its exact chosen property through the mapper's alias-first pass,
    which is what makes the composition reproducible against the reference's
    deterministic path with the same injections.
    """
    index = index or load_default_index()
    eligible = [f for f in field_names if f not in RESERVED_RECORD_KEYS]
    if not eligible:
        return None, {}

    # per-field candidates: (quality, prop, owner) with quality > min_quality
    field_cands: dict[str, list[tuple[float, str, str]]] = {}
    for f in sorted(eligible):
        ftoks = frozenset(tokenize(f))
        cands = []
        for prop, owners in index.prop_owners.items():
            q = _match_quality(ftoks, frozenset(tokenize(prop)))
            if q > min_quality:
                for o in owners:
                    cands.append((q, prop, o))
        if cands:
            field_cands[f] = sorted(cands, key=lambda x: (-x[0], x[1], x[2]))

    if len(field_cands) < min_mapped:
        return None, {}

    # owner scoring: fields covered, then summed best quality (deterministic)
    owner_fields: dict[str, dict[str, tuple[float, str]]] = {}
    for f, cands in field_cands.items():
        for q, prop, o in cands:
            best = owner_fields.setdefault(o, {})
            if f not in best or q > best[f][0]:
                best[f] = (q, prop)
    owner = min(
        owner_fields,
        key=lambda o: (-len(owner_fields[o]),
                       -sum(q for q, _ in owner_fields[o].values()), o),
    )
    covered = owner_fields[owner]
    if len(covered) < min_mapped or len(covered) / len(eligible) < min_fraction:
        return None, {}

    # greedy field->property assignment (quality desc, field asc); a property
    # can take only one field — a collision would silently overwrite the
    # earlier value during routing
    assigned: dict[str, str] = {}
    taken: set[str] = set()
    for f, (q, prop) in sorted(covered.items(), key=lambda kv: (-kv[1][0], kv[0])):
        if prop not in taken:
            assigned[f] = prop
            taken.add(prop)
    if len(assigned) < min_mapped or len(assigned) / len(eligible) < min_fraction:
        return None, {}

    # structure: facet + primary class from the owner
    if index.is_facet(owner):
        facet = owner
        stem = owner[:-5]
        primary = stem if stem in index.classes else "ObservableObject"
    else:
        # name-stem facet: the facet whose stem is the longest prefix of the
        # owner (URLHistoryEntry -> URLHistoryFacet, not URLFacet)
        stems = [(len(f) - 5, f) for f in index.facets
                 if owner.startswith(f[:-5]) or f[:-5].startswith(owner)]
        if stems:
            facet = max(stems)[1]
            stem = facet[:-5]
            primary = stem if stem in index.classes else "ObservableObject"
        elif owner in index.classes:
            # no facet pairing: emit properties directly on the class
            facet = None
            primary = owner
        else:
            return None, {}

    props_owner = facet if facet else primary
    omap = {
        "artifacts": [artifact_type],
        "classes": [primary],
        "facets": [facet] if facet else [],
        "properties": {primary: [],
                       props_owner: sorted(assigned.values())}
        if facet else {primary: sorted(assigned.values())},
        "relationships": [],
        "analysis": f"auto-mapped from ontology index (owner={owner})",
        "additional_details": {},
    }
    aliases = {normalize_key(f): [prop] for f, prop in sorted(assigned.items())}
    return omap, aliases
