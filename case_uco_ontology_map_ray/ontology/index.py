"""OntologyIndex: the load-once, read-only ontology state shipped to actors.

Built offline from the public UCO/CASE TTLs (scripts/build_ontology_index.py
-> vendored uco_index.json), loaded once per actor in ``__init__`` — the
Ray-native equivalent of the reference's module-global rdflib analyzer
singleton (``case_uco.py:28-157``, ``tools.py:102-109``).
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

_DEFAULT_JSON = Path(__file__).parent / "uco_index.json"


class OntologyIndex:
    def __init__(self, data: dict):
        self.classes: dict[str, dict] = data["classes"]
        self.prop_kinds: dict[str, str] = data["prop_kinds"]
        # facet taxonomy: every class reaching core:Facet via subclass edges
        # (reference case_uco.py:879-911)
        self.facets = frozenset(
            name for name in self.classes if self._is_subclass_of(name, "Facet")
        )
        # property -> owning classes (inverse map, reference
        # ontology_synthesizer.py:140-149 / case_uco.py:358-448)
        owners: dict[str, list[str]] = {}
        for cls, entry in self.classes.items():
            for prop in entry["shapes"]:
                owners.setdefault(prop, []).append(cls)
        self.prop_owners = {p: sorted(cs) for p, cs in owners.items()}

    # ------------------------------------------------------------------
    def _is_subclass_of(self, name: str, ancestor: str, _depth: int = 0) -> bool:
        if _depth > 20 or name not in self.classes:
            return False
        parents = self.classes[name]["parents"]
        if ancestor in parents:
            return True
        return any(self._is_subclass_of(p, ancestor, _depth + 1) for p in parents)

    def superclasses(self, name: str) -> list[str]:
        """RDFS traversal (reference case_uco.py:167-194)."""
        out, stack, seen = [], [name], set()
        while stack:
            cur = stack.pop()
            for p in self.classes.get(cur, {}).get("parents", []):
                if p not in seen:
                    seen.add(p)
                    out.append(p)
                    stack.append(p)
        return out

    def shapes_for(self, name: str, include_inherited: bool = True) -> dict[str, dict]:
        """SHACL property shapes, own + inherited (case_uco.py:278-339)."""
        shapes: dict[str, dict] = {}
        chain = ([name] + self.superclasses(name)) if include_inherited else [name]
        for cls in reversed(chain):  # nearest class wins
            shapes.update(self.classes.get(cls, {}).get("shapes", {}))
        return shapes

    def is_facet(self, name: str) -> bool:
        return name in self.facets

    # ------------------------------------------------------- search surface
    # Mirrors the reference's ontology query API so new artifact types can be
    # mapped with tooling instead of hand-built frozen maps:
    # list_all_classes (case_uco.py:476), search_classes (case_uco.py:686),
    # relevant_facets (case_uco.py:1004,1019). The distilled index vendors
    # each class's rdfs:comment, so both of the reference's match types
    # (name, description) are supported.

    def description(self, name: str) -> str:
        """The class's rdfs:comment text (reference get_class_summary
        'description'; empty when the TTL declares none)."""
        return self.classes.get(name, {}).get("comment", "")

    def list_all_classes(self) -> list[dict]:
        """Sorted [{'name', 'uri'}] over every class in the index."""
        from ..functions.naming import iri_for

        return sorted(
            ({"name": name, "uri": iri_for(name)} for name in self.classes),
            key=lambda x: x["name"],
        )

    def search_classes(self, keyword: str) -> list[dict]:
        """Classes matching ``keyword`` (case-insensitive) by name, else by
        rdfs:comment text — reference ``search_classes`` (case_uco.py:
        686-720): name matches get match_type 'name', description-only
        matches get 'description', sorted by name."""
        from ..functions.naming import iri_for

        kw = keyword.lower()
        out = []
        for name in self.classes:
            if kw in name.lower():
                match = "name"
            elif kw in self.description(name).lower():
                match = "description"
            else:
                continue
            out.append({"name": name, "uri": iri_for(name),
                        "match_type": match,
                        "description": self.description(name),
                        "n_properties": len(self.shapes_for(name)),
                        "is_facet": self.is_facet(name)})
        return sorted(out, key=lambda x: x["name"])

    def relevant_facets(self, class_name: str, limit: int = 10) -> list[str]:
        """Facets relevant to a class by bidirectional name containment
        (reference ``_find_relevant_facets``): unique, capped at ``limit``,
        sorted for determinism (the reference's set() order is unstable)."""
        cl = class_name.lower()
        rel = {f for f in self.facets if cl in f.lower() or f.lower() in cl}
        return sorted(rel)[:limit]

    def search_properties(self, keyword: str) -> list[dict]:
        """Properties whose local name contains ``keyword``, with their
        owning classes and SHACL datatype — the lookup used when mapping a
        new artifact field."""
        kw = keyword.lower()
        out = []
        for prop, owners in self.prop_owners.items():
            if kw in prop.lower():
                dt = None
                for o in owners:
                    shape = self.classes[o]["shapes"].get(prop)
                    if shape and shape.get("datatype"):
                        dt = shape["datatype"]
                        break
                out.append({"property": prop, "owners": owners, "datatype": dt})
        return sorted(out, key=lambda x: x["property"])

    def suggest_mapping(self, field_names: list[str],
                        top_n: int = 3) -> dict[str, list[dict]]:
        """For each raw record field, ranked candidate ontology properties by
        the SAME token-overlap heuristic the mapper uses
        (kg/mapper.py:_match_property / reference uuid_planner.py:92-133) —
        the tooling step for building a new artifact type's frozen map."""
        from ..functions.naming import tokenize

        out: dict[str, list[dict]] = {}
        for raw in field_names:
            # tokenize the RAW name (camelCase boundaries intact) — the
            # mapper's normalize-first pass relies on the alias map for
            # camel-cased fields; the tooling should not
            toks = set(tokenize(raw))
            scored = []
            for prop, owners in self.prop_owners.items():
                ptoks = set(tokenize(prop))
                score = len(toks & ptoks)
                if score > 0:
                    scored.append({"property": prop, "owners": owners,
                                   "score": score, "_extra": len(ptoks) - score})
            # precision tie-break: fewer unmatched property tokens first
            # (exact 'fileName' beats 'applicationFileName' for FileName)
            scored.sort(key=lambda x: (-x["score"], x["_extra"], x["property"]))
            out[raw] = [{k: v for k, v in s.items() if k != "_extra"}
                        for s in scored[:top_n]]
        return out

    # ------------------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps({"classes": self.classes, "prop_kinds": self.prop_kinds},
                          sort_keys=True)

    @classmethod
    def from_json_file(cls, path: str | Path) -> "OntologyIndex":
        with open(path) as f:
            return cls(json.load(f))


@lru_cache(maxsize=1)
def load_default_index() -> OntologyIndex:
    """The vendored distilled index (built from the public UCO 1.x TTLs)."""
    return OntologyIndex.from_json_file(_DEFAULT_JSON)
