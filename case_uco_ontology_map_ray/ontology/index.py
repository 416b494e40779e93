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
