"""SHACL-lite structural validation + fidelity (hallucination) checking.

The reference validates with case-utils/pyshacl per session plus a
placement rule check (``agents/validator.py:17-138``) and an LLM fidelity
check (``agents/hallucination_checker.py:73-169``). Per-row pyshacl cannot
run at 10^12 scale (SURVEY.md §7.4), so the SHACL shapes are distilled into
dict-based rules at index-build time and evaluated vectorized-ish per
record inside the same actor pass that builds the graph.

Rules (violation codes):
- ``placement``       : non-facet node carries a data property owned by a facet
- ``unknown-property``: facet node property not in its (inherited) shapes and
                        not a dfc-ext extension property
- ``max-count``       : property emitted more often than sh:maxCount
- ``datatype``        : literal doesn't conform to sh:datatype (ISO-8601
                        strings satisfy xsd:dateTime — the reference emits
                        timestamps as plain strings)
- ``empty-value``     : null/empty-string object (reference graph_generator
                        151-156 forbids)
- ``fidelity``        : emitted literal not derived from any input record
                        value (layer-2 hallucination rule: output ⊆ input)
"""

from __future__ import annotations

import re
from typing import Any

from .index import OntologyIndex

_ISO_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
)
_INT_RE = re.compile(r"^[+-]?\d+$")
_DEC_RE = re.compile(r"^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$")


def _literal_conforms(value: str, obj_dt: str, want: str) -> bool:
    if want == "xsd:string":
        return True
    if want == "xsd:dateTime":
        return obj_dt == "xsd:dateTime" or bool(_ISO_RE.match(value))
    if want in ("xsd:integer", "xsd:long", "xsd:unsignedLong", "xsd:int"):
        return bool(_INT_RE.match(value))
    if want in ("xsd:decimal", "xsd:double", "xsd:float"):
        return bool(_DEC_RE.match(value))
    if want == "xsd:boolean":
        return value in ("true", "false")
    return True  # unknown datatype: don't flag


class RuleEngine:
    """Compiled per-actor validator over (node_type, [(pred, obj, obj_dt)])."""

    def __init__(self, index: OntologyIndex | None = None):
        if index is None:
            from .index import load_default_index

            index = load_default_index()
        self.index = index
        self._shape_cache: dict[str, dict] = {}

    def _shapes(self, local_type: str) -> dict:
        s = self._shape_cache.get(local_type)
        if s is None:
            s = self.index.shapes_for(local_type)
            self._shape_cache[local_type] = s
        return s

    def _entry_flattened(self, facet_type: str, local_prop: str) -> bool:
        """Entry-level flattening legality (mirrors ontology/automap.py): a
        property owned by a non-facet class nested under the facet's name
        stem (URLHistoryEntry under URLHistoryFacet) is legal on the facet —
        the auto-mapper attaches entry properties there, matching the
        reference's synthesized maps (its validator checks map-declared
        properties, not deep SHACL nesting; agents/graph_generator.py:
        151-156)."""
        if not facet_type.endswith("Facet"):
            return False
        stem = facet_type[:-5]
        return any(
            o != stem and o.startswith(stem) and not self.index.is_facet(o)
            for o in self.index.prop_owners.get(local_prop, ())
        )

    def check_node(
        self,
        node_type: str,
        props: list[tuple[str, Any, str]],
        allowed_values: set[str] | None = None,
        declared: "set[str] | None" = None,
    ) -> list[tuple[str, str]]:
        """Return violations for one node as (rule, qualified_pred) pairs.

        ``props``: (pred, obj, obj_dt) triples excluding rdf:type.
        ``allowed_values``: input-record literal forms for the fidelity rule
        (skipped when None).
        ``declared``: property local-names declared for this node type in the
        configured ontology map — declared properties are never flagged
        ``unknown-property`` (the reference validates placement against the
        map, not strict SHACL membership; map-declared aliases like
        FileFacet.createdTime stay legal).
        """
        local_type = node_type.split(":")[-1]
        is_facet = self.index.is_facet(local_type) or local_type.lower().endswith("facet")
        shapes = self._shapes(local_type)
        violations: list[tuple[str, str]] = []
        counts: dict[str, int] = {}
        local_to_pred: dict[str, str] = {}

        for pred, obj, obj_dt in props:
            if pred == "uco-core:hasFacet":
                continue
            local_prop = pred.split(":")[-1]
            counts[local_prop] = counts.get(local_prop, 0) + 1
            local_to_pred[local_prop] = pred

            if obj is None or obj == "":
                violations.append(("empty-value", pred))
                continue

            shape = shapes.get(local_prop)
            if not is_facet and shape is None:
                # facet-owned property on a non-facet node — unless the
                # node's own (inherited) shapes declare it (e.g.
                # URLHistoryEntry.visitCount, which a facet also happens
                # to own)
                owners = self.index.prop_owners.get(local_prop, [])
                if any(self.index.is_facet(o) for o in owners):
                    violations.append(("placement", pred))
                    continue
            if is_facet and shape is None:
                if (
                    not pred.startswith("dfc-ext:")
                    and not (declared and local_prop in declared)
                    and not self._entry_flattened(local_type, local_prop)
                ):
                    violations.append(("unknown-property", pred))
                continue
            # sh:datatype applies to ANY node type with a shape for the
            # property (SHACL targets classes, not just facets) — the
            # independent crosscheck (tests/test_shacl_crosscheck.py) caught
            # entry-class literals going unchecked here
            if shape is not None:
                want = shape.get("datatype")
                if want and obj_dt != "@id":
                    if not _literal_conforms(str(obj), obj_dt, want):
                        violations.append((f"datatype[{want}]", pred))

            if allowed_values is not None and obj_dt != "@id":
                if str(obj) not in allowed_values:
                    violations.append(("fidelity", pred))

        for local_prop, n in counts.items():
            shape = shapes.get(local_prop)
            if shape and shape.get("maxCount") is not None and n > shape["maxCount"]:
                violations.append(
                    (f"max-count[{n}>{shape['maxCount']}]", local_to_pred[local_prop])
                )

        return violations


def allowed_value_forms(record: dict) -> set[str]:
    """Every literal form derivable from the record (fidelity whitelist):
    raw strings, str() of scalars, bool lowercase, list elements."""
    out: set[str] = set()

    def add(v):
        if v is None:
            return
        if isinstance(v, bool):
            out.add("true" if v else "false")
            return
        if isinstance(v, (list, tuple)):
            for x in v:
                add(x)
            return
        out.add(str(v))
        if isinstance(v, float):
            out.add(repr(v))

    for v in record.values():
        add(v)
    return out
