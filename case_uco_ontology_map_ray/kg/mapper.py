"""Deterministic per-record KG construction: UUID planning, property routing,
graph composition, triple flattening.

This is the hot path of the engine. One ``ArtifactMapper`` is compiled per
artifact type (in an actor's ``__init__`` — see ``stages/kg_stage.py``) and
holds every piece of precomputed state: the tokenized property index, the
alias map, a memoized field->property resolution cache, slot slugs/type IRIs.
Per record, the remaining work is one sha256, a few uuid5s, dict routing,
and triple emission.

Semantic parity (verified against goldens generated from the reference's own
deterministic path, see ``scripts/gen_goldens.py``):
- plan/slots:       reference ``agents/uuid_planner.py:194-284``
- property match:   ``agents/uuid_planner.py:92-133`` (alias-first, then max
                    token-overlap over owners in insertion order, strict ``>``)
- skeleton/compose: ``agents/graph_generator.py:163-217,268-319`` (relationship
                    slots gated on payload, empty facets pruned with their refs)
- placement:        ``agents/graph_generator.py:37-99`` (faithful including the
                    bare-name/type-IRI comparison that makes it a no-op on the
                    deterministic path)
- value normalize:  ``agents/graph_generator.py:101-110``
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from ..config import PROPERTY_ALIAS_MAP
from ..functions.fingerprint import record_fingerprint, record_uuid, slot_uuid
from ..functions.naming import iri_for, normalize_key, qualify_property, slugify, tokenize

# Triple datatype tags
DT_IRI = "@id"
DT_STRING = "xsd:string"
DT_INTEGER = "xsd:integer"
DT_DECIMAL = "xsd:decimal"
DT_BOOLEAN = "xsd:boolean"


def choose_primary_class(classes: Iterable[str], facets: Iterable[str]) -> str:
    """First class that is not facet-named (ref uuid_planner.py:69-74)."""
    facet_set = {f.lower() for f in facets}
    for cls in classes:
        if cls.lower() not in facet_set and not cls.lower().endswith("facet"):
            return cls
    return "ObservableObject"


class ArtifactMapper:
    """Compiled per-artifact-type mapping state + per-record KG construction."""

    def __init__(self, ontology_map: dict, custom_facets: dict | None = None,
                 alias_map: dict[str, list[str]] | None = None):
        self.ontology_map = ontology_map
        self.custom_facets = custom_facets or {}
        self.alias_map = alias_map if alias_map is not None else PROPERTY_ALIAS_MAP

        classes = list(ontology_map.get("classes", []))
        facets = list(ontology_map.get("facets", []))
        if not facets:
            # ref uuid_planner.py:212-215: recover facets from property owners
            for owner in ontology_map.get("properties", {}):
                if owner not in facets and owner.lower().endswith("facet"):
                    facets.append(owner)
        self.relationships = list(ontology_map.get("relationships", []) or [])

        primary = choose_primary_class(classes, facets)
        if primary == "ObservableObject":
            # ref uuid_planner.py:219-226
            if classes:
                primary = classes[0]
            else:
                for owner in ontology_map.get("properties", {}):
                    if not owner.lower().endswith("facet"):
                        primary = owner
                        break
        self.primary_class = primary
        self.primary_slug = slugify(primary)
        self.primary_type = iri_for(primary)

        self.facet_names = facets
        self.facet_slugs = [slugify(f) for f in facets]
        self.facet_types = {slug: iri_for(name) for slug, name in zip(self.facet_slugs, facets)}

        # relationship slots: (slug, type IRI); ref uuid_planner.py:260-265
        self.rel_slots: list[str] = []
        for rel_idx, rel in enumerate(self.relationships):
            kind = rel.get("type") or "relatedTo"
            self.rel_slots.append(slugify(f"relationship_{kind}_{rel_idx}"))
        self.rel_type = iri_for("ObservableRelationship")

        # Tokenized property index: owner_slug -> [(prop, token_set)] in
        # insertion order, owners with props only (ref uuid_planner.py:92-101).
        self.property_index: dict[str, list[tuple[str, frozenset]]] = {}
        for owner, props in (ontology_map.get("properties", {}) or {}).items():
            entries = [(p, frozenset(tokenize(p))) for p in props]
            if entries:
                self.property_index[slugify(owner)] = entries

        # Explicit propertyFieldMap rows (ref uuid_planner.py:139,155-175)
        self.property_field_map = (
            (ontology_map.get("additional_details", {}) or {}).get("propertyFieldMap", {}) or {}
        )

        # declared property local-names per node type IRI (validator input:
        # map-declared properties are legal regardless of strict SHACL)
        self.declared_props: dict[str, set[str]] = {}
        for owner, props in (ontology_map.get("properties", {}) or {}).items():
            self.declared_props[iri_for(owner)] = {p.split(":")[-1] for p in props}

        # prop localname -> facet owner for placement enforcement
        # (ref graph_generator.py:50-56; owner must end with exact "Facet")
        self.prop_to_facet: dict[str, str] = {}
        props_map = ontology_map.get("properties")
        if isinstance(props_map, dict):
            for owner, props in props_map.items():
                if owner.endswith("Facet"):
                    for p in props:
                        self.prop_to_facet[p] = owner

        # Custom facet assignment values keyed by facet slug, Nones filtered
        # (ref graph_generator.py:184-197). Values are assigned per record
        # from the record's own fields in process_record when
        # ``custom_value_fields`` is set; the static assignment values act as
        # the single-record reference behaviour.
        self.custom_assignments: list[tuple[str, dict[str, Any]]] = []
        for assignment in (self.custom_facets.get("facetAssignments") or []):
            facet_name = assignment.get("facet")
            if not facet_name:
                continue
            values = {
                k: v for k, v in (assignment.get("values") or {}).items() if v is not None
            }
            if values:
                self.custom_assignments.append((slugify(facet_name), values))

        # field name -> dfc-ext property, for per-record custom facet values
        self.custom_value_fields: dict[str, tuple[str, str]] = {}

        # Memoized field resolution: normalized_key -> (owner_slug|None, qualified|None)
        self._field_cache: dict[str, tuple[str | None, str | None]] = {}
        # raw_key -> (owner_slug|None, qualified|None): skips normalize+match
        # entirely for repeated field names (the common case — every record
        # of an artifact type shares its schema)
        self._raw_cache: dict[str, tuple[str | None, str | None]] = {}

        self.all_slugs = [self.primary_slug] + self.facet_slugs + self.rel_slots

    # ------------------------------------------------------------------ match
    def _match_property(self, normalized_key: str) -> tuple[str | None, str | None]:
        cached = self._field_cache.get(normalized_key)
        if cached is not None:
            return cached

        result: tuple[str | None, str | None] = (None, None)
        alias_candidates = self.alias_map.get(normalized_key)
        if alias_candidates:
            lowered = [a.lower() for a in alias_candidates]
            for owner_slug, entries in self.property_index.items():
                for prop, _ in entries:
                    if prop in alias_candidates or prop.lower() in lowered:
                        result = (owner_slug, prop)
                        break
                if result[0] is not None:
                    break

        if result[0] is None:
            raw_tokens = set(tokenize(normalized_key))
            best_score = 0
            for owner_slug, entries in self.property_index.items():
                for prop, tokens in entries:
                    score = len(raw_tokens & tokens)
                    if score > best_score:
                        best_score = score
                        result = (owner_slug, prop)

        self._field_cache[normalized_key] = result
        return result

    def unmapped_fields(self, record: dict, reserved: tuple[str, ...] = ()) -> list[str]:
        """Fields with no alias/heuristic match (custom-facet candidates)."""
        out = []
        for raw_key in record:
            if raw_key in reserved:
                continue
            owner, prop = self._match_property(normalize_key(raw_key))
            if prop is None:
                out.append(raw_key)
        return out

    # ------------------------------------------------------------------ plan
    def plan_record(self, record: dict, fp: str | None = None) -> tuple[
            str, dict[str, str], dict[str, str]]:
        """Return (fingerprint, {slug: slot_uuid}, {slot_uuid: type_iri}).

        ``fp`` lets callers that already hold the record's fingerprint (the
        construction finish stage dedups on it upstream) skip the canonical
        re-serialization — ~20% of per-record mapper time."""
        if fp is None:
            fp = record_fingerprint(record)
        rec_uuid = record_uuid(fp)
        plan: dict[str, str] = {}
        types: dict[str, str] = {}

        primary_uuid = slot_uuid(rec_uuid, self.primary_slug)
        plan[self.primary_slug] = primary_uuid
        types[primary_uuid] = self.primary_type

        for slug in self.facet_slugs:
            fu = slot_uuid(rec_uuid, slug)
            plan[slug] = fu
            types[fu] = self.facet_types[slug]

        for slug in self.rel_slots:
            ru = slot_uuid(rec_uuid, slug)
            plan[slug] = ru
            types[ru] = self.rel_type

        return fp, plan, types

    # ----------------------------------------------------------------- route
    def route_properties(self, record: dict, plan: dict[str, str]) -> tuple[
        dict[str, dict[str, Any]], dict[str, dict[str, Any]]
    ]:
        """Return ({slot_uuid: {qualified_prop: value}}, {slot_uuid: raw_fields}).

        Explicit propertyFieldMap rows first, then the per-field alias/heuristic
        pass in record key order (ref uuid_planner.py:136-191).
        """
        properties: dict[str, dict[str, Any]] = {}
        raw: dict[str, dict[str, Any]] = {}
        primary_uuid = plan[self.primary_slug]
        # ``raw`` is only consulted for relationship-slot payload gating
        # (graph_generator.py:292-293); skip the bookkeeping when this
        # artifact type has no relationship slots (the common case).
        track_raw = bool(self.rel_slots)

        for owner, prop_map in self.property_field_map.items():
            owner_slug = slugify(owner)
            slot = plan.get(owner_slug, primary_uuid)
            for prop_name, fields in (prop_map or {}).items():
                if not fields:
                    continue
                value = None
                for field_name in fields:
                    if field_name in record and record[field_name] is not None:
                        value = record[field_name]
                        break
                if value is None:
                    continue
                properties.setdefault(slot, {})[qualify_property(prop_name)] = value

        raw_cache = self._raw_cache
        for raw_key, value in record.items():
            resolved = raw_cache.get(raw_key)
            if resolved is None:
                owner_slug, prop_name = self._match_property(normalize_key(raw_key))
                qualified = qualify_property(prop_name) if prop_name else None
                resolved = (owner_slug, qualified)
                raw_cache[raw_key] = resolved
            owner_slug, qualified = resolved
            slot = plan.get(owner_slug) if owner_slug else None
            if slot is None:
                slot = primary_uuid
            if track_raw:
                raw.setdefault(slot, {})[raw_key] = value
            if qualified:
                properties.setdefault(slot, {})[qualified] = value

        return properties, raw

    # --------------------------------------------------------------- compose
    def process_record(self, record: dict) -> tuple[str, list[tuple[str, str, str, str]]]:
        """Full deterministic chain for one record.

        Returns (fingerprint, [(subj, pred, obj, obj_datatype), ...]).
        """
        cols = ([], [], [], [])
        fp, n = self.process_record_into(record, *cols)
        return fp, list(zip(*cols)) if n else []

    def compose_nodes(self, record: dict, fp: str | None = None
                      ) -> tuple[str, list[str], dict[str, dict]]:
        """Deterministic chain up to the composed JSON-LD node set.

        Returns (fingerprint, node_order, {uuid: node}) where each node is
        ``{"@type": iri, <qualified props with RAW values>...}`` plus
        ``uco-core:hasFacet`` as a list of facet uuids on the parent —
        exactly the reference's composed ``@graph`` minus the ``@id`` key
        (the dict key is the id).
        """
        fp, plan, types = self.plan_record(record, fp)
        properties, raw = self.route_properties(record, plan)
        primary_uuid = plan[self.primary_slug]

        # Skeleton: relationship slots only when they carry payload
        # (ref graph_generator.py:284-305)
        nodes: dict[str, dict[str, Any]] = {}
        node_order: list[str] = []
        facet_uuids: list[str] = []
        for slug in self.all_slugs:
            su = plan[slug]
            if slug in self.rel_slots:
                if not (properties.get(su) or raw.get(su)):
                    continue
            node = {"@type": types[su]}
            nodes[su] = node
            node_order.append(su)
            if slug in self.facet_types:
                facet_uuids.append(su)

        # Assign mapped properties (skip None/""; ref graph_generator.py:151-156)
        for su, props in properties.items():
            node = nodes.get(su)
            if node is None:
                continue
            for prop, value in props.items():
                if value is None or value == "":
                    continue
                node[prop] = value

        # Custom facet assignment values: per-record fields if configured,
        # else the compiled static assignment values.
        if self.custom_value_fields:
            for raw_key, (facet_slug, prop) in self.custom_value_fields.items():
                value = record.get(raw_key)
                if value is None or value == "":
                    continue
                su = plan.get(facet_slug)
                node = nodes.get(su)
                if node is not None:
                    node[prop] = value
        else:
            for facet_slug, values in self.custom_assignments:
                su = plan.get(facet_slug)
                node = nodes.get(su) if su else None
                if node is None:
                    continue
                for prop, value in values.items():
                    if value is None or value == "":
                        continue
                    node[prop] = value

        # Prune empty facets + drop their refs (ref graph_generator.py:199-216)
        kept_facets = [su for su in facet_uuids if len(nodes[su]) > 1]
        for su in facet_uuids:
            if len(nodes[su]) <= 1:
                del nodes[su]
                node_order.remove(su)

        if kept_facets:
            nodes[primary_uuid]["uco-core:hasFacet"] = kept_facets

        # Placement enforcement (ref graph_generator.py:37-99): faithful,
        # including the bare-name vs type-IRI comparison (no-op here).
        for su in node_order:
            node = nodes.get(su)
            if node is None:
                continue
            ntype = node.get("@type", "")
            if isinstance(ntype, str) and ntype.endswith("Facet"):
                continue
            to_move = [
                p for p in node
                if p not in ("@type", "uco-core:hasFacet")
                and p.split(":")[-1] in self.prop_to_facet
            ]
            if to_move and node.get("uco-core:hasFacet"):
                for p in to_move:
                    target_type = self.prop_to_facet[p.split(":")[-1]]
                    for fu in node["uco-core:hasFacet"]:
                        if nodes.get(fu, {}).get("@type") == target_type:
                            nodes[fu][p] = node.pop(p)
                            break

        return fp, node_order, nodes

    def process_record_into(self, record: dict, subj_l: list, pred_l: list,
                            obj_l: list, dt_l: list,
                            fp: str | None = None) -> tuple[str, int]:
        """Hot-path variant: append triples straight into column lists
        (no per-triple tuple allocation). Returns (fingerprint, n_emitted).
        """
        fp, node_order, nodes = self.compose_nodes(record, fp)

        # Flatten to triples (column-wise: no per-triple tuples)
        n0 = len(subj_l)
        for su in node_order:
            node = nodes.get(su)
            if node is None:
                continue
            for pred, value in node.items():
                if pred == "@type":
                    subj_l.append(su)
                    pred_l.append("rdf:type")
                    obj_l.append(str(value))
                    dt_l.append(DT_IRI)
                elif pred == "uco-core:hasFacet":
                    for fu in value:
                        subj_l.append(su)
                        pred_l.append(pred)
                        obj_l.append(fu)
                        dt_l.append(DT_IRI)
                else:
                    _emit_value(subj_l, pred_l, obj_l, dt_l, su, pred, value)
        return fp, len(subj_l) - n0


def _emit_value(subj_l: list, pred_l: list, obj_l: list, dt_l: list,
                subj: str, pred: str, value: Any) -> None:
    """Flatten one JSON-LD property value into the four column lists.

    Mirrors ``_normalise_value`` (ref graph_generator.py:101-110) for dict
    unwrapping, then stringifies with xsd typing by Python type.
    """
    if isinstance(value, str):  # most common case first
        obj_l.append(value)
        dt_l.append(DT_IRI if value.startswith("kb:") else DT_STRING)
    elif isinstance(value, bool):
        obj_l.append("true" if value else "false")
        dt_l.append(DT_BOOLEAN)
    elif isinstance(value, int):
        obj_l.append(str(value))
        dt_l.append(DT_INTEGER)
    elif isinstance(value, float):
        obj_l.append(repr(value))
        dt_l.append(DT_DECIMAL)
    elif isinstance(value, (list, tuple)):
        for v in value:
            _emit_value(subj_l, pred_l, obj_l, dt_l, subj, pred, v)
        return
    elif isinstance(value, dict):
        if "@value" in value:
            _emit_value(subj_l, pred_l, obj_l, dt_l, subj, pred, value["@value"])
            return
        if set(value.keys()) == {"@id"}:
            obj_l.append(str(value["@id"]))
            dt_l.append(DT_IRI)
        else:
            obj_l.append(json.dumps(value, sort_keys=True))
            dt_l.append(DT_STRING)
    else:
        obj_l.append(str(value))
        dt_l.append(DT_STRING)
    subj_l.append(subj)
    pred_l.append(pred)
