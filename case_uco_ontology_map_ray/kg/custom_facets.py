"""Deterministic custom-facet (dfc-ext) generation for unmapped fields.

Semantics mirror the reference's LLM-free fallback
(``agents/custom_facet.py:122-222`` ``_auto_generate_custom_facets`` and the
ontology-map merge in ``custom_facet_node``, ``custom_facet.py:443-472``):

- facet name = PascalCase(artifact_type) + ``ExtensionFacet`` (collision
  suffix 2,3,... vs existing facets);
- property name = ``dfc-ext:`` + lowerCamelCase(field) (single-token fields
  collapse to all-lowercase, e.g. ``RunCount`` -> ``dfc-ext:runcount``);
- datatype via xsd inference on the sample value;
- TTL stub emission for the facet class + each DatatypeProperty;
- the generated facet + properties are appended to the ontology map so the
  UUID planner allocates a slot for the facet.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any

from ..functions.naming import extension_facet_name, infer_xsd_datatype, to_camel_case

TTL_HEADER = (
    "@prefix dfc-ext: <https://www.w3.org/dfc-ext/> .\n"
    "@prefix uco-core: <https://ontology.unifiedcyberontology.org/uco/core/> .\n"
    "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
    "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
    "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
)

_MATCH_PRIORITY_KEYS = ("EntryNumber", "SequenceNumber", "FileName", "@id")


def generate_custom_facets(
    unmapped_details: list[dict],
    sample_record: dict[str, Any],
    artifact_type: Any,
    ontology_map: dict,
) -> tuple[dict, dict, str]:
    """Return (customFacets, updated_ontology_map, ttl_definitions).

    ``unmapped_details`` rows are ``{"field": name, "sampleValue": value}``.
    Returns ``({}, ontology_map, "")`` when there is nothing to generate.
    """
    if not unmapped_details:
        return {}, ontology_map, ""

    base_name = extension_facet_name(artifact_type)
    existing = set(ontology_map.get("facets", []) or [])
    facet_name = base_name
    suffix = 2
    while facet_name in existing:
        facet_name = f"{base_name}{suffix}"
        suffix += 1

    properties: dict[str, dict[str, str]] = {}
    values: dict[str, Any] = {}
    for detail in unmapped_details:
        field = detail.get("field")
        if not field:
            continue
        prop_name = f"dfc-ext:{to_camel_case(field)}"
        sample_value = detail.get("sampleValue")
        if sample_value is None and sample_record:
            sample_value = sample_record.get(field)
        properties[prop_name] = {"dataType": infer_xsd_datatype(sample_value)}
        if sample_value is not None:
            values[prop_name] = sample_value

    if not properties:
        return {}, ontology_map, ""

    match_fields: dict[str, Any] = {}
    for key in _MATCH_PRIORITY_KEYS:
        if sample_record and key in sample_record and sample_record[key] not in (None, ""):
            match_fields[key] = sample_record[key]
    if not match_fields and sample_record:
        sample_key = next((k for k, v in sample_record.items() if v not in (None, "")), None)
        if sample_key:
            match_fields[sample_key] = sample_record[sample_key]

    label = artifact_type or "unknown artifact type"
    custom_facets = {
        "facetDefinitions": {
            facet_name: {
                "namespace": "dfc-ext",
                "reasoning": (
                    f"Automatically generated extension facet for {label} "
                    "covering unmapped evidence fields."
                ),
                "properties": properties,
            }
        },
        "facetAssignments": [
            {"match": match_fields, "facet": facet_name, "values": values}
        ],
    }

    ttl_lines = [TTL_HEADER, "", f"# Auto-generated extension facet for {label}"]
    ttl_lines.append(
        f"dfc-ext:{facet_name}\n  a owl:Class ;\n  rdfs:subClassOf uco-core:Facet ;\n"
        f"  rdfs:label \"{facet_name}\" ;\n  rdfs:comment \"Extension facet for {label} "
        "capturing unmapped evidence fields.\" ."
    )
    for prop_name, meta in properties.items():
        local = prop_name.split(":", 1)[1]
        ttl_lines.append(
            f"\ndfc-ext:{local}\n  a owl:DatatypeProperty ;\n"
            f"  rdfs:domain dfc-ext:{facet_name} ;\n  rdfs:range {meta['dataType']} ;\n"
            f"  rdfs:label \"{local}\" ."
        )
    ttl_definitions = "\n".join(ttl_lines)

    updated = deepcopy(ontology_map)
    facets_list = list(updated.get("facets", []))
    if facet_name not in facets_list:
        facets_list.append(facet_name)
    updated["facets"] = facets_list
    props_map = updated.setdefault("properties", {})
    existing_props = props_map.get(facet_name, [])
    if not existing_props:
        props_map[facet_name] = list(properties.keys())
    else:
        for prop in properties:
            if prop not in existing_props:
                existing_props.append(prop)

    return custom_facets, updated, ttl_definitions
