"""Markdown mapping-table parsing + coverage stats + unmapped-field details.

Reference semantics:
- ``_parse_markdown_mapping_tables`` (ontology_synthesizer.py:101-151):
  ``PROPERTY | ORIGIN | TYPE | MAPS TO FIELD`` markdown rows ->
  ``propertyFieldMap {owner -> {property -> [fields]}}`` using an inverse
  property->owner map.
- unmapped-field differ (ontology_synthesizer.py:20-65): record fields not
  referenced by any mapping.
- unmapped detail sampler (ontology_synthesizer.py:68-98): sampleValue
  truncated to 120 chars + valueType.
- coverage stats (ontology_synthesizer.py:264-280).
"""

from __future__ import annotations

import re
from typing import Any

_RECORD_REF_RE = re.compile(r'record\[["\']([^"\']+)["\']\]|record\.([A-Za-z_][A-Za-z0-9_]*)')

TRUNCATE_AT = 120


def parse_markdown_mapping_tables(
    markdown: str, prop_owner_map: dict[str, list[str]]
) -> dict[str, dict[str, list[str]]]:
    """Markdown table rows -> propertyFieldMap keyed by owning class/facet.

    A row maps when its MAPS TO FIELD cell names one or more record fields
    (comma-separated; 'N/A'/'-' ignored). Owner = the ORIGIN cell if present,
    else the inverse map's first owner for the property.
    """
    out: dict[str, dict[str, list[str]]] = {}
    for line in markdown.splitlines():
        if "|" not in line:
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 4 or cells[0].upper() == "PROPERTY" or set(cells[0]) <= {"-", " ", ":"}:
            continue
        prop, origin, _typ, fields_cell = cells[0], cells[1], cells[2], cells[3]
        prop = prop.strip("`")
        if not prop or fields_cell.upper() in ("N/A", "-", "NONE", ""):
            continue
        fields = [f.strip().strip("`") for f in fields_cell.split(",")
                  if f.strip() and f.strip().upper() not in ("N/A", "-")]
        if not fields:
            continue
        local = prop.split(":")[-1]
        owner = origin if origin and origin.upper() not in ("N/A", "-") else None
        if owner is None:
            owners = prop_owner_map.get(local) or prop_owner_map.get(prop)
            owner = owners[0] if owners else None
        if owner is None:
            continue
        out.setdefault(owner, {}).setdefault(local, []).extend(
            f for f in fields if f not in out.get(owner, {}).get(local, [])
        )
    return out


def referenced_fields(text: str) -> set[str]:
    """Fields referenced as record["X"] / record.X in analysis text
    (reference ontology_synthesizer.py:20-27)."""
    out = set()
    for a, b in _RECORD_REF_RE.findall(text):
        out.add(a or b)
    return out


def unmapped_details(record: dict[str, Any], unmapped: list[str]) -> list[dict]:
    """Per unmapped field: sampleValue (120-char truncate) + valueType
    (reference ontology_synthesizer.py:68-98)."""
    details = []
    for field in unmapped:
        value = record.get(field)
        d: dict[str, Any] = {"field": field, "valueType": type(value).__name__}
        if isinstance(value, str) and len(value) > TRUNCATE_AT:
            d["sampleValue"] = value[:TRUNCATE_AT]
            d["isTruncated"] = True
        elif value is not None:
            d["sampleValue"] = value
        details.append(d)
    return details


def coverage_stats(record: dict[str, Any], unmapped: list[str],
                   reserved: tuple[str, ...] = ()) -> dict:
    """total/mapped/unmapped field counts (ontology_synthesizer.py:264-280)."""
    fields = [k for k in record if k not in reserved]
    n_total = len(fields)
    n_unmapped = len([f for f in unmapped if f in fields])
    return {
        "totalFields": n_total,
        "mappedFields": n_total - n_unmapped,
        "unmappedFields": n_unmapped,
        "coverage": round((n_total - n_unmapped) / n_total, 4) if n_total else 1.0,
    }
