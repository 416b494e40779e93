"""Minimal Turtle-subset parser for the public UCO/CASE ontology files.

Parses exactly the constructs the engine needs (no rdflib dependency):
@prefix lines, subject statement blocks, ``a`` type lists, rdfs:subClassOf,
and ``sh:property [ ... ]`` shape blocks with sh:path / sh:datatype /
sh:class / sh:minCount / sh:maxCount / sh:nodeKind. The vendored UCO TTLs
format one statement per column-0 subject with indented continuations,
which this parser relies on (asserted by tests against known classes).

Mirrors what the reference derives with rdflib (``case_uco.py:137-339``):
class cache, facet taxonomy, per-class SHACL property shapes.
"""

from __future__ import annotations

import re
from pathlib import Path

_PREFIX_RE = re.compile(r"@prefix\s+([\w-]*):\s+<([^>]+)>\s*\.")
_SHAPE_BLOCK_RE = re.compile(r"\[([^\[\]]*)\]", re.DOTALL)
_FIELD_RES = {
    "path": re.compile(r"sh:path\s+([\w-]+:[\w-]+)"),
    "datatype": re.compile(r"sh:datatype\s+([\w-]+:[\w-]+)"),
    "class": re.compile(r"sh:class\s+([\w-]+:[\w-]+)"),
    "nodeKind": re.compile(r"sh:nodeKind\s+sh:(\w+)"),
    "minCount": re.compile(r'sh:minCount\s+"(\d+)"'),
    "maxCount": re.compile(r'sh:maxCount\s+"(\d+)"'),
}
_SUBCLASS_RE = re.compile(r"rdfs:subClassOf\s+((?:[\w-]+:[\w-]+\s*,?\s*)+);")
# single-line string literal with \-escapes (the published UCO TTLs keep
# rdfs:comment on one line)
_COMMENT_RE = re.compile(r'rdfs:comment\s+"((?:[^"\\]|\\.)*)"')


def parse_ttl(text: str) -> dict:
    """Parse one TTL document -> {prefixes, statements: [(subject, body)]}."""
    prefixes = dict(_PREFIX_RE.findall(text))

    statements: list[tuple[str, str]] = []
    subject: str | None = None
    body: list[str] = []
    for line in text.splitlines():
        if line.startswith("#") or line.startswith("@prefix"):
            continue
        if line and not line[0].isspace():
            if subject is not None:
                statements.append((subject, "\n".join(body)))
            parts = line.split(None, 1)
            subject = parts[0]
            body = [parts[1]] if len(parts) > 1 else []
        elif subject is not None:
            body.append(line)
    if subject is not None:
        statements.append((subject, "\n".join(body)))
    return {"prefixes": prefixes, "statements": statements}


def _local(qname: str) -> str:
    return qname.split(":", 1)[-1]


def extract_ontology(text: str) -> dict:
    """Extract classes / subclass edges / property shapes / property kinds."""
    doc = parse_ttl(text)
    classes: dict[str, dict] = {}
    prop_kinds: dict[str, str] = {}

    for subject, body in doc["statements"]:
        if ":" not in subject:
            continue
        name = _local(subject)
        is_class = re.search(r"\bowl:Class\b", body) is not None
        if re.search(r"\bowl:DatatypeProperty\b", body):
            prop_kinds[name] = "DatatypeProperty"
        elif re.search(r"\bowl:ObjectProperty\b", body):
            prop_kinds[name] = "ObjectProperty"
        if not is_class:
            continue

        parents: list[str] = []
        m = _SUBCLASS_RE.search(body)
        if m:
            parents = [_local(p.strip()) for p in m.group(1).split(",") if p.strip()]

        shapes: dict[str, dict] = {}
        # only scan the sh:property section for bracket blocks
        if "sh:property" in body:
            for block in _SHAPE_BLOCK_RE.findall(body):
                fields = {}
                for key, rx in _FIELD_RES.items():
                    fm = rx.search(block)
                    if fm:
                        fields[key] = fm.group(1)
                path = fields.pop("path", None)
                if not path:
                    continue
                for k in ("minCount", "maxCount"):
                    if k in fields:
                        fields[k] = int(fields[k])
                shapes[_local(path)] = fields

        entry = classes.setdefault(name, {"parents": [], "shapes": {}})
        entry["parents"] = sorted(set(entry["parents"]) | set(parents))
        entry["shapes"].update(shapes)
        cm = _COMMENT_RE.search(body)
        if cm:
            # rdfs:comment -> the reference's class 'description' field
            # (case_uco.py get_class_summary / search_classes description
            # match_type); unescape \" and \\ only
            entry["comment"] = cm.group(1).replace('\\"', '"').replace("\\\\", "\\")

    return {"classes": classes, "prop_kinds": prop_kinds}


def extract_dir(ttl_dir: str) -> dict:
    """Merge extraction over every .ttl file in a directory."""
    merged = {"classes": {}, "prop_kinds": {}}
    for path in sorted(Path(ttl_dir).glob("*.ttl")):
        one = extract_ontology(path.read_text(encoding="utf-8"))
        for name, entry in one["classes"].items():
            cur = merged["classes"].setdefault(name, {"parents": [], "shapes": {}})
            cur["parents"] = sorted(set(cur["parents"]) | set(entry["parents"]))
            cur["shapes"].update(entry["shapes"])
            if entry.get("comment") and not cur.get("comment"):
                cur["comment"] = entry["comment"]
        merged["prop_kinds"].update(one["prop_kinds"])
    return merged
