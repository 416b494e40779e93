"""Cross-validation of the distilled RuleEngine against SHACL semantics.

pyshacl/rdflib are not installable in this environment (no network), so the
reference's real-SHACL check (``tools.py:356-390``, ``agents/validator.py:
17-138``) is cross-validated two ways instead:

1. **Pinned-shape oracle**: constraint literals hand-transcribed from the
   published UCO 1.x TTLs (the exact ``sh:property`` blocks in
   ``uco-observable.ttl``) — asserting the offline distillation
   (ttl_parser -> uco_index.json) preserved them bit-for-bit. A distillation
   bug that corrupted datatype or cardinality would fail here even though
   generator and engine share no code with this table.
2. **Independent evaluator**: a from-the-spec implementation of the SHACL
   core constraints the engine uses (sh:datatype, sh:maxCount — W3C SHACL
   §4.2.1, §4.1.2) driven ONLY by the pinned table, run over a fixture grid
   of clean and violating nodes; RuleEngine must agree on every verdict.

Known deliberate deviation (shared with the reference's emitted graphs and
documented in ontology/validate.py): ISO-8601 strings satisfy xsd:dateTime —
the reference serializes timestamps as plain JSON strings, which a strict
engine would flag on every timestamp. The independent evaluator follows the
same convention so the agreement check targets real distillation/logic bugs,
not that documented convention.

Note ``unknown-property`` is NOT cross-checked here: UCO shapes are not
``sh:closed``, so a real SHACL run would not flag extra properties — that
rule mirrors the reference's own placement validator, not SHACL.
"""

import re

from case_uco_ontology_map_ray.ontology.index import load_default_index
from case_uco_ontology_map_ray.ontology.validate import RuleEngine

# Hand-transcribed from the published UCO observable TTL (sh:property blocks
# of WindowsPrefetchFacet, FileFacet, URLHistoryEntry). None of these values
# flowed through ttl_parser.py — they are the independent oracle.
PINNED_SHAPES = {
    "WindowsPrefetchFacet": {
        "firstRun": {"datatype": "xsd:dateTime", "maxCount": 1},
        "lastRun": {"datatype": "xsd:dateTime", "maxCount": 1},
        "timesExecuted": {"datatype": "xsd:integer", "maxCount": 1},
        "applicationFileName": {"datatype": "xsd:string", "maxCount": 1},
    },
    "FileFacet": {
        "isDirectory": {"datatype": "xsd:boolean", "maxCount": None},
        "sizeInBytes": {"datatype": "xsd:integer", "maxCount": 1},
        "fileName": {"datatype": "xsd:string", "maxCount": None},
    },
    "URLHistoryEntry": {
        "visitCount": {"datatype": "xsd:integer", "maxCount": 1},
    },
}

_ISO = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
)


def shacl_eval(shapes: dict, props: list[tuple[str, str]]) -> set[tuple[str, str]]:
    """Independent SHACL-core evaluation over (prop, literal) pairs using the
    pinned shapes only. Returns {(rule, prop)} with rule in
    {'datatype', 'max-count'} — written from the W3C SHACL spec, sharing no
    code with ontology/validate.py."""
    out: set[tuple[str, str]] = set()
    counts: dict[str, int] = {}
    for prop, value in props:
        counts[prop] = counts.get(prop, 0) + 1
        shape = shapes.get(prop)
        if shape is None:
            continue  # UCO shapes are not sh:closed
        dt = shape["datatype"]
        ok = True
        if dt == "xsd:integer":
            ok = re.fullmatch(r"[+-]?\d+", value) is not None
        elif dt == "xsd:boolean":
            ok = value in ("true", "false")
        elif dt == "xsd:dateTime":
            ok = _ISO.fullmatch(value) is not None  # documented convention
        elif dt == "xsd:string":
            ok = True
        if not ok:
            out.add(("datatype", prop))
    for prop, n in counts.items():
        shape = shapes.get(prop)
        if shape and shape["maxCount"] is not None and n > shape["maxCount"]:
            out.add(("max-count", prop))
    return out


def test_index_distillation_matches_pinned_ttl_shapes():
    idx = load_default_index()
    for cls, pinned in PINNED_SHAPES.items():
        distilled = idx.shapes_for(cls, include_inherited=False)
        for prop, want in pinned.items():
            got = distilled[prop]
            assert got.get("datatype") == want["datatype"], (cls, prop, got)
            assert got.get("maxCount") == want["maxCount"], (cls, prop, got)


# fixture grid: (class, [(prop, literal)], expected-independent-verdict note)
FIXTURES = [
    # clean nodes
    ("WindowsPrefetchFacet",
     [("firstRun", "2025-09-17T10:30:00Z"), ("timesExecuted", "3"),
      ("applicationFileName", "CALC.EXE")]),
    ("FileFacet",
     [("fileName", "a.txt"), ("fileName", "b.txt"),  # no maxCount: legal
      ("isDirectory", "false"), ("sizeInBytes", "1024")]),
    ("URLHistoryEntry", [("visitCount", "7")]),
    # violations
    ("WindowsPrefetchFacet",
     [("firstRun", "2025-09-17T10:30:00Z"), ("firstRun", "2025-09-18T10:30:00Z")]),
    ("WindowsPrefetchFacet", [("timesExecuted", "many")]),
    ("WindowsPrefetchFacet", [("firstRun", "not-a-date")]),
    ("FileFacet", [("sizeInBytes", "12.5")]),
    ("FileFacet", [("isDirectory", "yes")]),
    ("FileFacet", [("sizeInBytes", "10"), ("sizeInBytes", "11")]),
    ("URLHistoryEntry", [("visitCount", "7"), ("visitCount", "8")]),
    ("URLHistoryEntry", [("visitCount", "7.5")]),
    # mixed: one clean, one datatype, one max-count
    ("WindowsPrefetchFacet",
     [("applicationFileName", "A.EXE"), ("timesExecuted", "x"),
      ("lastRun", "2025-01-01T00:00:00Z"), ("lastRun", "2025-01-02T00:00:00Z")]),
]


def test_rule_engine_agrees_with_independent_shacl_eval():
    eng = RuleEngine()
    for cls, props in FIXTURES:
        want = shacl_eval(PINNED_SHAPES[cls], props)
        got_raw = eng.check_node(
            f"uco-observable:{cls}",
            [(f"uco-observable:{p}", v, "xsd:string") for p, v in props],
        )
        got = set()
        for rule, pred in got_raw:
            local = pred.split(":")[-1]
            if rule.startswith("datatype"):
                got.add(("datatype", local))
            elif rule.startswith("max-count"):
                got.add(("max-count", local))
            elif rule == "unknown-property":
                # not cross-checked (UCO shapes are not sh:closed); the
                # fixtures only use pinned properties, so none expected
                raise AssertionError(f"unexpected unknown-property: {pred}")
        assert got == want, (cls, props, got, want)
