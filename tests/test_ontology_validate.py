"""Ontology index + SHACL-lite rule engine + validating stage tests."""

import pyarrow as pa
import pytest

from case_uco_ontology_map_ray.ontology.index import load_default_index
from case_uco_ontology_map_ray.ontology.validate import (
    RuleEngine,
    allowed_value_forms,
)


def test_index_structure():
    idx = load_default_index()
    assert idx.is_facet("WindowsPrefetchFacet")
    assert idx.is_facet("FileFacet")
    assert not idx.is_facet("ObservableObject")
    sh = idx.shapes_for("WindowsPrefetchFacet")
    assert sh["firstRun"]["datatype"] == "xsd:dateTime"
    assert sh["timesExecuted"]["datatype"] == "xsd:integer"
    assert "ObservableObject" in idx.superclasses("WindowsPrefetch")
    # inherited shapes flow down the class chain
    assert "description" in idx.shapes_for("WindowsPrefetch")


def test_rule_engine_clean_node():
    eng = RuleEngine()
    codes = eng.check_node(
        "uco-observable:WindowsPrefetchFacet",
        [
            ("uco-observable:firstRun", "2025-09-17T10:30:00Z", "xsd:string"),
            ("uco-observable:timesExecuted", "3", "xsd:integer"),
        ],
    )
    assert codes == []


def test_rule_engine_flags_violations():
    eng = RuleEngine()
    # unknown property on a known facet
    assert ("unknown-property", "uco-observable:nonsenseProp") in eng.check_node(
        "uco-observable:WindowsPrefetchFacet",
        [("uco-observable:nonsenseProp", "x", "xsd:string")],
    )
    # dfc-ext props never flagged unknown
    assert eng.check_node(
        "uco-observable:MftRecordExtensionFacet",
        [("dfc-ext:securityid", "S-1", "xsd:string")],
    ) == []
    # maxCount: firstRun is maxCount 1
    codes = eng.check_node(
        "uco-observable:WindowsPrefetchFacet",
        [
            ("uco-observable:firstRun", "2025-09-17T10:30:00Z", "xsd:string"),
            ("uco-observable:firstRun", "2025-09-18T10:30:00Z", "xsd:string"),
        ],
    )
    assert any(r.startswith("max-count") for r, _ in codes)
    # datatype: non-ISO string in a dateTime slot
    codes = eng.check_node(
        "uco-observable:WindowsPrefetchFacet",
        [("uco-observable:firstRun", "not-a-date", "xsd:string")],
    )
    assert any(r.startswith("datatype") for r, _ in codes)
    # placement: facet-owned property on a parent object
    codes = eng.check_node(
        "uco-observable:WindowsPrefetch",
        [("uco-observable:timesExecuted", "3", "xsd:integer")],
    )
    assert ("placement", "uco-observable:timesExecuted") in codes
    # empty value
    codes = eng.check_node(
        "uco-observable:WindowsPrefetchFacet",
        [("uco-observable:volume", "", "xsd:string")],
    )
    assert ("empty-value", "uco-observable:volume") in codes


def test_fidelity_rule():
    eng = RuleEngine()
    allowed = allowed_value_forms({"RunCount": 3, "Name": "x.exe", "Flag": True,
                                   "Paths": ["a", "b"]})
    assert {"3", "x.exe", "true", "a", "b"} <= allowed
    codes = eng.check_node(
        "uco-observable:WindowsPrefetchFacet",
        [("uco-observable:timesExecuted", "99", "xsd:integer")],
        allowed_values=allowed,
    )
    assert ("fidelity", "uco-observable:timesExecuted") in codes
    codes = eng.check_node(
        "uco-observable:WindowsPrefetchFacet",
        [("uco-observable:timesExecuted", "3", "xsd:integer")],
        allowed_values=allowed,
    )
    assert codes == []


def test_validating_stage_on_synthetic_turns():
    from case_uco_ontology_map_ray.sources.transcripts import conversations_table
    from case_uco_ontology_map_ray.stages.validate_stage import ValidatingTurnTriples

    tab = conversations_table(range(4), 12)
    out = ValidatingTurnTriples()(tab)
    df = out.to_pandas()
    assert len(df) > 0
    # the deterministic mapper copies input values; fidelity/structure clean
    bad = df[df.violation != ""]
    assert len(bad) == 0, bad.head().to_string()
    # same triple set as the unvalidated stage
    from case_uco_ontology_map_ray.stages.kg_stage import TurnTriples

    plain = TurnTriples()(tab).to_pandas()
    key = ["subj", "pred", "obj", "obj_dt"]
    assert set(map(tuple, df[key].values.tolist())) == set(
        map(tuple, plain[key].values.tolist())
    )
