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


def _one_turn_batch(payload: dict):
    import json

    import pyarrow as pa

    return pa.table({
        "conv_id": pa.array(["c0"]),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["tool"]),
        "text": pa.array([json.dumps(payload)]),
    })


def test_bounded_correction_recomposes_without_flagged_property():
    """T7: an injected datatype violation (FileFacet sizeInBytes = 'oops')
    is dropped in one bounded correction pass; the corrected graph is clean,
    keeps the same deterministic node IDs, and the dropped property triple
    stays in the stream with its violation code."""
    from case_uco_ontology_map_ray.stages.kg_stage import TurnTriples
    from case_uco_ontology_map_ray.stages.validate_stage import ValidatingTurnTriples

    payload = {
        "artifact_type": "MFT Records",
        "records": [
            {"EntryNumber": 5, "FullPath": "C:/Users/bad.txt", "Size": "oops"},
            {"EntryNumber": 6, "FullPath": "C:/Users/good.txt", "Size": 123},
        ],
    }
    out = ValidatingTurnTriples()(_one_turn_batch(payload)).to_pandas()

    bad = out[out.violation != ""]
    assert len(bad) == 1
    assert bad.iloc[0]["pred"] == "uco-observable:sizeInBytes"
    assert bad.iloc[0]["obj"] == "oops"
    assert bad.iloc[0]["violation"].startswith("datatype[")

    clean = out[out.violation == ""]
    # corrected graph: no sizeInBytes=oops anywhere in the clean stream
    assert not ((clean.pred == "uco-observable:sizeInBytes")
                & (clean.obj == "oops")).any()
    # the good record keeps its sizeInBytes
    assert ((clean.pred == "uco-observable:sizeInBytes")
            & (clean.obj == "123")).any()
    # node IDs unchanged vs the unvalidated stage (deterministic plan reuse)
    plain = TurnTriples()(_one_turn_batch(payload)).to_pandas()
    assert set(clean.subj) <= set(plain.subj)
    # clean stream = plain stream minus exactly the dropped property
    key = ["subj", "pred", "obj"]
    plain_set = set(map(tuple, plain[key].values.tolist()))
    clean_set = set(map(tuple, clean[key].values.tolist()))
    assert plain_set - clean_set == {
        (bad.iloc[0]["subj"], "uco-observable:sizeInBytes", "oops")
    }


def test_bounded_correction_prunes_emptied_facet():
    """If dropping the flagged property empties its facet, the facet node
    and the parent's hasFacet ref are pruned (graph_generator.py:199-216)."""
    from case_uco_ontology_map_ray.stages.validate_stage import ValidatingTurnTriples

    # record whose ONLY FileFacet property is the bad one: no file fields
    # except Size -> FileFacet carries just sizeInBytes
    payload = {
        "artifact_type": "MFT Records",
        "records": [{"EntryNumber": 7, "Size": "not-a-number"}],
    }
    out = ValidatingTurnTriples()(_one_turn_batch(payload)).to_pandas()
    clean = out[out.violation == ""]
    # FileFacet emptied -> its type triple and the hasFacet ref are gone
    facet_subjs = set(clean[clean.obj == "uco-observable:FileFacet"].subj)
    assert facet_subjs == set()
    refs = clean[clean.pred == "uco-core:hasFacet"]
    # remaining hasFacet refs (MftRecordFacet) never point at pruned nodes
    assert set(refs.obj) <= set(clean[clean.pred == "rdf:type"].subj)


def test_ontology_search_api():
    """Search surface mirroring reference case_uco.py:476,686,1004."""
    from case_uco_ontology_map_ray.ontology.index import load_default_index

    idx = load_default_index()
    all_classes = idx.list_all_classes()
    assert len(all_classes) == len(idx.classes)
    assert all_classes == sorted(all_classes, key=lambda x: x["name"])
    assert {"name": "WindowsPrefetch",
            "uri": "uco-observable:WindowsPrefetch"} in all_classes

    hits = idx.search_classes("prefetch")
    names = [h["name"] for h in hits]
    assert "WindowsPrefetch" in names and "WindowsPrefetchFacet" in names
    facet_hit = next(h for h in hits if h["name"] == "WindowsPrefetchFacet")
    assert facet_hit["is_facet"] and facet_hit["n_properties"] > 0

    rel = idx.relevant_facets("WindowsPrefetch")
    assert "WindowsPrefetchFacet" in rel and len(rel) <= 10

    props = idx.search_properties("filePath")
    assert any(p["property"] == "filePath" and "FileFacet" in p["owners"]
               for p in props)


def test_search_classes_matches_description_text():
    """Reference 'description' match_type (case_uco.py:686-720): keyword in
    rdfs:comment but NOT in the class name still matches — the vendored
    index carries the TTLs' rdfs:comment text."""
    from case_uco_ontology_map_ray.ontology.index import load_default_index

    idx = load_default_index()
    # 'web browser' appears only in comments (no class is named *WebBrowser*)
    hits = idx.search_classes("web browser")
    by_name = {h["name"]: h for h in hits}
    assert "URLHistory" in by_name
    assert by_name["URLHistory"]["match_type"] == "description"
    assert "web browser" in by_name["URLHistory"]["description"]
    # name match still wins over description match and is labeled 'name'
    hits2 = idx.search_classes("urlhistory")
    assert {h["match_type"] for h in hits2} == {"name"}
    # every class row exposes the reference's description field (possibly "")
    assert isinstance(idx.description("WindowsPrefetch"), str)
    # sorted by name like the reference
    assert [h["name"] for h in hits] == sorted(h["name"] for h in hits)


def test_suggest_mapping_recovers_frozen_map_choices():
    """The mapping-suggestion tool must rank the frozen-map properties at
    the top for the fields they were hand-mapped from."""
    from case_uco_ontology_map_ray.ontology.index import load_default_index

    idx = load_default_index()
    sugg = idx.suggest_mapping(["FileName", "FilePath", "RunCount"])
    assert sugg["FileName"][0]["property"] == "fileName"
    assert sugg["FilePath"][0]["property"] == "filePath"
    # RunCount has no token overlap with timesExecuted -> that is exactly why
    # the alias map exists; the tool returns no false certainty
    assert all(s["score"] >= 1 for s in sugg["RunCount"])
    # results ranked by score desc
    for cands in sugg.values():
        scores = [c["score"] for c in cands]
        assert scores == sorted(scores, reverse=True)


def test_failure_memory_learning(ray_session):
    """T8: injected violations aggregate into (artifact_type, rule) patterns
    with the reference's priority rule (>2 -> high) and render the
    memory-context string."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from case_uco_ontology_map_ray.stages.validate_stage import ValidatingTurnTriples
    from case_uco_ontology_map_ray.state.memory import (
        learn_failure_patterns,
        memory_context,
    )

    payloads = []
    for i in range(4):  # 4 bad records -> n > 2 -> priority high
        payloads.append(json.dumps({
            "artifact_type": "MFT Records",
            "records": [{"EntryNumber": i, "FullPath": f"/x/{i}", "Size": "bad"}],
        }))
    tab = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(4)]),
        "turn_idx": pa.array([0] * 4, pa.int32()),
        "role": pa.array(["tool"] * 4),
        "text": pa.array(payloads),
    })
    validated = rd.from_arrow(ValidatingTurnTriples()(tab))
    pat = learn_failure_patterns(validated)
    assert len(pat) == 1
    row = pat.iloc[0]
    assert row.artifact_type == "MFT Records"
    assert row.rule == "datatype"
    assert row.n == 4 and row.priority == "high"
    assert row.sample_pred == "uco-observable:sizeInBytes"
    ctx = memory_context(pat)
    assert "MFT Records/datatype: 4 violations" in ctx
    assert "drop-property-recompose [high]" in ctx

    # empty stream -> reference's empty-context sentinel
    clean = validated.filter(expr="violation == ''")
    assert memory_context(learn_failure_patterns(clean)) == \
        "No previous memory available"
