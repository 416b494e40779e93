"""Hypothesis property tests for the deterministic KG core: structural
invariants must hold for ARBITRARY records, not just fixtures."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from case_uco_ontology_map_ray.config import ONTOLOGY_MAPS, RESERVED_RECORD_KEYS
from case_uco_ontology_map_ray.kg.mapper import ArtifactMapper
from case_uco_ontology_map_ray.ontology.validate import allowed_value_forms

field_names = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_"),
    min_size=1, max_size=20,
).filter(lambda s: s not in RESERVED_RECORD_KEYS)

scalar_values = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=40),
)
values = st.one_of(scalar_values, st.lists(st.text(min_size=1, max_size=20), max_size=4))

records = st.dictionaries(field_names, values, min_size=1, max_size=12)


@settings(max_examples=150, deadline=None)
@given(records)
def test_mapper_invariants_hold_for_arbitrary_records(record):
    mapper = ArtifactMapper(ONTOLOGY_MAPS["MFT Records"])
    fp1, triples1 = mapper.process_record(record)
    fp2, triples2 = ArtifactMapper(ONTOLOGY_MAPS["MFT Records"]).process_record(record)

    # determinism across independent mapper instances
    assert fp1 == fp2 and triples1 == triples2

    # exactly one rdf:type per subject
    types = {}
    for s, p, o, dt in triples1:
        if p == "rdf:type":
            assert s not in types
            types[s] = o
    assert types  # at least the primary node exists

    # no empty objects
    assert all(o != "" for _, _, o, _ in triples1)

    # parent objects only carry rdf:type / hasFacet
    parents = {s for s, p, _, _ in triples1 if p == "uco-core:hasFacet"}
    for s, p, o, dt in triples1:
        if s in parents:
            assert p in ("rdf:type", "uco-core:hasFacet")

    # hasFacet targets exist and are typed
    for s, p, o, dt in triples1:
        if p == "uco-core:hasFacet":
            assert o in types and dt == "@id"

    # fidelity: every emitted literal derives from the input record
    allowed = allowed_value_forms(record)
    for s, p, o, dt in triples1:
        if p == "rdf:type" or dt == "@id":
            continue
        assert o in allowed, (p, o)


@settings(max_examples=60, deadline=None)
@given(records)
def test_fingerprint_is_canonical_json_sha256(record):
    import hashlib

    from case_uco_ontology_map_ray.functions.fingerprint import record_fingerprint

    want = hashlib.sha256(
        json.dumps(record, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()
    assert record_fingerprint(record) == want


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_shingle_minhash_simhash_total(text):
    """Sketch kernels never crash and are deterministic on arbitrary text."""
    from case_uco_ontology_map_ray.functions.hashing import (
        MinHasher,
        char_shingles,
        simhash64,
    )

    sh = char_shingles(text, 4)
    mh = MinHasher(16)
    assert (mh.signature(sh) == mh.signature(sh)).all()
    assert simhash64(sh) == simhash64(sh)
