"""Stable turn ordering (per-turn text-equality invariant) + distributed
custom-facet definition aggregate."""

import json

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_sorted_turns_preserves_text_under_stable_ordering(tmp_path):
    """BASELINE.json per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — round-trip through the engine's reader +
    sort must reproduce the generator's text column exactly."""
    import ray.data as rd

    from case_uco_ontology_map_ray.pipelines.kg import sorted_turns
    from case_uco_ontology_map_ray.sources.transcripts import (
        conversations_table,
        synthesize_transcripts,
    )

    src = str(tmp_path / "t")
    synthesize_transcripts(src, num_conversations=10, mean_turns=9,
                           conversations_per_block=3)
    got = sorted_turns(src).to_pandas()

    want = conversations_table(range(10), 9).to_pandas()
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    assert list(got.conv_id) == list(want.conv_id)
    assert list(got.turn_idx) == list(want.turn_idx)
    assert list(got.text) == list(want.text)  # the invariant


def test_custom_facet_definitions_aggregate():
    import ray.data as rd

    from case_uco_ontology_map_ray.pipelines.kg import custom_facet_definitions
    from case_uco_ontology_map_ray.sources.transcripts import conversations_table

    ds = rd.from_arrow(conversations_table(range(8), 12))
    out = custom_facet_definitions(ds)
    by_type = dict(zip(out.artifact_type, out.facet_name))
    assert by_type["MFT Record"] == "MftRecordExtensionFacet"
    assert by_type["IoT Sensor Reading"] == "IotSensorReadingExtensionFacet"
    # frozen-map types are not in the custom path
    assert "MFT Records" not in by_type
    for ttl in out.ttl:
        assert "rdfs:subClassOf uco-core:Facet" in ttl
    props = json.loads(out[out.artifact_type == "IoT Sensor Reading"].properties.iloc[0])
    assert "dfc-ext:temperature" in props
    assert props["dfc-ext:temperature"]["dataType"] == "xsd:decimal"
