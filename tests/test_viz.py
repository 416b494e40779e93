"""S7 graph-viz export — engine analog of the reference's mermaid chart
(`visualize.py:1-26`)."""

import pytest


def test_pipeline_mermaid_shape():
    from case_uco_ontology_map_ray.pipelines.viz import pipeline_mermaid

    text = pipeline_mermaid()
    assert text.startswith("graph TD\n")
    assert 'TurnTriples["TurnTriples"]' in text
    assert "TurnTriples --> ValidatingTurnTriples" in text


@pytest.mark.usefixtures("ray_session")
def test_kg_subgraph_exports(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from case_uco_ontology_map_ray.pipelines.viz import (
        export_graph_visualization, kg_subgraph_dot, kg_subgraph_mermaid)

    triples = pa.table({
        "subj": pa.array(["kb:a", "kb:a", "kb:b"]).dictionary_encode(),
        "pred": pa.array(["uco-core:hasFacet", "x:lit", "uco-core:source"]
                         ).dictionary_encode(),
        "obj": pa.array(["kb:f1", "plain literal", "kb:a"]),
        "obj_dt": pa.array(["@id", "xsd:string", "@id"]).dictionary_encode(),
    })
    ds = rd.from_arrow(triples)

    mmd = kg_subgraph_mermaid(ds)
    assert mmd.startswith("graph LR\n")
    assert "kb_a -->|hasFacet| kb_f1" in mmd
    assert "plain literal" not in mmd          # literal triples are not edges

    dot = kg_subgraph_dot(ds)
    assert dot.startswith("digraph kg {") and dot.rstrip().endswith("}")
    assert '"kb_b" -> "kb_a" [label="source"];' in dot

    out = export_graph_visualization(str(tmp_path / "pipeline.mmd"))
    assert (tmp_path / "pipeline.mmd").read_text().startswith("graph TD")
    out2 = export_graph_visualization(str(tmp_path / "kg.dot"), triples_ds=ds)
    assert (tmp_path / "kg.dot").read_text().startswith("digraph kg")
    assert out.endswith(".mmd") and out2.endswith(".dot")
