"""JSON-LD document output — the reference's native output model (§1.4).

A user of the reference receives ``{"@context": {...}, "@graph": [nodes]}``
per payload. This pipeline reconstructs those documents from transcripts:
one JSON-LD document row per artifact record (or per payload via
``jsonld_for_payload``), golden-tested byte-for-byte (modulo key order)
against the reference's composed graphs.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONTEXT
from ..kg.records import extract_records
from ..stages.kg_stage import TurnTriples


def nodes_to_graph(node_order: list[str], nodes: dict[str, dict]) -> list[dict]:
    """Engine node map -> reference-shaped @graph node list (@id first,
    hasFacet refs as [{"@id": ...}])."""
    out = []
    for su in node_order:
        node = nodes.get(su)
        if node is None:
            continue
        doc = {"@id": su}
        for k, v in node.items():
            if k == "uco-core:hasFacet":
                doc[k] = [{"@id": fu} for fu in v]
            else:
                doc[k] = v
        out.append(doc)
    return out


def jsonld_for_payload(payload: dict | list, stage: TurnTriples | None = None) -> dict:
    """One payload (possibly multi-record) -> one JSON-LD document, matching
    the reference's deterministic composer output."""
    stage = stage or TurnTriples()
    graph: list[dict] = []
    atype = payload.get("artifact_type") if isinstance(payload, dict) else None
    for record in extract_records(payload):
        mapper = stage._mapper_for(record.get("artifact_type", atype), record)
        _fp, node_order, nodes = mapper.compose_nodes(record)
        graph.extend(nodes_to_graph(node_order, nodes))
    return {"@context": DEFAULT_CONTEXT, "@graph": graph}


class TurnJsonLd(TurnTriples):
    """Actor stage: tool turns -> one JSON-LD document row per record."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch.column("role"), pa.scalar("tool")),
            pc.not_equal(batch.column("text"), pa.scalar("")),
        )
        tool_turns = batch.filter(mask)
        fps, docs, convs, turns = [], [], [], []
        for text, conv, turn in zip(tool_turns.column("text").to_pylist(),
                                    tool_turns.column("conv_id").to_pylist(),
                                    tool_turns.column("turn_idx").to_pylist()):
            try:
                payload = json.loads(text)
            except (json.JSONDecodeError, TypeError):
                continue
            atype = payload.get("artifact_type") if isinstance(payload, dict) else None
            for record in extract_records(payload):
                mapper = self._mapper_for(record.get("artifact_type", atype), record)
                fp, node_order, nodes = mapper.compose_nodes(record)
                doc = {"@context": DEFAULT_CONTEXT,
                       "@graph": nodes_to_graph(node_order, nodes)}
                fps.append(fp)
                docs.append(json.dumps(doc, sort_keys=True))
                convs.append(conv)
                turns.append(turn)
        return pa.table({
            "record_fp": pa.array(fps, pa.string()),
            "jsonld": pa.array(docs, pa.string()),
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(turns, pa.int32()),
        })


def jsonld_from_transcripts(source, batch_size: int = 2048, concurrency=None):
    import ray
    import ray.data as rd

    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=["conv_id", "turn_idx", "role", "text"])
    else:
        ds = source
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(1, cpus - 2)
    return ds.map_batches(TurnJsonLd, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
