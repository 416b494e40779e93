"""Validating KG stage: triple construction + SHACL-lite + fidelity checks
+ one bounded correction pass, in a single actor sweep (no cluster loops).

The reference's validate -> invalidate -> replan -> regenerate control loop
(``graph.py:117-143``, MAX_VALIDATION_ATTEMPTS=3 / MAX_HALLUCINATION=2)
becomes dataflow: every record is composed, validated, and — when a
violation is found — recomposed once without the offending properties
(deterministic uuid5 IDs make recomposition idempotent, so "partial UUID
invalidation" is just recomputation). Violating triples are emitted with a
non-empty ``violation`` column instead of being silently dropped; consumers
split the stream with a filter:

    clean      = out.filter(expr="violation == ''")
    violations = out.filter(expr="violation != ''")
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..kg.records import extract_records
from ..ontology.validate import RuleEngine, allowed_value_forms
from .kg_stage import TRIPLES_SCHEMA, TurnTriples

VALIDATED_SCHEMA = TRIPLES_SCHEMA.append(pa.field("violation", pa.string()))


class ValidatingTurnTriples(TurnTriples):
    def __init__(self, ontology_maps: dict | None = None, check_fidelity: bool = True):
        super().__init__(ontology_maps)
        self.engine = RuleEngine()
        self.check_fidelity = check_fidelity

    def _validate_record(self, record, triples, mapper=None):
        """Return [(triple, violation_code_or_empty)] for one record."""
        by_subj: dict[str, list] = {}
        types: dict[str, str] = {}
        for t in triples:
            s, p, o, dt = t
            if p == "rdf:type":
                types[s] = o
            else:
                by_subj.setdefault(s, []).append(t)

        allowed = allowed_value_forms(record) if self.check_fidelity else None
        flagged: dict[tuple[str, str], str] = {}
        for subj, rows in by_subj.items():
            ntype = types.get(subj, "")
            declared = mapper.declared_props.get(ntype) if mapper is not None else None
            for rule, pred in self.engine.check_node(
                ntype, [(p, o, dt) for _, p, o, dt in rows], allowed, declared
            ):
                flagged[(subj, pred)] = rule

        out = []
        for t in triples:
            code = flagged.get((t[0], t[1]), "")
            out.append((t, code))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch.column("role"), pa.scalar("tool")),
            pc.not_equal(batch.column("text"), pa.scalar("")),
        )
        tool_turns = batch.filter(mask)
        if tool_turns.num_rows == 0:
            return VALIDATED_SCHEMA.empty_table()

        cols = {name: [] for name in VALIDATED_SCHEMA.names}
        for text, conv_id, turn_idx in zip(
            tool_turns.column("text").to_pylist(),
            tool_turns.column("conv_id").to_pylist(),
            tool_turns.column("turn_idx").to_pylist(),
        ):
            try:
                payload = json.loads(text)
            except (json.JSONDecodeError, TypeError):
                continue
            atype = payload.get("artifact_type") if isinstance(payload, dict) else None
            for record in extract_records(payload):
                r_atype = record.get("artifact_type", atype)
                mapper = self._mapper_for(r_atype, record)
                fp, triples = mapper.process_record(record)
                checked = self._validate_record(record, triples, mapper)
                for (s, p, o, dt), code in checked:
                    cols["subj"].append(s)
                    cols["pred"].append(p)
                    cols["obj"].append(o)
                    cols["obj_dt"].append(dt)
                    cols["conv_id"].append(conv_id)
                    cols["turn_idx"].append(turn_idx)
                    cols["artifact_type"].append(r_atype or "")
                    cols["record_fp"].append(fp)
                    cols["violation"].append(code)

        return pa.table(
            {
                "subj": pa.array(cols["subj"], pa.string()),
                "pred": pa.array(cols["pred"], pa.string()),
                "obj": pa.array(cols["obj"], pa.string()),
                "obj_dt": pa.array(cols["obj_dt"], pa.string()),
                "conv_id": pa.array(cols["conv_id"], pa.string()),
                "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
                "artifact_type": pa.array(cols["artifact_type"], pa.string()),
                "record_fp": pa.array(cols["record_fp"], pa.string()),
                "violation": pa.array(cols["violation"], pa.string()),
            }
        )
