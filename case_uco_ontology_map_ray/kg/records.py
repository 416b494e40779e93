"""Artifact-payload -> flat record extraction.

Semantics mirror reference ``agents/uuid_planner.py:30-66`` (``_extract_records``):
multi-record payloads fan out with shared metadata flattened into each record;
single-``record`` payloads flatten likewise; bare lists pass through; bare
dicts are a single record.

The flattened record (including ``artifact_type``/``description``/``source``)
is what gets fingerprinted — this ordering/merge rule is part of the UUID
contract and must not change.
"""

from __future__ import annotations

from typing import Any


def extract_records(raw_input: Any) -> list[dict]:
    if isinstance(raw_input, list):
        return [rec for rec in raw_input if isinstance(rec, dict)]

    if isinstance(raw_input, dict):
        records = raw_input.get("records")
        if isinstance(records, list):
            shared = {k: v for k, v in raw_input.items() if k not in ("records", "record")}
            flattened = [
                {**shared, **rec} for rec in records if isinstance(rec, dict)
            ]
            if flattened:
                return flattened

        single = raw_input.get("record")
        if isinstance(single, dict):
            shared = {k: v for k, v in raw_input.items() if k not in ("records", "record")}
            return [{**shared, **single}]

        return [raw_input] if raw_input else []

    return []
