"""Input normalization: the reference's multi-format intake re-expressed.

Reference semantics:
- ``_normalize_input`` (services.py:23-64): dict/list -> JSON; CSV text ->
  DictReader rows; anything else -> free text. Returns
  {as_text, raw_json, format in {json, csv, text}}.
- CSV + metadata wrapper (services.py:125-151): first CSV row wrapped into
  the {artifact_type, description, source, record} payload shape.

At engine scale the same logic runs per tool-turn inside map_batches; the
driver-side helpers here also build payloads from whole CSV/JSON files so
users can feed artifact tables directly (``payloads_from_csv`` ->
ray.data pipeline input).
"""

from __future__ import annotations

import csv
import io
import json
from typing import Any


def normalize_input(data: Any) -> dict:
    """-> {as_text, raw_json, format}; format in {json, csv, text}."""
    if isinstance(data, (dict, list)):
        return {"as_text": json.dumps(data, ensure_ascii=False),
                "raw_json": data, "format": "json"}
    text = str(data or "")
    stripped = text.strip()
    if stripped.startswith(("{", "[")):
        try:
            obj = json.loads(stripped)
            return {"as_text": stripped, "raw_json": obj, "format": "json"}
        except json.JSONDecodeError:
            pass
    if _looks_like_csv(stripped):
        rows = list(csv.DictReader(io.StringIO(stripped)))
        if rows:
            return {"as_text": stripped, "raw_json": rows, "format": "csv"}
    return {"as_text": text, "raw_json": None, "format": "text"}


def _looks_like_csv(text: str) -> bool:
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if len(lines) < 2:
        return False
    header = lines[0]
    return ("," in header) and all(
        ln.count(",") == header.count(",") for ln in lines[1:3]
    )


def wrap_csv_payload(rows: list[dict], artifact_type: str | None,
                     description: str | None, source: str | None) -> dict:
    """CSV rows + metadata -> the standard artifact payload shape
    (multi-record generalization of services.py:125-151)."""
    payload: dict[str, Any] = {}
    if artifact_type:
        payload["artifact_type"] = artifact_type
    if description:
        payload["description"] = description
    if source:
        payload["source"] = source
    if len(rows) == 1:
        payload["record"] = rows[0]
    else:
        payload["records"] = rows
    return payload


def payloads_from_csv(path: str, artifact_type: str, description: str = "",
                      source: str = "", records_per_payload: int = 1):
    """A CSV artifact table -> Dataset of payload-JSON rows shaped like tool
    turns, so it can feed straight into the KG stage."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_csv(path)

    def to_payloads(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        texts = []
        for i in range(0, len(rows), records_per_payload):
            chunk = rows[i:i + records_per_payload]
            texts.append(json.dumps(
                wrap_csv_payload(chunk, artifact_type, description, source),
                sort_keys=True,
            ))
        n = len(texts)
        return pa.table({
            "conv_id": pa.array([f"csv:{path}"] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["tool"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(["csv_import"] * n, pa.string()),
        })

    return ds.map_batches(to_payloads, batch_format="pyarrow")
