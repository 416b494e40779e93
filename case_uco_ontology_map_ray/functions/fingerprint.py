"""Record fingerprinting + deterministic UUID allocation.

The uuid5 chain is what makes every downstream stage idempotent and
restart-safe: re-running (or resuming) the pipeline on the same records
yields byte-identical IDs, so partial outputs can simply be overwritten
or skipped (SURVEY.md §4).

Semantics: reference ``tools.py:26-32,67-70`` — sha256 over canonical JSON
(sorted keys, tight separators), then
``record_uuid = uuid5(NS_RECORD, fingerprint)`` and
``slot_uuid = uuid5(NS_SLOT, f"{record_uuid}:{slug}")``
(``agents/uuid_planner.py:244-266``).
"""

from __future__ import annotations

import hashlib
import json
import uuid
from typing import Any

from ..config import NS_RECORD, NS_SLOT


def canonical_json(record: dict[str, Any]) -> str:
    return json.dumps(record, sort_keys=True, separators=(",", ":"))


def record_fingerprint(record: dict[str, Any]) -> str:
    """sha256 hex of the canonical JSON encoding (ref tools.py:67-70)."""
    return hashlib.sha256(canonical_json(record).encode("utf-8")).hexdigest()


def uuid5_str(namespace: uuid.UUID, name: str) -> str:
    return str(uuid.uuid5(namespace, name))


def record_uuid(fingerprint: str) -> str:
    return uuid5_str(NS_RECORD, fingerprint)


def slot_uuid(rec_uuid: str, slug: str) -> str:
    return uuid5_str(NS_SLOT, f"{rec_uuid}:{slug}")
