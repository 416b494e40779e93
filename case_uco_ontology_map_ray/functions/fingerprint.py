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

_NS_RECORD_BYTES = NS_RECORD.bytes
_NS_SLOT_BYTES = NS_SLOT.bytes
_sha1 = hashlib.sha1
_sha256 = hashlib.sha256


def canonical_json(record: dict[str, Any]) -> str:
    return json.dumps(record, sort_keys=True, separators=(",", ":"))


def record_fingerprint(record: dict[str, Any]) -> str:
    """sha256 hex of the canonical JSON encoding (ref tools.py:67-70)."""
    return _sha256(canonical_json(record).encode("utf-8")).hexdigest()


# variant nibble: (n & 0x3) | 0x8, precomputed per hex char
_VARIANT_NIBBLE = {c: "89ab"[int(c, 16) & 0x3] for c in "0123456789abcdef"}


def _uuid5_hex(ns_bytes: bytes, name: str) -> str:
    """RFC-4122 uuid5 string without UUID-object overhead (hot path).

    Works on the sha1 HEXdigest directly: the version nibble is the 13th hex
    char (forced to '5') and the variant nibble the 17th (masked via lookup)
    — ~25% faster than masking digest bytes. Identical output to
    ``str(uuid.uuid5(ns, name))`` — verified in tests.
    """
    x = _sha1(ns_bytes + name.encode("utf-8")).hexdigest()
    return f"{x[:8]}-{x[8:12]}-5{x[13:16]}-{_VARIANT_NIBBLE[x[16]]}{x[17:20]}-{x[20:32]}"


def uuid5_str(namespace: uuid.UUID, name: str) -> str:
    return _uuid5_hex(namespace.bytes, name)


def record_uuid(fingerprint: str) -> str:
    return _uuid5_hex(_NS_RECORD_BYTES, fingerprint)


def slot_uuid(rec_uuid: str, slug: str) -> str:
    return _uuid5_hex(_NS_SLOT_BYTES, f"{rec_uuid}:{slug}")
