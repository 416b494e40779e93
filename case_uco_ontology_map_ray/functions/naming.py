"""Pure naming/normalization kernels.

Semantics match the reference's deterministic helpers (cited per function);
implementations are fresh and designed to be called inside vectorized
``map_batches`` bodies (precompiled regexes at module scope, no per-call
allocation beyond outputs).
"""

from __future__ import annotations

import re
from typing import Any

_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_CAMEL_BOUNDARY = re.compile(r"([a-z0-9])([A-Z])")
_TOKEN_SPLIT = re.compile(r"[^A-Za-z0-9]+")


def slugify(name: str) -> str:
    """Lower-case slug: spaces/dashes -> underscores (ref uuid_planner.py:26-27)."""
    return name.replace(" ", "_").replace("-", "_").lower()


def normalize_key(name: str) -> str:
    """Lower-case, collapse non-alnum runs to ``_``, strip edge underscores
    (ref uuid_planner.py:82-84)."""
    return _NON_ALNUM.sub("_", name.lower()).strip("_")


def tokenize(name: str) -> list[str]:
    """Split camelCase boundaries and ``_ - :`` separators into lower-case
    tokens (ref uuid_planner.py:86-89)."""
    spaced = _CAMEL_BOUNDARY.sub(r"\1 \2", name)
    spaced = spaced.replace("_", " ").replace("-", " ").replace(":", " ")
    return [tok for tok in spaced.lower().split() if tok]


def to_camel_case(name: str) -> str:
    """lowerCamelCase of a separator-delimited name (ref custom_facet.py:62-67).

    Note the reference lowercases the FIRST token entirely and capitalizes the
    rest, so ``RunCount`` -> ``runcount`` (single token) and
    ``zone_id_contents`` -> ``zoneIdContents``.
    """
    tokens = _TOKEN_SPLIT.split(name)
    if not tokens:
        return name
    first, *rest = tokens
    return first.lower() + "".join(tok.capitalize() for tok in rest)


def extension_facet_name(artifact_type: Any) -> str:
    """PascalCase + ``ExtensionFacet`` suffix, with ``UnknownArtifactExtensionFacet``
    fallback for None/empty/non-string (ref custom_facet.py:70-109)."""
    if not artifact_type or not isinstance(artifact_type, str):
        return "UnknownArtifactExtensionFacet"
    cleaned = artifact_type.strip()
    if not cleaned:
        return "UnknownArtifactExtensionFacet"
    tokens = [tok for tok in _TOKEN_SPLIT.split(cleaned) if tok]
    if not tokens:
        return "UnknownArtifactExtensionFacet"
    return "".join(tok.capitalize() for tok in tokens) + "ExtensionFacet"


def infer_xsd_datatype(value: Any) -> str:
    """Python value -> xsd tag (ref custom_facet.py:112-119). bool before int
    because bool is an int subclass."""
    if isinstance(value, bool):
        return "xsd:boolean"
    if isinstance(value, int):
        return "xsd:integer"
    if isinstance(value, float):
        return "xsd:decimal"
    return "xsd:string"


def qualify_property(prop_name: str) -> str:
    """Prefix bare property names with the observable namespace
    (ref uuid_planner.py:130-133)."""
    if ":" in prop_name:
        return prop_name
    return f"uco-observable:{prop_name}"


def iri_for(name: str) -> str:
    """Default type IRI in the observable namespace (ref uuid_planner.py:77-79)."""
    return f"uco-observable:{name}"
