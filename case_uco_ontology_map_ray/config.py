"""Static configuration: namespaces, JSON-LD context, alias maps, frozen
ontology maps per artifact type.

Semantics mirror the reference's deterministic path (not its code):
- UUID namespaces: reference ``tools.py:26-28`` (uuid5 chain rooted at
  ``uuid5(NAMESPACE_DNS, 'case.uco.org')``).
- JSON-LD @context: reference ``agents/graph_generator.py:19-35``.
- PROPERTY_ALIAS_MAP: reference ``agents/uuid_planner.py:9-23`` plus the
  prefetch aliases its smoke test injects (``tests/smoke_pipeline.py:58-65``).
- Frozen ontology maps: shaped per reference ``schemas.py:9-17``; contents
  follow FIXTURES.md §3 (the LLM-free fixture strategy the reference's own
  smoke test uses).
"""

from __future__ import annotations

import uuid

# --- Deterministic UUID namespaces (reference tools.py:26-28) ---------------
NS_CASE = uuid.uuid5(uuid.NAMESPACE_DNS, "case.uco.org")
NS_RECORD = uuid.uuid5(NS_CASE, "record")
NS_SLOT = uuid.uuid5(NS_CASE, "slot")
# Engine-specific namespace for canonical entity IDs (entity linking stage).
NS_ENTITY = uuid.uuid5(NS_CASE, "entity")

# --- JSON-LD context (reference graph_generator.py:19-35) -------------------
DEFAULT_CONTEXT = {
    "case-investigation": "https://ontology.caseontology.org/case/investigation/",
    "kb": "http://example.org/kb/",
    "drafting": "http://example.org/ontology/drafting/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "uco-action": "https://ontology.unifiedcyberontology.org/uco/action/",
    "core": "https://ontology.unifiedcyberontology.org/uco/core/",
    "identity": "https://ontology.unifiedcyberontology.org/uco/identity/",
    "location": "https://ontology.unifiedcyberontology.org/uco/location/",
    "observable": "https://ontology.unifiedcyberontology.org/uco/observable/",
    "tool": "https://ontology.unifiedcyberontology.org/uco/tool/",
    "types": "https://ontology.unifiedcyberontology.org/uco/types/",
    "vocabulary": "https://ontology.unifiedcyberontology.org/uco/vocabulary/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dfc-ext": "https://www.w3.org/dfc-ext/",
}

# --- Field-name -> candidate-ontology-property aliases ----------------------
# Base map: reference uuid_planner.py:9-23 (MFT-flavoured defaults).
BASE_PROPERTY_ALIAS_MAP: dict[str, list[str]] = {
    "entrynumber": ["mftFileID", "entryID"],
    "sequencenumber": ["sequenceNumber", "entrySequence"],
    "parententrynumber": ["mftParentID"],
    "fullpath": ["filePath"],
    "inuse": ["allocationStatus", "isAllocated"],
    "si_created": ["mftFileNameCreatedTime", "createdTime"],
    "si_modified": ["mftFileNameModifiedTime", "modifiedTime"],
    "si_accessed": ["mftFileNameAccessedTime", "accessedTime"],
    "fn_created": ["createdTime"],
    "fn_modified": ["modifiedTime"],
    "size": ["sizeInBytes"],
    "filename": ["fileName"],
    "filesystem": ["fileSystemType"],
}

# Prefetch aliases the reference smoke test injects (smoke_pipeline.py:58-65).
PREFETCH_ALIAS_MAP: dict[str, list[str]] = {
    "sourcefilename": ["applicationFileName", "fileName", "filePath", "accessedFile"],
    "referencedpaths": ["accessedDirectory", "accessedFile"],
    "runcount": ["timesExecuted"],
    "filecreatedtime": ["firstRun"],
    "filemodifiedtime": ["lastRun"],
    "volumeserialnumber": ["volume"],
}

# Round-4 artifact-type breadth (VERDICT r3 'What's missing' #3): aliases for
# the registry / event-log / browser-cookie frozen maps below. Aliases are
# inert for types whose map doesn't declare the target property (the matcher
# only routes onto map-declared properties), so one global dict is safe.
EXTENDED_ALIAS_MAP: dict[str, list[str]] = {
    # Windows Registry run keys -> WindowsRegistryKeyFacet
    "keypath": ["key"],
    "lastwritetime": ["modifiedTime"],
    "subkeycount": ["numberOfSubkeys"],
    # EVTX event records -> EventRecordFacet
    "eventid": ["eventID"],
    "recordnumber": ["eventRecordID"],
    "channel": ["eventRecordServiceName"],
    "message": ["eventRecordText"],
    "level": ["eventType"],
    "timecreated": ["startTime"],
    # Browser cookies -> BrowserCookieFacet
    "cookiename": ["cookieName"],
    "cookiepath": ["cookiePath"],
    "creationtime": ["observableCreatedTime"],
    "lastaccesstime": ["accessedTime"],
    "expirationtime": ["expirationTime"],
    "issecure": ["isSecure"],
}

PROPERTY_ALIAS_MAP: dict[str, list[str]] = {
    **BASE_PROPERTY_ALIAS_MAP,
    **PREFETCH_ALIAS_MAP,
    **EXTENDED_ALIAS_MAP,
}

# --- Frozen ontology maps per artifact type (FIXTURES.md §3) ----------------
# Shape per reference schemas.py:9-17: {artifacts, classes, facets,
# properties{owner->[prop]}, relationships, analysis, additional_details}.
ONTOLOGY_MAPS: dict[str, dict] = {
    "Windows Prefetch execution cache records": {
        "artifacts": ["Windows Prefetch execution cache records"],
        "classes": ["WindowsPrefetch"],
        "facets": ["WindowsPrefetchFacet", "FileFacet"],
        "properties": {
            "WindowsPrefetch": [],
            "WindowsPrefetchFacet": [
                "applicationFileName", "timesExecuted", "firstRun",
                "lastRun", "volume", "accessedFile", "accessedDirectory",
            ],
            "FileFacet": ["fileName", "filePath", "createdTime", "modifiedTime"],
        },
        # Live relationship slot (reference uuid_planner.py:260-265): the
        # prefetch file is Contained_Within its volume. The propertyFieldMap
        # rows below route record fields onto the relationship slot
        # (reference uuid_planner.py:155-175 routes explicit rows to the
        # owner slug, which may be a relationship slug); payload gating then
        # includes the ObservableRelationship node (graph_generator.py:292).
        "relationships": [
            {"type": "Contained_Within", "source": "WindowsPrefetch",
             "target": "Volume"},
        ],
        "analysis": "frozen fixture",
        "additional_details": {
            "propertyFieldMap": {
                "relationship_Contained_Within_0": {
                    "core:source": ["SourceFilename"],
                    "core:target": ["VolumeSerialNumber"],
                },
            },
        },
    },
    "MFT Records": {
        "artifacts": ["MFT Records"],
        "classes": ["File"],
        "facets": ["FileFacet", "MftRecordFacet"],
        "properties": {
            "File": [],
            "FileFacet": [
                "fileName", "filePath", "createdTime", "modifiedTime",
                "accessedTime", "allocationStatus", "sizeInBytes",
            ],
            "MftRecordFacet": [
                "mftFileID", "entryID", "sequenceNumber", "entrySequence",
                "mftParentID", "mftFileNameCreatedTime",
                "mftFileNameModifiedTime", "mftFileNameAccessedTime",
            ],
        },
        "relationships": [],
        "analysis": "frozen fixture",
        "additional_details": {},
    },
    # --- Round-4 breadth: registry / event log / browser cookies ----------
    # Property vocabularies follow the vendored UCO SHACL shapes
    # (ontology/index.py shapes_for): WindowsRegistryKeyFacet declares
    # key/modifiedTime/numberOfSubkeys; EventRecordFacet declares
    # eventID/eventRecordID/eventRecordServiceName/eventRecordText/
    # eventType/startTime; BrowserCookieFacet declares cookieName/
    # cookiePath/observableCreatedTime/accessedTime/expirationTime/
    # isSecure. Unmapped fields (ValueName/ValueData, Provider, HostKey)
    # are intentionally left unmapped — object-property targets (IRIs)
    # can't carry literals, the same gap the reference's researcher leaves.
    "Windows Registry run key entries": {
        "artifacts": ["Windows Registry run key entries"],
        "classes": ["WindowsRegistryKey"],
        "facets": ["WindowsRegistryKeyFacet"],
        "properties": {
            "WindowsRegistryKey": [],
            "WindowsRegistryKeyFacet": ["key", "modifiedTime", "numberOfSubkeys"],
        },
        "relationships": [],
        "analysis": "frozen fixture",
        "additional_details": {},
    },
    "Windows Event Log records": {
        "artifacts": ["Windows Event Log records"],
        "classes": ["EventRecord"],
        "facets": ["EventRecordFacet"],
        "properties": {
            "EventRecord": [],
            "EventRecordFacet": [
                "eventID", "eventRecordID", "eventRecordServiceName",
                "eventRecordText", "eventType", "startTime",
            ],
        },
        "relationships": [],
        "analysis": "frozen fixture",
        "additional_details": {},
    },
    "Browser cookie records": {
        "artifacts": ["Browser cookie records"],
        "classes": ["BrowserCookie"],
        "facets": ["BrowserCookieFacet"],
        "properties": {
            "BrowserCookie": [],
            "BrowserCookieFacet": [
                "cookieName", "cookiePath", "observableCreatedTime",
                "accessedTime", "expirationTime", "isSecure",
            ],
        },
        "relationships": [],
        "analysis": "frozen fixture",
        "additional_details": {},
    },
}

# Artifact types with no frozen map fall through to the custom-facet path
# (deterministic dfc-ext extension facet generation, reference
# custom_facet.py:122-222).
FALLBACK_ONTOLOGY_MAP: dict = {
    "artifacts": [],
    "classes": ["ObservableObject"],
    "facets": [],
    "properties": {"ObservableObject": []},
    "relationships": [],
    "analysis": "fallback: unknown artifact type",
    "additional_details": {},
}

# Metadata keys flattened into each record on multi-record fan-out
# (reference uuid_planner.py:30-66); also the reserved keys excluded from
# custom-facet generation (custom_facet.py:285-297).
RESERVED_RECORD_KEYS = ("artifact_type", "description", "source")
