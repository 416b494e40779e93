"""Conformance of the deterministic KG core against goldens generated from
the REFERENCE's own deterministic path (scripts/gen_goldens.py ran the
reference's uuid_planner_node + graph_generator_node with frozen ontology
maps; outputs committed under tests/goldens/).

The gate is P/R >= 0.95 on (subj, pred, obj, obj_datatype); these tests
assert exact set equality, which is stronger.
"""

import json
from pathlib import Path

import pytest

from case_uco_ontology_map_ray.config import (
    ONTOLOGY_MAPS,
    RESERVED_RECORD_KEYS,
)
from case_uco_ontology_map_ray.kg.custom_facets import generate_custom_facets
from case_uco_ontology_map_ray.kg.mapper import ArtifactMapper
from case_uco_ontology_map_ray.kg.records import extract_records

GOLDENS = Path(__file__).parent / "goldens"

PREFETCH_PAYLOAD = {
    "artifact_type": "Windows Prefetch execution cache records",
    "description": "Windows Prefetch files parsed from C:\\Windows\\Prefetch",
    "source": "prefetch_parser",
    "records": [
        {
            "SourceFilename": "C\\Windows\\Prefetch\\MALICIOUS.EXE-12345678.pf",
            "ExecutableName": "MALICIOUS.EXE",
            "PrefetchHash": "12345678",
            "RunCount": 3,
            "LastRunTime": "2025-09-17T10:35:15Z",
            "FileCreatedTime": "2025-09-17T10:30:00Z",
            "FileModifiedTime": "2025-09-17T10:35:15Z",
            "VolumeSerialNumber": "1234-ABCD",
            "ReferencedPaths": [
                "C\\Windows\\System32\\MALICIOUS.EXE",
                "C\\Windows\\System32\\kernel32.dll",
            ],
        },
        {
            "SourceFilename": "C\\Windows\\Prefetch\\NOTEPAD.EXE-9C1234AB.pf",
            "ExecutableName": "NOTEPAD.EXE",
            "PrefetchHash": "9C1234AB",
            "RunCount": 12,
            "LastRunTime": "2024-11-02T08:14:27Z",
            "FileCreatedTime": "2024-07-01T12:00:00Z",
            "FileModifiedTime": "2024-11-02T08:14:27Z",
            "VolumeSerialNumber": "DEAD-BEEF",
            "ReferencedPaths": [
                "C\\Windows\\System32\\notepad.exe",
                "C\\Windows\\Fonts\\segoeui.ttf",
            ],
        },
    ],
}

MFT_PAYLOAD = {
    "artifact_type": "MFT Records",
    "description": "Master File Table records containing filesystem metadata and file system structure information",
    "source": "NTFS filesystem analysis",
    "records": [
        {
            "EntryNumber": 42,
            "SequenceNumber": 3,
            "ParentEntryNumber": 5,
            "FullPath": "\\Windows\\Prefetch\\MALICIOUS.EXE-12345678.pf",
            "InUse": True,
            "SI_Created": "2025-09-17T10:30:00Z",
            "SI_Modified": "2025-09-17T10:35:15Z",
            "SI_Accessed": "2025-09-17T10:35:15Z",
            "FN_Created": "2025-09-17T10:30:00Z",
            "FN_Modified": "2025-09-17T10:35:15Z",
        },
        {
            "EntryNumber": 314,
            "SequenceNumber": 1,
            "ParentEntryNumber": 200,
            "FullPath": "\\Users\\Alice\\Documents\\report.docx",
            "InUse": True,
            "SI_Created": "2024-10-05T09:12:00Z",
            "SI_Modified": "2025-01-20T16:33:11Z",
            "SI_Accessed": "2025-01-22T07:02:45Z",
            "FN_Created": "2024-10-05T09:12:00Z",
            "FN_Modified": "2025-01-20T16:33:11Z",
        },
    ],
}

MINIMAL_MAP = {
    "artifacts": [],
    "classes": ["ObservableObject"],
    "facets": [],
    "properties": {"ObservableObject": []},
    "relationships": [],
    "analysis": "",
    "additional_details": {},
}


def load_golden(name):
    with open(GOLDENS / f"{name}_triples.json") as f:
        return {tuple(t) for t in json.load(f)}


def run_payload(payload, ontology_map):
    mapper = ArtifactMapper(ontology_map)
    triples = set()
    for record in extract_records(payload):
        _, recs = mapper.process_record(record)
        triples.update(recs)
    return triples


def test_prefetch_matches_reference_golden():
    got = run_payload(PREFETCH_PAYLOAD, ONTOLOGY_MAPS["Windows Prefetch execution cache records"])
    want = load_golden("prefetch")
    assert got == want


def test_mft_matches_reference_golden():
    got = run_payload(MFT_PAYLOAD, ONTOLOGY_MAPS["MFT Records"])
    want = load_golden("mft")
    assert got == want


# Round-4 breadth types (registry run keys / EVTX / cookies): goldens pinned
# from the reference deterministic path given the same frozen maps + aliases
# (scripts/gen_goldens.py round-4 section).
REGISTRY_PAYLOAD = {
    "artifact_type": "Windows Registry run key entries",
    "description": "Run/RunOnce key values parsed from the registry hives",
    "source": "registry_parser",
    "records": [
        {"KeyPath": "HKLM\\Software\\Microsoft\\Windows\\CurrentVersion\\Run",
         "ValueName": "Updater12", "ValueData": "C:\\ProgramData\\evil.exe",
         "LastWriteTime": "2025-01-02T03:04:05Z", "SubkeyCount": 4},
        {"KeyPath": "HKCU\\Software\\Microsoft\\Windows\\CurrentVersion\\Run",
         "ValueName": "Sync", "ValueData": "C:\\Users\\u\\sync.exe",
         "LastWriteTime": "2025-02-03T04:05:06Z", "SubkeyCount": 0},
    ],
}
EVTX_PAYLOAD = {
    "artifact_type": "Windows Event Log records",
    "description": "EVTX records parsed from the Security channel",
    "source": "evtx_parser",
    "records": [
        {"EventID": "4624", "RecordNumber": "112233", "Channel": "Security",
         "Provider": "Microsoft-Windows-Security-Auditing",
         "TimeCreated": "2025-01-02T03:04:05Z",
         "Message": "An account was successfully logged on",
         "Level": "Information"},
        {"EventID": "4625", "RecordNumber": "112234", "Channel": "Security",
         "Provider": "Microsoft-Windows-Security-Auditing",
         "TimeCreated": "2025-01-02T03:05:06Z",
         "Message": "An account failed to log on", "Level": "Warning"},
    ],
}
COOKIE_PAYLOAD = {
    "artifact_type": "Browser cookie records",
    "description": "Cookie rows parsed from the browser profile",
    "source": "cookie_parser",
    "records": [
        {"CookieName": "session_id", "CookiePath": "/", "HostKey": ".example.com",
         "CreationTime": "2025-01-02T03:04:05Z",
         "LastAccessTime": "2025-01-03T03:04:05Z",
         "ExpirationTime": "2025-02-02T03:04:05Z", "IsSecure": True},
        {"CookieName": "tracker", "CookiePath": "/app", "HostKey": ".vendor.net",
         "CreationTime": "2025-03-02T03:04:05Z",
         "LastAccessTime": "2025-03-03T03:04:05Z",
         "ExpirationTime": "2025-04-02T03:04:05Z", "IsSecure": False},
    ],
}


@pytest.mark.parametrize(
    "golden,payload",
    [("registry", REGISTRY_PAYLOAD), ("evtx", EVTX_PAYLOAD),
     ("cookie", COOKIE_PAYLOAD)],
)
def test_round4_frozen_types_match_reference_golden(golden, payload):
    got = run_payload(payload, ONTOLOGY_MAPS[payload["artifact_type"]])
    assert got == load_golden(golden)


@pytest.mark.parametrize(
    "name,payload",
    [
        (
            "custom_mft",
            {
                "artifact_type": "MFT Record",
                "description": "MFT record with extended attributes",
                "source": "ntfs_analysis_tool",
                "record": {
                    "EntryNumber": 77,
                    "SecurityId": "S-1-5-21-1004",
                    "ObjectIdFileDroid": "droid-0001",
                    "ZoneIdContents": "[ZoneTransfer] ZoneId=3",
                },
            },
        ),
        (
            "custom_usn",
            {
                "artifact_type": "NTFS USN journal records",
                "description": "USN change-journal entries from the NTFS volume",
                "source": "usn_parser",
                "record": {
                    "Usn": 120034,
                    "FileName": "evil.exe",
                    "Reason": "FILE_CREATE",
                    "Timestamp": "2025-01-02T03:04:05Z",
                },
            },
        ),
        (
            "custom_iot",
            {
                "artifact_type": "IoT Sensor Reading",
                "description": "sensor data",
                "source": "iot_gateway",
                "record": {
                    "temperature": 23.5,
                    "humidity": 41,
                    "active": True,
                    "sensor": "t-100",
                },
            },
        ),
    ],
)
def test_custom_facet_path_matches_reference_golden(name, payload):
    record = payload["record"]
    base = ArtifactMapper(MINIMAL_MAP)
    unmapped = base.unmapped_fields(record)
    details = [{"field": f, "sampleValue": record.get(f)} for f in unmapped]
    custom, updated_map, ttl = generate_custom_facets(
        details, record, payload["artifact_type"], MINIMAL_MAP
    )
    mapper = ArtifactMapper(updated_map, custom_facets=custom)
    triples = set()
    for rec in extract_records(payload):
        _, out = mapper.process_record(rec)
        triples.update(out)
    assert triples == load_golden(name)
    # TTL stub content (mirrors reference custom_facet.py:206-215)
    assert "rdfs:subClassOf uco-core:Facet" in ttl
    with open(GOLDENS / f"{name}_customfacets.json") as f:
        golden_cf = json.load(f)
    assert custom["facetDefinitions"] == golden_cf["customFacets"]["facetDefinitions"]
    assert ttl == golden_cf["ttl"]


def test_uuid_determinism_and_idempotence():
    mapper = ArtifactMapper(ONTOLOGY_MAPS["MFT Records"])
    recs = extract_records(MFT_PAYLOAD)
    fp1, t1 = mapper.process_record(recs[0])
    fp2, t2 = ArtifactMapper(ONTOLOGY_MAPS["MFT Records"]).process_record(recs[0])
    assert fp1 == fp2 and t1 == t2


def test_unmapped_field_detection_excludes_reserved():
    mapper = ArtifactMapper(MINIMAL_MAP)
    rec = extract_records(
        {"artifact_type": "X", "description": "d", "source": "s", "record": {"Foo": 1}}
    )[0]
    assert mapper.unmapped_fields(rec, reserved=RESERVED_RECORD_KEYS) == ["Foo"]


REL_MAP = {
    "artifacts": ["Windows Prefetch execution cache records"],
    "classes": ["WindowsPrefetch"],
    "facets": ["WindowsPrefetchFacet"],
    "properties": {
        "WindowsPrefetch": [],
        "WindowsPrefetchFacet": ["applicationFileName", "timesExecuted"],
    },
    "relationships": [
        {"type": "Connected_To", "source": "WindowsPrefetch", "target": "File"},
        {"type": "Contained_Within", "source": "WindowsPrefetch", "target": "Volume"},
    ],
    "analysis": "frozen fixture with relationships",
    "additional_details": {
        "propertyFieldMap": {
            "WindowsPrefetchFacet": {
                "timesExecuted": ["RunCount"],
                "applicationFileName": ["SourceFilename", "ExecutableName"],
            },
            "NonexistentOwner": {"someProp": ["PrefetchHash"]},
        }
    },
}


def test_relationship_slots_and_property_field_map_match_reference_golden():
    """Pins semantics untested by the other goldens: relationship slots are
    gated on payload (excluded when empty), explicit propertyFieldMap rows
    apply before the heuristic pass, and unknown owners route to the
    primary node (reference uuid_planner.py:155-175, graph_generator.py
    284-305)."""
    payload = {
        "artifact_type": "Windows Prefetch execution cache records",
        "description": "prefetch with relationship slots",
        "source": "prefetch_parser",
        "record": {
            "SourceFilename": "C\\Windows\\Prefetch\\APP.EXE-AAAA1111.pf",
            "RunCount": 7,
            "PrefetchHash": "AAAA1111",
        },
    }
    got = run_payload(payload, REL_MAP)
    assert got == load_golden("relationships")
    # no relationship nodes were emitted (no payload routed to them)
    assert not any("ObservableRelationship" in o for _, _, o, _ in got)


def test_relationship_slot_with_payload_included():
    """When a propertyFieldMap owner slugs to a relationship slot, the slot
    carries payload and the ObservableRelationship node IS emitted."""
    import copy

    rel_map2 = copy.deepcopy(REL_MAP)
    rel_map2["additional_details"]["propertyFieldMap"]["Relationship Connected_To 0"] = {
        "kindOfRelationship": ["RelKind"]
    }
    payload = {
        "artifact_type": "Windows Prefetch execution cache records",
        "description": "prefetch with relationship slots",
        "source": "prefetch_parser",
        "record": {
            "SourceFilename": "C\\Windows\\Prefetch\\APP.EXE-AAAA1111.pf",
            "RunCount": 7,
            "PrefetchHash": "AAAA1111",
            "RelKind": "Connected_To",
        },
    }
    got = run_payload(payload, rel_map2)
    assert got == load_golden("relationships_payload")
    assert any(o == "uco-observable:ObservableRelationship" for _, _, o, _ in got)
