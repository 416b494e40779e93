"""Unit tests for naming kernels, mirroring the reference's deterministic
test suite (reference tests/test_dynamic_custom_facet_naming.py:14-245)."""

from case_uco_ontology_map_ray.functions.naming import (
    extension_facet_name,
    infer_xsd_datatype,
    normalize_key,
    slugify,
    to_camel_case,
    tokenize,
)


def test_extension_facet_name_pascal_case():
    assert extension_facet_name("MFT Record") == "MftRecordExtensionFacet"
    assert extension_facet_name("Windows Prefetch") == "WindowsPrefetchExtensionFacet"
    assert extension_facet_name("Email Message") == "EmailMessageExtensionFacet"
    assert extension_facet_name("Network Log") == "NetworkLogExtensionFacet"


def test_extension_facet_name_edge_cases():
    assert extension_facet_name(None) == "UnknownArtifactExtensionFacet"
    assert extension_facet_name("") == "UnknownArtifactExtensionFacet"
    assert extension_facet_name("   ") == "UnknownArtifactExtensionFacet"
    assert extension_facet_name(42) == "UnknownArtifactExtensionFacet"
    assert extension_facet_name("!!!") == "UnknownArtifactExtensionFacet"


def test_extension_facet_name_mixed_separators():
    assert extension_facet_name("IoT sensor-reading") == "IotSensorReadingExtensionFacet"
    assert extension_facet_name("database_audit log") == "DatabaseAuditLogExtensionFacet"


def test_to_camel_case_lowercases_single_token():
    # Reference behaviour: first token fully lowercased -> runcount not runCount
    assert to_camel_case("RunCount") == "runcount"
    assert to_camel_case("zone_id_contents") == "zoneIdContents"
    assert to_camel_case("Security-Id") == "securityId"


def test_slugify_and_normalize():
    assert slugify("Windows Prefetch-Facet") == "windows_prefetch_facet"
    assert normalize_key("SI_Created") == "si_created"
    assert normalize_key("  Weird  Key!! ") == "weird_key"


def test_tokenize_camel_and_separators():
    assert tokenize("applicationFileName") == ["application", "file", "name"]
    assert tokenize("dfc-ext:securityId") == ["dfc", "ext", "security", "id"]
    assert tokenize("si_created") == ["si", "created"]


def test_infer_xsd_datatype():
    assert infer_xsd_datatype(True) == "xsd:boolean"
    assert infer_xsd_datatype(3) == "xsd:integer"
    assert infer_xsd_datatype(2.5) == "xsd:decimal"
    assert infer_xsd_datatype("x") == "xsd:string"
    assert infer_xsd_datatype(None) == "xsd:string"


def test_fast_uuid5_matches_stdlib():
    import uuid as _uuid

    from case_uco_ontology_map_ray.config import NS_RECORD, NS_SLOT
    from case_uco_ontology_map_ray.functions.fingerprint import uuid5_str

    for ns in (NS_RECORD, NS_SLOT, _uuid.NAMESPACE_DNS):
        for name in ("", "abc", "conv-00000001:prefetch", "ünïcödé"):
            assert uuid5_str(ns, name) == str(_uuid.uuid5(ns, name))


def test_extension_facet_name_domain_agnostic():
    # mirrors reference tests/test_dynamic_custom_facet_naming.py:206-245
    assert extension_facet_name("Database Audit Log") == "DatabaseAuditLogExtensionFacet"
    assert extension_facet_name("Network Flow") == "NetworkFlowExtensionFacet"
    assert extension_facet_name("iot sensor reading") == "IotSensorReadingExtensionFacet"
    assert extension_facet_name("BROWSER HISTORY") == "BrowserHistoryExtensionFacet"
    assert extension_facet_name("API-Gateway_Access.Log") == "ApiGatewayAccessLogExtensionFacet"
