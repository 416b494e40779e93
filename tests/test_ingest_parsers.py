"""Input normalization, fenced-JSON repair, mapping-table parsing tests
(reference parity: services.py:23-64, utils.py:57-91,
ontology_synthesizer.py:20-151)."""

import pytest

from case_uco_ontology_map_ray.functions.jsonx import (
    clean_json_payload,
    extract_fenced_json,
    extract_uuids,
)
from case_uco_ontology_map_ray.kg.mapping_tables import (
    coverage_stats,
    parse_markdown_mapping_tables,
    referenced_fields,
    unmapped_details,
)
from case_uco_ontology_map_ray.sources.ingest import (
    normalize_input,
    wrap_csv_payload,
)


def test_normalize_input_json_dict_and_text():
    out = normalize_input({"a": 1})
    assert out["format"] == "json" and out["raw_json"] == {"a": 1}
    out = normalize_input('{"x": [1, 2]}')
    assert out["format"] == "json" and out["raw_json"] == {"x": [1, 2]}
    out = normalize_input("just some notes about the case")
    assert out["format"] == "text" and out["raw_json"] is None


def test_normalize_input_csv():
    csv_text = "EntryNumber,FullPath\n42,\\Windows\\foo.pf\n314,\\Users\\doc.docx\n"
    out = normalize_input(csv_text)
    assert out["format"] == "csv"
    assert out["raw_json"][0]["EntryNumber"] == "42"
    assert len(out["raw_json"]) == 2


def test_wrap_csv_payload_single_and_multi():
    one = wrap_csv_payload([{"A": 1}], "MFT Records", "d", "s")
    assert one["record"] == {"A": 1} and one["artifact_type"] == "MFT Records"
    many = wrap_csv_payload([{"A": 1}, {"A": 2}], "MFT Records", None, None)
    assert len(many["records"]) == 2 and "description" not in many


def test_extract_fenced_json_with_repair():
    text = 'noise\n```json\n{"a": 1}\n```\nmore\n```json\n{"b": 2}\n```'
    assert extract_fenced_json(text) == {"b": 2}  # last fence wins
    broken = '```json\n{"a": 1} trailing garbage\n```'
    assert extract_fenced_json(broken) == {"a": 1}  # truncate-to-last-brace


def test_clean_json_payload_strips_comments():
    text = 'prefix {\n "a": 1, // comment\n "b": 2\n} suffix'
    assert clean_json_payload(text) == {"a": 1, "b": 2}


def test_extract_uuids():
    s = "invalid node 5526ecaf-dfff-504e-b328-0b0a5af104c9 and others"
    assert extract_uuids(s) == ["5526ecaf-dfff-504e-b328-0b0a5af104c9"]


def test_parse_markdown_mapping_tables():
    md = """
| PROPERTY | ORIGIN | TYPE | MAPS TO FIELD |
|----------|--------|------|---------------|
| timesExecuted | WindowsPrefetchFacet | xsd:integer | RunCount |
| filePath | | xsd:string | FullPath, SourceFilename |
| unmappedThing | FileFacet | xsd:string | N/A |
"""
    inverse = {"filePath": ["FileFacet"]}
    out = parse_markdown_mapping_tables(md, inverse)
    assert out["WindowsPrefetchFacet"]["timesExecuted"] == ["RunCount"]
    assert out["FileFacet"]["filePath"] == ["FullPath", "SourceFilename"]
    assert "unmappedThing" not in out.get("FileFacet", {})


def test_referenced_fields_and_unmapped_details():
    assert referenced_fields('maps record["RunCount"] and record.FullPath') == {
        "RunCount", "FullPath"
    }
    rec = {"Long": "x" * 200, "N": 5}
    det = unmapped_details(rec, ["Long", "N", "Missing"])
    by_field = {d["field"]: d for d in det}
    assert by_field["Long"]["isTruncated"] and len(by_field["Long"]["sampleValue"]) == 120
    assert by_field["N"]["sampleValue"] == 5 and by_field["N"]["valueType"] == "int"
    assert "sampleValue" not in by_field["Missing"]


def test_coverage_stats():
    rec = {"artifact_type": "X", "A": 1, "B": 2, "C": 3}
    st = coverage_stats(rec, ["C"], reserved=("artifact_type",))
    assert st == {"totalFields": 3, "mappedFields": 2, "unmappedFields": 1,
                  "coverage": 0.6667}


def test_loads_fast_matches_stdlib():
    """loads_fast (orjson-backed) must accept everything stdlib accepts and
    produce equal values — including the strict-mode fallbacks (NaN/Infinity
    literals, >64-bit ints) and unicode/escape edge cases."""
    import json
    import math

    from case_uco_ontology_map_ray.functions.jsonx import loads_fast

    def eq_typed(a, b):
        # int/float compare numerically equal in Python; parity must be
        # type-exact too (a >64-bit int parsed as float would change str())
        if isinstance(a, dict):
            return (isinstance(b, dict) and a.keys() == b.keys()
                    and all(eq_typed(a[k], b[k]) for k in a))
        if isinstance(a, list):
            return (isinstance(b, list) and len(a) == len(b)
                    and all(eq_typed(x, y) for x, y in zip(a, b)))
        return type(a) is type(b) and a == b

    cases = [
        '{"a": 1, "b": [1.5, "x", null, true]}',
        '{"nested": {"deep": {"k": "v\\u00e9\\n\\t"}}}',
        '123456789012345678901234567890',           # > 64-bit int
        '{"usn": 18446744073709551616}',             # 2^64: float-equal trap
        '{"neg": -9223372036854775809}',             # < i64 min
        '-1e308', '"\\ud83d\\ude00"', '[]', '{}',
        '{"dup": 1, "dup": 2}',                      # last-wins both parsers
    ]
    for c in cases:
        assert eq_typed(loads_fast(c), json.loads(c)), c
    # stdlib extensions orjson rejects: fallback must keep them parseable
    assert math.isnan(loads_fast("NaN"))
    assert loads_fast("Infinity") == float("inf")
    # invalid input raises ValueError exactly like stdlib
    with pytest.raises(ValueError):
        loads_fast('{"broken": ')


def test_process_record_into_fp_threading_identical():
    """Passing the precomputed fingerprint must change nothing: same fp,
    same triples, byte for byte."""
    from case_uco_ontology_map_ray.functions.fingerprint import (
        record_fingerprint,
    )
    from case_uco_ontology_map_ray.stages.kg_stage import TurnTriples

    record = {
        "artifact_type": "windows_prefetch",
        "SourceFilename": "NOTEPAD.EXE-D8414F97.pf",
        "ExecutableName": "NOTEPAD.EXE",
        "RunCount": 7,
    }
    stage = TurnTriples()
    mapper = stage._mapper_for(record["artifact_type"], record)
    cols_a = ([], [], [], [])
    fp_a, n_a = mapper.process_record_into(dict(record), *cols_a)
    fp = record_fingerprint(record)
    cols_b = ([], [], [], [])
    fp_b, n_b = mapper.process_record_into(dict(record), *cols_b, fp=fp)
    assert fp_a == fp_b == fp
    assert n_a == n_b and cols_a == cols_b


def test_read_transcripts_any_formats_equivalent(ray_session, tmp_path):
    """parquet / jsonl / csv readers produce the identical canonical table,
    and the KG construction emits the identical triple multiset from each
    (embedded JSON payloads must survive CSV quoting)."""
    import pandas as pd
    import pyarrow as pa

    from case_uco_ontology_map_ray.pipelines.kg import triples_from_transcripts
    from case_uco_ontology_map_ray.sources.transcripts import (
        conversations_table,
        read_transcripts_any,
    )

    t = conversations_table(list(range(6)), mean_turns=8)
    pq_dir, jl, cs = tmp_path / "pq", tmp_path / "t.jsonl", tmp_path / "t.csv"
    pq_dir.mkdir()
    import pyarrow.parquet as pq

    pq.write_table(t, pq_dir / "part0.parquet")
    df = t.to_pandas()
    df_out = df.copy()
    df_out["ts"] = df_out["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    df_out.to_json(jl, orient="records", lines=True)
    df_out.to_csv(cs, index=False)

    frames = {}
    for fmt, path in [("parquet", str(pq_dir)), ("jsonl", str(jl)),
                      ("csv", str(cs))]:
        ds = read_transcripts_any(path, fmt=fmt)
        f = (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
             .reset_index(drop=True))
        assert list(f.columns) == ["conv_id", "turn_idx", "role", "text",
                                   "tool", "ts"]
        frames[fmt] = f
    pd.testing.assert_frame_equal(frames["parquet"], frames["jsonl"])
    pd.testing.assert_frame_equal(frames["parquet"], frames["csv"])

    def triple_key(src, fmt):
        tr = (triples_from_transcripts(read_transcripts_any(src, fmt=fmt))
              .to_pandas())
        return (tr.sort_values(["subj", "pred", "obj", "conv_id", "turn_idx"])
                .reset_index(drop=True))
    base = triple_key(str(pq_dir), "parquet")
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, triple_key(str(jl), "jsonl"))
    pd.testing.assert_frame_equal(base, triple_key(str(cs), "csv"))
