"""Resumable execution / lineage manifest tests."""

import json
from pathlib import Path

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_resume_skips_completed_chunks(tmp_path):
    from case_uco_ontology_map_ray.sources.transcripts import synthesize_transcripts
    from case_uco_ontology_map_ray.state.lineage import triples_resumable

    src = str(tmp_path / "transcripts")
    synthesize_transcripts(src, num_conversations=20, mean_turns=9,
                           conversations_per_block=5)

    out = str(tmp_path / "triples")
    s1 = triples_resumable(src, out, chunk_files=2)
    assert s1["done"] == s1["chunks"] > 1
    assert s1["skipped"] == 0
    assert s1["rows"] > 0

    # second run: everything skipped, same row count
    s2 = triples_resumable(src, out, chunk_files=2)
    assert s2["done"] == 0
    assert s2["skipped"] == s1["chunks"]
    assert s2["rows"] == s1["rows"]

    # simulate a failed partition: delete one manifest -> only it reruns
    manifests = sorted(Path(out, "_manifests").glob("part-*.json"))
    manifests[1].unlink()
    s3 = triples_resumable(src, out, chunk_files=2)
    assert s3["done"] == 1 and s3["skipped"] == s1["chunks"] - 1
    assert s3["rows"] == s1["rows"]

    # manifests carry lineage back to inputs
    m = json.loads(manifests[0].read_text())
    assert m["status"] == "done" and len(m["inputs"]) > 0 and m["rows"] > 0

    # deterministic IDs: the rerun partition is byte-identical content-wise
    import ray.data as rd

    total = rd.read_parquet(out, file_extensions=["parquet"]).count()
    assert total == s1["rows"]


def test_incremental_ingest_processes_only_new_files(tmp_path):
    """Appending new input files reruns only the chunks whose file lists
    changed — incremental ingest without reprocessing history."""
    import shutil

    from case_uco_ontology_map_ray.sources.transcripts import synthesize_transcripts
    from case_uco_ontology_map_ray.state.lineage import triples_resumable

    src = str(tmp_path / "transcripts")
    synthesize_transcripts(src, num_conversations=8, mean_turns=9,
                           conversations_per_block=2)
    out = str(tmp_path / "triples")
    s1 = triples_resumable(src, out, chunk_files=2)
    assert s1["done"] == s1["chunks"]

    # "new data arrives": generate a disjoint conversation range elsewhere
    # and append its files to the input directory
    extra = str(tmp_path / "extra")
    import ray.data as rd

    from case_uco_ontology_map_ray.sources.transcripts import conversations_table

    rd.from_arrow(conversations_table(range(100, 104), 9)).write_parquet(extra)
    for i, f in enumerate(sorted(__import__("pathlib").Path(extra).glob("*.parquet"))):
        shutil.copy(f, f"{src}/zz_new_{i:03d}.parquet")

    s2 = triples_resumable(src, out, chunk_files=2)
    # old chunks skipped; only chunks covering the appended files ran
    assert s2["skipped"] >= s1["chunks"] - 1
    assert s2["done"] >= 1
    assert s2["rows"] > s1["rows"]
