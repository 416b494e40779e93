"""Multimodal binary-column stage tests (fake codec; real Ray plumbing)."""

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_media_features_pipeline():
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.multimodal import (
        media_features,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(60))
    out = media_features(ds, batch_size=16, concurrency=2).to_pandas()
    assert len(out) == 60
    assert (out.width * out.height * out.channels + 9 == out.n_bytes).all()
    assert out.mean_intensity.between(0, 255).all()
    assert out.hist16.map(len).eq(16).all()
    # histogram mass == pixel count
    assert (out.hist16.map(sum) == out.width * out.height * out.channels).all()
    # deterministic across runs
    again = media_features(rd.from_arrow(synth_media_table(60)),
                           batch_size=16, concurrency=2).to_pandas()
    assert list(out.sort_values("media_id").checksum) == list(
        again.sort_values("media_id").checksum
    )


def test_media_resize_roundtrip():
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.multimodal import (
        decode_image,
        media_resize,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(12))
    out = media_resize(ds, width=8, height=8, batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 12
    for p in out.payload:
        arr = decode_image(bytes(p))
        assert arr.shape[:2] == (8, 8)
