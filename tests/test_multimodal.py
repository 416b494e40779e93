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


@pytest.mark.usefixtures("ray_session")
def test_frame_sample_explodes_and_composes_with_features():
    import numpy as np
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.multimodal import (
        _decode_fake_video, decode_image, frame_sample, media_features,
        synth_video_table)

    vids = synth_video_table(6, n_frames=8)
    frames = frame_sample(rd.from_arrow(vids), n_out=4, concurrency=2)
    df = frames.to_pandas().sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    # 4 uniformly spaced frames per video, ids 0..5
    assert len(df) == 24
    assert sorted(df.media_id.unique()) == list(range(6))
    assert list(df[df.media_id == 0].frame_idx) == [0, 2, 4, 7]

    # sampled frame content equals the source video's frame slice
    vid0 = _decode_fake_video(vids.column("payload")[0].as_py())
    f0 = decode_image(df[(df.media_id == 0) & (df.frame_idx == 2)]["payload"].iloc[0])
    assert np.array_equal(f0, vid0[2])

    # frames flow into the image feature stage unchanged (composed pipeline)
    feats = media_features(
        frame_sample(rd.from_arrow(vids), n_out=4, concurrency=2),
        concurrency=2).to_pandas()
    assert len(feats) == 24
    assert (feats.channels == 3).all()
