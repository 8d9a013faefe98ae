"""Multimodal actor stages: real image features; stubbed audio/video
plumbing (schema, batch shape, one-to-many layout)."""

import numpy as np
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.stages import multimodal as mm


def test_image_features_real(ray_session, small_fixture_dir):
    import ray.data as rd

    images = rd.read_parquet(f"{small_fixture_dir}/images.parquet").limit(64)
    out = mm.image_features(images).to_pandas()
    assert len(out) == 64
    assert out.decode_ok.all()
    assert (out.width > 0).all() and (out.height > 0).all()
    assert out.mean_luma.between(0, 255).all()
    assert out.thumb.map(len).eq(64).all()


def test_image_features_undecodable_row(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "image_id": ["bad"],
                "bytes": [b"not an image"],
                "fmt": ["png"],
            }
        )
    )
    out = mm.image_features(ds).to_pandas()
    assert not out.decode_ok.iloc[0]
    assert out.width.iloc[0] == 0


def test_audio_stub_raises_without_fake():
    ex = mm.AudioFeatureExtractor(allow_fake=False)
    batch = pa.table({"clip_id": ["c1"], "bytes": [b"\x00\x01"]})
    with pytest.raises(NotImplementedError):
        ex(batch)


def test_audio_fake_plumbing(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    ds = rd.from_items(
        [
            {"clip_id": f"c{i}", "bytes": rng.integers(0, 256, 1000)
             .astype(np.uint8).tobytes()}
            for i in range(5)
        ]
    )
    out = ds.map_batches(
        mm.AudioFeatureExtractor,
        fn_constructor_kwargs={"allow_fake": True},
        batch_format="pyarrow",
        batch_size=2,
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 5
    assert (out.n_samples == 1000).all()
    assert (out.rms > 0).all()
    # deterministic: same payload -> same features
    out2 = ds.map_batches(
        mm.AudioFeatureExtractor,
        fn_constructor_kwargs={"allow_fake": True},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    assert out.sort_values("clip_id").reset_index(drop=True).equals(
        out2.sort_values("clip_id").reset_index(drop=True)
    )


def test_video_frame_sampler_one_to_many(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"video_id": "v1", "bytes": bytes(range(256)) * 40}]
    )
    out = ds.map_batches(
        mm.VideoFrameSampler,
        fn_constructor_kwargs={"every_n": 10, "allow_fake": True},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 4  # 40 pseudo-frames sampled every 10
    assert out.frame_idx.tolist() == [0, 10, 20, 30]
    assert out.video_id.eq("v1").all()
