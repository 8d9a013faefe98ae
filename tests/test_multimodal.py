"""Multimodal actor stages: real image features, real PCM16-WAV audio,
real uncompressed-AVI video frame sampling (plus the honest gates for
codecs this container can't decode)."""

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


def test_audio_stub_raises_without_fake_for_non_wav():
    ex = mm.AudioFeatureExtractor(allow_fake=False)
    batch = pa.table({"clip_id": ["c1"], "bytes": [b"\x00\x01"]})
    with pytest.raises(NotImplementedError):
        ex(batch)


def test_audio_wav_decode_real(ray_session):
    """WAV/PCM16 parsing is pure struct — no allow_fake needed."""
    import ray.data as rd

    from stack_trace_deduplication_ray.functions import codecs as C

    t = np.arange(16000, dtype=np.float64) / 16000.0
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    silence = np.zeros(8000, dtype=np.float64)
    ds = rd.from_items(
        [
            {"clip_id": "tone", "bytes": C.encode_wav(tone, 16000)},
            {"clip_id": "quiet", "bytes": C.encode_wav(silence, 8000)},
        ]
    )
    out = (
        ds.map_batches(
            mm.AudioFeatureExtractor,
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .set_index("clip_id")
    )
    assert out.loc["tone", "sample_rate"] == 16000
    assert out.loc["tone", "n_samples"] == 16000
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert abs(out.loc["tone", "rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert out.loc["tone", "zero_crossings"] > 800
    assert out.loc["quiet", "rms"] == 0.0
    assert out.loc["quiet", "sample_rate"] == 8000


def test_wav_roundtrip_and_stereo_downmix():
    from stack_trace_deduplication_ray.functions import codecs as C

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, 1000)
    y, rate = C.decode_wav(C.encode_wav(x, 22050))
    assert rate == 22050
    assert len(y) == 1000
    assert np.abs(y - x).max() < 1.0 / 32000  # PCM16 quantization bound
    with pytest.raises(ValueError):
        C.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        C.decode_wav(b"plainly not audio")


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


def _avi_clip(seed: int, n_frames: int = 40, size=(16, 16)) -> bytes:
    from stack_trace_deduplication_ray.functions import codecs as C

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (*size, 3), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    return C.encode_avi_rgb(frames, fps=10)


def test_avi_roundtrip_exact():
    from stack_trace_deduplication_ray.functions import codecs as C

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (17, 23, 3), dtype=np.uint8) for _ in range(5)]
    out, fps = C.decode_avi_frames(C.encode_avi_rgb(frames, fps=24))
    assert fps == 24 and len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        C.decode_avi_frames(b"RIFFxxxxNOPE")


def test_video_frame_sampler_real_decode(ray_session):
    """One row per sampled frame, REAL AVI decode: the frame phash must
    equal the phash of the original frame array."""
    import ray.data as rd

    from stack_trace_deduplication_ray.functions import codecs as C

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(40)
    ]
    ds = rd.from_items(
        [{"video_id": "v1", "bytes": C.encode_avi_rgb(frames, fps=10)}]
    )
    out = ds.map_batches(
        mm.VideoFrameSampler,
        fn_constructor_kwargs={"every_n": 10},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 4  # 40 frames sampled every 10
    assert out.frame_idx.tolist() == [0, 10, 20, 30]
    assert out.video_id.eq("v1").all()
    assert out.decode_ok.all()
    for _, row in out.iterrows():
        assert row.frame_phash == C.phash64(frames[row.frame_idx])


def test_video_frame_sampler_gates_undecodable(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [
            {"video_id": "good", "bytes": _avi_clip(1, n_frames=12)},
            {"video_id": "bad", "bytes": b"\x00\x01 not a container"},
        ]
    )
    out = ds.map_batches(
        mm.VideoFrameSampler,
        fn_constructor_kwargs={"every_n": 5},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    good = out[out.video_id == "good"]
    bad = out[out.video_id == "bad"]
    assert good.decode_ok.all() and len(good) == 3
    assert len(bad) == 1 and not bad.decode_ok.iloc[0]
    assert bad.frame_idx.iloc[0] == -1
