import numpy as np
import pytest

from stack_trace_deduplication_ray.functions import codecs as C
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.fixtures.images import (
    _make_base_image,
    _perturb_image,
)


def u64(v):
    return np.array([v], dtype=np.int64).astype(np.uint64)


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(img)), img)


def test_png_signature():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = C.encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:32]


def test_qdct_roundtrip_psnr_above_40(dB=40.0):
    """Per-row invariant from BASELINE.json input_hint: lossy
    round-trips decode with PSNR >= 40 dB."""
    rng = np.random.default_rng(1)
    for _ in range(10):
        img = _make_base_image(rng, int(rng.choice([32, 48, 64])),
                               int(rng.choice([32, 48, 64])))
        dec = C.decode_qdct(C.encode_qdct(img, 90))
        assert C.psnr(img, dec) >= dB


def test_qdct_deterministic():
    rng = np.random.default_rng(2)
    img = _make_base_image(rng, 48, 48)
    assert C.encode_qdct(img, 90) == C.encode_qdct(img, 90)


def test_qdct_nonsquare_and_odd_padding():
    rng = np.random.default_rng(3)
    img = rng.integers(100, 130, (33, 50, 3)).astype(np.uint8)  # non-multiple of 8
    dec = C.decode_qdct(C.encode_qdct(img, 95))
    assert dec.shape == img.shape


def test_phash_stability_under_noise_and_reencode():
    """Hamming(phash) <= hamming_radius for both dup injection paths."""
    rng = np.random.default_rng(4)
    for _ in range(20):
        img = _make_base_image(rng, int(rng.choice([32, 48, 64])),
                               int(rng.choice([32, 48, 64])))
        ph = C.phash64(img)
        noisy = _perturb_image(rng, img)
        assert H.hamming64(u64(ph), u64(C.phash64(noisy)))[0] <= 3
        re = C.decode_qdct(C.encode_qdct(img, 90))
        assert H.hamming64(u64(ph), u64(C.phash64(re)))[0] <= 3


def test_phash_distinct_images_far_apart():
    rng = np.random.default_rng(5)
    a = _make_base_image(rng, 48, 48)
    b = _make_base_image(rng, 48, 48)
    assert H.hamming64(u64(C.phash64(a)), u64(C.phash64(b)))[0] > 8


def test_encode_decode_dispatch_and_unknown_fmt():
    rng = np.random.default_rng(6)
    img = _make_base_image(rng, 32, 32)
    assert np.array_equal(C.decode_image(C.encode_image(img, "png"), "png"), img)
    with pytest.raises(NotImplementedError):
        C.encode_image(img, "webp")


def test_psnr_identical_is_inf():
    img = np.full((8, 8, 3), 7, dtype=np.uint8)
    assert C.psnr(img, img) == float("inf")
