"""Multimodal payload stages: opaque binary columns + typed metadata.

The pattern for every modality is identical and real: an actor-pool
``map_batches`` class whose __init__ does the expensive once-per-actor
setup (codec init / model load) and whose __call__ processes one Arrow
batch of binary payloads into typed feature columns, sized with small
batches because payloads dominate block size.

- Image decode / thumbnail / feature-extract: REAL (pure-numpy codecs,
  functions/codecs.py).
- Audio: PCM16 WAV decode is REAL (codecs.decode_wav); compressed
  containers (mp3/ogg/flac) need codec libraries absent here and
  raise, or — with ``allow_fake`` — derive a deterministic signal so
  the plumbing stays exercised.
- Video: uncompressed RGB24 AVI frame decode is REAL
  (codecs.decode_avi_frames, pure-struct RIFF parsing); compressed
  codecs raise per payload and the row degrades to decode_ok=False.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import codecs as C
from stack_trace_deduplication_ray.stages.joins import resolve_actors

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mean_luma", pa.float64()),
        ("contrast", pa.float64()),
        ("phash", pa.int64()),
        ("thumb", pa.list_(pa.float32(), 64)),  # 8x8 gray
    ]
)


class ImageFeatureExtractor:
    """Decode + resize + feature-extract for image payloads (REAL)."""

    def __init__(self, thumb_side: int = 8):
        self.thumb_side = thumb_side  # codec tables built lazily in numpy

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = len(ids)
        ok = np.zeros(n, dtype=bool)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        luma = np.zeros(n, dtype=np.float64)
        contrast = np.zeros(n, dtype=np.float64)
        ph = np.zeros(n, dtype=np.int64)
        side = self.thumb_side
        thumbs = np.zeros((n, side * side), dtype=np.float32)
        for i in range(n):
            try:
                px = C.decode_image(blobs[i], fmts[i])
            except Exception:
                continue
            ok[i] = True
            h[i], w[i] = px.shape[:2]
            g = C.to_gray(px)
            luma[i] = float(g.mean())
            contrast[i] = float(g.std())
            ph[i] = C.phash64(px)
            thumbs[i] = C.resize_area(g, side, side).astype(np.float32).reshape(-1)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "decode_ok": pa.array(ok),
                "width": pa.array(w),
                "height": pa.array(h),
                "mean_luma": pa.array(np.round(luma, 4)),
                "contrast": pa.array(np.round(contrast, 4)),
                "phash": pa.array(ph),
                "thumb": pa.FixedSizeListArray.from_arrays(
                    pa.array(thumbs.reshape(-1)), side * side
                ),
            }
        )


def image_features(images_ds, cfg: DedupConfig | None = None):
    cfg = cfg or DedupConfig()
    return images_ds.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=cfg.image_batch_size,
        concurrency=(1, resolve_actors(cfg)),
        num_cpus=1,
    )


# --------------------------------------------------------------- audio

AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("rms", pa.float64()),
        ("zero_crossings", pa.int64()),
    ]
)


def _decode_audio(blob: bytes, fake: bool) -> tuple[np.ndarray, int]:
    """WAV/PCM16 decode is REAL (pure struct parsing — codecs.decode_wav);
    other containers (mp3/ogg/flac) need codec libraries absent here
    and either raise or, with ``fake``, derive a deterministic PCM-ish
    signal from the payload bytes so the plumbing stays exercised.
    """
    if len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return C.decode_wav(blob)
    if not fake:
        raise NotImplementedError(
            "non-WAV audio decoding requires a codec library not present "
            "in this environment"
        )
    raw = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
    return (raw - 127.5) / 127.5, 0


class AudioFeatureExtractor:
    """Actor stage: audio payloads -> per-clip features.

    WAV decode is real; see _decode_audio for other containers.
    """

    def __init__(self, allow_fake: bool = False):
        self.allow_fake = allow_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        sr, ns, rms, zc = [], [], [], []
        for blob in blobs:
            x, rate = _decode_audio(blob, self.allow_fake)
            sr.append(rate)
            ns.append(len(x))
            rms.append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
            zc.append(int((np.diff(np.signbit(x)) != 0).sum()))
        return pa.table(
            {
                "clip_id": pa.array(ids, type=pa.string()),
                "sample_rate": pa.array(sr, type=pa.int32()),
                "n_samples": pa.array(ns, type=pa.int64()),
                "rms": pa.array(np.round(rms, 6), type=pa.float64()),
                "zero_crossings": pa.array(zc, type=pa.int64()),
            }
        )


# --------------------------------------------------------------- video

VIDEO_FRAMES_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_phash", pa.int64()),
    ]
)


class VideoFrameSampler:
    """Actor stage: video payloads -> one row per sampled frame.

    Frame decoding is REAL for uncompressed RGB24 AVI containers
    (pure-struct RIFF parsing, codecs.decode_avi_frames — same posture
    as the audio side's PCM16 WAV). Compressed codecs raise
    ValueError per payload and the row is emitted with decode_ok=False
    instead of poisoning the batch.
    """

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, ph_out, ok_out = [], [], [], []
        for vid, blob in zip(
            batch.column("video_id").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            try:
                frames, _fps = C.decode_avi_frames(blob)
            except ValueError:
                ids_out.append(vid)
                idx_out.append(-1)
                ph_out.append(0)
                ok_out.append(False)
                continue
            for f in range(0, len(frames), self.every_n):
                ids_out.append(vid)
                idx_out.append(f)
                ph_out.append(C.phash64(frames[f]))
                ok_out.append(True)
        return pa.table(
            {
                "video_id": pa.array(ids_out, type=pa.string()),
                "frame_idx": pa.array(idx_out, type=pa.int32()),
                "frame_phash": pa.array(ph_out, type=pa.int64()),
                "decode_ok": pa.array(ok_out, type=pa.bool_()),
            }
        )
