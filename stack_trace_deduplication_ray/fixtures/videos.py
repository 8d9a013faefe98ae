"""Deterministic synthetic video fixture: small uncompressed-RGB24 AVI
clips (the only container the pure-numpy codec decodes), including
exact-duplicate clips and one undecodable payload, so the video frame
stage has a real seeded corpus to run on (same posture as
fixtures/images.py for the image side)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from stack_trace_deduplication_ray.functions import codecs as C


def make_videos(n_clips: int, seed: int = 42) -> pa.Table:
    """(video_id, bytes, n_frames, width, height, fps) table.

    Every 5th clip is an exact byte duplicate of its predecessor (the
    frame-level dedup hook); clip `bad0` carries a non-AVI payload to
    exercise the decode_ok gate.
    """
    rng = np.random.default_rng(seed)
    ids, blobs, nf, ws, hs, fpss = [], [], [], [], [], []
    prev = None
    for i in range(n_clips):
        vid = f"vid{i:05d}"
        if i % 5 == 4 and prev is not None:
            blob, meta = prev
        else:
            n_frames = int(rng.integers(8, 25))
            w = h = 16
            fps = int(rng.choice([10, 24, 30]))
            frames = [
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for _ in range(n_frames)
            ]
            blob = C.encode_avi_rgb(frames, fps=fps)
            meta = (n_frames, w, h, fps)
            prev = (blob, meta)
        ids.append(vid)
        blobs.append(blob)
        nf.append(meta[0])
        ws.append(meta[1])
        hs.append(meta[2])
        fpss.append(meta[3])
    ids.append("bad0")
    blobs.append(b"\x00\x01 not a video container")
    nf.append(0)
    ws.append(0)
    hs.append(0)
    fpss.append(0)
    return pa.table(
        {
            "video_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(blobs, type=pa.binary()),
            "n_frames": pa.array(nf, type=pa.int32()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "fps": pa.array(fpss, type=pa.int32()),
        }
    )


def materialize_video_fixture(
    n_clips: int, seed: int = 42, root: str = "/tmp/stack_dedup_fixtures"
) -> str:
    out = os.path.join(root, f"videos_n{n_clips}_s{seed}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    pq.write_table(
        make_videos(n_clips, seed), os.path.join(out, "videos.parquet"),
        row_group_size=1024,
    )
    with open(done, "w") as f:
        f.write("ok")
    return out
