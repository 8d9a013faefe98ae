"""Deterministic synthetic image+caption fixture generator (FIXTURES.md F1/F2).

Pure function of (seed, n_rows): produces the `images` input table
(schemas.IMAGES) plus the `truth_clusters` ground-truth side table
(schemas.TRUTH_CLUSTERS). Reference analog of the labeled corpora the
reference evaluates against (state.csv ground truth,
ea/sim/main/data/buckets/events_extractors/events_from_state.py:61-73)
— synthesized here because no external data is permitted.

Duplicate-injection classes and shares per FIXTURES.md:
  base 40% | exact 10% | reencode 10% | near_caption 15% |
  near_image 10% | substring 10% | distractor 5% (+~1% skew bucket)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from stack_trace_deduplication_ray import schemas
from stack_trace_deduplication_ray.functions.codecs import (
    decode_image,
    encode_image,
    phash64,
)

_TOKENS = (
    "ocean sunset mountain forest river skyline harbor meadow desert glacier "
    "portrait abstract vintage macro aerial candid panorama silhouette "
    "bright dark vivid muted grainy sharp soft warm cool golden "
    "dog cat bird horse boat train bridge tower castle garden market street "
    "morning evening autumn winter spring summer rain snow fog mist cloud"
).split()

BOILERPLATE_CAPTION = "no caption available for this image record"

SHARES = {
    "base": 0.40,
    "exact": 0.10,
    "reencode": 0.10,
    "near_caption": 0.15,
    "near_image": 0.10,
    "substring": 0.10,
    "distractor": 0.04,
    "skew": 0.01,
}


def _make_caption(rng: np.random.Generator, n_words: int) -> str:
    words = rng.choice(_TOKENS, size=n_words, replace=True)
    return " ".join(words.tolist())


def _make_base_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Procedural RGB: smooth gradient + per-cluster 8x8 block pattern.

    The blocky component drives the gradient-sign perceptual hash, so
    different clusters get well-separated hashes (pure sinusoids made
    every image's dHash land within a few bits of every other's);
    block-constant content keeps the lossy QDCT round-trip far above
    the 40 dB PSNR invariant.
    """
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = rng.uniform(0.5, 2.5, 2)
    px, py = rng.uniform(0, 2 * np.pi, 2)
    base = rng.uniform(60, 180, 3)
    # per-cluster blocky pattern, upsampled to image size
    blocks = rng.uniform(-55.0, 55.0, (8, 8))
    by = (yy * 8 / h).astype(np.int64).clip(0, 7)
    bx = (xx * 8 / w).astype(np.int64).clip(0, 7)
    pattern = blocks[by, bx]
    # light box blur: soften block edges so the lossy DCT round-trip
    # stays above the 40 dB PSNR invariant at quality 90
    for _ in range(2):
        pattern = (
            pattern
            + np.roll(pattern, 1, 0) + np.roll(pattern, -1, 0)
            + np.roll(pattern, 1, 1) + np.roll(pattern, -1, 1)
        ) / 5.0
    img = np.empty((h, w, 3), dtype=np.float64)
    for c in range(3):
        img[:, :, c] = (
            base[c]
            + pattern
            + 20 * np.sin(2 * np.pi * fx * xx / w + px + c)
            + 20 * np.cos(2 * np.pi * fy * yy / h + py - c)
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def _perturb_caption(rng: np.random.Generator, caption: str) -> str:
    """1-3 word substitutions + maybe a punctuation edit (near_caption)."""
    words = caption.split()
    n_edits = int(rng.integers(1, 4))
    for _ in range(n_edits):
        i = int(rng.integers(0, len(words)))
        words[i] = str(rng.choice(_TOKENS))
    out = " ".join(words)
    if rng.random() < 0.5:
        out += "."
    return out


def _perturb_image(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Small seeded noise; keeps Hamming(phash) small (near_image)."""
    noise = rng.integers(-2, 3, size=img.shape, dtype=np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def make_images(
    n_rows: int, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Generate (images, truth_clusters) Arrow tables. Deterministic."""
    rng = np.random.default_rng(seed)
    specs: list[dict] = []  # one dict per row; cluster key = parent index

    n_skew = max(0, int(round(n_rows * SHARES["skew"])))
    n_distract = int(round(n_rows * SHARES["distractor"]))
    budget = n_rows - n_skew - n_distract
    n_base = int(round(n_rows * SHARES["base"]))
    n_derived = budget - n_base
    derived_classes = ["exact", "reencode", "near_caption", "near_image", "substring"]
    derived_weights = np.array([SHARES[c] for c in derived_classes])
    derived_weights = derived_weights / derived_weights.sum()

    # --- base rows (cluster parents) --------------------------------
    bases: list[dict] = []
    for i in range(n_base):
        w = int(rng.choice([32, 48, 64]))
        h = int(rng.choice([32, 48, 64]))
        fmt = "png" if rng.random() < 0.6 else "jpeg"
        img = _make_base_image(rng, w, h)
        # near_caption parents need enough words for shingle overlap
        caption = _make_caption(rng, int(rng.integers(12, 41)))
        data = encode_image(img, fmt)
        # pixels as stored (lossy fmt: decode what was encoded)
        pixels = img if fmt == "png" else decode_image(data, fmt)
        row = dict(
            cluster=i, dup_class="base", w=w, h=h, fmt=fmt,
            bytes=data, caption=caption, pixels=pixels,
        )
        bases.append(row)
        specs.append(row)

    # --- derived rows ------------------------------------------------
    for _ in range(n_derived):
        cls = str(rng.choice(derived_classes, p=derived_weights))
        p = bases[int(rng.integers(0, len(bases)))]
        if cls == "exact":
            row = dict(
                cluster=p["cluster"], dup_class=cls, w=p["w"], h=p["h"],
                fmt=p["fmt"], bytes=p["bytes"], caption=p["caption"],
                pixels=p["pixels"],
            )
        elif cls == "reencode":
            new_fmt = "jpeg" if p["fmt"] == "png" else "png"
            data = encode_image(p["pixels"], new_fmt)
            row = dict(
                cluster=p["cluster"], dup_class=cls, w=p["w"], h=p["h"],
                fmt=new_fmt, bytes=data, caption=p["caption"],
                pixels=decode_image(data, new_fmt),
            )
        elif cls == "near_caption":
            row = dict(
                cluster=p["cluster"], dup_class=cls, w=p["w"], h=p["h"],
                fmt=p["fmt"], bytes=p["bytes"],
                caption=_perturb_caption(rng, p["caption"]),
                pixels=p["pixels"],
            )
        elif cls == "near_image":
            img = _perturb_image(rng, p["pixels"])
            data = encode_image(img, "png")
            row = dict(
                cluster=p["cluster"], dup_class=cls, w=p["w"], h=p["h"],
                fmt="png", bytes=data, caption=p["caption"], pixels=img,
            )
        else:  # substring: long shared caption run, distinct image
            w = int(rng.choice([32, 48, 64]))
            h = int(rng.choice([32, 48, 64]))
            img = _make_base_image(rng, w, h)
            shared = p["caption"][: max(48, len(p["caption"]) // 2)]
            row = dict(
                cluster=p["cluster"], dup_class=cls, w=w, h=h, fmt="png",
                bytes=encode_image(img, "png"),
                caption=_make_caption(rng, 6) + " " + shared,
                pixels=img,
            )
        specs.append(row)

    # --- distractors: hard negatives, singleton clusters -------------
    for j in range(n_distract):
        w, h = int(rng.choice([32, 48, 64])), int(rng.choice([32, 48, 64]))
        img = _make_base_image(rng, w, h)
        specs.append(
            dict(
                cluster=f"d{j}", dup_class="distractor", w=w, h=h, fmt="png",
                bytes=encode_image(img, "png"),
                caption=_make_caption(rng, int(rng.integers(5, 10))),
                pixels=img,
            )
        )

    # --- skewed boilerplate bucket (one big mutual-dup cluster) ------
    for _ in range(n_skew):
        w, h = int(rng.choice([32, 48, 64])), int(rng.choice([32, 48, 64]))
        img = _make_base_image(rng, w, h)
        specs.append(
            dict(
                cluster="skew", dup_class="skew", w=w, h=h, fmt="png",
                bytes=encode_image(img, "png"),
                caption=BOILERPLATE_CAPTION, pixels=img,
            )
        )

    # --- shuffle generation order, assign canonical ids --------------
    order = rng.permutation(len(specs))
    ids = [f"img{i:010d}" for i in range(len(specs))]

    cluster_min: dict = {}
    rows = []
    for new_idx, old_idx in enumerate(order):
        s = specs[old_idx]
        rid = ids[new_idx]
        key = s["cluster"]
        if key not in cluster_min or rid < cluster_min[key]:
            cluster_min[key] = rid
        rows.append((rid, s))

    images = pa.Table.from_pydict(
        {
            "image_id": [r[0] for r in rows],
            "bytes": [r[1]["bytes"] for r in rows],
            "w": [r[1]["w"] for r in rows],
            "h": [r[1]["h"] for r in rows],
            "fmt": [r[1]["fmt"] for r in rows],
            "caption": [r[1]["caption"] for r in rows],
            "phash": [phash64(r[1]["pixels"]) for r in rows],
        },
        schema=schemas.IMAGES,
    )
    truth = pa.Table.from_pydict(
        {
            "image_id": [r[0] for r in rows],
            "cluster_id": [cluster_min[r[1]["cluster"]] for r in rows],
            "dup_class": [r[1]["dup_class"] for r in rows],
        },
        schema=schemas.TRUTH_CLUSTERS,
    )
    return images, truth


def materialize_fixture(
    n_rows: int, seed: int = 42, root: str = "/tmp/stack_dedup_fixtures"
) -> str:
    """Write (and cache) the fixture as parquet; returns its directory.

    Output is sharded parquet (resumable-output convention): the images
    table is written with row-group sizing suitable for block reads.
    """
    out = os.path.join(root, f"n{n_rows}_s{seed}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    images, truth = make_images(n_rows, seed)
    pq.write_table(
        images, os.path.join(out, "images.parquet"), row_group_size=4096
    )
    pq.write_table(truth, os.path.join(out, "truth_clusters.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out


def _gen_shard(shard: int, n_rows: int, seed: int, out_dir: str,
               include_skew: bool) -> str:
    """Generate one deterministic shard (pure fn of (seed, shard))."""
    rng_seed = np.random.default_rng([seed, shard])
    # reuse make_images' machinery by re-seeding: shard-local clusters
    images, truth = make_images(
        n_rows, seed=int(rng_seed.integers(0, 2**31)),
    )
    if not include_skew:
        # drop shard-local skew rows (only shard 0 carries the global
        # boilerplate cluster so ground truth stays consistent)
        keep = [
            i for i, c in enumerate(truth.column("dup_class").to_pylist())
            if c != "skew"
        ]
        images = images.take(keep)
        truth = truth.take(keep)
    # prefix ids with the shard so they are globally unique and the
    # lexicographic order stays deterministic
    import pyarrow.compute as pc

    def reprefix(tbl, col):
        ids = [f"s{shard:04d}{v}" for v in tbl.column(col).to_pylist()]
        return tbl.set_column(
            tbl.schema.get_field_index(col), col, pa.array(ids, type=pa.string())
        )

    images = reprefix(images, "image_id")
    truth = reprefix(reprefix(truth, "image_id"), "cluster_id")
    pq.write_table(
        images, os.path.join(out_dir, f"images_{shard:04d}.parquet"),
        row_group_size=4096,
    )
    pq.write_table(
        truth, os.path.join(out_dir, f"truth_{shard:04d}.parquet")
    )
    return f"shard {shard} ok"


def materialize_fixture_sharded(
    n_rows: int,
    seed: int = 42,
    root: str = "/tmp/stack_dedup_fixtures",
    shard_rows: int = 25_000,
) -> str:
    """Parallel sharded fixture generation via Ray tasks (one task per
    shard, deterministic per (seed, shard)); resumable-output layout:
    one parquet file per shard + a _DONE marker. Requires an active
    Ray session. Duplicate clusters are shard-local (plus the global
    boilerplate-caption cluster, generated only in shard 0)."""
    import ray

    tag = "" if shard_rows == 25_000 else f"_w{shard_rows}"
    out = os.path.join(root, f"sharded_n{n_rows}_s{seed}{tag}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    n_shards = max(1, -(-n_rows // shard_rows))
    per = n_rows // n_shards
    gen = ray.remote(num_cpus=1)(_gen_shard)
    futs = [
        gen.remote(s, per, seed, out, s == 0) for s in range(n_shards)
    ]
    ray.get(futs)
    with open(done, "w") as f:
        f.write(f"{n_shards} shards x {per} rows")
    return out
