"""Signature stage: images -> per-row sketch columns.

One actor-pool ``map_batches`` pass computes every per-row signature;
the wide ``bytes`` column is dropped from the output so nothing heavy
ever enters a shuffle (SURVEY.md §7.4 "wide binary rows").

Reference analogs: exact-dup key ``Stack.__hash__``
(/root/reference/ea/sim/main/data/objects/stack.py:54-57), n-gram
multisets ``SeqCoder.ngrams`` (ea/sim/main/preprocess/seq_coder.py:68-81),
stateful fit-once tokenizers (ea/sim/main/preprocess/tokenizers/bpe.py:43-151)
— recast as a stateless-per-row / stateful-per-actor columnar transform.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import codecs as C
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.stages.joins import resolve_actors

U64 = np.uint64

# Seed for the string-id -> int64 internal-id hash. Every exchange
# (collapse, candidate shuffle, verify joins, CC) moves 8-byte int64
# keys instead of Python string objects; the original string id is
# carried ONLY in the materialized signature table ("orig_id") and
# restored in run_dedup's final relabel join. Birthday odds of >= 1
# collision at n rows are ~n^2/2^65: ~7e-9 at 500k but ~2.7e-2 at 1e9
# — a collision silently merges two distinct ids, so string-id corpora
# past ~1e8 rows should either ship int64 ids natively (passthrough,
# zero risk) or enable cfg.exact_string_ids: hashes are confined to
# the non-negative half-space and colliding ids are DETECTED exactly
# and remapped into the reserved negative space (remap_colliding_ids).
IID_SEED = 0x1D17_0B5E

#: base of the reserved remap id space (exact_string_ids mode):
#: strictly negative, disjoint from every masked hash id
REMAP_ID_BASE = -(1 << 62)


def iid_bits(cfg: DedupConfig) -> int:
    """Effective internal-hash width: exact mode reserves the sign
    bit for remapped ids (<= 63); otherwise cfg.iid_hash_bits (64 =
    the full space, bit-identical to the flag-off behavior)."""
    b = cfg.iid_hash_bits
    return min(b, 63) if cfg.exact_string_ids else b


def internal_ids(
    col: "pa.ChunkedArray | pa.Array", bits: int = 64
) -> tuple[pa.Array, bool]:
    """Id column -> (int64 internal-id array, was_string).

    Integer ids pass through unchanged (min-id keep-first semantics
    preserved exactly); string ids are hashed to int64, masked to the
    top `bits` bits (64 = full space; < 64 keeps values in
    [0, 2^bits), leaving the negative space to remap_colliding_ids).
    """
    if pa.types.is_integer(col.type):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return arr.cast(pa.int64()), False
    ids = H.ids_np(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    h = H.hash_ids(ids, seed=IID_SEED)
    if bits < 64:
        h = h >> U64(64 - bits)
    return pa.array(h.view(np.int64)), True


def remap_colliding_ids(sigs, cfg: DedupConfig):
    """Exact-string-id mode: make the internal id space collision-free.

    One NARROW partitioned exchange over (image_id, orig_id) co-locates
    equal internal ids; groups holding >= 2 DISTINCT original ids are
    true hash collisions (comparison is on the original strings, so
    detection itself is exact). The colliding originals — expected
    ~n^2/2^(bits+1) rows, driver-sized by construction — are remapped
    to REMAP_ID_BASE + rank(orig) (lexicographic, deterministic across
    runs and resumes), a NEGATIVE id space disjoint from the masked
    non-negative hash space, then a map pass rewrites their signature
    rows. Returns (remapped sigs Dataset, stats dict).

    Cluster SEMANTICS are id-value-independent (components are content
    -driven; user-visible names are min ORIGINAL id), so remapping only
    changes internal representative choices, never the output.

    Reference precedent for an exact id registry:
    /root/reference/ea/sim/main/data/duplicates.py:39-58 (HashStorage
    persists the full id->hash map and trusts uniqueness); here
    uniqueness is enforced, not assumed.
    """
    import ray

    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    def find(part):
        n = len(part)
        if n == 0:
            return part.iloc[:0]
        part = part.sort_values(
            ["image_id", "orig_id"], kind="stable"
        )
        iid_s = part["image_id"].to_numpy()
        orig_s = part["orig_id"].to_numpy()
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = iid_s[1:] != iid_s[:-1]
        new_o = np.ones(n, dtype=bool)
        new_o[1:] = new_g[1:] | (orig_s[1:] != orig_s[:-1])
        gidx = np.cumsum(new_g) - 1
        n_distinct = np.bincount(gidx, weights=new_o.astype(np.int64))
        collides = (n_distinct >= 2)[gidx]
        keep = collides & new_o  # one row per distinct (iid, orig)
        import pandas as pd

        return pd.DataFrame(
            {"image_id": iid_s[keep], "orig_id": orig_s[keep]}
        )

    coll = partitioned_groups(
        sigs.select_columns(["image_id", "orig_id"]), "image_id", find, cfg
    ).to_pandas()
    stats = {
        "stage": "exact_string_ids",
        "bits": iid_bits(cfg),
        "colliding_rows": int(len(coll)),
        "colliding_ids": int(coll["image_id"].nunique()) if len(coll) else 0,
    }
    if not len(coll):
        return sigs, stats
    origs = sorted(coll["orig_id"].tolist())
    remap = {o: REMAP_ID_BASE + k for k, o in enumerate(origs)}
    coll_iids = np.sort(coll["image_id"].unique().astype(np.int64))
    ref = ray.put((coll_iids, remap))

    def apply(batch: pa.Table) -> pa.Table:
        ids_arr, mp = ray.get(ref)
        iids = batch.column("image_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ids_arr, iids), len(ids_arr) - 1)
        hit = ids_arr[pos] == iids
        if not hit.any():
            return batch
        new = iids.copy()
        origs_b = batch.column("orig_id").to_pylist()
        for i in np.nonzero(hit)[0]:
            new[i] = mp.get(origs_b[i], new[i])
        return batch.set_column(
            batch.schema.get_field_index("image_id"),
            "image_id",
            pa.array(new.astype(np.int64)),
        )

    return sigs.map_batches(apply, batch_format="pyarrow"), stats


def normalize_captions(captions: list[str], lowercase: bool = True) -> list[str]:
    """NFC + optional lowercase + whitespace collapse.

    Reference analog: MethodNameUnifier regex normalization
    (ea/sim/main/data/parsers/base.py:21-32) and Entry2SeqHelper
    lowercasing (ea/sim/main/preprocess/entry_coders.py:39-59).
    """
    import unicodedata

    out = []
    for c in captions:
        c = unicodedata.normalize("NFC", c)
        if lowercase:
            c = c.lower()
        out.append(" ".join(c.split()))
    return out


class SignatureStage:
    """Actor-pool batch transform: images table -> signatures table.

    MinHash permutation parameters are built ONCE per actor in
    ``__init__`` from the config seed (actor-pool pattern; reference
    analog: fit-once encoder state, SURVEY.md §2.3 T5).
    """

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.a, self.b = H.minhash_params(cfg.num_perm, cfg.minhash_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        captions = batch.column("caption").to_pylist()
        norm = normalize_captions(captions, cfg.lowercase)

        caption_hash = H.hash_bytes_arrays(norm, seed=1)
        image_hash = H.hash_bytes_arrays(batch.column("bytes").to_pylist(), seed=2)
        # exact-dup key: caption AND payload byte-identical
        with np.errstate(over="ignore"):
            exact_hash = H.splitmix64(
                caption_hash ^ ((image_hash << U64(1)) | (image_hash >> U64(63)))
            )

        sh, offs = H.shingle_hashes(norm, cfg.shingle_k)
        sig = H.minhash_signatures(sh, offs, self.a, self.b)
        n_shingles = np.diff(offs).astype(np.int32)
        # reduce the 128-perm signature to its LSH band keys HERE:
        # downstream only ever buckets on band keys, so the table
        # carries 16 x 8 B per row instead of the 1 KB signature — 8x
        # less through every collapse/feature shuffle
        bands = H.band_keys(sig, cfg.bands, cfg.rows_per_band)

        simhash = batch.column("phash").to_numpy(zero_copy_only=False).astype(
            np.int64
        )

        # decode ONCE per row here (actor pool); downstream PSNR verify
        # compares these 16x16 gray thumbnails (256 B as uint8) instead
        # of shipping the full payload bytes through a join shuffle.
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        thumbs = np.zeros((len(blobs), 256), dtype=np.uint8)
        decode_ok = np.zeros(len(blobs), dtype=bool)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                px = C.decode_image(blob, fmt)
            except Exception:
                continue  # undecodable payload: thumb stays zero
            thumbs[i] = np.clip(
                np.round(C.resize_area(C.to_gray(px), 16, 16)), 0, 255
            ).astype(np.uint8).reshape(-1)
            decode_ok[i] = True

        # bands / thumbs travel as variable-width BINARY payloads:
        # fixed-size-list columns cost full-width zero buffers when a
        # downstream join nulls them (measured ~900 MB of zeros in the
        # verify exchange at 500k rows); binary nulls cost one offset.
        bands_bin = H.binary_from_fixed(
            bands.reshape(len(batch), -1).view(np.uint8)
        )
        iid, was_str = internal_ids(
            batch.column("image_id"), bits=iid_bits(cfg)
        )
        orig = {"orig_id": batch.column("image_id")} if was_str else {}
        return pa.table(
            {
                "image_id": iid,
                **orig,
                "caption_norm": pa.array(norm, type=pa.string()),
                "caption_hash": pa.array(caption_hash.view(np.int64)),
                "image_hash": pa.array(image_hash.view(np.int64)),
                "exact_hash": pa.array(exact_hash.view(np.int64)),
                "simhash": pa.array(simhash),
                "bands": bands_bin,
                "n_shingles": pa.array(n_shingles),
                "thumb": H.binary_from_fixed(thumbs),
                "decode_ok": pa.array(decode_ok),
            }
        )


def signature_stage(images_ds, cfg: DedupConfig, has_image: bool = True):
    """images Dataset -> signatures Dataset (bytes projected away)."""
    return images_ds.map_batches(
        SignatureStage,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.image_batch_size if has_image else cfg.batch_size,
        # fixed pool at (cluster CPUs - 2): decode is the dominant
        # CPU-bound stage and the autoscaler's ramp was measured to
        # cost ~20% of stage wall time at 500k rows; two CPUs stay
        # free for the feeding read tasks (no starvation)
        concurrency=resolve_actors(cfg),
        num_cpus=1,
    )


class TextSignatureStage(SignatureStage):
    """Signature stage for caption-only corpora (no image payload).

    Used by the text pipelines over the `documents` table; image-side
    hashes are zero and simhash is absent.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        cfg = self.cfg
        captions = batch.column("caption").to_pylist()
        norm = normalize_captions(captions, cfg.lowercase)
        caption_hash = H.hash_bytes_arrays(norm, seed=1)
        sh, offs = H.shingle_hashes(norm, cfg.shingle_k)
        sig = H.minhash_signatures(sh, offs, self.a, self.b)
        bands = H.band_keys(sig, cfg.bands, cfg.rows_per_band)
        bands_bin = H.binary_from_fixed(
            bands.reshape(len(batch), -1).view(np.uint8)
        )
        ch64 = caption_hash.view(np.int64)
        iid, was_str = internal_ids(
            batch.column("image_id"), bits=iid_bits(cfg)
        )
        orig = {"orig_id": batch.column("image_id")} if was_str else {}
        return pa.table(
            {
                "image_id": iid,
                **orig,
                "caption_norm": pa.array(norm, type=pa.string()),
                "caption_hash": pa.array(ch64),
                "exact_hash": pa.array(ch64),  # text-only exact key
                "bands": bands_bin,
                "n_shingles": pa.array(np.diff(offs).astype(np.int32)),
            }
        )


def text_signature_stage(docs_ds, cfg: DedupConfig):
    return docs_ds.map_batches(
        TextSignatureStage,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, resolve_actors(cfg)),
        num_cpus=1,
    )
