"""Vectorized 64-bit hashing primitives (numpy, wraparound uint64).

The reference dictionary-encodes tokens through a mutable vocab
(IdCoder, ea/sim/main/preprocess/id_coder.py:25-61) and keys exact dups
on Python ``hash`` of a joined string (stack.py:54-57). Both are
replaced here by stateless, seeded, deterministic 64-bit hashing so
that retried Ray tasks recompute identical values and no global vocab
shuffle is ever needed.

All functions are batch-vectorized: no per-row Python loops.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK64 = U64(0xFFFFFFFFFFFFFFFF)

# Polynomial rolling-hash base (odd -> bijective modulo 2^64 steps).
_POLY_BASE = U64(0x100000001B3)  # FNV prime

# splitmix64 constants
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)

_ERR = {"over": "ignore"}


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    with np.errstate(**_ERR):
        z = (x.astype(U64) + _SM_GAMMA) & _MASK64
        z = ((z ^ (z >> U64(30))) * _SM_M1) & _MASK64
        z = ((z ^ (z >> U64(27))) * _SM_M2) & _MASK64
        return z ^ (z >> U64(31))


def hash_bytes_arrays(values: list[bytes] | np.ndarray, seed: int = 0) -> np.ndarray:
    """64-bit content hash of each bytes/str element -> uint64 array.

    Uses pandas' SipHash-based object-array hasher (deterministic, C
    speed, independent of PYTHONHASHSEED) then mixes the seed in.
    """
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, hash_key="stack_dedup_0000")  # 16-byte key
    with np.errstate(**_ERR):
        return splitmix64(h.astype(U64) ^ (U64(seed & 0xFFFFFFFFFFFFFFFF)))


def ids_np(col) -> np.ndarray:
    """Arrow id column -> numpy array: int64 zero-copy-ish fast path,
    object array of Python values otherwise (string ids)."""
    import pyarrow as pa

    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return np.asarray(col.to_pylist(), dtype=object)


def hash_ids(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit hash of an id array -> uint64.

    int64 ids: pure-numpy splitmix64 (no per-row Python, the exchange
    fast path); anything else falls back to the bytes hasher. Every
    shuffle/salt/sample key in the dedup engine derives from this, so
    int64 id columns never round-trip through Python objects.
    """
    arr = np.asarray(ids)
    if arr.dtype.kind in "iu":
        with np.errstate(**_ERR):
            return splitmix64(
                arr.astype(np.int64).view(U64)
                ^ U64(seed & 0xFFFFFFFFFFFFFFFF)
            )
    return hash_bytes_arrays(arr, seed)


def binary_from_fixed(mat: np.ndarray):
    """(n, width) uint8 matrix -> Arrow variable-width binary array.

    Fixed-size-list columns pad to FULL-WIDTH zero child buffers when
    a join/union nulls them (pa.nulls of fixed_size_list allocates
    n*width bytes); variable binary nulls cost one offset. Signature
    payloads (thumbs, band keys) are therefore carried as binary.
    """
    import pyarrow as pa

    n, width = mat.shape
    offsets = (np.arange(n + 1, dtype=np.int32) * width).tobytes()
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets),
         pa.py_buffer(np.ascontiguousarray(mat).tobytes())],
    )


def fixed_from_binary(col, width: int) -> np.ndarray:
    """Arrow binary column of `width`-byte values -> (n, width) uint8
    matrix (vectorized gather; handles chunk offsets/slices)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, width), dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    idx = offs[:-1].astype(np.int64)[:, None] + np.arange(width)[None, :]
    return data[idx]


def concat_utf8(strings: "np.ndarray | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Encode a batch of strings to one flat uint8 array + offsets.

    Returns (flat, offsets) with offsets of length n+1; row i occupies
    flat[offsets[i]:offsets[i+1]].
    """
    bs = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    return flat, offsets


def window_hashes(flat: np.ndarray, k: int) -> np.ndarray:
    """Hash every length-k byte window of `flat` -> uint64[len(flat)-k+1].

    Polynomial hash with splitmix64 finalizer; fully vectorized
    (len x k intermediate, fine for small k).
    """
    n = len(flat) - k + 1
    if n <= 0:
        return np.empty(0, dtype=U64)
    # Horner scan: h_i = sum_j flat[i+j] * base^(k-1-j), computed as k
    # vectorized passes over n-length arrays. The (n, k) uint64 window
    # matrix this replaces allocated n*k*8 bytes (gigabytes at large
    # batches) and was memory-bound; the scan keeps three n-length
    # temporaries and produces bit-identical values.
    f = flat.astype(U64)
    with np.errstate(**_ERR):
        h = np.zeros(n, dtype=U64)
        for j in range(k):
            h *= _POLY_BASE
            h += f[j : j + n]
    return splitmix64(h)


def shingle_hashes(
    strings: "np.ndarray | list[str]", k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Character k-shingle hashes for a batch of strings.

    Returns (hashes, offsets): hashes is the concatenation of per-row
    shingle-hash sequences (duplicates kept — MinHash minima are
    unaffected), offsets has length n+1 indexing into it. Rows shorter
    than k contribute a single whole-string shingle so they still
    participate (and exact-equal short strings still collide).

    Reference analog: per-doc n-gram multisets, SeqCoder.ngrams
    (ea/sim/main/preprocess/seq_coder.py:68-81) — recast as a sliding
    window over the batch's concatenated utf-8 bytes.
    """
    flat, offs = concat_utf8(strings)
    n = len(offs) - 1
    lens = np.diff(offs)
    # hash every window in the concatenated buffer, then select only
    # windows that lie fully inside one row.
    wh = window_hashes(flat, k)
    counts = np.maximum(lens - k + 1, 0)
    short = lens < k  # rows shorter than k: use one whole-row hash
    out_counts = np.where(short, (lens > 0).astype(np.int64), counts)
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offs[1:])
    total = int(out_offs[-1])
    out = np.empty(total, dtype=U64)

    # long rows: gather window ranges [offs[i], offs[i]+counts[i])
    long_idx = np.nonzero(~short & (counts > 0))[0]
    if long_idx.size:
        # build gather indices via repeat + cumsum trick (no python loop)
        c = counts[long_idx]
        starts = offs[long_idx]
        # positions within each row: arange per segment
        seg_end = np.cumsum(c)
        seg_start = seg_end - c
        ar = np.arange(seg_end[-1], dtype=np.int64) - np.repeat(seg_start, c)
        gather = np.repeat(starts, c) + ar
        dst_start = out_offs[long_idx]
        dst = np.repeat(dst_start, c) + ar
        out[dst] = wh[gather]

    # short non-empty rows: hash the whole row
    short_idx = np.nonzero(short & (lens > 0))[0]
    for i in short_idx:  # rare (strings shorter than k); tiny loop
        row = flat[offs[i] : offs[i + 1]]
        out[out_offs[i]] = window_hashes(
            np.pad(row, (0, max(0, k - len(row)))), k
        )[0]
    return out, out_offs


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameter vectors for num_perm permutations.

    a is odd so x -> a*x + b (mod 2^64) is a bijection.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) * U64(2) + U64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    hashes: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """Segmented MinHash: per-row minimum of each permuted hash stream.

    hashes: uint64[total] (concatenated per-row shingle hashes)
    offsets: int64[n+1]
    Returns uint64[n, num_perm]; empty rows get all-MAX signatures (so
    they never collide in any band).
    """
    n = len(offsets) - 1
    num_perm = len(a)
    sig = np.full((n, num_perm), _MASK64, dtype=U64)
    if len(hashes) == 0 or n == 0:
        return sig
    starts = offsets[:-1]
    nonempty = np.diff(offsets) > 0
    # Sentinel slot: a trailing _MASK64 makes every offsets[:-1] value a
    # valid reduceat index (empty rows have starts[i] == len(hashes)),
    # so no clamping — clamping shortened the preceding non-empty row's
    # segment whenever empty rows followed it in the batch, making
    # signatures batch-composition-dependent (regression-tested in
    # tests/test_hashing.py).
    vbuf = np.empty(len(hashes) + 1, dtype=U64)
    vbuf[-1] = _MASK64
    with np.errstate(**_ERR):
        for p in range(num_perm):  # num_perm passes, each fully vectorized
            np.multiply(hashes, a[p], out=vbuf[:-1])
            vbuf[:-1] += b[p]
            m = np.minimum.reduceat(vbuf, starts)
            sig[nonempty, p] = m[nonempty]
    return sig


def band_keys(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """LSH band keys: hash each band's rows -> uint64[n, bands].

    Two rows share band b's key iff their signatures agree on all
    rows_per_band components of that band.
    """
    n, num_perm = sig.shape
    assert bands * rows_per_band == num_perm
    grouped = sig.reshape(n, bands, rows_per_band)
    with np.errstate(**_ERR):
        h = np.zeros((n, bands), dtype=U64)
        for r in range(rows_per_band):
            h = (h * _POLY_BASE + grouped[:, :, r]) & _MASK64
        # mix band index in so band 0 and band 1 buckets never collide
        h = splitmix64(h ^ (np.arange(bands, dtype=U64) * _SM_GAMMA))
    return h


def jaccard_from_hash_sets(
    hashes_a: np.ndarray, hashes_b: np.ndarray
) -> float:
    """Exact Jaccard over two shingle-hash multisets (uniqued)."""
    sa = np.unique(hashes_a)
    sb = np.unique(hashes_b)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return float(inter) / float(union) if union else 1.0


def hamming64(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized popcount of x^y for uint64 arrays."""
    v = (np.asarray(x, dtype=U64) ^ np.asarray(y, dtype=U64)).view(np.uint8)
    # popcount via unpackbits on the raw bytes
    bits = np.unpackbits(v.reshape(-1, 8), axis=1).sum(axis=1)
    return bits.astype(np.int64)


def simhash_chunk_keys(simhash: np.ndarray, chunks: int) -> np.ndarray:
    """Split 64-bit hashes into `chunks` equal bit-chunks -> uint64[n, chunks].

    Key = splitmix64(chunk_value ^ chunk_index * gamma) so different
    chunk positions never collide. Pigeonhole: Hamming(x, y) < chunks
    implies x and y agree exactly on >= 1 chunk.
    """
    simhash = np.asarray(simhash, dtype=U64)
    width = 64 // chunks
    mask = U64((1 << width) - 1)
    cols = []
    with np.errstate(**_ERR):
        for c in range(chunks):
            chunk = (simhash >> U64(c * width)) & mask
            cols.append(splitmix64(chunk ^ (U64(c) * _SM_GAMMA)))
    return np.stack(cols, axis=1)


def simhash_from_token_hashes(
    hashes: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Segmented 64-bit SimHash (Charikar bit-vote) per row.

    hashes: uint64[total] concatenated per-row token hashes;
    offsets: int64[n+1]. Each row's simhash bit b is the sign of the
    vote sum over its tokens' bit b — matrix column j IS value bit j
    (plain little-endian unpack/pack on both sides; the earlier
    byte-reversed packing permuted bits, which was Hamming-invariant
    but made the mapping SQL-opaque). Fully vectorized: unpack to a
    (total, 64) ±1 matrix, segment-sum with add.reduceat, re-pack.
    Empty rows hash to 0.
    """
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=U64)
    if len(hashes) == 0:
        return np.zeros(n, dtype=U64)
    bits = np.unpackbits(
        hashes.astype(U64).view(np.uint8).reshape(-1, 8), axis=1,
        bitorder="little",
    ).astype(np.int8)
    votes = bits * 2 - 1  # {0,1} -> {-1,+1}
    # sentinel row so every offsets[:-1] index is valid (empty rows)
    votes = np.vstack([votes, np.zeros((1, 64), dtype=np.int8)])
    sums = np.add.reduceat(votes.astype(np.int32), offsets[:-1], axis=0)
    nonempty = np.diff(offsets) > 0
    sums[~nonempty] = -1  # empty rows -> all bits 0
    out_bits = (sums > 0).astype(np.uint8)
    packed = np.packbits(out_bits, axis=1, bitorder="little")
    return np.ascontiguousarray(packed).view("<u8").astype(U64).reshape(-1)


def simhash_combo_keys(
    simhash: np.ndarray, n_sub: int = 6, r: int = 3
) -> np.ndarray:
    """Combination keys over `n_sub` sub-chunks: one key per r-subset
    -> uint64[n, C(n_sub, r)] (HmSearch-style wide-key probing).

    The 64 bits partition into n_sub sub-chunks (widths differ by at
    most 1 and cover ALL bits); every r-combination of sub-chunk
    values hashes — with its combination index — into one bucket key.
    Pigeonhole: Hamming(x, y) <= n_sub - r implies >= r clean
    sub-chunks, so x and y share >= 1 combination key EXACTLY. At
    (6, 3) the key space is ~2^32 per combination (vs 2^16 for the
    4-chunk scheme), pushing random birthday collisions out to ~1e11
    rows at 20 keys/row instead of 4.
    """
    from itertools import combinations

    simhash = np.asarray(simhash, dtype=U64)
    base, rem = divmod(64, n_sub)
    widths = [base + 1] * rem + [base] * (n_sub - rem)
    subs = []
    pos = 0
    for w in widths:
        mask = U64((1 << w) - 1)
        subs.append((simhash >> U64(pos)) & mask)
        pos += w
    cols = []
    with np.errstate(**_ERR):
        for ci, combo in enumerate(combinations(range(n_sub), r)):
            key = U64(ci + 1) * _SM_GAMMA
            for c in combo:
                key = splitmix64(subs[c] ^ key)
            cols.append(key)
    return np.stack(cols, axis=1)


def hash_strings_poly(strings: "np.ndarray | list[str]") -> np.ndarray:
    """Whole-string polynomial hash: splitmix64(FNV-Horner over each
    string's utf-8 bytes) -> uint64[n].

    The same construction as ``window_hashes`` with k = len(row) —
    i.e. a self-contained, integer-arithmetic-only string hash that a
    SQL oracle can re-derive exactly (unlike ``hash_bytes_arrays``,
    whose pandas SipHash core has no SQL counterpart). Vectorized as
    max-length masked Horner passes over the flattened byte buffer.
    """
    flat, offs = concat_utf8(strings)
    n = len(offs) - 1
    lens = np.diff(offs)
    h = np.zeros(n, dtype=U64)
    starts = offs[:-1]
    with np.errstate(**_ERR):
        for j in range(int(lens.max()) if n else 0):
            active = lens > j
            h[active] = h[active] * _POLY_BASE + flat[starts[active] + j]
    return splitmix64(h)
