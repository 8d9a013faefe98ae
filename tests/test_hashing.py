import numpy as np
import pytest

from stack_trace_deduplication_ray.functions import hashing as H


def u64(*vals):
    return np.array(vals, dtype=np.uint64)


def test_splitmix64_deterministic_and_avalanche():
    x = u64(0, 1, 2, 3)
    a = H.splitmix64(x)
    b = H.splitmix64(x)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == 4
    # avalanche: one input-bit flip changes ~half the output bits
    d = H.hamming64(H.splitmix64(u64(12345)), H.splitmix64(u64(12344)))
    assert 10 < d[0] < 54


def test_hash_bytes_arrays_content_keyed():
    h = H.hash_bytes_arrays([b"abc", b"abc", b"abd", b""])
    assert h[0] == h[1]
    assert h[0] != h[2]
    assert h.dtype == np.uint64
    # strings hash like their utf-8 content, deterministically
    h2 = H.hash_bytes_arrays(["abc", "abc"])
    assert h2[0] == h2[1]


def test_shingle_hashes_identical_strings_identical_sets():
    hs, offs = H.shingle_hashes(["abcdefgh", "abcdefgh", "zzzzzzzz"], 5)
    r0 = hs[offs[0] : offs[1]]
    r1 = hs[offs[1] : offs[2]]
    r2 = hs[offs[2] : offs[3]]
    assert np.array_equal(r0, r1)
    assert len(r0) == 4  # 8 - 5 + 1
    assert H.jaccard_from_hash_sets(r0, r1) == 1.0
    assert H.jaccard_from_hash_sets(r0, r2) == 0.0


def test_shingle_hashes_short_and_empty_rows():
    hs, offs = H.shingle_hashes(["ab", "", "ab", "abcdef"], 5)
    assert offs.tolist() == [0, 1, 1, 2, 4]
    assert hs[0] == hs[1]  # short rows hash whole-row, equal content collides


def test_shingle_window_does_not_cross_row_boundary():
    # "XXabc" + "defYY" concatenated must not produce shingle "bcdef"
    hs1, o1 = H.shingle_hashes(["XXabc", "defYY"], 3)
    hs2, o2 = H.shingle_hashes(["XXabcdefYY"], 3)
    s_rows = set(hs1.tolist())
    s_concat = set(hs2.tolist())
    assert not s_rows >= s_concat  # concat has cross-boundary shingles


def test_minhash_signature_estimates_jaccard():
    rng = np.random.default_rng(7)
    base = [" ".join(rng.choice(list("abcdefghij"), 60)) for _ in range(1)][0]
    variant = base[:40] + base[40:].replace("a", "b")
    hs, offs = H.shingle_hashes([base, variant, "completely different text!"], 5)
    a, b = H.minhash_params(256, 42)
    sig = H.minhash_signatures(hs, offs, a, b)
    est01 = (sig[0] == sig[1]).mean()
    true01 = H.jaccard_from_hash_sets(hs[offs[0] : offs[1]], hs[offs[1] : offs[2]])
    assert abs(est01 - true01) < 0.15
    est02 = (sig[0] == sig[2]).mean()
    assert est02 < 0.1


def test_minhash_empty_rows_never_collide_in_bands():
    hs, offs = H.shingle_hashes(["", ""], 5)
    a, b = H.minhash_params(128, 0)
    sig = H.minhash_signatures(hs, offs, a, b)
    assert (sig == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_minhash_signature_batch_composition_independent():
    # Regression: a non-empty row followed by empty rows in the same
    # batch must get the SAME signature as when batched alone (the old
    # reduceat index clamp silently dropped the last shingle hash of
    # the final non-empty row whenever empty rows trailed it).
    a, b = H.minhash_params(128, 17)
    for text in ["hello world, a nice day", "ab"]:
        hs1, o1 = H.shingle_hashes([text], 5)
        sig_alone = H.minhash_signatures(hs1, o1, a, b)
        hs2, o2 = H.shingle_hashes([text, "", ""], 5)
        sig_mixed = H.minhash_signatures(hs2, o2, a, b)
        assert np.array_equal(sig_alone[0], sig_mixed[0]), text
        # and with an empty row in front as well
        hs3, o3 = H.shingle_hashes(["", text, ""], 5)
        sig_mid = H.minhash_signatures(hs3, o3, a, b)
        assert np.array_equal(sig_alone[0], sig_mid[1]), text


def test_band_keys_shape_and_identity():
    hs, offs = H.shingle_hashes(["hello world, nice day", "hello world, nice day"], 5)
    a, b = H.minhash_params(128, 0)
    sig = H.minhash_signatures(hs, offs, a, b)
    bk = H.band_keys(sig, 16, 8)
    assert bk.shape == (2, 16)
    assert np.array_equal(bk[0], bk[1])
    # different bands of the same row land in different buckets
    assert len(np.unique(bk[0])) == 16


def test_hamming64():
    assert H.hamming64(u64(0), u64(0))[0] == 0
    assert H.hamming64(u64(0xFFFFFFFFFFFFFFFF), u64(0))[0] == 64
    assert H.hamming64(u64(0b1011), u64(0b0010))[0] == 2


def test_simhash_chunk_keys_pigeonhole():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 63, dtype=np.uint64)
    # flip 3 bits -> with 4 chunks at least one chunk key must match
    y = x
    for bit in [2, 20, 50]:
        y = y ^ (np.uint64(1) << np.uint64(bit))
    keys = H.simhash_chunk_keys(u64(x, y), 4)
    assert (keys[0] == keys[1]).sum() >= 1
    # chunk keys at different positions never equal each other
    assert len(np.unique(keys[0])) == 4


def test_minhash_params_deterministic():
    a1, b1 = H.minhash_params(64, 9)
    a2, b2 = H.minhash_params(64, 9)
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2)
    assert (a1 % 2 == 1).all()


def test_prefix_filter_jaccard_equals_brute_force():
    """word_jaccard_pairs_exact must EQUAL the n^2 brute force at any
    threshold (the prefix filter is lossless by the pigeonhole bound)."""
    from stack_trace_deduplication_ray.pipelines.text import (
        word_jaccard_pairs_exact,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 15)))
        for _ in range(120)
    ]
    ids = np.arange(120, dtype=np.int64) * 7  # non-contiguous ids
    for thr in (0.3, 0.5, 0.8):
        s, d, j = word_jaccard_pairs_exact(ids, texts, thr)
        got = set(zip(s.tolist(), d.tolist(), j.tolist()))
        exp = set()
        sets = [set(t.split(" ")) for t in texts]
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                jac = inter / union if union else 1.0
                if jac >= thr:
                    exp.add((int(ids[a]), int(ids[b]), round(jac, 6)))
        assert got == exp, f"threshold {thr}: {len(got)} vs {len(exp)}"


def test_simhash_from_token_hashes():
    """Charikar bit-vote SimHash: identical token multisets collide,
    small edits stay within a few bits, unrelated texts are far."""
    def sh(texts):
        toks = [t.split() for t in texts]
        lens = np.fromiter(map(len, toks), dtype=np.int64, count=len(toks))
        offs = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = (
            np.concatenate([H.hash_bytes_arrays(t) for t in toks if len(t)])
            if lens.sum() else np.empty(0, dtype=np.uint64)
        )
        return H.simhash_from_token_hashes(flat, offs)

    a = "the quick brown fox jumps over a lazy dog " * 5
    b = a.replace("lazy", "busy")
    c = "completely different words entirely here now then " * 5
    s = sh([a, a, b, c, ""])
    assert s[0] == s[1]
    near = H.hamming64(s[0:1], s[2:3])[0]
    far = H.hamming64(s[0:1], s[3:4])[0]
    assert near <= 10 < far
    assert s[4] == 0  # empty row
    # batch-composition independent (segment sums don't leak)
    s2 = sh([a])
    assert s2[0] == s[0]


def test_distributed_jaccard_join_deskewed(ray_session):
    """word_jaccard_pairs_distributed must EQUAL the per-source n^2
    brute force under 80/20 source skew, AND the dominant source's
    prefix postings must spread over >1 hash partition (the round-2
    design put a whole source in ONE task; this shape keys the
    exchange by (source, token))."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.text import (
        word_jaccard_pairs_distributed,
    )
    from stack_trace_deduplication_ray.stages.joins import (
        _key_partition,
        resolve_partitions,
    )

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    n = 200
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(n)
    ]
    # 80% of docs in one source, rest spread over 4
    sources = ["big" if i < int(n * 0.8) else f"s{i % 4}" for i in range(n)]
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids), "text": pa.array(texts),
             "source": pa.array(sources)}
        )
    )
    thr = 0.5
    got = (
        word_jaccard_pairs_distributed(ds, thr, DedupConfig())
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    exp_rows = []
    df = pd.DataFrame({"doc_id": ids, "text": texts, "source": sources})
    for _, g in df.groupby("source"):
        gi = g["doc_id"].to_numpy()
        sets = [set(t.split(" ")) for t in g["text"]]
        for a in range(len(gi)):
            for b in range(a + 1, len(gi)):
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                jac = inter / union if union else 1.0
                if jac >= thr:
                    exp_rows.append(
                        (min(gi[a], gi[b]), max(gi[a], gi[b]), round(jac, 6))
                    )
    exp = (
        pd.DataFrame(exp_rows, columns=["src", "dst", "jac"])
        .astype({"src": "int64", "dst": "int64"})
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert len(exp) > 5, "fixture produced too few pairs to be meaningful"
    pd.testing.assert_frame_equal(got, exp)

    # de-skew evidence: the big source's (source, token) keys land in
    # more than one hash partition of the pair-emission exchange
    from stack_trace_deduplication_ray.functions import hashing as H

    big_texts = [t for t, s in zip(texts, sources) if s == "big"]
    toks = sorted({w for t in big_texts for w in t.split(" ")})
    th = H.hash_bytes_arrays(np.asarray(toks, dtype=object))
    sh = H.hash_bytes_arrays(np.asarray(["big"], dtype=object))[0]
    tkey = H.splitmix64(th ^ sh).view(np.int64)
    P = resolve_partitions(DedupConfig())
    assert len(np.unique(_key_partition(tkey, P))) > 1
