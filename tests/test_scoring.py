"""Classic scorer kernels: Lerch idf^2 set-intersection and FaST
positional alignment, verified against independent straightforward
transcriptions of the published formulas (Lerch & Mezini 2013; the
FaST paper, irving-muller.github.io/papers/FaST.pdf)."""

import math

import numpy as np

from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.functions import scoring as S


def naive_fast(tokens_a, tokens_b, df_of, n_docs, alpha=1.0, beta=1.0, gamma=1.0):
    """Plain-Python transcription of the paper's alignment: reversed
    streams, 1-based positions, id-sorted, linear merge."""

    def prep(tokens):
        rev = tokens[::-1]
        items = [(t, p) for p, t in enumerate(rev, start=1)]
        return sorted(items, key=lambda x: x[0])

    def weight(tok, pos):
        return (pos ** -alpha) * math.exp(-beta * df_of.get(tok, 0) / n_docs)

    a, b = prep(tokens_a), prep(tokens_b)
    i = j = 0
    sim = 0.0
    while i < len(a) and j < len(b):
        if a[i][0] == b[j][0]:
            sim += (weight(*a[i]) + weight(*b[j])) * math.exp(
                -gamma * abs(a[i][1] - b[j][1])
            )
            i += 1
            j += 1
        elif a[i][0] < b[j][0]:
            sim -= weight(*a[i])
            i += 1
        else:
            sim -= weight(*b[j])
            j += 1
    sim -= sum(weight(*x) for x in a[i:]) + sum(weight(*x) for x in b[j:])
    norm = sum(weight(*x) for x in a) + sum(weight(*x) for x in b)
    return 1.0 if norm == 0 else sim / norm


def _df_from_texts(texts):
    df = {}
    for t in texts:
        toks = t.split(" ")
        hs = np.unique(H.hash_bytes_arrays(toks))
        for h in hs:
            df[int(h)] = df.get(int(h), 0) + 1
    return df


def test_fast_align_matches_naive_transcription():
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 10)))
        for _ in range(30)
    ]
    df_of = _df_from_texts(texts)
    n = len(texts)
    for ai in range(0, 30, 3):
        for bi in range(1, 30, 7):
            va = S.fast_token_views(texts[ai], df_of, n)
            vb = S.fast_token_views(texts[bi], df_of, n)
            got = S.fast_align(*va, *vb)
            # naive transcription works on hashed token ids so the
            # id-sort order matches
            ta = [int(h) for h in H.hash_bytes_arrays(texts[ai].split(" "))]
            tb = [int(h) for h in H.hash_bytes_arrays(texts[bi].split(" "))]
            exp = naive_fast(ta, tb, df_of, n)
            assert abs(got - exp) < 1e-9, (ai, bi, got, exp)


def test_fast_identical_docs_score_high():
    texts = ["a b c d e", "a b c d e", "v w x y z"]
    df_of = _df_from_texts(texts)
    v0 = S.fast_token_views(texts[0], df_of, 3)
    v1 = S.fast_token_views(texts[1], df_of, 3)
    v2 = S.fast_token_views(texts[2], df_of, 3)
    same = S.fast_align(*v0, *v1)
    diff = S.fast_align(*v0, *v2)
    assert same == 1.0  # perfect alignment: sim equals the norm
    assert abs(diff - (-1.0)) < 1e-12  # zero overlap: pure gaps
    assert S.fast_align(*S.fast_token_views("", df_of, 3),
                        *S.fast_token_views("", df_of, 3)) == 1.0


def test_lerch_score_formula():
    texts = ["x y z", "x y q", "q r s"]
    df_of = _df_from_texts(texts)
    n = 3
    idf_of = {t: 1.0 + math.log(n / (d + 1)) for t, d in df_of.items()}
    sets = S.token_hash_sets(texts)
    hx, hy = (int(h) for h in H.hash_bytes_arrays(["x", "y"]))
    exp = idf_of[hx] ** 2 + idf_of[hy] ** 2
    assert abs(S.lerch_score(sets[0], sets[1], idf_of) - exp) < 1e-12
    assert S.lerch_score(sets[0], sets[2], idf_of) == 0.0


def test_idf_lerch_vectorized():
    df = np.array([0, 1, 9])
    idf = S.idf_lerch(df, 10)
    assert np.allclose(idf, 1.0 + np.log(10.0 / (df + 1.0)))
