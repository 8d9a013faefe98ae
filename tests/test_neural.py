"""P4/P5 numpy cross-encoders: forward-pass invariants + pipeline
determinism. The models are seeded and untrained (no torch in the
environment — SURVEY §2.4); what these tests pin is the INFERENCE
machinery: masking, batching independence, the eval-time cache, the
pair-level cross features, and the distributed plumbing around them."""

import numpy as np
import pytest

from stack_trace_deduplication_ray.functions.neural import (
    LSTMCrossEncoderNumpy,
    S3MNumpy,
    _BiLSTM,
    pad_id_lists,
    token_ids,
)

SF = "/root/testdata/sf0.001"


def test_token_ids_deterministic_and_reserved():
    a = token_ids("NullPointerException at Foo.bar", 4096)
    b = token_ids("NullPointerException at Foo.bar", 4096)
    assert np.array_equal(a, b)
    assert a.min() >= 4  # special ids PAD/UNK/SOS/EOS never collide
    assert a.max() < 4096


def test_pad_id_lists_truncates_to_last_window():
    s = np.arange(10, 110)
    ids, lens = pad_id_lists([s], max_len=8)
    assert lens[0] == 8
    assert np.array_equal(ids[0], s[-8:])


def test_bilstm_pad_freeze_matches_solo_run():
    """A padded short row must produce the identical final hidden as
    running it alone at its true length (pack_padded_sequence
    semantics)."""
    rng = np.random.default_rng(7)
    lstm = _BiLSTM(rng, 8, 5)
    emb = rng.standard_normal((1, 3, 8)).astype(np.float32)
    padded = np.pad(emb, ((0, 0), (0, 4), (0, 0)))
    _, h_pad = lstm.run(padded, np.array([3]))
    _, h_solo = lstm.run(emb, np.array([3]))
    assert np.allclose(h_pad, h_solo, atol=1e-6)


def test_s3m_batch_split_equivalence():
    ta = ["a b c d", "x y z", "a b c d", "longer text with many tokens here"]
    tb = ["a b q", "x y z w", "hello world", "short"]
    full = S3MNumpy().score_pairs(ta, tb)
    m = S3MNumpy()
    split = np.concatenate(
        [m.score_pairs(ta[:2], tb[:2]), m.score_pairs(ta[2:], tb[2:])]
    )
    assert np.allclose(full, split, atol=1e-5)


def test_s3m_cache_equals_direct_encode():
    m = S3MNumpy()
    texts = ["alpha beta", "gamma", "alpha beta"]
    direct = m.encode(texts)
    cached = m.cached_encode(texts)
    assert np.allclose(direct, cached, atol=1e-6)
    # repeated text hits the cache: rows 0 and 2 identical
    assert np.allclose(cached[0], cached[2])


def test_s3m_symmetric_feature_map():
    """(h1+h2)/2, h1*h2 and ||h1-h2|| are all symmetric -> the score
    must be pair-order invariant (the reference trains with both
    orders; the feature map guarantees it structurally)."""
    m = S3MNumpy()
    s_ab = m.score_pairs(["a b c"], ["x y c"])
    s_ba = m.score_pairs(["x y c"], ["a b c"])
    assert np.allclose(s_ab, s_ba, atol=1e-6)


def test_cross_encoder_flag_path_changes_score():
    ce = LSTMCrossEncoderNumpy()
    shared = ce.score_pairs(["alpha beta gamma"], ["alpha beta delta"])
    disjoint = ce.score_pairs(["alpha beta gamma"], ["eps zeta delta"])
    assert not np.allclose(shared, disjoint)


def test_cross_encoder_batch_split_equivalence():
    ta = ["a b c", "p q r s", "common token stream"]
    tb = ["a z c", "p q", "common other stream"]
    ce = LSTMCrossEncoderNumpy()
    full = ce.score_pairs(ta, tb)
    split = np.concatenate(
        [ce.score_pairs(ta[:1], tb[:1]), ce.score_pairs(ta[1:], tb[1:])]
    )
    assert np.allclose(full, split, atol=1e-5)


def test_s3m_indexed_equals_list_path():
    """score_pairs_indexed (the grid's hot path: doc array + pair
    index arrays, used docs encoded once) must equal score_pairs on
    the materialized text lists."""
    texts = np.asarray(
        ["a b c", "x y z", "a b q", "common stream here", "unused doc"],
        dtype=object,
    )
    ia = np.array([0, 1, 2, 0])
    ib = np.array([2, 3, 0, 3])
    s_idx = S3MNumpy().score_pairs_indexed(texts, ia, ib)
    s_lst = S3MNumpy().score_pairs(
        [texts[i] for i in ia], [texts[i] for i in ib]
    )
    assert np.allclose(s_idx, s_lst, atol=1e-6)
    empty = np.array([], dtype=np.int64)
    assert S3MNumpy().score_pairs_indexed(texts, empty, empty).shape == (0,)


def test_seeded_reconstruction_identical():
    """Two instances from the same seed are the same model — the
    property that lets every worker rebuild weights locally instead
    of shipping them."""
    a = S3MNumpy(seed=123).score_pairs(["x y"], ["x z"])
    b = S3MNumpy(seed=123).score_pairs(["x y"], ["x z"])
    c = S3MNumpy(seed=124).score_pairs(["x y"], ["x z"])
    assert np.allclose(a, b)
    assert not np.allclose(a, c)


@pytest.mark.usefixtures("ray_session")
def test_s3m_pair_scores_pipeline():
    from stack_trace_deduplication_ray.pipelines.neural import s3m_pair_scores

    df = (
        s3m_pair_scores(SF)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert len(df) > 0
    assert (df["src"] < df["dst"]).all()
    assert df.groupby("src").size().max() <= 5
    df2 = (
        s3m_pair_scores(SF)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert df.equals(df2)


@pytest.mark.usefixtures("ray_session")
def test_cross_encoder_rerank_pipeline():
    from stack_trace_deduplication_ray.pipelines.neural import (
        cross_encoder_rerank,
    )
    from stack_trace_deduplication_ray.pipelines.ranking import (
        lerch_pair_scores,
    )

    df = (
        cross_encoder_rerank(SF, k=3, retrieve_k=5)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert len(df) > 0
    assert df.groupby("src").size().max() <= 3
    # reranked pairs are a subset of the first-stage candidate set
    cand = lerch_pair_scores(SF, k=5).to_pandas()
    cand_keys = set(zip(cand["src"], cand["dst"]))
    assert set(zip(df["src"], df["dst"])) <= cand_keys
    df2 = (
        cross_encoder_rerank(SF, k=3, retrieve_k=5)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert df.equals(df2)


def test_s3m_hidden_cache_cap_bounds_memory_and_keeps_scores():
    # an all-distinct stream through a tiny hidden-cache cap must score
    # identically to the uncapped model, with the cache staying bounded
    ta = [f"alpha{i} beta{i}" for i in range(20)]
    tb = [f"gamma{i} delta{i}" for i in range(20)]
    capped = S3MNumpy(cache_cap=6)
    plain = S3MNumpy()
    got, want = [], []
    for i in range(0, 20, 4):
        got.append(capped.score_pairs(ta[i : i + 4], tb[i : i + 4]))
        want.append(plain.score_pairs(ta[i : i + 4], tb[i : i + 4]))
        assert len(capped._cache) <= 8  # cap clears; <=1 batch resident
    assert np.allclose(np.concatenate(got), np.concatenate(want), atol=1e-6)


def test_s3m_cache_cap_clear_mid_fill_keeps_batch_claims():
    # one batch larger than the cap with duplicate texts: the clear
    # must not drop hidden states this batch already claimed
    m = S3MNumpy(cache_cap=2)
    ta = ["a b", "c d", "a b", "e f"]
    tb = ["x y", "x y", "z w", "z w"]
    got = m.score_pairs(ta, tb)
    want = S3MNumpy().score_pairs(ta, tb)
    assert np.allclose(got, want, atol=1e-6)
