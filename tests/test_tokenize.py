"""Camel/dot pre-tokenizer + deterministic from-scratch BPE."""

import numpy as np

from stack_trace_deduplication_ray.functions.tokenize import (
    BpeEncoder,
    split_camel_dot,
    train_bpe,
)


def test_split_camel_dot():
    assert split_camel_dot("com.foo.BarBaz.doHTTPCall") == [
        "com", "foo", "bar", "baz", "do", "http", "call",
    ]
    assert split_camel_dot("lambda$handle$0") == ["lambda", "handle", "0"]
    assert split_camel_dot("XMLParser", lowercase=False) == ["XML", "Parser"]
    assert split_camel_dot("") == []


def test_bpe_train_deterministic_and_merges_frequent_pairs():
    texts = ["low low low lower lowest", "new newer newest low"] * 3
    m1 = train_bpe(texts, num_merges=30)
    m2 = train_bpe(list(texts), num_merges=30)
    assert m1 == m2  # bit-identical refit
    assert len(m1) > 0
    # 'lo' ('l','o') is the most frequent pair -> merged early
    assert ("l", "o") in m1[:3]


def test_bpe_encode_roundtrip_and_cache():
    texts = ["aaab aaab aaab abab"] * 4
    enc = BpeEncoder(train_bpe(texts, num_merges=20))
    subs = enc.encode_word("aaab")
    # subwords reassemble the word (+ end marker)
    assert "".join(subs).replace("</w>", "") == "aaab"
    assert enc.encode_word("aaab") is subs  # memoized
    # unseen word still encodes (falls back to chars + any merges)
    out = enc.encode_word("zzz")
    assert "".join(out).replace("</w>", "") == "zzz"
    # full-text encode concatenates per-word pieces
    assert len(enc.encode("aaab zzz")) == len(subs) + len(out)


def test_bpe_query_runs(ray_session):
    from stack_trace_deduplication_ray.pipelines.analysis import bpe_token_counts

    out = bpe_token_counts("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert (out.n_subwords >= out.n_words).all()  # each word >= 1 piece
    out2 = bpe_token_counts("/root/testdata/sf0.001").to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True)
    )
