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


def test_pad_sequences_batch_semantics():
    """M12: left-truncate to max_len, wrap SOS/EOS, optional fixed pad
    (reference padding.py:8-107 semantics)."""
    import pyarrow as pa

    from stack_trace_deduplication_ray.functions.tokenize import (
        EOS_ID,
        PAD_ID,
        SOS_ID,
        pad_sequences_batch,
    )

    batch = pa.table(
        {
            "rid": pa.array([1, 2, 3], type=pa.int64()),
            "seq": pa.array(
                [[10, 11, 12, 13, 14], [20], []],
                type=pa.list_(pa.int64()),
            ),
        }
    )
    out = pad_sequences_batch(batch, col="seq", max_len=3)
    seqs = out.column("seq").to_pylist()
    # left-truncate keeps the LAST max_len ids (deepest frames)
    assert seqs[0] == [SOS_ID, 12, 13, 14, EOS_ID]
    assert seqs[1] == [SOS_ID, 20, EOS_ID]
    assert seqs[2] == [SOS_ID, EOS_ID]
    assert out.column("rid").to_pylist() == [1, 2, 3]

    fixed = pad_sequences_batch(batch, col="seq", max_len=3, fixed=True)
    fseqs = fixed.column("seq").to_pylist()
    assert all(len(s) == 5 for s in fseqs)
    assert fseqs[1] == [SOS_ID, 20, EOS_ID, PAD_ID, PAD_ID]
    assert fseqs[2] == [SOS_ID, EOS_ID, PAD_ID, PAD_ID, PAD_ID]


def test_pad_sequences_ds(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stack_trace_deduplication_ray.functions.tokenize import (
        pad_sequences_ds,
    )

    rng = np.random.default_rng(3)
    seqs = [list(rng.integers(10, 100, rng.integers(0, 30))) for _ in range(500)]
    ds = rd.from_arrow(
        pa.table({"seq": pa.array(seqs, type=pa.list_(pa.int64()))})
    )
    from stack_trace_deduplication_ray.functions.tokenize import EOS_ID, PAD_ID

    out = pad_sequences_ds(ds, max_len=8, fixed=True).to_pandas()
    assert all(len(s) == 10 for s in out["seq"])
    # tail-preservation: last real id before EOS == original last id
    for orig, padded in zip(seqs, out["seq"]):
        body = [t for t in padded[1:] if t not in (PAD_ID, EOS_ID)]
        assert body == orig[-8:]
