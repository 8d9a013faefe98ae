"""Property-based tests (hypothesis) for the pure kernels: padding
vs a row-at-a-time reference implementation, and the broadcast join
vs an in-memory pandas merge. These cover the input space the
fixed-seed tests cannot (ragged lengths, empty rows, adversarial key
overlap)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from stack_trace_deduplication_ray.functions.tokenize import (
    EOS_ID,
    PAD_ID,
    SOS_ID,
    pad_sequences_batch,
)

seqs_strategy = st.lists(
    st.lists(st.integers(min_value=3, max_value=1000), max_size=40),
    min_size=1,
    max_size=50,
)


def _pad_reference(seq: list[int], max_len: int, fixed: bool) -> list[int]:
    """Row-at-a-time transliteration of the reference semantics
    (padding.py:8-107): tail-keep max_len, wrap SOS/EOS, optional
    right-pad to max_len + 2."""
    kept = seq[len(seq) - min(len(seq), max_len):]
    out = [SOS_ID] + kept + [EOS_ID]
    if fixed:
        out = out + [PAD_ID] * (max_len + 2 - len(out))
    return out


@settings(max_examples=200, deadline=None)
@given(seqs=seqs_strategy, max_len=st.integers(1, 50), fixed=st.booleans())
def test_pad_sequences_matches_reference(seqs, max_len, fixed):
    batch = pa.table(
        {
            "i": pa.array(range(len(seqs)), type=pa.int64()),
            "seq": pa.array(seqs, type=pa.list_(pa.int64())),
        }
    )
    out = pad_sequences_batch(batch, col="seq", max_len=max_len, fixed=fixed)
    got = out.column("seq").to_pylist()
    want = [_pad_reference(s, max_len, fixed) for s in seqs]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    lk=st.lists(st.integers(0, 30), min_size=0, max_size=60),
    rk=st.lists(st.integers(0, 30), min_size=0, max_size=20, unique=True),
    join_type=st.sampled_from(["inner", "left_outer"]),
)
def test_broadcast_attach_matches_pandas(ray_session, lk, rk, join_type):
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.stages.joins import broadcast_attach

    cfg = DedupConfig(num_partitions=4)
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(lk, type=pa.int64()),
                "v": pa.array(np.arange(len(lk))),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "__rk": pa.array(rk, type=pa.int64()),
                "w": pa.array([x * 10 for x in rk], type=pa.int64()),
            }
        )
    )
    out = broadcast_attach(
        left, right, "k", "__rk", cfg,
        join_type=join_type, right_rows=len(rk),
    ).to_pandas()
    ldf = pd.DataFrame({"k": pd.Series(lk, dtype="int64"),
                        "v": np.arange(len(lk))})
    rdf = pd.DataFrame({"k": pd.Series(rk, dtype="int64"),
                        "w": pd.Series([x * 10 for x in rk], dtype="int64")})
    how = "inner" if join_type == "inner" else "left"
    want = ldf.merge(rdf, on="k", how=how)
    if len(want) == 0:
        assert len(out) == 0
        return
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    want = want.sort_values(["k", "v"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    gw, ww = got["w"].to_numpy(dtype=float), want["w"].to_numpy(dtype=float)
    assert ((gw == ww) | (np.isnan(gw) & np.isnan(ww))).all()


def test_embedding_dedup_clusters(ray_session):
    """Embedding near-dup clustering: every vector labeled exactly
    once, cluster_id = min member id, deterministic across runs."""
    from stack_trace_deduplication_ray.pipelines.similarity import (
        embedding_dedup_clusters,
    )

    a = embedding_dedup_clusters("/root/testdata/sf0.001").to_pandas()
    assert len(a) == 500 and a.vec_id.is_unique
    mins = a.groupby("cluster_id")["vec_id"].min()
    assert (mins.index == mins.values).all()
    b = embedding_dedup_clusters("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("vec_id").reset_index(drop=True),
        b.sort_values("vec_id").reset_index(drop=True),
    )
