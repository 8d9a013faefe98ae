"""T13 embedding-client stage: truncation, memoization, cost metering
and the actor-pool pipeline. The remote call itself is the stubbed
seam (no network here); everything around it is exercised for real."""

import numpy as np
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.stages.embed_client import (
    DeterministicLocalBackend,
    EmbedClientStage,
    ExternalServiceBackend,
    PriceTracker,
)

SF = "/root/testdata/sf0.001"


def test_price_tracker_math_and_alerts():
    t = PriceTracker(price_per_1k_tokens=2.0, alert_every_spent_dollar=1.0)
    t.update(400)  # $0.8
    assert t.alerts == 0
    t.update(200)  # $1.2 -> crossed $1
    assert t.alerts == 1
    t.update(1000)  # $3.2 -> crossed $2 and $3
    assert t.alerts == 3
    assert t.tokens == 1600
    assert abs(t.price - 3.2) < 1e-9


def test_local_backend_deterministic_unit_norm():
    a = DeterministicLocalBackend(dim=16, seed=7)
    b = DeterministicLocalBackend(dim=16, seed=7)
    toks = [np.array([1, 2, 3], dtype=np.uint64), np.array([9], dtype=np.uint64)]
    ea, eb = a.encode_batch(toks), b.encode_batch(toks)
    assert np.allclose(ea, eb)
    assert np.allclose(np.linalg.norm(ea, axis=1), 1.0, atol=1e-5)
    c = DeterministicLocalBackend(dim=16, seed=8).encode_batch(toks)
    assert not np.allclose(ea, c)


def test_external_backend_is_a_stub():
    be = ExternalServiceBackend("remote-emb", "tok", dim=8)
    with pytest.raises(NotImplementedError):
        be.encode_batch([np.array([1], dtype=np.uint64)])


def _batch(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_stage_memo_bills_duplicates_once():
    st = EmbedClientStage(dim=8, max_input_tokens=16, price_per_1k_tokens=1.0)
    out = st(_batch(["a b c", "a b c", "x y"]))
    # 3 rows emitted, but only 2 distinct truncated streams billed
    assert len(out) == 3
    assert st.tracker.tokens == 3 + 2
    e = np.stack(out.column("embedding").to_numpy(zero_copy_only=False))
    assert np.allclose(e[0], e[1])
    assert not np.allclose(e[0], e[2])
    # a second batch with a seen text bills nothing new
    st(_batch(["a b c"]))
    assert st.tracker.tokens == 5


def test_stage_truncates_to_last_window():
    st = EmbedClientStage(dim=8, max_input_tokens=4)
    long = " ".join(f"t{i}" for i in range(20))
    out = st(_batch([long]))
    assert out.column("consumed_tokens")[0].as_py() == 4
    # the billed window is the LAST 4 tokens: a text equal to that
    # suffix maps to the same embedding (memo hit, no new billing)
    before = st.tracker.tokens
    out2 = st(_batch([" ".join(f"t{i}" for i in range(16, 20))]))
    assert st.tracker.tokens == before
    e1 = np.asarray(out.column("embedding")[0].as_py())
    e2 = np.asarray(out2.column("embedding")[0].as_py())
    assert np.allclose(e1, e2)


def test_stage_token_permutation_not_collided():
    st = EmbedClientStage(dim=8)
    out = st(_batch(["alpha beta", "beta alpha"]))
    # position-mixed memo keys: permuted texts are distinct requests
    assert st.tracker.tokens == 4


@pytest.mark.usefixtures("ray_session")
def test_embed_client_pipeline_batching_independent():
    from stack_trace_deduplication_ray.pipelines.analysis import (
        embed_client_cost,
        embed_client_vectors,
    )

    a = (
        embed_client_vectors(SF, dim=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == 500
    ea = np.stack(a["embedding"].to_numpy())
    assert np.allclose(np.linalg.norm(ea, axis=1), 1.0, atol=1e-4)
    b = (
        embed_client_vectors(SF, dim=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.allclose(ea, np.stack(b["embedding"].to_numpy()))

    # cost metering parity with the SQL definition
    import duckdb

    cost = (
        embed_client_cost(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    sql = (
        "SELECT doc_id, LEAST(len(string_split(text, ' ')), 256)::BIGINT "
        f"AS consumed_tokens FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id"
    )
    oracle = con.execute(sql).df().reset_index(drop=True)
    assert cost.astype("int64").equals(oracle.astype("int64"))


def test_stage_memo_cap_bounds_memory_and_keeps_values():
    # all-distinct stream through a tiny cap: embeddings must match an
    # uncapped stage exactly and the memo must never exceed the cap
    texts = [f"tok{i} tok{i + 1} tok{i + 2}" for i in range(25)]
    capped = EmbedClientStage(dim=8, memo_cap=4)
    plain = EmbedClientStage(dim=8)
    outs_c, outs_p = [], []
    for i in range(0, len(texts), 5):
        chunk = texts[i : i + 5]
        ids = list(range(i, i + len(chunk)))
        outs_c.append(capped(_batch(chunk, ids)))
        outs_p.append(plain(_batch(chunk, ids)))
        assert len(capped._memo) <= 5  # cap=4 clears; <=1 batch resident
    ec = np.concatenate(
        [np.stack(o.column("embedding").to_numpy(zero_copy_only=False)) for o in outs_c]
    )
    ep = np.concatenate(
        [np.stack(o.column("embedding").to_numpy(zero_copy_only=False)) for o in outs_p]
    )
    assert np.allclose(ec, ep)


def test_stage_memo_cap_clear_mid_fill_keeps_batch_claims():
    # one batch larger than the cap with internal duplicates: the
    # clear must not drop values the same batch already claimed
    st = EmbedClientStage(dim=8, memo_cap=2)
    texts = ["a b", "c d", "a b", "e f", "g h", "a b"]
    out = st(_batch(texts))
    e = np.stack(out.column("embedding").to_numpy(zero_copy_only=False))
    assert np.allclose(e[0], e[2])
    assert np.allclose(e[0], e[5])
    ref = EmbedClientStage(dim=8)(_batch(texts))
    er = np.stack(ref.column("embedding").to_numpy(zero_copy_only=False))
    assert np.allclose(e, er)
