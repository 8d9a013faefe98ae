"""Full-model training for the S3M cross-encoder: from-scratch
backpropagation through time, no autograd framework.

`pipelines/training.py` trains the scoring head over a frozen
encoder; this module removes the freeze. `S3MTrainable` carries the
SAME parameters as the inference model `neural.S3MNumpy` (identical
seeded init — training starts exactly where the deployed scorer
starts) and computes exact analytic gradients of the reference's
BCE-with-logits triplet objective (reranker_losses.py:46-54) with
respect to EVERY parameter: the token embedding table, both LSTM
directions (W, U, b each), and the two head layers — the full
gradient the reference's torch training computes
(train_model.py:105-165), derived by hand here:

* the LSTM backward replays the gate algebra in reverse with the
  pack-padded masking respected: a padded step's state carried
  `h_t = h_{t-1}` forward, so its gradient carries `dh_{t-1} += dh_t`
  straight through and contributes nothing to the gates;
* the backward-direction LSTM consumed each row's reversed valid
  prefix, so its embedding gradient un-reverses through the same
  index map;
* S3M uses only the final hidden state of each side (s3m.py:37-62),
  so BPTT seeds from `dh_final` alone;
* the pair feature map [(h1+h2)/2, h1*h2, ||h1-h2||] backprops into
  BOTH sides of every pair, and an anchor shared by a positive and a
  negative pair accumulates both contributions via the scatter-add
  into the embedding table;
* PAD embedding row stays frozen at zero (its gradient is masked),
  matching padding_idx=0 embeddings in the reference.

Everything is float64 and SUM-form, so per-batch partials add exactly
across a distributed gradient pass (same contract as
`neural.head_loss_and_grads`). Verified parameter-by-parameter
against central finite differences in tests/test_training_full.py.
"""

from __future__ import annotations

import numpy as np

from stack_trace_deduplication_ray.functions.neural import (
    S3MNumpy,
    _sigmoid,
    pad_id_lists,
    token_ids_batch,
)
from stack_trace_deduplication_ray.functions.tokenize import PAD_ID

# canonical parameter order for flatten/unflatten across the wire
PARAM_NAMES = (
    "E",
    "Wf", "Uf", "bf",
    "Wb", "Ub", "bb",
    "W1", "b1", "W2", "b2",
)


def params_from_model(model: S3MNumpy) -> dict[str, np.ndarray]:
    """float64 training copies of an inference model's parameters."""
    p = {
        "E": model.E,
        "Wf": model.lstm.fwd[0], "Uf": model.lstm.fwd[1], "bf": model.lstm.fwd[2],
        "Wb": model.lstm.bwd[0], "Ub": model.lstm.bwd[1], "bb": model.lstm.bwd[2],
        "W1": model.W1, "b1": model.b1, "W2": model.W2, "b2": model.b2,
    }
    return {k: np.asarray(v, dtype=np.float64).copy() for k, v in p.items()}


def install_params(model: S3MNumpy, params: dict[str, np.ndarray]) -> None:
    """Write trained params back into an inference model (float32,
    the serving dtype); clears its hidden cache."""
    f32 = lambda k: np.asarray(params[k], dtype=np.float32)  # noqa: E731
    model.E = f32("E")
    model.E[PAD_ID] = 0.0
    model.lstm.fwd = (f32("Wf"), f32("Uf"), f32("bf"))
    model.lstm.bwd = (f32("Wb"), f32("Ub"), f32("bb"))
    model.W1, model.b1 = f32("W1"), f32("b1")
    model.W2, model.b2 = f32("W2"), f32("b2")
    model._cache.clear()


def flatten_params(params: dict[str, np.ndarray]) -> np.ndarray:
    return np.concatenate([params[k].reshape(-1) for k in PARAM_NAMES])


def unflatten_params(flat: np.ndarray, like: dict[str, np.ndarray]):
    out, off = {}, 0
    for k in PARAM_NAMES:
        sz = like[k].size
        out[k] = flat[off : off + sz].reshape(like[k].shape)
        off += sz
    return out


def _lstm_forward_cached(ids_emb, lens, W, U, b, h, want_outs: bool = False):
    """One LSTM direction with caches for BPTT. Returns (h_final,
    outs (N,T,h) zeroed past each length — None unless `want_outs` —
    and cache). `ids_emb` is the (N,T,d) embedded input for THIS
    direction (already reversed for the backward direction)."""
    N, T, _ = ids_emb.shape
    hs = np.zeros((N, h))
    cs = np.zeros((N, h))
    outs = np.zeros((N, T, h)) if want_outs else None
    cache = []
    for t in range(T):
        active = (t < lens)[:, None].astype(np.float64)
        z = ids_emb[:, t, :] @ W + hs @ U + b
        i = _sigmoid(z[:, :h])
        f = _sigmoid(z[:, h : 2 * h])
        g = np.tanh(z[:, 2 * h : 3 * h])
        o = _sigmoid(z[:, 3 * h :])
        c_new = f * cs + i * g
        tc = np.tanh(c_new)
        h_new = o * tc
        cache.append((hs, cs, i, f, g, o, tc, active))
        hs = active * h_new + (1 - active) * hs
        cs = active * c_new + (1 - active) * cs
        if want_outs:
            outs[:, t, :] = active * h_new
    return hs, outs, cache


def _lstm_backward(ids_emb, lens, W, U, dh_final, cache, h, d_outs=None):
    """BPTT for one direction seeded from the final-hidden gradient
    and, optionally, per-timestep output gradients `d_outs` (N,T,h)
    (the pooled aggregations of the P5 text encoder). Returns
    (d_emb (N,T,d), dW, dU, db)."""
    N, T, d = ids_emb.shape
    dW = np.zeros_like(W)
    dU = np.zeros_like(U)
    db = np.zeros(4 * h)
    d_emb = np.zeros((N, T, d))
    dh = dh_final.copy()
    dc = np.zeros((N, h))
    for t in range(T - 1, -1, -1):
        h_prev, c_prev, i, f, g, o, tc, active = cache[t]
        dh_new = dh * active
        if d_outs is not None:
            # outs[:, t] = active * h_new — output grads enter h_new
            # directly at their own step, masked
            dh_new = dh_new + d_outs[:, t, :] * active
        dh_skip = dh * (1 - active)
        dc_new = dc * active
        dc_skip = dc * (1 - active)
        do = dh_new * tc
        dct = dh_new * o * (1 - tc * tc) + dc_new
        df = dct * c_prev
        di = dct * g
        dg = dct * i
        dz = np.concatenate(
            [
                di * i * (1 - i),
                df * f * (1 - f),
                dg * (1 - g * g),
                do * o * (1 - o),
            ],
            axis=1,
        )
        x_t = ids_emb[:, t, :]
        dW += x_t.T @ dz
        dU += h_prev.T @ dz
        db += dz.sum(axis=0)
        d_emb[:, t, :] = dz @ W.T
        dh = dz @ U.T + dh_skip
        dc = dct * f + dc_skip
    return d_emb, dW, dU, db


def _gru_forward_cached(ids_emb, lens, W, U, b, h, want_outs: bool = False):
    """One GRU direction with caches for BPTT (the reference's GRUEmb
    sibling of LSTMEmb, encoders/modules/rnn). Gate order (r, z, n) in
    the stacked (d,3h)/(h,3h)/(3h) params; single-bias form
    n = tanh(xW_n + r*(hU_n) + b_n) — torch's split hidden bias only
    matters for bit-parity with torch, which this container cannot
    have anyway. Masking semantics identical to the LSTM: padded
    steps freeze the state."""
    N, T, _ = ids_emb.shape
    hs = np.zeros((N, h))
    outs = np.zeros((N, T, h)) if want_outs else None
    cache = []
    for t in range(T):
        active = (t < lens)[:, None].astype(np.float64)
        x = ids_emb[:, t, :]
        # gates: r, z from x/h; candidate n uses r-gated hidden term
        ar = x @ W[:, :h] + hs @ U[:, :h] + b[:h]
        az = x @ W[:, h : 2 * h] + hs @ U[:, h : 2 * h] + b[h : 2 * h]
        r = _sigmoid(ar)
        z = _sigmoid(az)
        hu = hs @ U[:, 2 * h :]
        an = x @ W[:, 2 * h :] + r * hu + b[2 * h :]
        n = np.tanh(an)
        h_new = (1 - z) * n + z * hs
        cache.append((hs, r, z, n, hu, active))
        hs = active * h_new + (1 - active) * hs
        if want_outs:
            outs[:, t, :] = active * h_new
    return hs, outs, cache


def _gru_backward(ids_emb, lens, W, U, dh_final, cache, h, d_outs=None):
    """BPTT for one GRU direction (see _lstm_backward for the masking
    discipline). Returns (d_emb, dW, dU, db)."""
    N, T, d = ids_emb.shape
    dW = np.zeros_like(W)
    dU = np.zeros_like(U)
    db = np.zeros(3 * h)
    d_emb = np.zeros((N, T, d))
    dh = dh_final.copy()
    for t in range(T - 1, -1, -1):
        h_prev, r, z, n, hu, active = cache[t]
        dh_new = dh * active
        if d_outs is not None:
            dh_new = dh_new + d_outs[:, t, :] * active
        dh_skip = dh * (1 - active)
        # h' = (1-z)*n + z*h_prev
        dn = dh_new * (1 - z)
        dz = dh_new * (h_prev - n)
        dh_prev = dh_new * z
        dan = dn * (1 - n * n)
        dr = dan * hu
        dhu = dan * r
        dar = dr * r * (1 - r)
        daz = dz * z * (1 - z)
        x = ids_emb[:, t, :]
        dW[:, :h] += x.T @ dar
        dW[:, h : 2 * h] += x.T @ daz
        dW[:, 2 * h :] += x.T @ dan
        dU[:, :h] += h_prev.T @ dar
        dU[:, h : 2 * h] += h_prev.T @ daz
        dU[:, 2 * h :] += h_prev.T @ dhu
        db[:h] += dar.sum(axis=0)
        db[h : 2 * h] += daz.sum(axis=0)
        db[2 * h :] += dan.sum(axis=0)
        d_emb[:, t, :] = (
            dar @ W[:, :h].T + daz @ W[:, h : 2 * h].T + dan @ W[:, 2 * h :].T
        )
        dh = (
            dh_prev
            + dar @ U[:, :h].T
            + daz @ U[:, h : 2 * h].T
            + dhu @ U[:, 2 * h :].T
            + dh_skip
        )
    return d_emb, dW, dU, db


# rnn kind registry: (forward, backward, gates-per-cell)
_RNN_KINDS = {
    "lstm": (_lstm_forward_cached, _lstm_backward, 4),
    "gru": (_gru_forward_cached, _gru_backward, 3),
}


def _reverse_padded(emb: np.ndarray, lens: np.ndarray) -> np.ndarray:
    N, T, _ = emb.shape
    idx = np.arange(T)[None, :]
    rev = np.where(idx < lens[:, None], lens[:, None] - 1 - idx, 0)
    out = emb[np.arange(N)[:, None], rev].copy()
    out[idx >= lens[:, None]] = 0.0
    return out


def _encode_with_cache(ids, lens, params, h):
    """Both directions forward with caches. Returns (h_final (N,2h),
    forward cache bundle for the backward pass)."""
    emb = params["E"][ids]
    emb[ids == PAD_ID] = 0.0
    emb_r = _reverse_padded(emb, lens)
    hf, _, cf = _lstm_forward_cached(emb, lens, params["Wf"], params["Uf"], params["bf"], h)
    hb, _, cb = _lstm_forward_cached(emb_r, lens, params["Wb"], params["Ub"], params["bb"], h)
    return np.concatenate([hf, hb], axis=1), (emb, emb_r, cf, cb)


def _encoder_backward(ids, lens, params, h, fwd_state, dh_cat, grads):
    """Backprop a final-hidden gradient through both directions and
    scatter the embedding gradient (PAD row masked)."""
    emb, emb_r, cf, cb = fwd_state
    dh_f, dh_b = dh_cat[:, :h], dh_cat[:, h:]
    demb_f, dWf, dUf, dbf = _lstm_backward(
        emb, lens, params["Wf"], params["Uf"], dh_f, cf, h
    )
    demb_r, dWb, dUb, dbb = _lstm_backward(
        emb_r, lens, params["Wb"], params["Ub"], dh_b, cb, h
    )
    grads["Wf"] += dWf
    grads["Uf"] += dUf
    grads["bf"] += dbf
    grads["Wb"] += dWb
    grads["Ub"] += dUb
    grads["bb"] += dbb
    # un-reverse the backward direction's embedding gradient through
    # the same index map the forward pass used
    N, T, _ = emb.shape
    idx = np.arange(T)[None, :]
    valid = idx < lens[:, None]
    rev = np.where(valid, lens[:, None] - 1 - idx, 0)
    demb = demb_f
    np.add.at(demb, (np.arange(N)[:, None], rev), np.where(valid[:, :, None], demb_r, 0.0))
    flat_ids = ids.reshape(-1)
    keep = flat_ids != PAD_ID
    np.add.at(
        grads["E"], flat_ids[keep], demb.reshape(-1, demb.shape[2])[keep]
    )


# ---------------------------------------------------------------------------
# P5: the token-level LSTM cross-encoder (rnn.py:34-103), trainable.
# ---------------------------------------------------------------------------

P5_PARAM_NAMES = (
    "E", "siv",
    "Wf", "Uf", "bf",
    "Wb", "Ub", "bb",
    "Wmix", "bmix", "W1", "b1", "W2", "b2",
)


def p5_params_from_model(model) -> dict[str, np.ndarray]:
    """float64 training copies of an LSTMCrossEncoderNumpy's params."""
    p = {
        "E": model.E, "siv": model.same_item_vec,
        "Wf": model.lstm.fwd[0], "Uf": model.lstm.fwd[1], "bf": model.lstm.fwd[2],
        "Wb": model.lstm.bwd[0], "Ub": model.lstm.bwd[1], "bb": model.lstm.bwd[2],
        "Wmix": model.Wmix, "bmix": model.bmix,
        "W1": model.W1, "b1": model.b1, "W2": model.W2, "b2": model.b2,
    }
    return {k: np.asarray(v, dtype=np.float64).copy() for k, v in p.items()}


def p5_install_params(model, params: dict[str, np.ndarray]) -> None:
    f32 = lambda k: np.asarray(params[k], dtype=np.float32)  # noqa: E731
    model.E = f32("E")
    model.E[PAD_ID] = 0.0
    model.same_item_vec = f32("siv")
    model.lstm.fwd = (f32("Wf"), f32("Uf"), f32("bf"))
    model.lstm.bwd = (f32("Wb"), f32("Ub"), f32("bb"))
    model.Wmix, model.bmix = f32("Wmix"), f32("bmix")
    model.W1, model.b1 = f32("W1"), f32("b1")
    model.W2, model.b2 = f32("W2"), f32("b2")


def p5_flatten(params: dict[str, np.ndarray]) -> np.ndarray:
    return np.concatenate([params[k].reshape(-1) for k in P5_PARAM_NAMES])


def p5_unflatten(flat: np.ndarray, like: dict[str, np.ndarray]):
    out, off = {}, 0
    for k in P5_PARAM_NAMES:
        sz = like[k].size
        out[k] = flat[off : off + sz].reshape(like[k].shape)
        off += sz
    return out


def _text_enc_forward(ids, lens, flags, p, h, rnn: str = "lstm"):
    """The LSTMEmb/GRUEmb text encoder (encoders/modules/rnn/
    rnn.py:29-88) forward with caches: token embedding (+ optional
    flag vector when `flags`/`p["siv"]` are present) -> bi-RNN ->
    ConcatAgg(final, max, avg) -> mixture linear. Shared by the P5
    cross-encoder and the bi-encoder; `rnn` selects the cell (the
    reference's rnn_type switch, texts/rnn.py:34-52)."""
    fwd_fn, _, _ = _RNN_KINDS[rnn]
    emb = p["E"][ids]
    if flags is not None:
        emb = emb + flags[:, :, None] * p["siv"]
    emb[ids == PAD_ID] = 0.0
    emb_r = _reverse_padded(emb, lens)
    hf, of, cf = fwd_fn(
        emb, lens, p["Wf"], p["Uf"], p["bf"], h, want_outs=True
    )
    hb, ob, cb = fwd_fn(
        emb_r, lens, p["Wb"], p["Ub"], p["bb"], h, want_outs=True
    )
    outs = np.concatenate([of, ob], axis=2)
    h_final = np.concatenate([hf, hb], axis=1)
    T = ids.shape[1]
    valid = (np.arange(T)[None, :] < lens[:, None])[:, :, None]
    masked = np.where(valid, outs, -np.inf)
    am = masked.argmax(axis=1)  # (N, 2h) first-argmax like torch
    mx = np.take_along_axis(outs, am[:, None, :], axis=1)[:, 0, :]
    avg = outs.sum(axis=1) / lens[:, None]
    agg = np.concatenate([h_final, mx, avg], axis=1)
    e = agg @ p["Wmix"] + p["bmix"]
    state = (emb, emb_r, cf, cb, am, agg, valid)
    return e, state


def _text_enc_backward(ids, lens, flags, p, h, state, de, grads, rnn: str = "lstm"):
    """Backward of `_text_enc_forward`: output-embedding gradient
    `de` -> pooling (max routes to the first argmax, avg spreads
    1/len over valid steps) -> both RNN directions -> embedding
    scatter (+ flag-vector gradient when flags are present)."""
    _, bwd_fn, _ = _RNN_KINDS[rnn]
    emb, emb_r, cf, cb, am, agg, valid = state
    grads["Wmix"] += agg.T @ de
    grads["bmix"] += de.sum(axis=0)
    dagg = de @ p["Wmix"].T
    dh_final = dagg[:, : 2 * h]
    dmx = dagg[:, 2 * h : 4 * h]
    davg = dagg[:, 4 * h :]

    N, T, _ = emb.shape
    d_outs = np.where(valid, (davg / lens[:, None])[:, None, :], 0.0)
    np.add.at(
        d_outs,
        (np.arange(N)[:, None], am, np.arange(2 * h)[None, :]),
        dmx,
    )

    demb_f, dWf, dUf, dbf = bwd_fn(
        emb, lens, p["Wf"], p["Uf"], dh_final[:, :h], cf, h,
        d_outs=d_outs[:, :, :h],
    )
    demb_r, dWb, dUb, dbb = bwd_fn(
        emb_r, lens, p["Wb"], p["Ub"], dh_final[:, h:], cb, h,
        d_outs=d_outs[:, :, h:],
    )
    grads["Wf"] += dWf
    grads["Uf"] += dUf
    grads["bf"] += dbf
    grads["Wb"] += dWb
    grads["Ub"] += dUb
    grads["bb"] += dbb

    idx = np.arange(T)[None, :]
    v2 = idx < lens[:, None]
    rev = np.where(v2, lens[:, None] - 1 - idx, 0)
    demb = demb_f
    np.add.at(
        demb, (np.arange(N)[:, None], rev),
        np.where(v2[:, :, None], demb_r, 0.0),
    )
    # emb = E[ids] (+ flags*siv), then PAD rows zeroed: PAD positions
    # got no gradient (masked in BPTT), so the scatter below is exact
    if flags is not None:
        grads["siv"] += (demb * flags[:, :, None]).sum(axis=(0, 1))
    flat_ids = ids.reshape(-1)
    keep = flat_ids != PAD_ID
    np.add.at(
        grads["E"], flat_ids[keep], demb.reshape(-1, demb.shape[2])[keep]
    )


class LSTMCrossEncoderTrainable:
    """The reference's reranker model (LSTMCrossEncoder, rnn.py) with
    hand-derived full gradients — the `cross_enc` branch of
    train_model.py:105-165. Adds to the S3M derivation: per-timestep
    output gradients through the ConcatAgg pooling (max routes to the
    first argmax like torch; avg spreads 1/len over valid steps), and
    the learned `same_item` cross-feature vector whose gradient is
    the flag-masked sum of embedding gradients. Same seeded init as
    the inference model."""

    def __init__(
        self,
        vocab_size: int = 4096,
        d_input: int = 32,
        hidden: int = 32,
        out_size: int = 32,
        n_ctx: int = 48,
        seed: int = 0xCE11,
    ):
        from stack_trace_deduplication_ray.functions.neural import (
            LSTMCrossEncoderNumpy,
        )

        base = LSTMCrossEncoderNumpy(
            vocab_size=vocab_size, d_input=d_input, hidden=hidden,
            out_size=out_size, n_ctx=n_ctx, seed=seed,
        )
        self.vocab_size = vocab_size
        self.hidden = hidden
        self.out_size = out_size
        self.n_ctx = n_ctx
        self.seed = seed
        self.params = p5_params_from_model(base)

    # ---- one side through the text encoder, with caches ----
    def _encode_side_cached(self, ids, lens, flags, p):
        return _text_enc_forward(ids, lens, flags, p, self.hidden)

    def _side_backward(self, ids, lens, flags, p, state, de, grads):
        _text_enc_backward(ids, lens, flags, p, self.hidden, state, de, grads)

    def loss_and_grads(
        self, ids_a, lens_a, flags_a, ids_b, lens_b, flags_b, y,
        params: dict[str, np.ndarray] | None = None,
    ) -> tuple[float, dict[str, np.ndarray]]:
        p = params if params is not None else self.params
        y = np.asarray(y, dtype=np.float64)
        e1, st1 = self._encode_side_cached(ids_a, lens_a, flags_a, p)
        e2, st2 = self._encode_side_cached(ids_b, lens_b, flags_b, p)

        cat = np.concatenate([e1, e2], axis=1)
        z1 = cat @ p["W1"] + p["b1"]
        a1 = np.maximum(z1, 0.0)
        logit = (a1 @ p["W2"] + p["b2"]).reshape(-1)
        loss = float(
            (np.maximum(logit, 0.0) - logit * y + np.log1p(np.exp(-np.abs(logit)))).sum()
        )

        grads = {k: np.zeros_like(v) for k, v in p.items()}
        dlogit = (_sigmoid(logit) - y)[:, None]
        grads["W2"] += a1.T @ dlogit
        grads["b2"] += dlogit.sum(axis=0)
        dz1 = (dlogit @ p["W2"].T) * (z1 > 0.0)
        grads["W1"] += cat.T @ dz1
        grads["b1"] += dz1.sum(axis=0)
        dcat = dz1 @ p["W1"].T
        de1, de2 = dcat[:, : self.out_size], dcat[:, self.out_size :]

        self._side_backward(ids_a, lens_a, flags_a, p, st1, de1, grads)
        self._side_backward(ids_b, lens_b, flags_b, p, st2, de2, grads)
        grads["E"][PAD_ID] = 0.0
        return loss, grads

    def logits(
        self, ids_a, lens_a, flags_a, ids_b, lens_b, flags_b,
        params: dict[str, np.ndarray] | None = None,
    ) -> np.ndarray:
        p = params if params is not None else self.params
        e1, _ = self._encode_side_cached(ids_a, lens_a, flags_a, p)
        e2, _ = self._encode_side_cached(ids_b, lens_b, flags_b, p)
        cat = np.concatenate([e1, e2], axis=1)
        a1 = np.maximum(cat @ p["W1"] + p["b1"], 0.0)
        return (a1 @ p["W2"] + p["b2"]).reshape(-1)

    def prepare_pairs(self, texts_a: list[str], texts_b: list[str]):
        """Texts -> (ids, lens, flags) per side, with the reference's
        cross-feature semantics: a token is flagged when it occurs in
        the other side's FULL (untruncated) token sequence."""
        seq_a = token_ids_batch(texts_a, self.vocab_size)
        seq_b = token_ids_batch(texts_b, self.vocab_size)
        ids_a, lens_a = pad_id_lists(seq_a, self.n_ctx)
        ids_b, lens_b = pad_id_lists(seq_b, self.n_ctx)
        flags_a = np.zeros(ids_a.shape)
        flags_b = np.zeros(ids_b.shape)
        for i in range(len(seq_a)):
            flags_a[i, : lens_a[i]] = np.isin(ids_a[i, : lens_a[i]], seq_b[i])
            flags_b[i, : lens_b[i]] = np.isin(ids_b[i, : lens_b[i]], seq_a[i])
        return (ids_a, lens_a, flags_a), (ids_b, lens_b, flags_b)


# ---------------------------------------------------------------------------
# The siamese bi-encoder (ModelOnPairs branch of train_model.py:146-153):
# RNNTextEncoder -> cosine -> InfoNCE over in-batch negatives.
# ---------------------------------------------------------------------------

BI_PARAM_NAMES = (
    "E",
    "Wf", "Uf", "bf",
    "Wb", "Ub", "bb",
    "Wmix", "bmix",
)


def bi_flatten(params: dict[str, np.ndarray]) -> np.ndarray:
    return np.concatenate([params[k].reshape(-1) for k in BI_PARAM_NAMES])


def bi_unflatten(flat: np.ndarray, like: dict[str, np.ndarray]):
    out, off = {}, 0
    for k in BI_PARAM_NAMES:
        sz = like[k].size
        out[k] = flat[off : off + sz].reshape(like[k].shape)
        off += sz
    return out


class BiEncoderTrainable:
    """The reference's similarity (retrieval) model training branch:
    a siamese RNN text encoder over (anchor, positive) pairs with the
    InfoNCE / NT-Xent objective and IN-BATCH negatives
    (losses.py:79-91 InfoNCEPairs wiring NTXentLoss(temp) over
    concat(anchors, positives) with paired labels;
    train_model.py:146-153). The encoder is the same LSTMEmb shape as
    the cross-encoder's text encoder (encoders/modules/rnn/rnn.py) —
    shared forward/backward here — WITHOUT the pair-dependent cross
    features, which is what makes it a bi-encoder: every document
    embeds independently, so trained embeddings can be indexed (ANN)
    instead of scored pairwise."""

    def __init__(
        self,
        vocab_size: int = 4096,
        d_input: int = 32,
        hidden: int = 32,
        out_size: int = 32,
        n_ctx: int = 48,
        seed: int = 0xB1E5C0,
        temp: float = 0.05,
        rnn_type: str = "lstm",
    ):
        rng = np.random.default_rng(np.random.PCG64(seed))
        self.vocab_size = vocab_size
        self.hidden = hidden
        self.out_size = out_size
        self.n_ctx = n_ctx
        self.seed = seed
        self.temp = temp
        self.rnn_type = rnn_type
        n_gates = _RNN_KINDS[rnn_type][2]
        E = rng.standard_normal((vocab_size, d_input))
        E[PAD_ID] = 0.0
        k = 1.0 / np.sqrt(hidden)

        def direction():
            return (
                rng.uniform(-k, k, (d_input, n_gates * hidden)),
                rng.uniform(-k, k, (hidden, n_gates * hidden)),
                rng.uniform(-k, k, n_gates * hidden),
            )

        Wf, Uf, bf = direction()
        Wb, Ub, bb = direction()
        km = 1.0 / np.sqrt(6 * hidden)
        self.params = {
            "E": E,
            "Wf": Wf, "Uf": Uf, "bf": bf,
            "Wb": Wb, "Ub": Ub, "bb": bb,
            "Wmix": rng.uniform(-km, km, (6 * hidden, out_size)),
            "bmix": rng.uniform(-km, km, out_size),
        }

    def prepare(self, texts: list[str]):
        seqs = token_ids_batch(texts, self.vocab_size)
        return pad_id_lists(seqs, self.n_ctx)

    def embed(self, ids, lens, params=None) -> np.ndarray:
        """L2-normalized document embeddings (the vectors an ANN
        index would hold)."""
        p = params if params is not None else self.params
        e, _ = _text_enc_forward(
            ids, lens, None, p, self.hidden, rnn=self.rnn_type
        )
        return e / np.maximum(
            np.linalg.norm(e, axis=1, keepdims=True), 1e-12
        )

    def loss_and_grads(
        self,
        ids_a: np.ndarray,
        lens_a: np.ndarray,
        ids_b: np.ndarray,
        lens_b: np.ndarray,
        params: dict[str, np.ndarray] | None = None,
    ) -> tuple[float, dict[str, np.ndarray]]:
        """SUM NT-Xent loss over the 2n in-batch anchors and its
        exact gradient. Every embedding other than an anchor's own
        pair partner is its negative — the per-batch negative set, so
        a distributed pass over B batches optimizes B local-negative
        objectives (exactly torch's per-device behavior)."""
        p = params if params is not None else self.params
        h = self.hidden
        n = len(ids_a)

        ea, sta = _text_enc_forward(ids_a, lens_a, None, p, h, rnn=self.rnn_type)
        eb, stb = _text_enc_forward(ids_b, lens_b, None, p, h, rnn=self.rnn_type)
        e = np.concatenate([ea, eb], axis=0)  # (2n, D)
        norms = np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        z = e / norms
        S = z @ z.T
        m = 2 * n
        logits = S / self.temp
        np.fill_diagonal(logits, -np.inf)
        pi = (np.arange(m) + n) % m  # pair partner index

        row_max = logits.max(axis=1, keepdims=True)
        ex = np.exp(logits - row_max)
        denom = ex.sum(axis=1)
        lse = np.log(denom) + row_max.reshape(-1)
        pos = logits[np.arange(m), pi]
        loss = float((lse - pos).sum())

        # dL/dlogits = softmax - onehot(pi), zero diagonal
        P = ex / denom[:, None]
        P[np.arange(m), pi] -= 1.0
        dS = P / self.temp
        # S = z z^T (same z both sides): dz = (dS + dS^T) @ z
        dz = (dS + dS.T) @ z
        # z = e / ||e||: de = (dz - z (z . dz)) / ||e||
        de = (dz - z * (z * dz).sum(axis=1, keepdims=True)) / norms

        grads = {k: np.zeros_like(v) for k, v in p.items()}
        _text_enc_backward(
            ids_a, lens_a, None, p, h, sta, de[:n], grads, rnn=self.rnn_type
        )
        _text_enc_backward(
            ids_b, lens_b, None, p, h, stb, de[n:], grads, rnn=self.rnn_type
        )
        grads["E"][PAD_ID] = 0.0
        return loss, grads


def dedup_sides(side_a, side_b, max_len: int):
    """Pair side lists (variable-length id arrays) -> (unique padded
    id matrix, lengths, ia, ib) for the *_indexed methods: every
    document that recurs across pairs — every anchor (positive AND
    negative pair), every pool negative drawn twice — is encoded
    once."""
    seen: dict[bytes, int] = {}
    uniq: list[np.ndarray] = []

    def idx_of(s: np.ndarray) -> int:
        k = s.tobytes()
        j = seen.get(k)
        if j is None:
            j = len(uniq)
            seen[k] = j
            uniq.append(s)
        return j

    ia = np.fromiter((idx_of(s) for s in side_a), dtype=np.int64, count=len(side_a))
    ib = np.fromiter((idx_of(s) for s in side_b), dtype=np.int64, count=len(side_b))
    ids, lens = pad_id_lists(uniq, max_len)
    return ids, lens, ia, ib


class S3MTrainable:
    """The S3M cross-encoder with hand-derived full gradients.

    Construction mirrors `S3MNumpy(seed=...)` exactly (same PCG64
    draw order), so `params` starts bit-compatible with the deployed
    inference weights."""

    def __init__(
        self,
        vocab_size: int = 4096,
        emb_dim: int = 32,
        hidden: int = 32,
        max_len: int = 48,
        seed: int = 0x53334D,
    ):
        base = S3MNumpy(
            vocab_size=vocab_size, emb_dim=emb_dim, hidden=hidden,
            max_len=max_len, seed=seed,
        )
        self.vocab_size = vocab_size
        self.hidden = hidden
        self.max_len = max_len
        self.seed = seed
        self.params = params_from_model(base)

    def prepare(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Texts -> (padded id matrix, lengths), the model's input
        contract (tokenize once, reuse across steps)."""
        seqs = token_ids_batch(texts, self.vocab_size)
        return pad_id_lists(seqs, self.max_len)

    def loss_and_grads(
        self,
        ids_a: np.ndarray,
        lens_a: np.ndarray,
        ids_b: np.ndarray,
        lens_b: np.ndarray,
        y: np.ndarray,
        params: dict[str, np.ndarray] | None = None,
    ) -> tuple[float, dict[str, np.ndarray]]:
        """SUM BCE-with-logits loss over pair rows ((ids_a, ids_b) ->
        target y) and its exact gradient for every parameter."""
        p = params if params is not None else self.params
        h = self.hidden
        y = np.asarray(y, dtype=np.float64)

        h1, st1 = _encode_with_cache(ids_a, lens_a, p, h)
        h2, st2 = _encode_with_cache(ids_b, lens_b, p, h)

        # ---- head forward (pair_features + 2-layer ReLU MLP) ----
        diff = h1 - h2
        nrm = np.linalg.norm(diff, axis=1, keepdims=True)
        feats = np.concatenate([(h1 + h2) / 2.0, h1 * h2, nrm], axis=1)
        z1 = feats @ p["W1"] + p["b1"]
        a1 = np.maximum(z1, 0.0)
        logit = (a1 @ p["W2"] + p["b2"]).reshape(-1)
        loss = float(
            (np.maximum(logit, 0.0) - logit * y + np.log1p(np.exp(-np.abs(logit)))).sum()
        )

        # ---- head backward ----
        grads = {k: np.zeros_like(v) for k, v in p.items()}
        dlogit = (_sigmoid(logit) - y)[:, None]
        grads["W2"] += a1.T @ dlogit
        grads["b2"] += dlogit.sum(axis=0)
        dz1 = (dlogit @ p["W2"].T) * (z1 > 0.0)
        grads["W1"] += feats.T @ dz1
        grads["b1"] += dz1.sum(axis=0)
        dfeats = dz1 @ p["W1"].T

        two_h = h1.shape[1]
        df_avg = dfeats[:, :two_h]
        df_prod = dfeats[:, two_h : 2 * two_h]
        df_nrm = dfeats[:, 2 * two_h :]
        # ||h1-h2|| subgradient: 0 at the (measure-zero) identical
        # point — matches torch's norm backward convention
        safe = np.where(nrm > 0.0, nrm, 1.0)
        dn = df_nrm * diff / safe
        dh1 = 0.5 * df_avg + df_prod * h2 + dn
        dh2 = 0.5 * df_avg + df_prod * h1 - dn

        _encoder_backward(ids_a, lens_a, p, h, st1, dh1, grads)
        _encoder_backward(ids_b, lens_b, p, h, st2, dh2, grads)
        grads["E"][PAD_ID] = 0.0
        return loss, grads

    def loss_and_grads_indexed(
        self,
        ids: np.ndarray,
        lens: np.ndarray,
        ia: np.ndarray,
        ib: np.ndarray,
        y: np.ndarray,
        params: dict[str, np.ndarray] | None = None,
    ) -> tuple[float, dict[str, np.ndarray]]:
        """`loss_and_grads` over (unique-document matrix, pair index
        arrays): each distinct document is encoded — and its BPTT
        backward run — exactly ONCE per call no matter how many pairs
        it appears in; pair-side hidden gradients scatter-add into the
        per-document gradient before the single encoder backward.
        Equal to the pairwise form (pinned in tests); this is the
        training analog of the reference's eval-time hidden cache
        (s3m.py:65-81) and the hot path both trainers call."""
        p = params if params is not None else self.params
        h = self.hidden
        y = np.asarray(y, dtype=np.float64)

        h_u, st = _encode_with_cache(ids, lens, p, h)
        h1, h2 = h_u[ia], h_u[ib]

        diff = h1 - h2
        nrm = np.linalg.norm(diff, axis=1, keepdims=True)
        feats = np.concatenate([(h1 + h2) / 2.0, h1 * h2, nrm], axis=1)
        z1 = feats @ p["W1"] + p["b1"]
        a1 = np.maximum(z1, 0.0)
        logit = (a1 @ p["W2"] + p["b2"]).reshape(-1)
        loss = float(
            (np.maximum(logit, 0.0) - logit * y + np.log1p(np.exp(-np.abs(logit)))).sum()
        )

        grads = {k: np.zeros_like(v) for k, v in p.items()}
        dlogit = (_sigmoid(logit) - y)[:, None]
        grads["W2"] += a1.T @ dlogit
        grads["b2"] += dlogit.sum(axis=0)
        dz1 = (dlogit @ p["W2"].T) * (z1 > 0.0)
        grads["W1"] += feats.T @ dz1
        grads["b1"] += dz1.sum(axis=0)
        dfeats = dz1 @ p["W1"].T

        two_h = h1.shape[1]
        df_avg = dfeats[:, :two_h]
        df_prod = dfeats[:, two_h : 2 * two_h]
        df_nrm = dfeats[:, 2 * two_h :]
        safe = np.where(nrm > 0.0, nrm, 1.0)
        dn = df_nrm * diff / safe
        dh1 = 0.5 * df_avg + df_prod * h2 + dn
        dh2 = 0.5 * df_avg + df_prod * h1 - dn

        dh_u = np.zeros_like(h_u)
        np.add.at(dh_u, ia, dh1)
        np.add.at(dh_u, ib, dh2)
        _encoder_backward(ids, lens, p, h, st, dh_u, grads)
        grads["E"][PAD_ID] = 0.0
        return loss, grads

    def logits_indexed(
        self,
        ids: np.ndarray,
        lens: np.ndarray,
        ia: np.ndarray,
        ib: np.ndarray,
        params: dict[str, np.ndarray] | None = None,
    ) -> np.ndarray:
        p = params if params is not None else self.params
        h_u, _ = _encode_with_cache(ids, lens, p, self.hidden)
        h1, h2 = h_u[ia], h_u[ib]
        nrm = np.linalg.norm(h1 - h2, axis=1, keepdims=True)
        feats = np.concatenate([(h1 + h2) / 2.0, h1 * h2, nrm], axis=1)
        a1 = np.maximum(feats @ p["W1"] + p["b1"], 0.0)
        return (a1 @ p["W2"] + p["b2"]).reshape(-1)

    def logits(
        self,
        ids_a: np.ndarray,
        lens_a: np.ndarray,
        ids_b: np.ndarray,
        lens_b: np.ndarray,
        params: dict[str, np.ndarray] | None = None,
    ) -> np.ndarray:
        p = params if params is not None else self.params
        h = self.hidden
        h1, _ = _encode_with_cache(ids_a, lens_a, p, h)
        h2, _ = _encode_with_cache(ids_b, lens_b, p, h)
        nrm = np.linalg.norm(h1 - h2, axis=1, keepdims=True)
        feats = np.concatenate([(h1 + h2) / 2.0, h1 * h2, nrm], axis=1)
        a1 = np.maximum(feats @ p["W1"] + p["b1"], 0.0)
        return (a1 @ p["W2"] + p["b2"]).reshape(-1)
