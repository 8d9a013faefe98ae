"""Numpy forward passes for the reference's neural cross-encoders.

The reference scores (query, candidate) pairs with trained torch
models: S3M — biLSTM-encode each side to its final hidden state, then
an MLP over [(h1+h2)/2, h1*h2, ||h1-h2||]
(/root/reference/ea/sim/main/methods/neural/cross_encoders/s3m.py:82-96
forward, :37-62 encode, :65-81 eval-time hidden cache) — and
LSTMCrossEncoder — token-level cross features where a learned
"has_same_item" vector is added to every token embedding whose token
occurs on the OTHER side, then a biLSTM text encoder per side and a
head over the concatenated text embeddings
(.../cross_encoders/rnn.py:63-103). The text encoder (LSTMEmb,
.../encoders/modules/rnn/rnn.py:60-88) aggregates the biLSTM as
concat(final hidden, max-pool, avg-pool over valid steps) -> linear.

This container has no torch and no GPU, so TRAINING is out of scope
(SURVEY.md §2.4 P4/P5). What IS in scope — and what this module
provides — is the full inference shape with the exact feature maps
above, as deterministic seeded-weight numpy forward passes:

* weights drawn once from a seeded PCG64 stream (same init family as
  torch: U(-1/sqrt(h), 1/sqrt(h)) for LSTM/linear, N(0,1) for
  embeddings), so every worker process reconstructs IDENTICAL models
  from the integer seed alone — nothing is shipped;
* the LSTM loops over TIME only; every step is a (batch, 4h) GEMM
  over all rows at once, with padded steps frozen (the numpy
  equivalent of pack_padded_sequence: state stops updating at each
  row's length);
* S3M keeps the reference's eval-time per-document hidden cache
  (s3m.py:65-81): within a scoring task each distinct document is
  encoded once no matter how many pairs it appears in.

Untrained weights score nothing *semantically* — these exist to make
the pair-batch plumbing (P6) real, measurable and deterministic, the
same role the reference's S3MMockRetrievalModel plays for retrieval
latency (S3M_mock_retrival.py:7-54).
"""

from __future__ import annotations

import functools

import numpy as np

from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.functions.tokenize import PAD_ID

# hashed-vocab ids skip the reserved special ids (PAD/UNK/SOS/EOS =
# 0..3, matching the reference id space — functions/tokenize.py)
_N_SPECIAL = 4


def token_ids(text: str, vocab_size: int) -> np.ndarray:
    """Whitespace tokens -> stable hashed vocab ids in
    [_N_SPECIAL, vocab_size). The reference dict-encodes against a
    trained vocabulary; with no training pass, feature hashing gives
    the same fixed-id-space contract deterministically."""
    toks = text.split(" ")
    h = H.hash_bytes_arrays(toks)
    return (h % np.uint64(vocab_size - _N_SPECIAL)).astype(np.int64) + _N_SPECIAL


def token_ids_batch(texts: list[str], vocab_size: int) -> list[np.ndarray]:
    """[token_ids(t) for t in texts], but ONE vectorized hash call over
    every token of every text — per-text hashing is call-overhead-bound
    on short documents (measured ~4x on 2048-doc batches)."""
    if not texts:
        return []
    toks = [t.split(" ") for t in texts]
    counts = np.fromiter(
        (len(x) for x in toks), dtype=np.int64, count=len(toks)
    )
    flat = np.asarray([w for x in toks for w in x], dtype=object)
    h = H.hash_bytes_arrays(flat)
    ids = (h % np.uint64(vocab_size - _N_SPECIAL)).astype(np.int64) + _N_SPECIAL
    return np.split(ids, np.cumsum(counts)[:-1])


class _TokenMemo:
    """Per-model token-id memo: pair queries re-present the same
    document on many pairs (|pairs| = |queries| x k over <= |corpus|
    distinct texts), so each distinct text is tokenized once. Bounded:
    the table clears when it reaches `cap` entries (the pathological
    all-distinct stream stays O(cap) memory and pays one wasted clear
    per cap misses — noise)."""

    def __init__(self, vocab_size: int, cap: int = 1 << 18):
        self.vocab_size = vocab_size
        self.cap = cap
        self._m: dict[int, np.ndarray] = {}

    def get(self, texts: list[str]) -> list[np.ndarray]:
        keys = [hash(t) for t in texts]
        # hits resolve BEFORE any cap-clear (a clear mid-fill must not
        # drop a value this batch already claimed)
        out = [self._m.get(k) for k in keys]
        miss: dict[int, str] = {}
        for i, (k, v) in enumerate(zip(keys, out)):
            if v is None and k not in miss:
                miss[k] = texts[i]
        if miss:
            if len(self._m) + len(miss) > self.cap:
                self._m.clear()
            fresh = dict(
                zip(miss, token_ids_batch(list(miss.values()), self.vocab_size))
            )
            self._m.update(fresh)
            out = [fresh[k] if v is None else v for k, v in zip(keys, out)]
        return out


def pad_id_lists(seqs: list[np.ndarray], max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Right-pad id lists (truncated to their LAST max_len ids, the
    reference's n_ctx window — rnn.py:80) into an (N, T) int64 matrix
    + lengths. PAD rows never influence the LSTM state (frozen) or
    the pooled aggregations (masked)."""
    seqs = [s[-max_len:] for s in seqs]
    lens = np.asarray([max(len(s), 1) for s in seqs], dtype=np.int64)
    T = int(lens.max())
    out = np.full((len(seqs), T), PAD_ID, dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out, lens


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def pair_features(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """S3M pair feature map over encoded sides (s3m.py:82-96 forward):
    [(h1+h2)/2, h1*h2, ||h1-h2||] -> (N, 2*enc_dim + 1)."""
    return np.concatenate(
        [
            (h1 + h2) / 2.0,
            h1 * h2,
            np.linalg.norm(h1 - h2, axis=1, keepdims=True),
        ],
        axis=1,
    )


def head_logits(feats: np.ndarray, params) -> np.ndarray:
    """2-layer ReLU head forward: feats (N,D) -> logits (N,)."""
    W1, b1, W2, b2 = params
    a = np.maximum(feats @ W1 + b1, 0.0)
    return (a @ W2 + b2).reshape(-1)


def head_loss_and_grads(feats: np.ndarray, y: np.ndarray, params):
    """SUM binary-cross-entropy-with-logits loss and its exact
    analytic gradients w.r.t. the head params, over one batch of pair
    features `feats` (N,D) with targets `y` in {0,1}.

    The loss is the reference's reranker objective — BCEWithLogits on
    positive pairs toward 1 and negative pairs toward 0
    (reranker_losses.py:46-54 BCELossWithLogits.forward; wired into
    the cross-encoder trainer at train_model.py:75-76,160-162). SUMS
    (not means) are returned so per-batch partials add exactly across
    a distributed gradient pass; everything is computed in float64 so
    the distributed sum and the single-call full batch agree to
    addition-order noise. Verified against finite differences in
    tests/test_training.py."""
    W1, b1, W2, b2 = (np.asarray(p, dtype=np.float64) for p in params)
    feats = np.asarray(feats, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = feats @ W1 + b1
    a = np.maximum(z, 0.0)
    logit = (a @ W2 + b2).reshape(-1)
    # numerically stable BCE-with-logits: max(x,0) - x*y + log1p(e^-|x|)
    loss = np.maximum(logit, 0.0) - logit * y + np.log1p(np.exp(-np.abs(logit)))
    d = (_sigmoid(logit) - y)[:, None]  # dLoss/dlogit, (N,1)
    gW2 = a.T @ d
    gb2 = d.sum(axis=0)
    dz = (d @ W2.T) * (z > 0.0)
    gW1 = feats.T @ dz
    gb1 = dz.sum(axis=0)
    return float(loss.sum()), (gW1, gb1, gW2, gb2)


class AdamState:
    """Minimal deterministic Adam (Kingma & Ba 2015), float64 state.
    The reference trains with Lightning's default Adam; this is the
    same update rule written out."""

    def __init__(self, params, lr: float = 0.05, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        self.t = 0
        self.m = [np.zeros_like(np.asarray(p, dtype=np.float64)) for p in params]
        self.v = [np.zeros_like(np.asarray(p, dtype=np.float64)) for p in params]

    def step(self, params, grads):
        self.t += 1
        out = []
        for i, (p, g) in enumerate(zip(params, grads)):
            p = np.asarray(p, dtype=np.float64)
            g = np.asarray(g, dtype=np.float64)
            self.m[i] = self.b1 * self.m[i] + (1 - self.b1) * g
            self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g * g
            mh = self.m[i] / (1 - self.b1 ** self.t)
            vh = self.v[i] / (1 - self.b2 ** self.t)
            out.append(p - self.lr * mh / (np.sqrt(vh) + self.eps))
        return tuple(out)


def _linear(rng: np.random.Generator, fan_in: int, fan_out: int):
    k = 1.0 / np.sqrt(fan_in)
    W = rng.uniform(-k, k, (fan_in, fan_out)).astype(np.float32)
    b = rng.uniform(-k, k, fan_out).astype(np.float32)
    return W, b


class _BiLSTM:
    """Seeded bidirectional LSTM. run() returns (outputs (N,T,2h)
    zeroed past each row's length, final hidden concat (N,2h))."""

    def __init__(self, rng: np.random.Generator, d: int, h: int):
        self.h = h
        k = 1.0 / np.sqrt(h)

        def direction():
            return (
                rng.uniform(-k, k, (d, 4 * h)).astype(np.float32),
                rng.uniform(-k, k, (h, 4 * h)).astype(np.float32),
                rng.uniform(-k, k, 4 * h).astype(np.float32),
            )

        self.fwd = direction()
        self.bwd = direction()

    def _one_dir(self, emb: np.ndarray, lens: np.ndarray, params):
        W, U, b = params
        N, T, _ = emb.shape
        h = self.h
        hs = np.zeros((N, h), dtype=np.float32)
        cs = np.zeros((N, h), dtype=np.float32)
        outs = np.zeros((N, T, h), dtype=np.float32)
        for t in range(T):
            active = (t < lens)[:, None]
            z = emb[:, t, :] @ W + hs @ U + b
            i = _sigmoid(z[:, :h])
            f = _sigmoid(z[:, h : 2 * h])
            g = np.tanh(z[:, 2 * h : 3 * h])
            o = _sigmoid(z[:, 3 * h :])
            c_new = f * cs + i * g
            h_new = o * np.tanh(c_new)
            hs = np.where(active, h_new, hs)
            cs = np.where(active, c_new, cs)
            outs[:, t, :] = np.where(active, h_new, 0.0)
        return outs, hs

    @staticmethod
    def _reverse_padded(emb: np.ndarray, lens: np.ndarray) -> np.ndarray:
        N, T, _ = emb.shape
        idx = np.arange(T)[None, :]
        rev = np.where(idx < lens[:, None], lens[:, None] - 1 - idx, 0)
        out = emb[np.arange(N)[:, None], rev].copy()
        out[idx >= lens[:, None]] = 0.0
        return out

    def run(self, emb: np.ndarray, lens: np.ndarray):
        out_f, h_f = self._one_dir(emb, lens, self.fwd)
        # backward pass consumes each row's REVERSED valid prefix; the
        # pooled aggregations downstream are step-order-invariant over
        # the valid window, so the outputs are not un-reversed
        out_b, h_b = self._one_dir(self._reverse_padded(emb, lens), lens, self.bwd)
        return (
            np.concatenate([out_f, out_b], axis=2),
            np.concatenate([h_f, h_b], axis=1),
        )


class S3MNumpy:
    """P4: S3M pairwise scorer (s3m.py:19-96) as a seeded numpy
    forward pass. score_pairs(texts_a, texts_b) -> (N,) float scores;
    each distinct text is biLSTM-encoded ONCE per instance (the
    reference's eval-time cache, s3m.py:65-81)."""

    def __init__(
        self,
        vocab_size: int = 4096,
        emb_dim: int = 32,
        hidden: int = 32,
        max_len: int = 48,
        seed: int = 0x53334D,
        cache_cap: int = 1 << 18,
    ):
        rng = np.random.default_rng(np.random.PCG64(seed))
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.E = rng.standard_normal((vocab_size, emb_dim)).astype(np.float32)
        self.E[PAD_ID] = 0.0
        self.lstm = _BiLSTM(rng, emb_dim, hidden)
        # head over [(h1+h2)/2 (2h), h1*h2 (2h), ||h1-h2|| (1)]
        self.W1, self.b1 = _linear(rng, 4 * hidden + 1, hidden)
        self.W2, self.b2 = _linear(rng, hidden, 1)
        # bounded like _TokenMemo: the singleton lives for the worker
        # process's whole life, so an uncapped hidden cache would grow
        # with every distinct doc the worker ever scores
        self._cache_cap = cache_cap
        self._cache: dict[int, np.ndarray] = {}

    def encode(self, texts: list[str]) -> np.ndarray:
        # no token memo here: cached_encode dedups at the HIDDEN level,
        # so encode only ever sees each distinct text once
        seqs = token_ids_batch(texts, self.vocab_size)
        ids, lens = pad_id_lists(seqs, self.max_len)
        _, h_final = self.lstm.run(self.E[ids], lens)
        return h_final

    def cached_encode(self, texts: list[str]) -> np.ndarray:
        keys = [hash(t) for t in texts]
        # hits resolve BEFORE any cap-clear (same discipline as
        # _TokenMemo: a clear mid-fill must not drop a value this
        # batch already claimed)
        hits = [self._cache.get(k) for k in keys]
        miss_idx, miss_txt, seen = [], [], set()
        for i, (k, v) in enumerate(zip(keys, hits)):
            if v is None and k not in seen:
                seen.add(k)
                miss_idx.append(i)
                miss_txt.append(texts[i])
        if miss_txt:
            if len(self._cache) + len(miss_txt) > self._cache_cap:
                self._cache.clear()
            enc = self.encode(miss_txt)
            fresh = {keys[i]: enc[j] for j, i in enumerate(miss_idx)}
            self._cache.update(fresh)
            hits = [fresh[k] if v is None else v for k, v in zip(keys, hits)]
        return np.stack(hits)

    @property
    def head_params(self):
        return (self.W1, self.b1, self.W2, self.b2)

    def set_head_params(self, params) -> None:
        """Install trained head params (pipelines/training.py); the
        frozen encoder and its hidden cache are untouched."""
        self.W1, self.b1, self.W2, self.b2 = (
            np.asarray(p, dtype=np.float32) for p in params
        )

    def _head(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        return head_logits(pair_features(h1, h2), self.head_params).astype(
            np.float64
        )

    def score_pairs(self, texts_a: list[str], texts_b: list[str]) -> np.ndarray:
        return self._head(self.cached_encode(texts_a), self.cached_encode(texts_b))

    def score_pairs_indexed(
        self, texts: np.ndarray, ia: np.ndarray, ib: np.ndarray
    ) -> np.ndarray:
        """Pair scores over (doc array, pair index arrays): each USED
        doc is encoded once (through the hidden cache), hidden rows
        gather by index — no per-pair Python text list ever exists.
        Equivalent to score_pairs(texts[ia], texts[ib]) (pinned in
        tests); this is the hot path the candidate grid calls."""
        if len(ia) == 0:
            return np.empty(0, dtype=np.float64)
        used = np.unique(np.concatenate([ia, ib]))
        enc = self.cached_encode([texts[i] for i in used])
        remap = np.empty(int(used.max()) + 1, dtype=np.int64)
        remap[used] = np.arange(len(used))
        return self._head(enc[remap[ia]], enc[remap[ib]])


class LSTMCrossEncoderNumpy:
    """P5: token-level cross-encoder (rnn.py:34-103) as a seeded
    numpy forward pass. Per pair: tokens present on the OTHER side
    get a learned vector added to their embedding (soft alignment),
    each side runs through the LSTMEmb text encoder
    (concat(final hidden, max, avg) -> mixture linear,
    encoders/modules/rnn/rnn.py:29-88), and the head scores the
    concatenated side embeddings. No per-document cache is possible:
    the membership flags differ per PAIR (unlike S3M)."""

    def __init__(
        self,
        vocab_size: int = 4096,
        d_input: int = 32,
        hidden: int = 32,
        out_size: int = 32,
        n_ctx: int = 48,
        seed: int = 0xCE11,
    ):
        rng = np.random.default_rng(np.random.PCG64(seed))
        self.vocab_size = vocab_size
        self.n_ctx = n_ctx
        self.E = rng.standard_normal((vocab_size, d_input)).astype(np.float32)
        self.E[PAD_ID] = 0.0
        self.same_item_vec = rng.standard_normal(d_input).astype(np.float32)
        self.lstm = _BiLSTM(rng, d_input, hidden)
        # ConcatAgg(final hidden 2h, max 2h, avg 2h) -> mixture
        self.Wmix, self.bmix = _linear(rng, 6 * hidden, out_size)
        self.W1, self.b1 = _linear(rng, 2 * out_size, out_size)
        self.W2, self.b2 = _linear(rng, out_size, 1)
        self._toks = _TokenMemo(vocab_size)

    def _encode_side(
        self, ids: np.ndarray, lens: np.ndarray, flags: np.ndarray
    ) -> np.ndarray:
        emb = self.E[ids] + flags[:, :, None] * self.same_item_vec
        emb[ids == PAD_ID] = 0.0
        outs, h_final = self.lstm.run(emb, lens)
        T = ids.shape[1]
        valid = (np.arange(T)[None, :] < lens[:, None])[:, :, None]
        mx = np.where(valid, outs, -np.inf).max(axis=1)
        avg = outs.sum(axis=1) / lens[:, None].astype(np.float32)
        agg = np.concatenate([h_final, mx, avg], axis=1)
        return agg @ self.Wmix + self.bmix

    def score_pairs(self, texts_a: list[str], texts_b: list[str]) -> np.ndarray:
        # rerank pair sets re-present each document ~k times (and the
        # same texts batch over batch within an actor) — tokenize each
        # distinct text once
        seq_a = self._toks.get(texts_a)
        seq_b = self._toks.get(texts_b)
        ids_a, lens_a = pad_id_lists(seq_a, self.n_ctx)
        ids_b, lens_b = pad_id_lists(seq_b, self.n_ctx)
        n = len(seq_a)
        flags_a = np.zeros(ids_a.shape, dtype=np.float32)
        flags_b = np.zeros(ids_b.shape, dtype=np.float32)
        for i in range(n):
            # membership vs the FULL other-side token set (the
            # reference flags against item.tokens untruncated)
            flags_a[i, : lens_a[i]] = np.isin(ids_a[i, : lens_a[i]], seq_b[i])
            flags_b[i, : lens_b[i]] = np.isin(ids_b[i, : lens_b[i]], seq_a[i])
        e1 = self._encode_side(ids_a, lens_a, flags_a)
        e2 = self._encode_side(ids_b, lens_b, flags_b)
        z = np.maximum(
            np.concatenate([e1, e2], axis=1) @ self.W1 + self.b1, 0.0
        )
        return (z @ self.W2 + self.b2).reshape(-1).astype(np.float64)


@functools.lru_cache(maxsize=4)
def shared_s3m(seed: int = 0x53334D) -> S3MNumpy:
    """Process-wide S3M instance: grid-cell scoring tasks reconstruct
    the identical seeded model once per worker process (weights are
    derived from the seed — nothing crosses the object store) and
    share its document-hidden cache across cells."""
    return S3MNumpy(seed=seed)


@functools.lru_cache(maxsize=4)
def shared_cross_encoder(seed: int = 0xCE11) -> LSTMCrossEncoderNumpy:
    return LSTMCrossEncoderNumpy(seed=seed)
