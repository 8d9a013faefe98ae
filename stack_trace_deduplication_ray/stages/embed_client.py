"""T13: external-embedding client as an actor-pool map_batches stage.

The reference calls a remote embedding service per text — tiktoken
truncation to the model's max input, a per-text-hash memo so repeated
texts are never re-billed, and a running cost meter with spend alerts
(/root/reference/ea/sim/dev/scripts/training/training/embeddings/
client.py:20-61 OpenAIClient + PriceTracker; main.py:36-46 text-hash
memo). This container has no network, so the SERVICE CALL is the one
stubbed seam; everything around it — the Ray-side actor-pool shape,
token truncation, batch-level memo/dedup, consumed-token accounting —
is real and tested.

Shape for scale: `docs.map_batches(EmbedClientStage, concurrency=N,
batch_size=B)` — one backend connection and one memo per ACTOR
(built in __init__, never per batch); each __call__ dedups its batch
against the memo, sends only the misses in one batched request, and
emits (doc_id, embedding, consumed_tokens). Cost metering is emitted
PER ROW and summed by a downstream aggregate — per-actor trackers
alone would need a driver-side gather; the column makes the total an
ordinary distributed sum (and SQL-checkable: consumed_tokens =
min(whitespace tokens, max_input), see oracle_sql()
["embed_client_cost"]).

Backends:

* ``DeterministicLocalBackend`` — seeded embedding-bag: each token id
  indexes a seeded Gaussian row; a text's embedding is the normalized
  sum. Deterministic across processes (weights derive from the seed),
  vectorizable, and unit-norm like real embedding APIs. The default,
  and what tests/bench run.
* ``ExternalServiceBackend`` — the real remote-call seam; raises
  NotImplementedError here (no network in this environment). A
  deployment implements encode_batch() with its HTTP client; nothing
  else in the stage changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.functions import hashing as H


class PriceTracker:
    """Running token/cost meter (client.py:20-40): update() adds
    consumed tokens; crossing each `alert_every_spent_dollar` boundary
    increments `alerts` (the reference prints; an actor can't usefully
    print, so the count is observable state instead)."""

    def __init__(
        self,
        price_per_1k_tokens: float,
        alert_every_spent_dollar: float | None = None,
    ):
        self._rate = price_per_1k_tokens / 1000.0
        self._tokens = 0
        self._alert_step = alert_every_spent_dollar
        self._next_alert = alert_every_spent_dollar
        self.alerts = 0

    def update(self, tokens: int) -> None:
        self._tokens += int(tokens)
        if self._alert_step is not None:
            while self.price >= self._next_alert:
                self.alerts += 1
                self._next_alert += self._alert_step

    @property
    def tokens(self) -> int:
        return self._tokens

    @property
    def price(self) -> float:
        return self._tokens * self._rate


class DeterministicLocalBackend:
    """Seeded embedding-bag backend: embedding(text) = L2-normalized
    sum of seeded Gaussian rows indexed by hashed token id. One
    (table_size, dim) weight table per instance, derived from the
    integer seed — identical in every worker, nothing shipped."""

    def __init__(self, dim: int = 64, seed: int = 0xE0B, table_size: int = 8192):
        rng = np.random.default_rng(np.random.PCG64(seed))
        self._table = rng.standard_normal((table_size, dim)).astype(np.float32)
        self._n = np.uint64(table_size)
        self.dim = dim

    def encode_batch(self, token_lists: list[np.ndarray]) -> np.ndarray:
        if not token_lists:
            return np.empty((0, self.dim), dtype=np.float32)
        lens = np.fromiter(
            (len(t) for t in token_lists), dtype=np.int64, count=len(token_lists)
        )
        if (lens == 0).any():
            # reduceat misreads zero-length segments; the pipeline
            # never produces one (split(" ") yields >= 1 token), so
            # the scalar path only exists for direct API callers
            out = np.empty((len(token_lists), self.dim), dtype=np.float32)
            for i, toks in enumerate(token_lists):
                rows = self._table[(toks % self._n).astype(np.int64)]
                v = rows.sum(axis=0)
                out[i] = v / max(float(np.linalg.norm(v)), 1e-12)
            return out
        # one gather + one segmented sum over every token of every text
        flat = (np.concatenate(token_lists) % self._n).astype(np.int64)
        seg = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sums = np.add.reduceat(self._table[flat], seg, axis=0)
        norms = np.maximum(np.linalg.norm(sums, axis=1), 1e-12)
        return (sums / norms[:, None]).astype(np.float32)


class ExternalServiceBackend:
    """The remote-call seam (client.py:42-61). Constructing it is
    fine (config validation); calling it is impossible here."""

    def __init__(self, model_name: str, api_token: str, dim: int):
        self.model_name = model_name
        self._token = api_token
        self.dim = dim

    def encode_batch(self, token_lists: list[np.ndarray]) -> np.ndarray:
        raise NotImplementedError(
            "ExternalServiceBackend requires network access; this "
            "environment has none. Deployments implement encode_batch "
            "with their HTTP client — the surrounding EmbedClientStage "
            "(truncation, memo, cost metering, actor-pool plumbing) is "
            "backend-agnostic."
        )


class EmbedClientStage:
    """Actor-pool embedding client. __init__ once per actor: backend +
    per-actor text-hash memo + price tracker. __call__ per batch:
    tokenize, truncate to the LAST max_input tokens (the reference's
    encoding.encode(text)[-max_input:], client.py:49), dedup against
    the memo, one batched backend call for the misses."""

    def __init__(
        self,
        dim: int = 64,
        max_input_tokens: int = 256,
        price_per_1k_tokens: float = 0.0001,
        alert_every_spent_dollar: float | None = None,
        backend: str = "local",
        seed: int = 0xE0B,
        text_col: str = "text",
        id_col: str = "doc_id",
        memo_cap: int = 1 << 18,
    ):
        if backend == "local":
            self._backend = DeterministicLocalBackend(dim=dim, seed=seed)
        elif backend == "external":
            self._backend = ExternalServiceBackend("remote-emb", "", dim)
        else:
            raise ValueError(f"unknown backend {backend!r}")
        self._max_input = max_input_tokens
        # bounded: a long-lived actor embedding an all-distinct stream
        # must stay O(memo_cap) memory (one wasted clear per cap
        # misses); re-billing after a clear matches the reference,
        # whose memo is also process-local (main.py:36-46)
        self._memo_cap = memo_cap
        self._memo: dict[int, np.ndarray] = {}
        self.tracker = PriceTracker(price_per_1k_tokens, alert_every_spent_dollar)
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        dim = self._backend.dim
        if len(batch) == 0:
            return pa.table(
                {
                    self._id_col: pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32(), dim)),
                    "consumed_tokens": pa.array([], type=pa.int64()),
                }
            )
        texts = batch.column(self._text_col).to_pylist()
        # ONE vectorized hash call over every token of every text
        # (per-text hashing is call-overhead-bound on short documents
        # — same measurement as functions.neural.token_ids_batch),
        # then per-row truncation to the LAST max_input tokens and a
        # segmented xor-reduce for the memo keys
        tok_lists = [t.split(" ") for t in texts]
        counts = np.fromiter(
            (len(x) for x in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        h = H.hash_bytes_arrays(
            np.asarray([w for x in tok_lists for w in x], dtype=object)
        )
        ends = np.cumsum(counts)
        kept_len = np.minimum(counts, self._max_input)
        starts = ends - kept_len
        seg = np.concatenate([[0], np.cumsum(kept_len)[:-1]])
        within = np.arange(int(kept_len.sum())) - np.repeat(seg, kept_len)
        kept = h[np.repeat(starts, kept_len) + within]
        consumed = kept_len
        # memo key = hash of the TRUNCATED token stream (two texts
        # identical in their billed window share one request);
        # position-mixed so permutations don't collide
        pos = within.astype(np.uint64) + np.uint64(1)
        with np.errstate(over="ignore"):
            mixed = H.splitmix64(kept * np.uint64(0x9E3779B97F4A7C15) + pos)
        keys = np.bitwise_xor.reduceat(mixed, seg).tolist()
        tok_arrays = np.split(kept, np.cumsum(kept_len)[:-1])
        # hits resolve BEFORE any cap-clear (a clear mid-fill must not
        # drop a value this batch already claimed)
        hits = [self._memo.get(k) for k in keys]
        miss_idx = []
        seen: set = set()
        for i, (k, v) in enumerate(zip(keys, hits)):
            if v is None and k not in seen:
                seen.add(k)
                miss_idx.append(i)
        if miss_idx:
            if len(self._memo) + len(miss_idx) > self._memo_cap:
                self._memo.clear()
            enc = self._backend.encode_batch([tok_arrays[i] for i in miss_idx])
            billed = 0
            fresh: dict[int, np.ndarray] = {}
            for j, i in enumerate(miss_idx):
                fresh[keys[i]] = enc[j]
                billed += int(consumed[i])
            self._memo.update(fresh)
            self.tracker.update(billed)
            hits = [fresh[k] if v is None else v for k, v in zip(keys, hits)]
        emb = np.stack(hits)
        return pa.table(
            {
                self._id_col: batch.column(self._id_col).cast(pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1)), dim
                ),
                "consumed_tokens": pa.array(consumed),
            }
        )
