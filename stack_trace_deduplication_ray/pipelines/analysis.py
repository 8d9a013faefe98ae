"""Text-analysis operators over the `documents` table.

Training-data-pipeline staples: token counting, document-frequency
(the reference's IDF fits, /root/reference/ea/sim/main/methods/classic/
fast.py:17-36 and lerch.py:22-33), quality scoring, language ID
(n-gram/stopword heuristic), and content fingerprinting.

Every function is a vectorized ``map_batches`` (numpy char kernels) or
a partial-aggregated groupby; SQL oracles are listed in
``__ray_entry__.oracle_sql`` with IDENTICAL column names and formulas.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.sources.tables import read_table


def token_counts(sf_dir: str):
    """(doc_id, n_tokens) where n_tokens = split-on-single-space count
    (== count(' ')+1, exactly DuckDB's len(string_split(text, ' ')))."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = np.asarray(batch.column("text").to_pylist(), dtype=object)
        n = np.char.count(texts.astype(str), " ") + 1
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n.astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def token_document_frequency(sf_dir: str):
    """(token, df): number of documents containing each token.

    The reference's DF fit (fast.py:23-29): per-doc DISTINCT tokens,
    then count per token. Partial aggregation happens inside the batch
    (distinct per doc) before the single groupby shuffle.
    """
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        # per-doc distinct (A10), vectorized: Arrow split/flatten, then
        # one C-speed exact dedup on (doc, token) — no Python loop, no
        # hash-only dedup (this query is oracle-exact)
        import pandas as pd
        import pyarrow.compute as pc

        toks_list = pc.split_pattern(batch.column("text"), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks_list).combine_chunks()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        keep = ~pd.DataFrame(
            {"d": doc_idx, "t": flat.to_pandas()}
        ).duplicated().to_numpy()
        return pa.table({"token": flat.filter(pa.array(keep))})

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="df"))
    )


def quality_scores(sf_dir: str):
    """(doc_id, n_chars_actual, n_words, n_punct) quality features.

    Formulas mirror the SQL oracle exactly:
      n_chars_actual = length(text)
      n_words        = count(' ') + 1
      n_punct        = count('.') + count(',')
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = np.asarray(batch.column("text").to_pylist(), dtype=object).astype(str)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_actual": pa.array(
                    np.char.str_len(texts).astype(np.int64)
                ),
                "n_words": pa.array(
                    (np.char.count(texts, " ") + 1).astype(np.int64)
                ),
                "n_punct": pa.array(
                    (np.char.count(texts, ".") + np.char.count(texts, ",")).astype(
                        np.int64
                    )
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# small seeded stopword lists per language for the heuristic language ID
_LANG_MARKERS = {
    "en": {"the", "and", "of", "a", "to", "fast", "slow"},
    "es": {"el", "la", "de", "y", "que"},
    "de": {"der", "die", "das", "und", "ist"},
    "fr": {"le", "la", "et", "de", "un"},
    "zh": {"的", "是", "了", "在"},
}


class LangId:
    """Stopword-hit language classifier (actor pool: marker sets and
    vectorized lookups built once per actor).

    Heuristic only — the synthetic corpus' `lang` column is random, so
    this demonstrates the operator shape (stateful classifier stage),
    not corpus accuracy. Rows-only driver check.
    """

    def __init__(self):
        # sorted-hash marker arrays per language, built once per actor:
        # membership tests become one vectorized searchsorted over the
        # batch's concatenated token hashes (no per-row set ops)
        from stack_trace_deduplication_ray.functions import hashing as H

        self.langs = sorted(_LANG_MARKERS)
        self.marker_hashes = [
            np.sort(H.hash_bytes_arrays(sorted(_LANG_MARKERS[lang])))
            for lang in self.langs
        ]
        self._hash = H.hash_bytes_arrays

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks = [np.unique(self._hash(t.split(" "))) for t in texts]
        lens = np.fromiter(map(len, toks), dtype=np.int64, count=len(toks))
        offs = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = (
            np.concatenate(toks) if lens.sum() else np.empty(0, np.uint64)
        )
        hits = np.zeros((len(self.langs), len(texts)), dtype=np.int64)
        for li, mh in enumerate(self.marker_hashes):
            if len(flat) == 0 or len(mh) == 0:
                continue
            pos = np.searchsorted(mh, flat)
            is_hit = mh[np.minimum(pos, len(mh) - 1)] == flat
            # segment-sum hits per row
            hits[li] = np.add.reduceat(
                np.concatenate([is_hit.astype(np.int64), [0]]),
                offs[:-1],
            ) * (lens > 0)
        best_n = hits.max(axis=0)
        best_i = hits.argmax(axis=0)  # first max = alphabetical winner
        preds = np.where(
            best_n > 0,
            np.asarray(self.langs, dtype=object)[best_i],
            "unknown",
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, type=pa.string()),
                "marker_hits": pa.array(best_n, type=pa.int64()),
            }
        )


def language_id(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4),
        num_cpus=1,
    )


def fingerprints(sf_dir: str):
    """(doc_id, fp): md5 content fingerprint — oracle: md5(text)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(fps, type=pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class BpeStage:
    """Actor-pool subword tokenizer: the trained merge table is fetched
    ONCE per actor in __init__ (fit-once/apply-many — reference
    BPETokenizer with persisted vocab, ea/sim/main/preprocess/
    tokenizers/bpe.py:43-151) and the per-word memo lives in the
    encoder (cached_encode pattern, s3m.py:64-80)."""

    def __init__(self, merges_ref):
        import ray

        from stack_trace_deduplication_ray.functions.tokenize import BpeEncoder

        self.enc = BpeEncoder(ray.get(merges_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_sub = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = t.split()
            n_tok[i] = len(words)
            n_sub[i] = sum(len(self.enc.encode_word(w)) for w in words)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_tok),
                "n_subwords": pa.array(n_sub),
            }
        )


def bpe_token_counts(sf_dir: str, num_merges: int = 200, fit_sample_mod: int = 5):
    """Subword (BPE) token counts per document: fit the merge table on
    a deterministic hash-sample of the corpus (driver-side — the fit
    corpus is the small side by construction; reference fits BPE on a
    text dump the same way, bpe.py:97-111), broadcast it, and encode
    every document in an actor pool.

    Not SQL-expressible -> rows-only driver check; determinism is
    unit-tested (tests/test_tokenize.py). Output (doc_id, n_words,
    n_subwords)."""
    import ray

    from stack_trace_deduplication_ray.functions.tokenize import train_bpe
    from stack_trace_deduplication_ray.stages.joins import resolve_actors

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % fit_sample_mod == 0))

    fit_texts = [
        r["text"]
        for b in ds.map_batches(sample, batch_format="pyarrow").iter_batches(
            batch_size=4096, batch_format="pyarrow"
        )
        for r in b.select(["text"]).to_pylist()
    ]
    merges = train_bpe(fit_texts, num_merges=num_merges)
    merges_ref = ray.put(merges)

    from stack_trace_deduplication_ray.config import DedupConfig

    cfg = DedupConfig()
    return ds.map_batches(
        BpeStage,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, resolve_actors(cfg)),
        num_cpus=1,
    )


def padded_sequences(sf_dir: str, max_len: int = 16):
    """M12 padding as a driver query: per-document word-LENGTH
    sequences (deterministic, SQL-replicable token ids) run through
    the padding coder — left-truncate to the last `max_len` ids, wrap
    [SOS] + seq + [EOS] (functions/tokenize.pad_sequences_batch;
    reference Padding.encode, padding.py:8-107).

    Output is reduced to order-sensitive scalars so the driver can
    hash-compare against the DuckDB oracle: (doc_id, n_ids, first_id,
    last_id, checksum) with checksum = sum(1-indexed position * id)
    over the padded sequence.
    """
    import pyarrow.compute as pc

    from stack_trace_deduplication_ray.functions.tokenize import (
        pad_sequences_batch,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def seqs(batch: pa.Table) -> pa.Table:
        tl = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        lens = pc.utf8_length(pc.list_flatten(tl)).cast(pa.int64())
        seq = pa.ListArray.from_arrays(tl.offsets, lens)
        return pa.table({"doc_id": batch.column("doc_id"), "seq": seq})

    def reduce(batch: pa.Table) -> pa.Table:
        padded = pad_sequences_batch(batch, col="seq", max_len=max_len)
        arr = padded.column("seq").combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(padded)
        lens = offs[1:] - offs[:-1]
        row = np.repeat(np.arange(n), lens)
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(offs[:-1], lens) + 1
        checksum = np.zeros(n, dtype=np.int64)
        np.add.at(checksum, row, vals * pos)
        first = vals[offs[:-1]] if len(vals) else np.empty(0, np.int64)
        last = vals[offs[1:] - 1] if len(vals) else np.empty(0, np.int64)
        return pa.table(
            {
                "doc_id": padded.column("doc_id"),
                "n_ids": pa.array(lens),
                "first_id": pa.array(first),
                "last_id": pa.array(last),
                "checksum": pa.array(checksum),
            }
        )

    return ds.map_batches(seqs, batch_format="pyarrow").map_batches(
        reduce, batch_format="pyarrow"
    )


def embed_client_vectors(sf_dir: str, dim: int = 64, max_input_tokens: int = 256):
    """T13 embedding-client run over documents: actor-pool
    EmbedClientStage (deterministic local backend) emits
    (doc_id, embedding fixed_size_list<float32>[dim],
    consumed_tokens). Embeddings are seeded-hash-derived, so the
    query is deterministic but not SQL-expressible (rows-only); the
    token-metering half IS — see embed_client_cost."""
    from stack_trace_deduplication_ray.stages.embed_client import EmbedClientStage

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        EmbedClientStage,
        fn_constructor_kwargs={"dim": dim, "max_input_tokens": max_input_tokens},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 8),
        num_cpus=1,
    )


def embed_client_cost(sf_dir: str, max_input_tokens: int = 256):
    """T13 cost metering, oracle-checkable: per-doc billed tokens =
    min(whitespace token count, max_input) — exactly what the stage's
    truncation consumes (client.py:49 tokens[-max_input:]). Output
    (doc_id, consumed_tokens)."""
    ds = embed_client_vectors(sf_dir, max_input_tokens=max_input_tokens)
    return ds.select_columns(["doc_id", "consumed_tokens"])
