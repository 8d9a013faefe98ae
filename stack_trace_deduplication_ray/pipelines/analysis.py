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
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            toks.extend(set(t.split(" ")))  # per-doc distinct (A10)
        return pa.table({"token": pa.array(toks, type=pa.string())})

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
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for t in batch.column("text").to_pylist():
            toks = set(t.split(" "))
            best, best_n = "unknown", 0
            for lang, mk in sorted(self.markers.items()):
                n = len(toks & mk)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
            scores.append(best_n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, type=pa.string()),
                "marker_hits": pa.array(scores, type=pa.int64()),
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
