"""Subword tokenization: camel/dot pre-tokenizer + from-scratch BPE.

Reference analogs: CamelCaseAndDotPreTokenizer
(/root/reference/ea/sim/main/preprocess/tokenizers/bpe.py:21-40) and the
HuggingFace-backed BPETokenizer (bpe.py:43-151) — re-implemented here
as a deterministic, dependency-free byte-pair-encoding fit (the public
Sennrich et al. 2016 algorithm) whose trained merge table rides an
actor pool: fit once (driver or offline), encode per batch with a
per-actor word cache (the reference's cached_encode pattern, T7).
"""

from __future__ import annotations

import re
from collections import Counter

_CAMEL_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")
_END = "</w>"


def split_camel_dot(name: str, lowercase: bool = True) -> list[str]:
    """Split a dotted identifier on '.' then on camel-case boundaries:
    'com.foo.BarBaz.doHTTPCall' -> [com, foo, bar, baz, do, http, call].
    """
    out = []
    for seg in name.split("."):
        for m in _CAMEL_RE.findall(seg):
            out.append(m.lower() if lowercase else m)
    return out


def train_bpe(texts: list[str], num_merges: int = 200) -> list[tuple[str, str]]:
    """Deterministic BPE fit: repeatedly merge the most frequent
    adjacent symbol pair (ties broken lexicographically so retrained
    vocabularies are bit-identical). Returns the ordered merge list —
    the whole tokenizer state."""
    word_freq = Counter()
    for t in texts:
        for w in t.split():
            word_freq[w] += 1
    words = {
        w: tuple(list(w) + [_END]) for w in word_freq
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_freq = Counter()
        for w, sym in words.items():
            f = word_freq[w]
            for i in range(len(sym) - 1):
                pair_freq[(sym[i], sym[i + 1])] += f
        if not pair_freq:
            break
        best_f = max(pair_freq.values())
        if best_f < 2:
            break
        best = min(p for p, f in pair_freq.items() if f == best_f)
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for w, sym in words.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


class BpeEncoder:
    """Apply a trained merge table; per-word memo (reference
    cached_encode, s3m.py:64-80)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {p: i for i, p in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}
        # vocabulary: deterministic id per symbol (sorted)
        symbols = set()
        for a, b in merges:
            symbols.add(a)
            symbols.add(b)
            symbols.add(a + b)
        self.vocab = {s: i for i, s in enumerate(sorted(symbols))}

    def encode_word(self, w: str) -> list[str]:
        hit = self._cache.get(w)
        if hit is not None:
            return hit
        sym = list(w) + [_END]
        while len(sym) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(sym) - 1):
                r = self.ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        self._cache[w] = sym
        return sym

    def encode(self, text: str) -> list[str]:
        out = []
        for w in text.split():
            out.extend(self.encode_word(w))
        return out


# --- sequence padding (M12) ------------------------------------------

# Special token ids match the reference's SpecialTokens numbering
# exactly — PAD=0, UNK=1, SOS=2, EOS=3 (ea/sim/main/preprocess/
# id_coder.py) — so padded sequences are token-id compatible with the
# reference framework. UNK is defined for vocabulary coders that need
# it; the padding coder itself never emits it.
PAD_ID, UNK_ID, SOS_ID, EOS_ID = 0, 1, 2, 3


def pad_sequences_batch(batch, col: str = "seq", max_len: int = 64,
                        fixed: bool = False):
    """Vectorized M12 padding coder over an Arrow list<int> column
    (reference Padding.encode,
    ea/sim/main/preprocess/tokenizers/padding.py:8-107): each sequence
    is LEFT-truncated to its last `max_len` ids (the deepest frames
    survive, matching pad_seq's seq[len-min(len,max_len):]), then
    wrapped [SOS] + seq + [EOS]. With fixed=True the result is
    right-padded with PAD to exactly max_len + 2 ids (the
    fixed-length-tensor layout a batched model input needs).

    Pure offset arithmetic on the flattened values — no per-row
    Python; returns the batch with `col` replaced by the padded
    list column.
    """
    import numpy as np
    import pyarrow as pa

    arr = batch.column(col).combine_chunks()
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(batch)
    lens = offs[1:] - offs[:-1]
    keep = np.minimum(lens, max_len)
    starts = offs[1:] - keep  # keep the TAIL of each sequence
    out_len = keep + 2 if not fixed else np.full(n, max_len + 2, np.int64)
    new_offs = np.concatenate([[0], np.cumsum(out_len)])
    flat = np.full(int(new_offs[-1]), PAD_ID, dtype=np.int64)
    row = np.repeat(np.arange(n), keep)
    # position of each kept id inside its output row: SOS occupies
    # slot 0, so kept ids start at 1
    within = (
        np.arange(len(row), dtype=np.int64)
        - np.repeat(np.cumsum(keep) - keep, keep)
    )
    src = np.repeat(starts, keep) + within
    flat[new_offs[row] + 1 + within] = vals[src]
    flat[new_offs[:-1]] = SOS_ID
    flat[new_offs[:-1] + 1 + keep] = EOS_ID
    padded = pa.ListArray.from_arrays(
        pa.array(new_offs, type=pa.int32()), pa.array(flat, type=pa.int64())
    )
    i = batch.schema.get_field_index(col)
    return batch.set_column(i, col, padded)


def pad_sequences_ds(ds, col: str = "seq", max_len: int = 64,
                     fixed: bool = False):
    """Dataset-level M12: map_batches wrapper of pad_sequences_batch."""

    def fn(batch):
        return pad_sequences_batch(batch, col=col, max_len=max_len, fixed=fixed)

    return ds.map_batches(fn, batch_format="pyarrow")
