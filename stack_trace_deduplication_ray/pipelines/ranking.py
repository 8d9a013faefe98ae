"""Classic ranker pipelines over the `documents` table: Lerch TF-IDF
and FaST alignment pair scoring — the reference's headline scoring
models (eval_fast.py / eval_lerch shape: fit DF on the corpus, score
query-candidate pairs, emit a ranked top-k per query) re-expressed as
one DF aggregation + partition-granularity pair scoring.

Candidate enumeration mirrors the reference's within-group all-pairs
retrieval (DummyRetrievalModel, ea/sim/main/methods/retrieval_model.py:50-58)
bounded to same-`source` pairs sharing >= 1 token; the ranked cut is
the reference's per-query top-k truncation (eval_fast.py:95-96).

The DF/IDF fit is broadcast (ray.put) to the scoring tasks — the
vocabulary is the small side of this join by construction; at larger
vocabularies swap the broadcast for stages.joins.join_ds on the token
hash (same partitioned pattern the dedup verify uses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.functions import scoring as S
from stack_trace_deduplication_ray.pipelines.util import ensure_schema
from stack_trace_deduplication_ray.sources.tables import read_table
from stack_trace_deduplication_ray.stages.joins import partitioned_groups

PAIR_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("score", pa.float64())]
)


def _df_fit(sf_dir: str) -> tuple[int, dict[int, int]]:
    """Corpus document-frequency fit: N and {token_hash: df}.

    Reference analog: FaST._Index.fit / LerchCrossEncoder.fit
    (fast.py:17-36, lerch.py:22-33) as one distinct-per-doc flat_map +
    groupby count (SURVEY.md §2.3 T2-T4)."""
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()

    def distinct(batch: pa.Table) -> pa.Table:
        # vectorized per-doc distinct token hashes: ONE Arrow split +
        # ONE C-speed hash pass over the flattened tokens, then a
        # lexsort first-occurrence mask per (doc, hash) — semantics
        # identical to per-doc np.unique(hash(tokens))
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks_list = pc.split_pattern(batch.column("text"), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks_list).combine_chunks()
        if len(flat) == 0:
            return pa.table(
                {
                    "tok": pa.array(np.empty(0, np.int64)),
                    "doc_id": pa.array(np.empty(0, ids.dtype)),
                }
            )
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        th = H.hash_bytes_arrays(flat.to_numpy(zero_copy_only=False))
        order = np.lexsort((th, doc_idx))
        sd, sh = doc_idx[order], th[order]
        first = np.ones(len(sh), dtype=bool)
        first[1:] = (sh[1:] != sh[:-1]) | (sd[1:] != sd[:-1])
        keep = order[first]
        return pa.table(
            {
                "tok": pa.array(th[keep].view(np.int64)),
                "doc_id": pa.array(ids[doc_idx[keep]]),
            }
        )

    df_tbl = (
        ds.map_batches(distinct, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Count(alias_name="df"))
    ).to_pandas()
    # tok travelled the shuffle as int64 (bit-cast); restore the
    # unsigned domain the scoring lookups use
    keys = df_tbl["tok"].to_numpy(dtype=np.int64).view(np.uint64)
    df_of = {int(k): int(v) for k, v in zip(keys, df_tbl["df"])}
    return n_docs, df_of


def _same_source_shared_token_pairs(part_group: pd.DataFrame):
    """Within one source group: (i, j) index pairs of docs sharing at
    least one token (full inverted index; the ranked cut bounds the
    output, and the fixture's group sizes bound the candidates)."""
    sets = S.token_hash_sets(list(part_group["text"]))
    tok_l, doc_l = [], []
    for i, s in enumerate(sets):
        tok_l.append(s)
        doc_l.append(np.full(len(s), i, dtype=np.int64))
    if not tok_l:
        return np.empty(0, np.int64), np.empty(0, np.int64), sets
    pt = np.concatenate(tok_l)
    pdoc = np.concatenate(doc_l)
    o = np.argsort(pt, kind="stable")
    pt, pdoc = pt[o], pdoc[o]
    change = np.nonzero(pt[1:] != pt[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(pt)]])
    ci, cj = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        g = np.sort(pdoc[s:e])
        i, j = np.triu_indices(e - s, k=1)
        ci.append(g[i])
        cj.append(g[j])
    if not ci:
        return np.empty(0, np.int64), np.empty(0, np.int64), sets
    n = len(sets)
    key = np.unique(np.concatenate(ci) * n + np.concatenate(cj))
    return key // n, key % n, sets


def _ranked_pairs_query(sf_dir: str, score_fn_builder, k: int):
    """Shared shape of the ranker queries: DF fit -> broadcast ->
    per-source candidate pairs -> score -> per-src top-k."""
    n_docs, df_of = _df_fit(sf_dir)
    fit_ref = ray.put((n_docs, df_of))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def score_partition(part: pd.DataFrame) -> pd.DataFrame:
        n_docs_l, df_l = ray.get(fit_ref)
        score_rows = score_fn_builder(n_docs_l, df_l)
        src_all, dst_all, sc_all = [], [], []
        for _, group in part.groupby("source", sort=False):
            ids = group["doc_id"].to_numpy()
            ci, cj, _ = _same_source_shared_token_pairs(group)
            if not len(ci):
                continue
            sc = score_rows(group, ci, cj)
            a, b = ids[ci], ids[cj]
            src_all.append(np.minimum(a, b))
            dst_all.append(np.maximum(a, b))
            sc_all.append(np.round(sc, 4))
        if not src_all:
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"),
                 "dst": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )
        out = pd.DataFrame(
            {
                "src": np.concatenate(src_all).astype(np.int64),
                "dst": np.concatenate(dst_all).astype(np.int64),
                "score": np.concatenate(sc_all).astype(np.float64),
            }
        )
        # ranked cut per query doc: top-k by (rounded score desc, dst)
        out = out.sort_values(
            ["src", "score", "dst"], ascending=[True, False, True],
            kind="stable",
        )
        return out.groupby("src", sort=False).head(k)

    out_ds = partitioned_groups(ds, "source", score_partition, DedupConfig())
    return ensure_schema(out_ds, PAIR_SCHEMA)


def lerch_pair_scores(sf_dir: str, k: int = 5):
    """Lerch TF-IDF pair scores, top-k per query doc (SQL-expressible
    -> DuckDB oracle ★). Output (src, dst, score rounded 4)."""

    def builder(n_docs, df_of):
        idf_of = {
            t: 1.0 + np.log(n_docs / (d + 1.0)) for t, d in df_of.items()
        }

        def score_rows(group, ci, cj):
            sets = S.token_hash_sets(list(group["text"]))
            return np.fromiter(
                (S.lerch_score(sets[a], sets[b], idf_of)
                 for a, b in zip(ci, cj)),
                dtype=np.float64, count=len(ci),
            )

        return score_rows

    return _ranked_pairs_query(sf_dir, builder, k)


def fast_pair_scores(
    sf_dir: str, k: int = 5,
    alpha: float = 1.0, beta: float = 1.0, gamma: float = 1.0,
):
    """FaST positional-alignment pair scores, top-k per query doc.
    The alignment is order-dependent (not SQL-expressible) -> rows-only
    driver check; the kernel itself is verified against an independent
    transcription of the published algorithm in tests/test_scoring.py.
    Output (src, dst, score rounded 4)."""

    def builder(n_docs, df_of):
        def score_rows(group, ci, cj):
            views = [
                S.fast_token_views(t, df_of, n_docs, alpha, beta)
                for t in group["text"]
            ]
            return np.fromiter(
                (
                    S.fast_align(*views[a], *views[b], gamma=gamma)
                    for a, b in zip(ci, cj)
                ),
                dtype=np.float64, count=len(ci),
            )

        return score_rows

    return _ranked_pairs_query(sf_dir, builder, k)
