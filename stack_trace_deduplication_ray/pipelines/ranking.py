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


def _ranked_pairs_query(sf_dir: str, score_fn_builder, k: int):
    """Shared shape of the ranker queries, de-skewed: DF fit ->
    broadcast -> TOKEN-keyed candidate-pair exchange -> text
    attachment (two partitioned joins, pair dedup folded) -> pairwise
    score -> per-src top-k cut.

    The round-2 shape hash-partitioned by `source`, capping
    parallelism at the source cardinality (one dominant source = one
    giant straggler building its whole inverted index in-process).
    Here the exchange key is hash(source, token): a big source's
    posting lists spread over the full partition space, the same
    de-skew as word_jaccard_pairs_distributed. Semantics unchanged —
    candidates are same-source pairs sharing >= 1 token
    (DummyRetrievalModel's within-group retrieval,
    /root/reference/ea/sim/main/methods/retrieval_model.py:50-58),
    ranked cut per query doc (eval_fast.py:95-96).
    """
    from stack_trace_deduplication_ray.stages.joins import join_ds

    cfg = DedupConfig()
    n_docs, df_of = _df_fit(sf_dir)
    fit_ref = ray.put((n_docs, df_of))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks_list = pc.split_pattern(batch.column("text"), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks_list).combine_chunks()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        th = H.hash_bytes_arrays(flat.to_numpy(zero_copy_only=False))
        order = np.lexsort((th, doc_idx))
        sd, sh = doc_idx[order], th[order]
        first = np.ones(len(sh), dtype=bool)
        first[1:] = (sh[1:] != sh[:-1]) | (sd[1:] != sd[:-1])
        keep = order[first]
        d = doc_idx[keep]
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh_src = H.hash_bytes_arrays(
            np.asarray(batch.column("source").to_pylist(), dtype=object)
        )
        with np.errstate(over="ignore"):
            tkey = H.splitmix64(th[keep] ^ sh_src[d])
        return pa.table(
            {
                "tkey": pa.array(tkey.view(np.int64)),
                "doc_id": pa.array(ids[d].astype(np.int64)),
            }
        )

    postings = ds.map_batches(explode, batch_format="pyarrow")

    def emit_pairs(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["tkey"].to_numpy()
        ids = part["doc_id"].to_numpy()
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate([[0], change]) if len(keys) else np.empty(0, int)
        ends = np.concatenate([change, [len(keys)]]) if len(keys) else starts
        src_all, dst_all = [], []
        for s, e in zip(starts, ends):
            g = np.sort(ids[s:e])
            if len(g) < 2:
                continue
            i, j = np.triu_indices(len(g), k=1)
            src_all.append(g[i])
            dst_all.append(g[j])
        if not src_all:
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "src": np.concatenate(src_all).astype(np.int64),
                "dst": np.concatenate(dst_all).astype(np.int64),
            }
        )

    pairs = partitioned_groups(postings, "tkey", emit_pairs, cfg)

    def ren(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__did" + suffix: batch.column("doc_id").cast(pa.int64()),
                    "text" + suffix: batch.column("text"),
                }
            )

        return fn

    texts = ds.select_columns(["doc_id", "text"])
    j1 = join_ds(
        pairs.materialize(),
        texts.map_batches(ren("_src"), batch_format="pyarrow"),
        "src", "__did_src", cfg, dedup_left=["src", "dst"],
    ).materialize()
    j2 = join_ds(
        j1, texts.map_batches(ren("_dst"), batch_format="pyarrow"),
        "dst", "__did_dst", cfg,
    )

    def score_batch(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return PAIR_SCHEMA.empty_table()
        n_docs_l, df_l = ray.get(fit_ref)
        score_pairs = score_fn_builder(n_docs_l, df_l)
        sc = score_pairs(
            batch.column("text_src").to_pylist(),
            batch.column("text_dst").to_pylist(),
        )
        return pa.table(
            {
                "src": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "score": pa.array(np.round(sc, 4)),
            }
        )

    scored = j2.map_batches(score_batch, batch_format="pyarrow")

    def topk(part: pd.DataFrame) -> pd.DataFrame:
        out = part.sort_values(
            ["src", "score", "dst"], ascending=[True, False, True],
            kind="stable",
        )
        return out.groupby("src", sort=False).head(k)

    out_ds = partitioned_groups(scored, "src", topk, cfg)
    return ensure_schema(out_ds, PAIR_SCHEMA)


def lerch_pair_scores(sf_dir: str, k: int = 5):
    """Lerch TF-IDF pair scores, top-k per query doc (SQL-expressible
    -> DuckDB oracle ★). Output (src, dst, score rounded 4)."""

    def builder(n_docs, df_of):
        idf_of = {
            t: 1.0 + np.log(n_docs / (d + 1.0)) for t, d in df_of.items()
        }

        def score_pairs(texts_a, texts_b):
            sa = S.token_hash_sets(texts_a)
            sb = S.token_hash_sets(texts_b)
            return np.fromiter(
                (S.lerch_score(a, b, idf_of) for a, b in zip(sa, sb)),
                dtype=np.float64, count=len(sa),
            )

        return score_pairs

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
        def score_pairs(texts_a, texts_b):
            # memoize views per distinct text within the batch (a doc
            # appears in many pairs)
            cache: dict = {}

            def view(t):
                v = cache.get(t)
                if v is None:
                    v = cache[t] = S.fast_token_views(
                        t, df_of, n_docs, alpha, beta
                    )
                return v

            return np.fromiter(
                (
                    S.fast_align(*view(a), *view(b), gamma=gamma)
                    for a, b in zip(texts_a, texts_b)
                ),
                dtype=np.float64, count=len(texts_a),
            )

        return score_pairs

    return _ranked_pairs_query(sf_dir, builder, k)
