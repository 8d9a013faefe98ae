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

from stack_trace_deduplication_ray.config import DedupConfig, coalesce_for_rows
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.functions import scoring as S
from stack_trace_deduplication_ray.pipelines.util import ensure_schema
from stack_trace_deduplication_ray.sources.tables import read_table
from stack_trace_deduplication_ray.stages.joins import partitioned_groups

PAIR_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("score", pa.float64())]
)


def _df_fit(sf_dir: str) -> tuple[int, tuple[np.ndarray, np.ndarray]]:
    """Corpus document-frequency fit: N and the broadcast-ready
    (sorted uint64 token hashes, int64 counts) array pair — the same
    representation the broadcast joins use (~10x smaller than a dict
    of boxed ints; scorer-side lookups are vectorized searchsorted).

    Reference analog: FaST._Index.fit / LerchCrossEncoder.fit
    (fast.py:17-36, lerch.py:22-33) as one distinct-per-doc flat_map +
    groupby count (SURVEY.md §2.3 T2-T4)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()

    def partial_df(batch: pa.Table) -> pa.Table:
        # per-batch partial DF: the (doc, token)-distinct rows collapse
        # to one (token, count) row per batch-local token — no exchange
        t = _distinct_doc_tokens(batch)
        u, c = np.unique(
            t.column("tok").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {"tok": pa.array(u), "df": pa.array(c.astype(np.int64))}
        )

    # driver merge of the partials instead of a groupby SHUFFLE: the
    # fit result is broadcast whole to every scorer anyway (fit_ref),
    # so a driver-sized vocabulary is already this ranker's standing
    # assumption — the merge just removes the fit's only all-to-all
    # (measured ~5 s -> ~1.5 s at sf0.1)
    parts = ds.map_batches(partial_df, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("tok", sort=False)["df"].sum()
    keys = agg.index.to_numpy(dtype=np.int64).view(np.uint64)
    dfs = agg.to_numpy(dtype=np.int64)
    # sort in the uint64 domain — the domain token_hash_sets /
    # fast_token_views search in
    o = np.argsort(keys)
    return n_docs, (keys[o], dfs[o])


def _distinct_doc_tokens(batch: pa.Table) -> pa.Table:
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


from stack_trace_deduplication_ray.stages.candidates import (
    _group_bounds as _group_bounds_np,
)


def _fit_and_sources(ds):
    """ONE pass over documents computing every driver-side fit the
    ranker needs: corpus size, DF partials and per-source doc counts —
    each batch emits tagged (kind, key, val) partial rows and the
    driver merges (no shuffle, no second task wave; the round-3 shape
    paid one wave for the DF fit and another for the source sizes).

    Returns (n_docs, (tok_keys uint64 sorted-as-uint64, dfs int64),
    (src_keys int64 sorted-as-int64, src_counts int64))."""

    def partials(batch: pa.Table) -> pa.Table:
        t = _distinct_doc_tokens(batch)
        u, c = np.unique(
            t.column("tok").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        sh = H.hash_bytes_arrays(
            np.asarray(batch.column("source").to_pylist(), dtype=object)
        )
        us, cs = np.unique(sh, return_counts=True)
        kind = np.concatenate(
            [
                np.zeros(len(u), np.int8),
                np.ones(len(us), np.int8),
                np.full(1, 2, np.int8),
            ]
        )
        key = np.concatenate([u, us.view(np.int64), np.zeros(1, np.int64)])
        val = np.concatenate(
            [
                c.astype(np.int64),
                cs.astype(np.int64),
                np.asarray([len(batch)], np.int64),
            ]
        )
        return pa.table(
            {
                "kind": pa.array(kind),
                "key": pa.array(key),
                "val": pa.array(val),
            }
        )

    # driver merge of the partials instead of a groupby SHUFFLE: the
    # fit result is broadcast whole to every scorer anyway (fit_ref),
    # so a driver-sized vocabulary is already this ranker's standing
    # assumption — the merge just removes the fit's only all-to-all
    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    kind = parts["kind"].to_numpy()
    n_docs = int(parts.loc[kind == 2, "val"].sum())
    dfp = parts[kind == 0].groupby("key", sort=False)["val"].sum()
    keys = dfp.index.to_numpy(dtype=np.int64).view(np.uint64)
    dfs = dfp.to_numpy(dtype=np.int64)
    # token keys sort in the uint64 domain (token_hash_sets /
    # fast_token_views search there); source keys stay int64 (the
    # exchange bit-cast domain replicate() searches in)
    o = np.argsort(keys)
    srcp = parts[kind == 1].groupby("key", sort=True)["val"].sum()
    return (
        n_docs,
        (keys[o], dfs[o]),
        (srcp.index.to_numpy(dtype=np.int64), srcp.to_numpy(dtype=np.int64)),
    )


def _ranked_pairs_query(
    sf_dir: str,
    score_fn_builder,
    k: int,
    chunk_target: int = 2000,
    max_grid: int = 8,
):
    """Shared shape of the ranker queries: DF fit -> broadcast ->
    GRID-partitioned same-source candidate join -> text attachment
    (two partitioned joins) -> pairwise score -> per-src top-k cut.

    Candidate semantics: same-source pairs sharing >= 1 token
    (DummyRetrievalModel's within-group retrieval,
    /root/reference/ea/sim/main/methods/retrieval_model.py:50-58),
    ranked cut per query doc (eval_fast.py:95-96).

    De-skew design (exact theta-join grid): each source's docs hash
    into C chunks (C = clamp(ceil(n_source/chunk_target), 1, max_grid)
    from a cheap driver-side source count); every posting row
    replicates to the C cells {min(c,j), max(c,j)}, and each grid cell
    builds an in-process token index over its two chunks, emitting
    within-chunk pairs only on the diagonal cell and cross-chunk pairs
    only off-diagonal — every qualifying pair is produced by EXACTLY
    one cell, so there is no per-shared-token pair multiplicity (the
    round-3 interim token-keyed shape emitted a pair once per shared
    token: measured 10x slower than this at sf0.1) and no global pair
    dedup. A dominant source spreads over C(C+1)/2 cells across the
    full partition space; replication factor is bounded by max_grid.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    n_docs, df_of, (src_keys, src_n) = _fit_and_sources(ds)
    cfg = coalesce_for_rows(DedupConfig(), n_docs)
    fit_ref = ray.put((n_docs, df_of))

    grid_c = np.clip(
        np.ceil(src_n / float(chunk_target)).astype(np.int64), 1, max_grid
    )
    grid_ref = ray.put((src_keys, grid_c))

    def replicate(batch: pa.Table) -> pa.Table:
        """Each DOC row (id, text) replicated to its C grid cells with
        a side tag — texts travel the exchange once per cell, never
        once per pair (scoring happens in-cell)."""
        s_keys, s_grid = ray.get(grid_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh_src = H.hash_bytes_arrays(
            np.asarray(batch.column("source").to_pylist(), dtype=object)
        )
        C = s_grid[np.searchsorted(s_keys, sh_src.view(np.int64))]
        c = (
            H.hash_ids(ids.astype(np.int64), seed=0xC0FFEE)
            % C.view(np.uint64)
        ).astype(np.int64)
        n_out = int(C.sum())
        rr = np.repeat(np.arange(len(C), dtype=np.int64), C)
        j = np.arange(n_out, dtype=np.int64) - np.repeat(np.cumsum(C) - C, C)
        c_r = c[rr]
        lo = np.minimum(c_r, j)
        hi = np.maximum(c_r, j)
        with np.errstate(over="ignore"):
            cell = H.splitmix64(
                sh_src[rr]
                ^ (lo.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                ^ (hi.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
            )
        # side: 1 = chunk lo, 2 = chunk hi, 3 = diagonal (lo == hi)
        side = np.where(lo == hi, 3, np.where(c_r == lo, 1, 2)).astype(np.int8)
        take = pa.array(rr, type=pa.int64())
        return pa.table(
            {
                "cell": pa.array(cell.view(np.int64)),
                "doc_id": pa.array(ids[rr].astype(np.int64)),
                "side": pa.array(side),
                "text": batch.column("text").take(take),
            }
        )

    cells_ds = ds.map_batches(replicate, batch_format="pyarrow")

    def score_cell(part: pd.DataFrame) -> pd.DataFrame:
        """Per grid cell: tokenize once per doc, enumerate pairs
        sharing >= 1 token (diagonal: within-chunk; off-diagonal:
        cross-chunk only — exactly-once across the grid), score with
        the broadcast DF fit, keep a LOCAL per-src top-k. The global
        top-k is a superset-safe merge of cell top-ks (any pair in the
        global top-k ranks <= k inside its one producing cell)."""
        empty = pd.DataFrame(
            {
                "src": pd.Series(dtype="int64"),
                "dst": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            }
        )
        if not len(part):
            return empty
        n_docs_l, df_l = ray.get(fit_ref)
        # additive scorers (lerch: score = sum of token weights over
        # the shared-token set) are computed DURING pair enumeration by
        # accumulating each token group's weight onto its pairs — no
        # per-pair Python loop at all (measured 0.92 -> 0.15 s/cell)
        additive = getattr(score_fn_builder, "additive_weights", None)
        if additive is not None:
            w_keys, w_vals = additive(n_docs_l, df_l)
            score_pairs = None
        else:
            score_pairs = score_fn_builder(n_docs_l, df_l)
        cells = part["cell"].to_numpy()
        all_ids = part["doc_id"].to_numpy()
        all_side = part["side"].to_numpy()
        all_text = part["text"].to_numpy()
        frames = []
        c_starts, c_ends = _group_bounds_np(cells)
        for cs, ce in zip(c_starts, c_ends):
            ids = all_ids[cs:ce]
            side = all_side[cs:ce]
            texts = all_text[cs:ce]
            if len(ids) < 2:
                continue
            # local postings: (token hash, local doc index)
            tok_l, idx_l = [], []
            for li, t in enumerate(texts):
                h = np.unique(H.hash_bytes_arrays(t.split(" ")))
                tok_l.append(h)
                idx_l.append(np.full(len(h), li, dtype=np.int64))
            toks = np.concatenate(tok_l).view(np.int64)
            lidx = np.concatenate(idx_l)
            o = np.lexsort((lidx, toks))
            toks, lidx = toks[o], lidx[o]
            ia_c, ib_c, wt_c = [], [], []
            g_starts, g_ends = _group_bounds_np(toks)
            diag = side[0] == 3  # a cell is all-diagonal or not at all
            if score_pairs is None:
                # per-token-group weights, one vectorized lookup
                gw = S.df_lookup(
                    toks[g_starts].view(np.uint64), w_keys, w_vals
                )
            for gi, (gs, ge) in enumerate(zip(g_starts, g_ends)):
                g = lidx[gs:ge]
                if len(g) < 2:
                    continue
                if diag:
                    a, b = np.triu_indices(len(g), k=1)
                    ia_c.append(g[a])
                    ib_c.append(g[b])
                else:
                    A = g[side[g] == 1]
                    B = g[side[g] == 2]
                    if len(A) == 0 or len(B) == 0:
                        continue
                    ia_c.append(np.repeat(A, len(B)))
                    ib_c.append(np.tile(B, len(A)))
                if score_pairs is None:
                    wt_c.append(np.full(len(ia_c[-1]), gw[gi]))
            if not ia_c:
                continue
            ia = np.concatenate(ia_c)
            ib = np.concatenate(ib_c)
            # canonical (src < dst) on doc id, exact in-cell pair dedup
            # (a pair recurs across token groups, never across cells)
            sa, sb = all_ids[cs:ce][ia], all_ids[cs:ce][ib]
            swap = sa > sb
            src = np.where(swap, sb, sa)
            dst = np.where(swap, sa, sb)
            o2 = np.lexsort((dst, src))
            src, dst = src[o2], dst[o2]
            first = np.ones(len(src), dtype=bool)
            first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            if score_pairs is None:
                # additive path: a pair's score is the SUM of its
                # shared-token weights — segment-sum the sorted weight
                # stream over the unique-(src,dst) runs
                wts = np.concatenate(wt_c)[o2]
                sc = np.add.reduceat(wts, np.nonzero(first)[0])
                src, dst = src[first], dst[first]
            else:
                li_a = np.where(swap, ib, ia)[o2]
                li_b = np.where(swap, ia, ib)[o2]
                src, dst = src[first], dst[first]
                li_a, li_b = li_a[first], li_b[first]
                if getattr(score_fn_builder, "indexed_pairs", False):
                    # vectorized-kernel path: the scorer takes the
                    # cell's doc array + pair index arrays, so no
                    # per-pair Python list of texts is materialized
                    # (the S3M head runs on gathered hidden rows)
                    sc = score_pairs(texts, li_a, li_b)
                else:
                    sc = score_pairs(
                        [texts[i] for i in li_a], [texts[i] for i in li_b]
                    )
            df = pd.DataFrame(
                {
                    "src": src.astype(np.int64),
                    "dst": dst.astype(np.int64),
                    "score": np.round(sc, 4),
                }
            )
            df = df.sort_values(
                ["src", "score", "dst"], ascending=[True, False, True],
                kind="stable",
            )
            frames.append(df.groupby("src", sort=False).head(k))
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    scored = partitioned_groups(cells_ds, "cell", score_cell, cfg)

    if int(grid_c.max()) == 1:
        # C=1 everywhere: each source is ONE cell, every pair of a src
        # lives in exactly that cell, so the in-cell per-src top-k IS
        # the global top-k — skip the second exchange entirely (the
        # unskewed-corpus fast path; sf0.1 measured ~2.5 s saved)
        return ensure_schema(scored, PAIR_SCHEMA)

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
    -> DuckDB oracle ★). Output (src, dst, score rounded 4).

    Lerch is ADDITIVE over the shared-token set (score = sum idf(t)^2
    over the intersection), so the scorer ships as a token-weight
    table and score_cell accumulates weights during pair enumeration
    — no per-pair kernel runs at all (the per-pair intersect1d shape
    lives on in scoring.lerch_score for the registry / tests)."""

    def builder(n_docs, fit):  # pragma: no cover - additive path used
        keys, dfs = fit
        idf2 = S.idf_lerch(dfs, n_docs) ** 2

        def score_pairs(texts_a, texts_b):
            cache: dict = {}

            def hs(t):
                v = cache.get(t)
                if v is None:
                    v = cache[t] = S.token_hash_sets([t])[0]
                return v

            out = np.empty(len(texts_a), dtype=np.float64)
            for i, (a, b) in enumerate(zip(texts_a, texts_b)):
                inter = np.intersect1d(hs(a), hs(b), assume_unique=True)
                out[i] = S.df_lookup(inter, keys, idf2).sum()
            return out

        return score_pairs

    def additive(n_docs, fit):
        keys, dfs = fit
        return keys, S.idf_lerch(dfs, n_docs) ** 2

    builder.additive_weights = additive
    return _ranked_pairs_query(sf_dir, builder, k)


def fast_pair_scores(
    sf_dir: str, k: int = 5,
    alpha: float = 1.0, beta: float = 1.0, gamma: float = 1.0,
):
    """FaST positional-alignment pair scores, top-k per query doc
    (DuckDB oracle ★). The two-pointer merge over id-sorted token
    streams is equivalent to matching the k-th occurrence of each
    shared token in both docs (occurrences ordered by reversed
    position), which IS SQL-expressible as an equi-join on
    (source, token, k) — see oracle_sql()["fast_pair_scores"]. The
    kernel is additionally verified against an independent
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
