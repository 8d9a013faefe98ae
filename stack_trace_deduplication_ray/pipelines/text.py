"""Text-side dedup pipelines over the `documents` table.

The caption dedup engine applied to a plain document corpus
(doc_id:int64, text:string[, lang, source]) — the training-data-scale
dedup operations: exact (hash keep-first), MinHash+LSH near-dup
clustering, n-gram Jaccard pair mining, repeated-substring candidates.

Reference analog: exact-dup keep-first over sorted ids
(/root/reference/ea/sim/main/data/objects/issue.py:13-22) and the
all-with-all within-group pair enumeration
(ea/sim/dev/scripts/training/datasets/pair.py:39-57).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.pipelines.util import ensure_schema, sized_cfg
from stack_trace_deduplication_ray.sources.tables import read_table

TEXT_DEDUP_CONFIG = DedupConfig(
    stages=("exact", "minhash", "substring"),
    lowercase=False,  # oracle parity: SQL groups by raw text
)


def _docs_as_engine_input(sf_dir: str):
    """documents -> (image_id:int64, caption) for the engine.

    doc_id passes through as the engine's int64 internal id (the
    exchange fast path — no string keys anywhere), and the engine's
    min-id cluster representative is exactly min(doc_id)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch.column("doc_id").cast(pa.int64()),
                "caption": batch.column("text"),
            }
        )

    return ds.map_batches(conv, batch_format="pyarrow")


def exact_dedup_keep_first(sf_dir: str):
    """Keep-first exact dedup summary: one row per distinct text with
    the kept (min) doc_id and the duplicate count.

    Oracle: SELECT min(doc_id) AS keep_id, count(*) AS n
            FROM documents GROUP BY text.
    """
    from ray.data.aggregate import Count, Min

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def key(batch: pa.Table) -> pa.Table:
        h = H.hash_bytes_arrays(batch.column("text").to_pylist(), seed=3)
        return pa.table(
            {
                "text_hash": pa.array(h.view(np.int64)),
                "doc_id": batch.column("doc_id"),
            }
        )

    out = (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n"))
    )
    return out.select_columns(["keep_id", "n"])


def corpus_stats(sf_dir: str):
    """(n_rows, n_unique_texts) — one-row summary.

    Oracle: SELECT count(*) AS n_rows, count(DISTINCT text) AS n_unique
            FROM documents.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_rows = ds.count()

    def key(batch: pa.Table) -> pa.Table:
        h = H.hash_bytes_arrays(batch.column("text").to_pylist(), seed=3)
        return pa.table({"text_hash": pa.array(h.view(np.int64))})

    n_unique = (
        ds.map_batches(key, batch_format="pyarrow").groupby("text_hash").count()
    ).count()
    return pa.table(
        {
            "n_rows": pa.array([n_rows], type=pa.int64()),
            "n_unique": pa.array([n_unique], type=pa.int64()),
        }
    )


def minhash_dedup_clusters(sf_dir: str):
    """Full near-dup clustering of documents (exact + MinHash-LSH +
    substring stages). Returns (doc_id, cluster_id).

    Hash-checked against a machine-generated pure-SQL DuckDB oracle
    (eval/sql_oracle.py): the 64-bit hash kernels, MinHash/LSH
    banding, winnowing, verification, and connected components are
    re-derived in DuckDB integer arithmetic and must agree
    bit-for-bit on every cluster assignment.
    """
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    res = run_dedup(
        _docs_as_engine_input(sf_dir), TEXT_DEDUP_CONFIG, has_image=False
    )

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("image_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    return res["clusters"].map_batches(conv, batch_format="pyarrow")


def word_jaccard_pairs_exact(
    ids: np.ndarray, texts: list[str], threshold: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """EXACT all-pairs word-set similarity join via prefix filtering
    (Bayardo/Chaudhuri all-pairs style, public literature): tokens are
    globally ordered rarest-first; a pair with Jaccard >= t must share
    a token inside both docs' prefixes of length |d| - ceil(t*|d|) + 1
    (pigeonhole: J >= t forces >= ceil(t*|d|) shared tokens, which
    cannot all avoid the prefix). Only prefix-token posting lists are
    expanded into candidates, then candidates get the exact Jaccard.

    Guaranteed identical to brute-force n^2 enumeration (tested), but
    the quadratic blowup on frequent tokens is gone — frequent tokens
    sort to the END of every doc and rarely enter a prefix.

    Returns (src, dst, jac) arrays with src < dst by id.
    """
    n = len(ids)
    if n < 2:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.float64)
    sets = [np.unique(np.asarray(t.split(" "), dtype=object)) for t in texts]
    # global rarity order: df per token, then token text as tiebreak
    all_tok = np.concatenate(sets)
    uniq, counts = np.unique(all_tok, return_counts=True)
    order = np.lexsort((uniq, counts))  # (df asc, token asc)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    rank_of = dict(zip(uniq, rank))
    docs = [np.sort(np.fromiter((rank_of[t] for t in s), dtype=np.int64,
                                count=len(s))) for s in sets]
    # prefix postings
    post_tok, post_doc = [], []
    for i, dr in enumerate(docs):
        plen = len(dr) - int(np.ceil(threshold * len(dr))) + 1
        if plen > 0:
            post_tok.append(dr[:plen])
            post_doc.append(np.full(plen, i, dtype=np.int64))
    pt = np.concatenate(post_tok)
    pd_ = np.concatenate(post_doc)
    o = np.argsort(pt, kind="stable")
    pt, pd_ = pt[o], pd_[o]
    change = np.nonzero(pt[1:] != pt[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(pt)]])
    cand_i, cand_j = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        g = np.sort(pd_[s:e])
        i, j = np.triu_indices(e - s, k=1)
        cand_i.append(g[i])
        cand_j.append(g[j])
    if not cand_i:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.float64)
    ci = np.concatenate(cand_i)
    cj = np.concatenate(cand_j)
    pair_key = np.unique(ci.astype(np.int64) * n + cj)
    ci, cj = pair_key // n, pair_key % n
    src_l, dst_l, jac_l = [], [], []
    for a, b in zip(ci, cj):
        inter = np.intersect1d(docs[a], docs[b], assume_unique=True).size
        union = len(docs[a]) + len(docs[b]) - inter
        jac = inter / union if union else 1.0
        if jac >= threshold:
            ia, ib = int(ids[a]), int(ids[b])
            src_l.append(min(ia, ib))
            dst_l.append(max(ia, ib))
            jac_l.append(round(jac, 6))
    return (
        np.asarray(src_l, dtype=np.int64),
        np.asarray(dst_l, dtype=np.int64),
        np.asarray(jac_l, dtype=np.float64),
    )


def jaccard_pairs_by_source(sf_dir: str, threshold: float = 0.5):
    """Word-set Jaccard >= threshold for doc pairs within one source
    (the all-with-all within-group enumeration, pair.py:39-57 — as a
    fully DISTRIBUTED exact prefix-filtered similarity join).

    Output (src, dst, jac) with src < dst, jac rounded to 6 places.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return word_jaccard_pairs_distributed(
        ds, threshold, sized_cfg(sf_dir, "documents"), n_docs=ds.count()
    )


def word_jaccard_pairs_distributed(
    ds, threshold: float, cfg: DedupConfig, n_docs: int | None = None
):
    """Distributed exact AllPairs similarity join, de-skewed.

    The round-2 shape partitioned by `source`, so ONE dominant source
    became one giant straggler task (its whole inverted index built
    in-process). This shape's partition keys are (source, token): a
    big source spreads across the full partition space and no stage
    ever co-locates a whole source.

        1. explode per-doc distinct tokens -> (tkey, doc_id, n_tok)
           with tkey = hash(source, token) — one exchange keyed by
           token computes the per-(source, token) DF (the AllPairs
           global rarity order must be consistent corpus-wide, not
           partition-local, for the prefix guarantee to hold);
        2. regroup by doc_id: sort each doc's tokens by (df, tkey) and
           keep the prefix of length |d| - ceil(t*|d|) + 1 (pigeonhole:
           J >= t forces >= ceil(t*|d|) shared tokens, which cannot
           all avoid the prefix — exact for ANY consistent total
           order, rarity-first minimizes posting sizes);
        3. regroup prefix postings by tkey: each token emits its
           posting list's pairs (frequent tokens sort to the END of
           docs and rarely enter a prefix — the quadratic posting
           blowup stays pruned);
        4. pair dedup folds into the text-attachment join (src, then
           dst — the verify_fused join shape) and each pair gets the
           exact word-set Jaccard.

    (src, dst) pairs are within one source by construction (they met
    in a (source, token) bucket). Exactness vs the n^2 enumeration is
    tested, including under 80/20 source skew.
    """
    import pandas as pd

    from stack_trace_deduplication_ray.stages.joins import (
        join_ds,
        partitioned_groups,
    )

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks_list = pc.split_pattern(batch.column("text"), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks_list).combine_chunks()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        th = H.hash_bytes_arrays(flat.to_numpy(zero_copy_only=False))
        # per-doc distinct (word SETS)
        order = np.lexsort((th, doc_idx))
        sd, sh = doc_idx[order], th[order]
        first = np.ones(len(sh), dtype=bool)
        first[1:] = (sh[1:] != sh[:-1]) | (sd[1:] != sd[:-1])
        keep = order[first]
        d = doc_idx[keep]
        n_tok = np.bincount(d, minlength=len(batch)).astype(np.int64)
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
                "n_tok": pa.array(n_tok[d]),
            }
        )

    postings = ds.map_batches(explode, batch_format="pyarrow")

    def with_df(part: pd.DataFrame) -> pd.DataFrame:
        df = part.groupby("tkey", sort=False)["doc_id"].transform("size")
        out = part.copy()
        out["df"] = df.astype(np.int64)
        return out

    dfed = partitioned_groups(postings, "tkey", with_df, cfg)

    def prefixes(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["doc_id", "df", "tkey"], kind="stable")
        pos = g.groupby("doc_id", sort=False).cumcount()
        n = g["n_tok"].to_numpy()
        plen = n - np.ceil(threshold * n).astype(np.int64) + 1
        keep = pos.to_numpy() < plen
        return g.loc[keep, ["tkey", "doc_id"]]

    prefix_post = partitioned_groups(dfed, "doc_id", prefixes, cfg)

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

    pairs = partitioned_groups(prefix_post, "tkey", emit_pairs, cfg)

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
    # first join stays partitioned (its fold-in pair dedup is global
    # only under pair-keyed partitioning); the second attach
    # broadcasts when the caller-known doc count is under the
    # (text-width-tightened) gate — one exchange + boundary saved
    from stack_trace_deduplication_ray.stages.joins import (
        broadcast_attach,
        should_broadcast,
    )

    text_gate = max(1, cfg.broadcast_join_max_rows // 4)
    j1 = join_ds(
        pairs.materialize(),
        texts.map_batches(ren("_src"), batch_format="pyarrow"),
        "src", "__did_src", cfg, dedup_left=["src", "dst"],
    )
    if should_broadcast(cfg, n_docs, text_gate):
        j2 = broadcast_attach(
            j1, texts.map_batches(ren("_dst"), batch_format="pyarrow"),
            "dst", "__did_dst", cfg, right_rows=n_docs, max_rows=text_gate,
        )
    else:
        j2 = join_ds(
            j1.materialize(),
            texts.map_batches(ren("_dst"), batch_format="pyarrow"),
            "dst", "__did_dst", cfg,
        )

    def score(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64()),
                 "jac": pa.array([], type=pa.float64())}
            )
        ta = batch.column("text_src").to_pylist()
        tb = batch.column("text_dst").to_pylist()
        jac = np.zeros(n, dtype=np.float64)
        for i in range(n):  # pairs only — small relative to corpus
            sa = set(ta[i].split(" "))
            sb = set(tb[i].split(" "))
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 1.0
        keep = jac >= threshold
        return pa.table(
            {
                "src": batch.column("src").cast(pa.int64()).filter(pa.array(keep)),
                "dst": batch.column("dst").cast(pa.int64()).filter(pa.array(keep)),
                "jac": pa.array(np.round(jac[keep], 6)),
            }
        )

    return ensure_schema(
        j2.map_batches(score, batch_format="pyarrow"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("jac", pa.float64())]),
    )


def substring_candidate_pairs(sf_dir: str, cfg: DedupConfig = TEXT_DEDUP_CONFIG):
    """Winnowed-fingerprint repeated-substring candidate pairs over
    document texts, verified by shared >= L-char window. Hash-checked
    against eval/sql_oracle.substring_candidate_pairs_sql, which
    reproduces the winnowing itself in SQL (so no reliance on the
    L+window-1 completeness guarantee). Output (src, dst) doc ids,
    src < dst."""
    from stack_trace_deduplication_ray.stages import candidates as cand
    from stack_trace_deduplication_ray.stages import expand as ex
    from stack_trace_deduplication_ray.stages import verify as ver
    from stack_trace_deduplication_ray.stages.signatures import text_signature_stage

    cfg = sized_cfg(sf_dir, "documents", cfg)
    docs = _docs_as_engine_input(sf_dir)
    sigs = text_signature_stage(docs, cfg).materialize()
    e, _ = cand.pairs_from_buckets(ex.expand_substring(sigs, cfg), "substring", cfg)
    verified = ver.verify_substring(e.materialize(), sigs, cfg)

    def conv(batch: pa.Table) -> pa.Table:
        # src/dst ARE doc ids: int64 ids pass through the engine
        return batch.select(["src", "dst"])

    return ensure_schema(
        verified.map_batches(conv, batch_format="pyarrow"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
    )


def substring_pairs_exact(sf_dir: str, cfg: DedupConfig = TEXT_DEDUP_CONFIG):
    """Exact repeated-substring pair mining with a closed-form
    contract: pairs of documents whose NORMALIZED texts share a
    substring of >= L + window - 1 chars (39 at the default (32, 8)
    config). Winnowing's guarantee (expand.winnow_fingerprints:
    strings sharing a >= L+window-1 substring share a fingerprint)
    makes the bucket pass a COMPLETE candidate generator at that
    length, and the verify here re-checks an exact shared
    (L+window-1)-gram — so the result set is EXACTLY the SQL
    self-join on extracted grams of the whitespace-normalized text
    (DuckDB oracle ★). `substring_candidate_pairs` keeps the looser
    >= L semantics, which is guarantee-gapped in [L, L+window-2] and
    therefore rows-only. Output (src, dst) doc ids, src < dst."""
    import dataclasses

    from stack_trace_deduplication_ray.stages import candidates as cand
    from stack_trace_deduplication_ray.stages import expand as ex
    from stack_trace_deduplication_ray.stages import verify as ver
    from stack_trace_deduplication_ray.stages.signatures import text_signature_stage

    cfg = sized_cfg(sf_dir, "documents", cfg)
    docs = _docs_as_engine_input(sf_dir)
    sigs = text_signature_stage(docs, cfg).materialize()
    e, _ = cand.pairs_from_buckets(ex.expand_substring(sigs, cfg), "substring", cfg)
    # verify at the guarantee length: candidates are complete there
    cfg_v = dataclasses.replace(
        cfg, substring_min_len=cfg.substring_min_len + cfg.winnow_window - 1
    )
    verified = ver.verify_substring(e.materialize(), sigs, cfg_v)

    def conv(batch: pa.Table) -> pa.Table:
        return batch.select(["src", "dst"])

    return ensure_schema(
        verified.map_batches(conv, batch_format="pyarrow"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
    )


def cluster_size_histogram(sf_dir: str):
    """A11 histogram as a ★ query: cluster-size distribution of the
    flagship minhash clusters (reference per-issue report histograms,
    /root/reference/helpers/print_dataset_sizes.py:11-60). Output
    (cluster_size, n_clusters); the oracle wraps the machine-generated
    clusters statement in two GROUP BYs."""
    from stack_trace_deduplication_ray.pipelines.dedup import cluster_summary

    return cluster_summary(minhash_dedup_clusters(sf_dir))


def report_dedup_clusters(sf_dir: str):
    """Raw V1/V0 JSON report ingestion -> dedup clusters end-to-end
    (S3/S4 source operators + the text engine): a deterministic raw
    report fixture is written under /tmp, ingested with
    sources.reports.read_reports (binary-file source + vectorized
    parse + MethodNameUnifier), and clustered. Output
    (report_id, cluster_id); ★ oracle — the DuckDB side re-parses the
    same raw JSON files in SQL (read_json_auto + the unifier regex
    chain, eval/sql_oracle.report_dedup_clusters_sql)."""
    import os

    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.sources.reports import (
        read_reports,
        reports_as_documents,
        write_reports_fixture,
    )

    # One fixed fixture size at every sf: the DuckDB oracle
    # (eval/sql_oracle.report_dedup_clusters_sql) embeds this exact
    # path, and oracle parity requires both engines to read the same
    # raw files regardless of which sf dir the driver runs at.
    n = 240
    d = f"/tmp/stack_dedup_fixtures/reports_{n}"
    if not os.path.exists(os.path.join(d, "_DONE")):
        write_reports_fixture(d, n=n, seed=7)
        open(os.path.join(d, "_DONE"), "w").close()
    docs = reports_as_documents(read_reports(d))
    res = run_dedup(
        docs, DedupConfig(stages=("exact", "minhash")), has_image=False
    )

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "report_id": batch.column("image_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    return res["clusters"].map_batches(conv, batch_format="pyarrow")


def cross_segment_new_docs(sf_dir: str, train_source: str = "src0"):
    """Cross-segment hash anti-join: documents outside the train
    segment whose text hash never appeared INSIDE it — the reference's
    mine-time dedup (FinalStateReportMiner.mine drops test rows whose
    hash was seen in train, ea/sim/dev/scripts/data/dataset/common/
    miners/final_state.py:24-36; with_dup_attach=False filter,
    event_state_model.py:94-104).

    The train segment's hash set is the SMALL side by construction ->
    broadcast (ray.put) + vectorized membership mask per batch; at
    segment sizes where that breaks, the same predicate is one
    join_ds left-outer + null filter. Output (doc_id), ★ oracle.
    """
    import ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def train_hashes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("source"), train_source))
        h = H.hash_bytes_arrays(t.column("text").to_pylist(), seed=3)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    seen = np.unique(
        np.concatenate(
            [
                b.column("h").to_numpy(zero_copy_only=False)
                for b in ds.map_batches(
                    train_hashes, batch_format="pyarrow"
                ).iter_batches(batch_size=65536, batch_format="pyarrow")
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    ref = ray.put(seen)

    def anti(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        train_seen = ray.get(ref)
        t = batch.filter(
            pc.not_equal(batch.column("source"), train_source)
        )
        h = H.hash_bytes_arrays(t.column("text").to_pylist(), seed=3).view(
            np.int64
        )
        pos = np.searchsorted(train_seen, h)
        pos_c = np.minimum(pos, max(len(train_seen) - 1, 0))
        new = (
            train_seen[pos_c] != h
            if len(train_seen)
            else np.ones(len(h), dtype=bool)
        )
        return pa.table({"doc_id": t.column("doc_id").filter(pa.array(new))})

    return ds.map_batches(anti, batch_format="pyarrow")


def simhash_text_clusters(sf_dir: str, cfg: DedupConfig | None = None):
    """Text near-dup clustering by 64-bit token SimHash (Charikar
    bit-vote) — the classic low-cost dedup family alongside
    MinHash-LSH: token-hash bit votes -> chunk-probed buckets with the
    in-bucket Hamming(<= radius) test (pigeonhole-complete, same
    machinery as the image side) -> connected components.
    Output (doc_id, cluster_id); hash-checked against
    eval/sql_oracle.simhash_text_clusters_sql (the token hash is the
    SQL-rederivable poly+splitmix construction, hash_strings_poly)."""
    from stack_trace_deduplication_ray.stages import candidates as cand
    from stack_trace_deduplication_ray.stages import cc as cc_mod

    cfg = cfg or sized_cfg(sf_dir, "documents")
    ds = _docs_as_engine_input(sf_dir)

    def sig(batch: pa.Table) -> pa.Table:
        caps = batch.column("caption").to_pylist()
        toks = [c.split() for c in caps]
        lens = np.fromiter(map(len, toks), dtype=np.int64, count=len(toks))
        offs = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        # ONE vectorized hash pass over the batch's flattened token
        # stream (was a per-row hash_bytes_arrays loop); the poly
        # construction is also what makes the SQL oracle possible
        flat = (
            H.hash_strings_poly([t for row in toks for t in row])
            if lens.sum()
            else np.empty(0, dtype=np.uint64)
        )
        sh = H.simhash_from_token_hashes(flat, offs)
        return pa.table(
            {
                "image_id": batch.column("image_id").cast(pa.int64()),
                "simhash": pa.array(sh.view(np.int64)),
            }
        )

    sigs = ds.map_batches(sig, batch_format="pyarrow").materialize()

    def expand(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(
            np.uint64
        )
        keys = H.simhash_chunk_keys(sh, cfg.simhash_chunks)
        n, k = keys.shape
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1).view(np.int64)),
                "image_id": pa.array(np.repeat(ids, k), type=pa.int64()),
                "simhash": pa.array(np.repeat(sh.view(np.int64), k)),
            }
        )

    edges, _ = cand.simhash_pairs_from_buckets(
        sigs.map_batches(expand, batch_format="pyarrow"), "simhash", cfg
    )
    # Re-verify Hamming on EVERY edge: the in-bucket pre-test already
    # guarantees it for normal pairs, but salting BRIDGE links (and
    # over-cap chain links between sub-bucket reps) skip it — the
    # image flagship re-checks those in its PSNR verify, and without
    # this pass a sampling-triggered salt of an under-cap bucket can
    # leak an unverified rep-rep edge straight into CC (observed at
    # fixture scale: 2 extra merges from hot-estimate false
    # positives). One feature-attachment join pair, same machinery as
    # the verify stages.
    from stack_trace_deduplication_ray.stages.verify import (
        attach_pair_features,
    )

    attached = attach_pair_features(
        edges.materialize(), sigs, cfg, dedup_pairs=True,
        feat_size_bytes=sigs.size_bytes(),
    )

    def ham_filter(batch: pa.Table) -> pa.Table:
        a = batch.column("simhash_src").to_numpy(zero_copy_only=False)
        b = batch.column("simhash_dst").to_numpy(zero_copy_only=False)
        d = H.hamming64(a.astype(np.int64).view(np.uint64),
                        b.astype(np.int64).view(np.uint64))
        keep = d <= cfg.hamming_radius
        return batch.filter(pa.array(keep)).select(["src", "dst"])

    edges = attached.map_batches(
        ham_filter, batch_format="pyarrow"
    ).materialize()
    clusters = cc_mod.assign_clusters(ds.select_columns(["image_id"]), edges, cfg)

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("image_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    return clusters.map_batches(conv, batch_format="pyarrow")
