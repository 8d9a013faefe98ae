"""Ranked-prediction evaluation over engine output — the reference's
core deliverable (per-query ranked candidate lists scored by
Accuracy@k / MRR / F-beta / ROC-AUC / bootstrap CI,
/root/reference/ea/sim/dev/evaluation/evaluator.py:11-50) as driver
queries over the embeddings table:

- retrieval_rank_metrics ★: rank of the first correct-label candidate
  in the cosine top-10 per query -> Accuracy@{1,3,5,10} + MRR@10
  (SQL-expressible, DuckDB oracle).
- retrieval_threshold_metrics ★: the attach-vs-new battery — y_true =
  1-NN label match, y_score = top cosine — through the F-beta
  threshold sweep, rank-sum ROC-AUC and the bootstrap CI of
  Accuracy@1, composed from the two deterministic halves below off
  one ranks pass (DuckDB oracle = their SQL union).
- threshold_fbeta_auc ★: the sweep/AUC half on its own
  (4-decimal-quantized scores, DuckDB oracle).
- bootstrap_acc1_ci ★: the bootstrap CI with a deterministic
  Lehmer-LCG resampler both engines reproduce bit-for-bit.

Both run the brute-force scoring shape (batch x broadcast matrix):
this is the EVALUATION path, intentionally exact; the retrieval scale
path is similarity.lsh_near_pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.pipelines.similarity import (
    _emb_matrix,
    _probe_sample,
)
from stack_trace_deduplication_ray.sources.tables import read_table


# Above this corpus size the exact-eval queries stop broadcasting the
# full N x d matrix (which breaks before the compute does) and switch
# to the sampled-query transposed path: a seeded probe sample is the
# broadcast side (Q x d, small) and every corpus batch scores itself
# against the probes — O(N*Q) one-pass, exact top-k FOR THE SAMPLED
# QUERIES. Reference analog of the top-50 retrieval cut the reference
# evaluates through (retrieval_stage.py:121-126, arg_parsers.py:12).
EVAL_BROADCAST_MAX_ROWS = 100_000


def _sampled_first_correct_ranks(
    sf_dir: str, k: int = 10, n_queries: int = 512, seed: int = 23
):
    """Sampled-path ranks: exact cosine top-k of each PROBE query,
    computed transposed (corpus batches x broadcast probe matrix) with
    per-batch partial top-k and a small driver-side merge. Emits the
    same (rank, top_score, top1_match) layout as the full path."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    q_ids, q_mat, q_lab = _probe_sample(ds, n_queries, seed)
    ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids_q, q = ray.get(ref)
        ids, m = _emb_matrix(batch)
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        nm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = nm @ q.T  # (b, Q)
        # leave-one-out: a probe never retrieves itself
        self_mask = ids[:, None].astype(np.int64) == ids_q[None, :]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        qi = np.repeat(np.arange(sims.shape[1]), kk)
        ri = top.T.reshape(-1)
        return pa.table(
            {
                "q": pa.array(qi.astype(np.int64)),
                "cos": pa.array(sims[ri, qi]),
                "cand_id": pa.array(ids[ri].astype(np.int64)),
                "cand_lab": pa.array(lab[ri]),
            }
        )

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts = parts[np.isfinite(parts["cos"])]
    ranks = np.zeros(len(q_ids), dtype=np.int64)
    top_score = np.full(len(q_ids), -np.inf)
    top1 = np.zeros(len(q_ids), dtype=np.int64)
    if len(parts):
        # vectorized per-query top-k merge: one global lexsort by
        # (q, -cos, cand_id), positions within each q-run, first
        # match among the k kept rows (replaces the per-group pandas
        # loop — bounded by the probe sample, but free to vectorize)
        q = parts["q"].to_numpy()
        cos = parts["cos"].to_numpy()
        cid = parts["cand_id"].to_numpy()
        lab = parts["cand_lab"].to_numpy()
        o = np.lexsort((cid, -cos, q))
        qs, cos_s, lab_s = q[o], cos[o], lab[o]
        first_of_q = np.ones(len(qs), dtype=bool)
        first_of_q[1:] = qs[1:] != qs[:-1]
        start = np.nonzero(first_of_q)[0]
        grp = np.cumsum(first_of_q) - 1
        pos = np.arange(len(qs)) - start[grp]
        match = lab_s == q_lab[qs]
        top_score[qs[first_of_q]] = cos_s[first_of_q]
        top1[qs[first_of_q]] = match[first_of_q].astype(np.int64)
        sel = (pos < k) & match
        if sel.any():
            qsel, psel = qs[sel], pos[sel]
            fsel = np.ones(len(qsel), dtype=bool)
            fsel[1:] = qsel[1:] != qsel[:-1]
            ranks[qsel[fsel]] = psel[fsel] + 1
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "q": pa.array(q_ids.astype(np.int64)),
                "rank": pa.array(ranks),
                "top_score": pa.array(top_score),
                "top1_match": pa.array(top1),
            }
        )
    )


def _broadcast_corpus(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    ids_all, mats, labs = [], [], []
    for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        i, m = _emb_matrix(b)
        ids_all.append(i)
        mats.append(m)
        labs.append(b.column("label").to_numpy(zero_copy_only=False))
    ids = np.concatenate(ids_all)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.concatenate(mats)[order]
    lab = np.concatenate(labs)[order]
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ds, ray.put((ids, mat, lab))


def _first_correct_ranks(
    sf_dir: str, k: int = 10, max_broadcast_rows: int | None = None
):
    """Per-query rank (1-based, within top-k, 0 = none) of the first
    candidate whose label matches; candidates ordered (cos desc,
    vec_id asc). Also returns (top_score, top1_match) per query for
    the threshold battery. Emitted as per-batch partial tables.

    Corpora above `max_broadcast_rows` (default
    EVAL_BROADCAST_MAX_ROWS) take the sampled-query path — the full
    N x d broadcast is gated, never implicit at scale."""
    limit = (
        EVAL_BROADCAST_MAX_ROWS
        if max_broadcast_rows is None
        else max_broadcast_rows
    )
    probe = read_table(sf_dir, "embeddings", columns=["vec_id"])
    if probe.count() > limit:
        return _sampled_first_correct_ranks(sf_dir, k)
    ds, ref = _broadcast_corpus(sf_dir)

    def ranks(batch: pa.Table) -> pa.Table:
        key_ids, mat, lab = ray.get(ref)
        ids, q = _emb_matrix(batch)
        true = batch.column("label").to_numpy(zero_copy_only=False)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = qn @ mat.T
        self_pos = np.searchsorted(key_ids, ids)
        sims[np.arange(len(ids)), self_pos] = -np.inf
        # stable argsort of -cos: ties broken by ascending position ==
        # ascending vec_id (key_ids is sorted) — K5 deterministic order
        order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        cand_lab = lab[order]
        match = cand_lab == true[:, None]
        has = match.any(axis=1)
        first = np.where(has, match.argmax(axis=1) + 1, 0)
        top_score = np.take_along_axis(sims, order[:, :1], axis=1).ravel()
        return pa.table(
            {
                "q": pa.array(ids.astype(np.int64)),
                "rank": pa.array(first.astype(np.int64)),
                "top_score": pa.array(top_score),
                "top1_match": pa.array(match[:, 0].astype(np.int64)),
            }
        )

    return ds.map_batches(ranks, batch_format="pyarrow")


def retrieval_rank_metrics(sf_dir: str, k: int = 10):
    """Accuracy@{1,3,5,10} + MRR@10 over the cosine top-10 per query.
    Aggregated DISTRIBUTED: each batch reduces its ranks to partial
    (count, hits@k, rr) sums and only the one-row partials meet the
    driver. Output one row, floats rounded 4 (DuckDB oracle ★)."""

    def partials(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        cols = {"n": pa.array([len(r)], type=pa.int64())}
        for kk in (1, 3, 5, 10):
            cols[f"h{kk}"] = pa.array(
                [int(((r > 0) & (r <= kk)).sum())], type=pa.int64()
            )
        rr = np.where(r > 0, 1.0 / np.maximum(r, 1), 0.0)
        cols["rr"] = pa.array([float(rr.sum())], type=pa.float64())
        return pa.table(cols)

    p = _first_correct_ranks(sf_dir, k).map_batches(
        partials, batch_format="pyarrow"
    ).to_pandas().sum()
    n = int(p["n"])
    out = {"n_queries": n}
    for kk in (1, 3, 5, 10):
        out[f"acc{kk}"] = round(float(p[f"h{kk}"] / n), 4)
    out["mrr10"] = round(float(p["rr"] / n), 4)
    return pa.table(
        {kk: pa.array([v], type=pa.int64() if kk == "n_queries" else pa.float64())
         for kk, v in out.items()}
    )


def _fbeta_auc_metrics(t) -> dict:
    """F-beta sweep + rank-sum ROC-AUC over a (top_score, top1_match)
    ranks frame, with scores quantized to 4 decimals so the threshold
    boundary set is bit-identical to the DuckDB oracle. Values
    rounded 4."""
    from stack_trace_deduplication_ray.eval.metrics import (
        f_beta_sweep,
        roc_auc,
    )

    scores = np.round(t["top_score"].to_numpy(), 4)
    y = t["top1_match"].to_numpy().astype(np.int64)
    out = dict(f_beta_sweep(scores, y))
    auc = roc_auc(scores, y)
    if not np.isnan(auc):
        out["roc_auc"] = auc
    return {k: round(v, 4) for k, v in out.items()}


def _bootstrap_metrics(t, n_iter: int = 100) -> dict:
    """Deterministic Lehmer-LCG percentile bootstrap of Accuracy@1
    over a ranks frame ordered by query id (see bootstrap_acc1_ci)."""
    y = t.sort_values("q")["top1_match"].to_numpy().astype(np.int64)
    n = len(y)
    i = np.repeat(np.arange(n_iter, dtype=np.int64), n)
    j = np.tile(np.arange(n, dtype=np.int64), n_iter)
    pick = _lehmer2(i * np.int64(1000003) + j) % n
    sums = np.sort(y[pick].reshape(n_iter, n).sum(axis=1))
    lo_rank = max(int(np.ceil(0.025 * n_iter)), 1)
    hi_rank = int(np.ceil(0.975 * n_iter))
    return {
        "acc1_mean": _r4_ratio(int(y.sum()), n),
        "acc1_ci_lo": _r4_ratio(int(sums[lo_rank - 1]), n),
        "acc1_ci_hi": _r4_ratio(int(sums[hi_rank - 1]), n),
    }


def retrieval_threshold_metrics(sf_dir: str):
    """The full evaluator battery (A6 F-beta sweep + A7 ROC-AUC + A8
    bootstrap CI, reference evaluator.py) over the attach-vs-new
    signal, composed from its two hash-checkable halves computed off
    ONE ranks pass: the 4-decimal-quantized sweep/AUC
    (threshold_fbeta_auc) and the deterministic Lehmer-LCG bootstrap
    (bootstrap_acc1_ci). Both halves are exact-int64/quantized on both
    engines, so the whole battery is DuckDB-oracle-checkable (★); the
    reference-shaped seeded-np-RNG bootstrap remains available as
    eval.metrics.bootstrap_ci. Output (metric, value) rounded 4.

    The per-query (score, label) pairs are collected to the driver:
    the sweep/AUC/bootstrap need the full sorted score vector, and at
    one row per QUERY the vector is the small side by construction
    (same driver-side design as the reference's Evaluator)."""
    from stack_trace_deduplication_ray.eval.metrics import metrics_table

    t = _first_correct_ranks(sf_dir).to_pandas()
    out = _fbeta_auc_metrics(t)
    out.update(_bootstrap_metrics(t))
    return metrics_table(out)


def threshold_fbeta_auc(sf_dir: str):
    """The SQL-expressible half of the evaluator battery as a
    hash-checkable ★ query: best F-beta (betas 0.25/0.5/1/2/3) over
    every score threshold + rank-sum ROC-AUC with average tie ranks,
    over the attach-vs-new signal (y = top-1 label match, score =
    top-1 cosine).

    Scores are QUANTIZED to 4 decimals on BOTH engines before the
    sweep so the threshold boundary set is bit-identical between the
    numpy path and the DuckDB oracle (F values are then exact integer
    ratios -> deterministic argmax; ties broken toward the larger
    threshold in both). The seeded bootstrap stays in
    Output (metric, value) rounded 4."""
    from stack_trace_deduplication_ray.eval.metrics import metrics_table

    return metrics_table(
        _fbeta_auc_metrics(_first_correct_ranks(sf_dir).to_pandas())
    )


def _lehmer2(x: np.ndarray) -> np.ndarray:
    """Two Lehmer-LCG rounds (multiplier 48271, modulus 2^31-1 — the
    MINSTD constants). All intermediates < 2^47, so plain int64
    arithmetic is exact — the same expression evaluates identically
    as DuckDB BIGINT math, which is the point: a resampling scheme
    BOTH engines can reproduce bit-for-bit."""
    M = np.int64(2147483647)
    x = x % (M - 1) + 1
    x = (x * np.int64(48271)) % M
    x = (x * np.int64(48271)) % M
    return x


def _r4_ratio(num: int, den: int) -> float:
    """round(num/den, 4) with HALF-UP rounding done entirely in int64
    arithmetic: (num*20000 + den) // (2*den) / 10000. Both numpy int64
    and DuckDB BIGINT `//` evaluate this identically, so a ratio that
    lands exactly on a 0.00005 boundary (the case float round() makes
    engine-dependent) is still hash-stable."""
    return int((np.int64(num) * np.int64(20000) + np.int64(den))
               // (np.int64(2) * np.int64(den))) / 10000.0


def bootstrap_acc1_ci(sf_dir: str, n_iter: int = 100):
    """Percentile bootstrap CI of Accuracy@1 (reference: 100
    resamples, ea/common/evaluation/intervals.py:17-33) with a
    DETERMINISTIC integer resampler instead of an opaque RNG stream:
    draw j of iteration i picks index lehmer2(i*1000003 + j) % n over
    the y vector ordered by query id. The scheme is unbiased across
    draws and — unlike np.random — expressible in ANSI SQL, making
    the whole CI hash-checkable against the DuckDB oracle (★).

    The CI bounds are DISCRETE order statistics of the per-iteration
    success SUMS (ranks ceil(0.025*n_iter) and ceil(0.975*n_iter),
    i.e. 3rd and 98th of 100): integer sums + integer ranks + the
    integer half-up rounding of _r4_ratio keep the whole computation
    in exact int64, immune to float quantile-interpolation rounding
    boundaries that differ between engines. The reference-shaped
    seeded-np-RNG linear-interpolation bootstrap remains available as
    eval.metrics.bootstrap_ci. Output (metric, value) rounded 4."""
    from stack_trace_deduplication_ray.eval.metrics import metrics_table

    return metrics_table(
        _bootstrap_metrics(
            _first_correct_ranks(sf_dir).to_pandas(), n_iter
        )
    )
