"""Similarity search over the `embeddings` table (vec_id, embedding:
list<float>, label).

- brute-force cosine top-k against a broadcast query matrix (the
  baseline; numpy matmul per batch)
- same-label near-dup pairs (cosine >= threshold)
- LSH-bucketed approximate near-dup pairs (random hyperplane SimHash
  over embeddings -> bucket groupby -> within-bucket exact cosine) —
  the scale path replacing the reference's FAISS IndexFlatIP
  (/root/reference/ea/sim/main/methods/index/faiss.py:10-83) with a
  shuffle-native index-free design.
- IVF approximate kNN (seeded k-means coarse quantizer fit once on a
  sample, broadcast; probe-limited exact scoring per batch) — the
  second ANN variant; with full probing it equals the brute force
  exactly (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.pipelines.util import ensure_schema, sized_cfg
from stack_trace_deduplication_ray.sources.tables import read_table


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    lists = batch.column("embedding").combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(batch)
    return ids, flat.reshape(n, -1)


def knn_brute_force(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Top-k cosine neighbors of one stored vector, brute force.

    The query vector is fetched once and broadcast (ray.put); every
    batch does one vectorized matmul. Output (vec_id, cos) rounded to
    4 places, sorted desc, self excluded.
    """
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = None
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        ids, mat = _emb_matrix(b)
        hit = np.nonzero(ids == query_vec_id)[0]
        if len(hit):
            q = mat[hit[0]]
            break
    assert q is not None, f"query vec {query_vec_id} not found"
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ qv) / np.maximum(norms, 1e-12)
        keep = ids != query_vec_id
        return pa.table(
            {
                "vec_id": pa.array(ids[keep]),
                "cos": pa.array(np.round(cos[keep], 4)),
            }
        )

    from stack_trace_deduplication_ray.pipelines.util import distributed_topk

    return distributed_topk(
        ds.map_batches(score, batch_format="pyarrow"),
        [("cos", True), ("vec_id", False)], k,
    )


def same_label_near_pairs(sf_dir: str, threshold: float = 0.4):
    """Exact cosine pairs >= threshold within each label group
    (all-with-all inside map_groups; group sizes are bounded).
    Output (src, dst, cos) with src < dst, cos rounded 4."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ mat.T
        i, j = np.triu_indices(len(ids), k=1)
        # canonical src < dst on vec_id
        a, b = ids[i], ids[j]
        src = np.minimum(a, b)
        dst = np.maximum(a, b)
        cos = sims[i, j]
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "src": src[keep].astype(np.int64),
                "dst": dst[keep].astype(np.int64),
                "cos": np.round(cos[keep], 4),
            }
        )

    return ensure_schema(
        ds.groupby("label").map_groups(pairs, batch_format="pandas"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("cos", pa.float64())]),
    )


def _probe_sample(ds, n_queries: int, seed: int):
    """Seeded hash-sample of ~n_queries probe rows -> (ids, matrix,
    labels), L2-normalized. Small by construction."""
    from stack_trace_deduplication_ray.functions import hashing as H

    n = ds.count()
    mod = max(1, n // max(1, n_queries))

    def flt(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = (
            H.hash_ids(ids.astype(np.int64), seed=seed) % np.uint64(mod) == 0
        )
        return batch.filter(pa.array(mask))

    ids_l, mats, labs = [], [], []
    for b in ds.map_batches(flt, batch_format="pyarrow").iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        i, m = _emb_matrix(b)
        ids_l.append(i)
        mats.append(m)
        labs.append(b.column("label").to_numpy(zero_copy_only=False))
    ids = np.concatenate(ids_l).astype(np.int64)
    mat = np.concatenate(mats)
    lab = np.concatenate(labs)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat, lab



LSH_QUANT_BITS = 20  # embeddings quantized to floor(x * 2^20) int64


class HyperplaneLSH:
    """Sign-random-projection bucketer for embeddings (actor pool: the
    projection matrix is built once per actor from the seed).

    The projection is EXACT INTEGER arithmetic end to end, which makes
    the bucket assignment engine-independent (the DuckDB oracle
    re-derives it bit-for-bit):

    - plane entries are Rademacher ±1 signs taken from the parity of
      splitmix64(seed ^ (t*2^40 + bit*2^20 + dim)) — the standard SRP
      collision probability P(bit agrees) = 1 - theta/pi holds for
      ±1 entries just as for Gaussian ones (Charikar'02 sign-random
      projections; Achlioptas'03 database-friendly projections);
    - vectors are quantized to floor(x * 2^QUANT) int64 (exact: the
      float64 product is floored, never round-half-tied), so a bit is
      the sign of an int64 sum — no float summation-order ambiguity
      can flip a bucket bit between engines. At 2^20 the quantization
      perturbs each component by < 1e-6 relative to unit-scale data,
      far below any angular resolution the 16-bit sketch has.
    """

    def __init__(self, dim: int, n_bits: int = 16, n_tables: int = 4, seed: int = 99):
        from stack_trace_deduplication_ray.functions import hashing as H

        idx = (
            np.arange(n_tables, dtype=np.uint64)[:, None, None] << np.uint64(40)
        ) | (
            np.arange(n_bits, dtype=np.uint64)[None, :, None] << np.uint64(20)
        ) | np.arange(dim, dtype=np.uint64)[None, None, :]
        with np.errstate(over="ignore"):
            par = H.splitmix64(idx.reshape(-1) ^ np.uint64(seed)) & np.uint64(1)
        self.planes = (
            par.astype(np.int64).reshape(n_tables, n_bits, dim) * 2 - 1
        )
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        # float64 BLAS matmul over INTEGER-VALUED operands: every
        # product q_i * (±1) and every partial sum is an integer far
        # below 2^53 (|q| < 2^(QUANT + log2 max|x|) ~ 2^27, dims <<
        # 2^20), so the float64 result is EXACT regardless of
        # summation order — int64 determinism at BLAS speed (numpy
        # integer matmul has no BLAS path and is ~50x slower at wide
        # dims).
        q = np.floor(mat * float(1 << LSH_QUANT_BITS))
        out_ids, out_buckets = [], []
        for t in range(self.n_tables):
            bits = q @ self.planes[t].T.astype(np.float64) > 0
            vals = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
            out_ids.append(ids)
            out_buckets.append(vals + (t << 32))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_buckets).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(out_ids)),
            }
        )


# Materialized LSH pair tables, memoized per exact parameterization so
# evaluation queries (ann_recall) REUSE the table instead of re-running
# the whole bucket->pair->join chain. Input dirs are immutable test
# data; entries are materialized Datasets held in the object store.
_LSH_PAIR_CACHE: dict = {}


def lsh_near_pairs(
    sf_dir: str,
    threshold: float = 0.4,
    n_bits: int | None = None,
    n_tables: int = 16,
    bucket_cap: int = 2000,
):
    """Approximate near-dup pairs, fully distributed: hyperplane-LSH
    buckets -> within-bucket candidate pairs (partition-granularity
    group processing) -> vector attachment via TWO partitioned hash
    joins (pair dedup folded into the first) -> vectorized rowwise
    cosine. The embedding matrix is NEVER pulled to the driver.

    (n_bits, n_tables) trade candidate volume for recall: P(bit
    agrees) = 1 - arccos(cos)/pi, so at cos=0.4 a 4-bit table matches
    with p~0.16 and 16 tables give ~0.94 expected candidate recall
    (measured by the ann_recall query). n_bits=None auto-sizes to the
    table: ~2^bits = n/64 target bucket occupancy (floor 4) — the
    standard volume/recall dial; within-bucket all-pairs work is
    otherwise quadratic in occupancy. Buckets larger than
    `bucket_cap` are truncated WITH A LOG LINE (never silently).

    Output (src, dst, cos) rounded 4, src < dst. Approximate ->
    rows-only driver check; ann_recall quantifies it.
    """
    import logging

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.stages.joins import (
        join_ds,
        partitioned_groups,
    )

    logger = logging.getLogger(__name__)
    cache_key = (sf_dir, threshold, n_bits, n_tables, bucket_cap)
    cached = _LSH_PAIR_CACHE.get(cache_key)
    if cached is not None:
        return cached
    cfg = sized_cfg(sf_dir, "embeddings")
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = next(iter(ds.limit(1).iter_batches(batch_size=1, batch_format="pyarrow")))
    dim = len(first.column("embedding")[0])
    n_vec = ds.count()  # parquet-metadata count (gates n_bits + broadcast)
    if n_bits is None:
        n_bits = max(4, int(np.ceil(np.log2(max(2, n_vec / 64)))))

    buckets = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_args=(dim, n_bits, n_tables),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def emit_pairs(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["bucket"].to_numpy()
        ids = part["vec_id"].to_numpy()
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate([[0], change]) if len(keys) else np.empty(0, int)
        ends = np.concatenate([change, [len(keys)]]) if len(keys) else starts
        src_all, dst_all = [], []
        for s, e in zip(starts, ends):
            g = np.unique(ids[s:e])
            if len(g) < 2:
                continue
            if len(g) > bucket_cap:
                logger.warning(
                    "lsh_near_pairs: bucket of %d capped to %d "
                    "(raise bucket_cap or n_bits)", len(g), bucket_cap,
                )
                # truncate on a hash-shuffled order: keeping the first
                # bucket_cap ids of np.unique would systematically drop
                # high-id vectors (biased recall loss); the splitmix
                # order spreads the loss uniformly and stays seeded
                from stack_trace_deduplication_ray.functions import (
                    hashing as Hl,
                )

                ho = np.argsort(Hl.hash_ids(g.astype(np.int64), seed=0xCA9))
                g = np.sort(g[ho[:bucket_cap]])
            i, j = np.triu_indices(len(g), k=1)
            src_all.append(g[i])
            dst_all.append(g[j])
        if not src_all:
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"),
                 "dst": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "src": np.concatenate(src_all).astype(np.int64),
                "dst": np.concatenate(dst_all).astype(np.int64),
            }
        )

    pairs = partitioned_groups(buckets, "bucket", emit_pairs, cfg)

    # vector attachment: (src, dst) x embeddings, dedup folded into the
    # first join; int64 vec_ids are the join keys directly (join_ds
    # int fast path — no string round-trip)
    def ren(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__vid" + suffix: batch.column("vec_id").cast(pa.int64()),
                    "emb" + suffix: batch.column("embedding"),
                }
            )

        return fn

    emb_src = ds.map_batches(ren("_src"), batch_format="pyarrow")
    emb_dst = ds.map_batches(ren("_dst"), batch_format="pyarrow")

    # stage boundaries are materialized: Ray's streaming executor was
    # measured 3x slower running the bucket->pairs->join->join chain as
    # one graph than staged (50 s vs 14 s at 2k vectors x 16 tables);
    # the pair table is narrow, so the boundary is cheap
    pairs_s = pairs.materialize()
    # the FIRST join stays partitioned even under the broadcast gate:
    # its fold-in dedup on (src, dst) is REAL here (the same pair is
    # emitted by every LSH table whose buckets collide) and a global
    # dedup needs a pair-keyed exchange anyway. The SECOND attach has
    # no such constraint -> broadcast when the corpus is under the
    # (width-tightened) gate, dropping one exchange + its boundary.
    from stack_trace_deduplication_ray.stages.joins import (
        broadcast_attach,
        should_broadcast,
    )

    emb_gate = max(1, cfg.broadcast_join_max_rows // 8)
    j1 = join_ds(
        pairs_s, emb_src, "src", "__vid_src", cfg,
        dedup_left=["src", "dst"],
    )
    if should_broadcast(cfg, n_vec, emb_gate):
        j2 = broadcast_attach(
            j1, emb_dst, "dst", "__vid_dst", cfg,
            right_rows=n_vec, max_rows=emb_gate,
        )
    else:
        j2 = join_ds(j1.materialize(), emb_dst, "dst", "__vid_dst", cfg)

    def score(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64()),
                 "cos": pa.array([], type=pa.float64())}
            )
        a = np.stack(
            batch.column("emb_src").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        b = np.stack(
            batch.column("emb_dst").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
        cos = np.sum(a * b, axis=1)
        keep = cos >= threshold
        src = batch.column("src").to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "cos": pa.array(np.round(cos[keep], 4)),
            }
        )

    out = ensure_schema(
        j2.map_batches(score, batch_format="pyarrow"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("cos", pa.float64())]),
    ).materialize()
    _LSH_PAIR_CACHE[cache_key] = out
    return out


def ann_recall(
    sf_dir: str,
    threshold: float = 0.4,
    n_queries: int = 64,
    sample_seed: int = 17,
):
    """Candidate recall of the LSH path, estimated over a SEEDED QUERY
    SAMPLE (the reference's retrieval-quality evaluation shape applied
    to the ANN stage).

    Scale shape: the LSH pair table is built ONCE and materialized;
    the exact side computes the true >=threshold neighbors of only
    ~n_queries hash-sampled probe vectors (one distributed pass, each
    batch scored against the broadcast Q x d probe matrix — O(N*Q),
    never the full N x N matrix or a driver-side matrix pull). Recall
    = |LSH pairs touching a probe ∩ exact probe pairs| / |exact probe
    pairs|; only the probe-restricted pair sets (bounded by probe
    neighborhood sizes) reach the driver.

    Output one row (n_queries, n_exact, n_hit, recall rounded 4);
    hash-checked against eval/sql_oracle.ann_recall_sql (the SRP-LSH
    buckets are exact integer arithmetic, so the whole recall
    measurement is engine-independent).
    """
    from stack_trace_deduplication_ray.functions import hashing as H

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_vec = ds.count()
    mod = max(1, n_vec // max(1, n_queries))

    def probe_filter(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = (
            H.hash_ids(ids.astype(np.int64), seed=sample_seed)
            % np.uint64(mod)
            == 0
        )
        return batch.filter(pa.array(mask))

    probes = ds.map_batches(probe_filter, batch_format="pyarrow")
    p_ids_l, p_mats = [], []
    for b in probes.iter_batches(batch_size=8192, batch_format="pyarrow"):
        i, m = _emb_matrix(b)
        p_ids_l.append(i)
        p_mats.append(m)
    p_ids = np.concatenate(p_ids_l) if p_ids_l else np.empty(0, np.int64)
    assert len(p_ids), "query sample is empty"
    p_mat = np.concatenate(p_mats)
    p_mat = p_mat / np.maximum(
        np.linalg.norm(p_mat, axis=1, keepdims=True), 1e-12
    )
    ref = ray.put((p_ids.astype(np.int64), p_mat))

    def exact_probe_pairs(batch: pa.Table) -> pa.Table:
        q_ids, q = ray.get(ref)
        ids, m = _emb_matrix(batch)
        nm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = nm @ q.T  # (b, Q)
        rows, cols = np.nonzero(sims >= threshold)
        a = ids[rows].astype(np.int64)
        b_ = q_ids[cols]
        sel = a != b_
        return pa.table(
            {
                "src": pa.array(np.minimum(a, b_)[sel]),
                "dst": pa.array(np.maximum(a, b_)[sel]),
            }
        )

    exact_tbl = (
        ds.map_batches(exact_probe_pairs, batch_format="pyarrow").to_pandas()
    )
    exact = set(zip(exact_tbl["src"], exact_tbl["dst"]))

    # probe-membership side built ONCE (sorted int64 array, ray.put):
    # searchsorted membership per batch, no per-batch set->Arrow
    # array construction
    probe_sorted = np.sort(p_ids.astype(np.int64))
    probe_ref = ray.put(probe_sorted)
    lsh_pairs = lsh_near_pairs(sf_dir, threshold)  # memoized+materialized

    def touching(batch: pa.Table) -> pa.Table:
        pr = ray.get(probe_ref)

        def member(col: str) -> np.ndarray:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(pr, v)
            pos_c = np.minimum(pos, len(pr) - 1)
            return pr[pos_c] == v

        keep = member("src") | member("dst")
        return batch.filter(pa.array(keep)).select(["src", "dst"])

    lsh_tbl = lsh_pairs.map_batches(touching, batch_format="pyarrow").to_pandas()
    lsh = set(zip(lsh_tbl["src"], lsh_tbl["dst"]))
    hit = len(exact & lsh)
    return pa.table(
        {
            "n_queries": pa.array([len(p_ids)], type=pa.int64()),
            "n_exact": pa.array([len(exact)], type=pa.int64()),
            "n_hit": pa.array([hit], type=pa.int64()),
            "recall": pa.array(
                [round(hit / len(exact), 4) if exact else 1.0],
                type=pa.float64(),
            ),
        }
    )


def _sampled_knn_label_accuracy(ds, n_queries: int = 512, seed: int = 23):
    """Sampled-path leave-one-out 1-NN accuracy: exact nearest
    neighbor of each seeded probe, computed transposed (corpus
    batches x broadcast Q x d probe matrix, per-batch partial best,
    small driver merge). Output (n=|probes|, correct, accuracy)."""
    q_ids, q_mat, q_lab = _probe_sample(ds, n_queries, seed)
    ref = ray.put((q_ids, q_mat))

    def partial_best(batch: pa.Table) -> pa.Table:
        ids_q, q = ray.get(ref)
        ids, m = _emb_matrix(batch)
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        nm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = nm @ q.T  # (b, Q)
        sims[ids[:, None].astype(np.int64) == ids_q[None, :]] = -np.inf
        # per-query best in this batch, tie -> smallest candidate id
        ids_b = np.broadcast_to(ids, sims.T.shape)
        order = np.lexsort((ids_b, -sims.T), axis=1)  # per query: (-cos, id)
        best = order[:, 0]
        return pa.table(
            {
                "q": pa.array(np.arange(sims.shape[1], dtype=np.int64)),
                "cos": pa.array(sims[best, np.arange(sims.shape[1])]),
                "cand_id": pa.array(ids[best].astype(np.int64)),
                "cand_lab": pa.array(lab[best]),
            }
        )

    parts = ds.map_batches(partial_best, batch_format="pyarrow").to_pandas()
    parts = parts[np.isfinite(parts["cos"])]
    best = parts.sort_values(
        ["q", "cos", "cand_id"], ascending=[True, False, True]
    ).groupby("q", sort=True).head(1)
    correct = int(
        (best["cand_lab"].to_numpy() == q_lab[best["q"].to_numpy()]).sum()
    )
    n = len(q_ids)
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "correct": pa.array([correct], type=pa.int64()),
            "accuracy": pa.array([round(correct / n, 4)], type=pa.float64()),
        }
    )


def knn_label_accuracy(sf_dir: str, max_broadcast_rows: int | None = None):
    """Leave-one-out 1-NN label accuracy over the embeddings table —
    the retrieval-quality evaluation shape of the reference
    (Accuracy@1 over ranked candidates, ea/sim/dev/evaluation/metrics/
    base/per_instance/accuracy.py:6-27) as one brute-force vectorized
    pass: every batch scores against the broadcast full matrix.

    Corpora above `max_broadcast_rows` (default: evaluation.
    EVAL_BROADCAST_MAX_ROWS) switch to the sampled-query transposed
    path — the full-matrix broadcast is size-gated, never implicit.

    Output: one row (n, correct, accuracy rounded 4).
    """
    from stack_trace_deduplication_ray.pipelines.evaluation import (
        EVAL_BROADCAST_MAX_ROWS,
    )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    limit = (
        EVAL_BROADCAST_MAX_ROWS
        if max_broadcast_rows is None
        else max_broadcast_rows
    )
    if ds.count() > limit:
        return _sampled_knn_label_accuracy(ds)
    full = ds.materialize()
    ids_all, mats, labels_all = [], [], []
    for b in full.iter_batches(batch_size=8192, batch_format="pyarrow"):
        i, m = _emb_matrix(b)
        ids_all.append(i)
        mats.append(m)
        labels_all.append(b.column("label").to_numpy(zero_copy_only=False))
    all_ids = np.concatenate(ids_all)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    all_mat = np.concatenate(mats)[order]
    all_lab = np.concatenate(labels_all)[order]
    all_mat = all_mat / np.maximum(
        np.linalg.norm(all_mat, axis=1, keepdims=True), 1e-12
    )
    ref = ray.put((all_ids, all_mat, all_lab))

    def score(batch: pa.Table) -> pa.Table:
        key_ids, mat, lab = ray.get(ref)
        ids, q = _emb_matrix(batch)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = qn @ mat.T  # (b, N)
        self_pos = np.searchsorted(key_ids, ids)
        sims[np.arange(len(ids)), self_pos] = -np.inf  # leave-one-out
        # deterministic tie-break: highest sim, then smallest vec_id
        # (argmax returns the first/smallest index on ties, and key_ids
        # is sorted ascending)
        nn = np.argmax(sims, axis=1)
        pred = lab[nn]
        true = batch.column("label").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "correct": pa.array((pred == true).astype(np.int64)),
            }
        )

    correct = full.map_batches(score, batch_format="pyarrow").sum("correct")
    n = full.count()
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "correct": pa.array([int(correct)], type=pa.int64()),
            "accuracy": pa.array(
                [round(int(correct) / n, 4)], type=pa.float64()
            ),
        }
    )


def _kmeans_fit(mat: np.ndarray, n_centroids: int, seed: int = 7,
                n_iter: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means on L2-normalized vectors (driver-side fit
    on a sample — the fit-once half of the IVF pattern). Deterministic:
    seeded init, fixed iteration count, empty clusters re-seeded from
    the farthest points."""
    rng = np.random.default_rng(seed)
    n = len(mat)
    cents = mat[rng.choice(n, size=min(n_centroids, n), replace=False)]
    for _ in range(n_iter):
        sims = mat @ cents.T
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cents)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members) == 0:
                far = sims.max(axis=1).argmin()
                new[c] = mat[far]
            else:
                v = members.mean(axis=0)
                new[c] = v / max(np.linalg.norm(v), 1e-12)
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def _ivf_fit(ds, n_vec: int, n_centroids: int, fit_sample: int) -> np.ndarray:
    """Fit-once IVF coarse quantizer: HASH-sample across the whole
    table -> seeded k-means -> centroid matrix (caller broadcasts).
    A head-of-storage sample would bias the centroids on
    label/cluster-ordered tables (and probe-limited recall with it);
    the hash sample is order-independent and deterministic."""
    from stack_trace_deduplication_ray.functions import hashing as H

    smod = max(1, n_vec // max(1, fit_sample))

    def fit_filter(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = H.hash_ids(ids.astype(np.int64), seed=0x1F5) % np.uint64(smod) == 0
        return batch.filter(pa.array(mask))

    mats = []
    for b in ds.map_batches(fit_filter, batch_format="pyarrow").iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        _, m = _emb_matrix(b)
        if len(m):
            mats.append(m)
    if not mats:
        # tiny-corpus fallback: smod rounds up, so the hash filter can
        # select zero rows — take a head sample instead (bias is moot
        # when the whole corpus is this small)
        for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            _, m = _emb_matrix(b)
            mats.append(m)
            if sum(len(x) for x in mats) >= fit_sample:
                break
    sample = np.concatenate(mats)[:fit_sample].astype(np.float64)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    return _kmeans_fit(sample, n_centroids)


def ivf_recall(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 16,
    n_centroids: int = 8,
    n_probe: int = 4,
    fit_sample: int = 4096,
    sample_seed: int = 23,
):
    """Recall@k of the IVF path vs exact brute force, over a seeded
    hash-sampled probe set — the IVF sibling of `ann_recall`'s
    quantified quality proxy.

    ONE distributed pass computes BOTH sides: each batch scores its
    vectors against the broadcast Q x d probe matrix (O(N*Q), never
    N x N), emits per-query top-k partials twice — unrestricted
    (exact) and masked to the query's `n_probe` nearest inverted
    lists (IVF) — and the driver merges the (blocks x Q x k x 2)
    partial rows with one lexsort. recall = |ivf top-k ∩ exact
    top-k| / (Q*k). Output one row (n_queries, k, n_probe,
    n_centroids, recall rounded 4); rows-only driver check
    (approximate by design)."""
    from stack_trace_deduplication_ray.functions import hashing as H

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_vec = ds.count()
    cents = _ivf_fit(ds, n_vec, n_centroids, fit_sample)

    # seeded probe sample (ann_recall's shape)
    mod = max(1, n_vec // max(1, n_queries))

    def probe_filter(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = (
            H.hash_ids(ids.astype(np.int64), seed=sample_seed)
            % np.uint64(mod)
            == 0
        )
        return batch.filter(pa.array(mask))

    p_ids_l, p_mats = [], []
    for b in ds.map_batches(probe_filter, batch_format="pyarrow").iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        i, m = _emb_matrix(b)
        p_ids_l.append(i)
        p_mats.append(m)
    p_ids = (
        np.concatenate(p_ids_l).astype(np.int64)
        if p_ids_l
        else np.empty(0, np.int64)
    )
    assert len(p_ids), "query sample is empty"
    q = np.concatenate(p_mats).astype(np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    # per-query probed lists: bool mask (n_centroids, Q)
    aff = cents @ qn.T  # (C, Q)
    nprobe = min(n_probe, len(cents))
    top_c = np.argsort(-aff, axis=0)[:nprobe]  # (nprobe, Q)
    probe_mask = np.zeros((len(cents), len(p_ids)), dtype=bool)
    probe_mask[top_c, np.arange(len(p_ids))[None, :]] = True
    ref = ray.put((cents, p_ids, qn, probe_mask))

    def partials(batch: pa.Table) -> pa.Table:
        cents_l, q_ids, qv, pm = ray.get(ref)
        ids, mat = _emb_matrix(batch)
        if not len(ids):
            return pa.table(
                {
                    "q": pa.array([], type=pa.int64()),
                    "ivf": pa.array([], type=pa.int8()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        nm = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        sims = nm @ qv.T  # (b, Q)
        sims[ids[:, None].astype(np.int64) == q_ids[None, :]] = -np.inf
        assign = (nm @ cents_l.T).argmax(axis=1)
        in_probe = pm[assign]  # (b, Q) bool
        kk = min(k, len(ids))
        qs, fl, vi, co = [], [], [], []
        for flag, s in ((0, sims), (1, np.where(in_probe, sims, -np.inf))):
            top = np.argpartition(-s, kk - 1, axis=0)[:kk]  # (kk, Q)
            cols = np.broadcast_to(np.arange(s.shape[1]), top.shape)
            v = s[top, cols]
            keep = np.isfinite(v)
            qs.append(cols[keep])
            fl.append(np.full(int(keep.sum()), flag, dtype=np.int8))
            vi.append(ids[top[keep]].astype(np.int64))
            co.append(v[keep])
        return pa.table(
            {
                "q": pa.array(np.concatenate(qs).astype(np.int64)),
                "ivf": pa.array(np.concatenate(fl)),
                "vec_id": pa.array(np.concatenate(vi)),
                "cos": pa.array(np.concatenate(co)),
            }
        )

    t = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    qcol = t["q"].to_numpy()
    fcol = t["ivf"].to_numpy()
    vcol = t["vec_id"].to_numpy()
    ccol = t["cos"].to_numpy()
    # global per-(q, flag) top-k: one lexsort, positions within runs
    o = np.lexsort((vcol, -ccol, fcol, qcol))
    qs_, fs_, vs_ = qcol[o], fcol[o], vcol[o]
    grp = qs_.astype(np.int64) * 2 + fs_
    starts = np.r_[0, np.nonzero(np.diff(grp))[0] + 1]
    pos = np.arange(len(grp)) - np.repeat(starts, np.diff(np.r_[starts, len(grp)]))
    kept = pos < k
    exact_keys = set(zip(qs_[kept & (fs_ == 0)], vs_[kept & (fs_ == 0)]))
    ivf_keys = set(zip(qs_[kept & (fs_ == 1)], vs_[kept & (fs_ == 1)]))
    denom = max(1, len(exact_keys))
    rec = len(exact_keys & ivf_keys) / denom
    return pa.table(
        {
            "n_queries": pa.array([len(p_ids)], type=pa.int64()),
            "k": pa.array([k], type=pa.int64()),
            "n_probe": pa.array([nprobe], type=pa.int64()),
            "n_centroids": pa.array([len(cents)], type=pa.int64()),
            "recall": pa.array([round(rec, 4)], type=pa.float64()),
        }
    )


def ivf_knn(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 4,
    fit_sample: int = 4096,
):
    """IVF (inverted-file) approximate kNN — the coarse-quantizer scale
    path beside the hyperplane-LSH one (build brief: "an IVF or
    LSH-bucketed variant"): k-means centroids fit once on a sample
    (driver-side, seeded), broadcast; every batch assigns its vectors
    to the nearest centroid and only vectors in the query's `n_probe`
    closest lists are scored exactly. At scale the assignment column
    is the partitioning key (one groupby materializes the inverted
    lists); the probe is a vectorized per-batch mask here.

    With n_probe == n_centroids the output EXACTLY equals
    knn_brute_force (tested); smaller n_probe trades recall for
    scanned volume. Output (vec_id, cos rounded 4) sorted desc,
    self excluded; rows-only driver check (approximate by design).
    """
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_vec = ds.count()
    cents = _ivf_fit(ds, n_vec, n_centroids, fit_sample)
    cents_ref = ray.put(cents)

    # ---- query vector + probed lists ----------------------------------
    q = None
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        ids, mat = _emb_matrix(b)
        hit = np.nonzero(ids == query_vec_id)[0]
        if len(hit):
            q = mat[hit[0]].astype(np.float64)
            break
    assert q is not None, f"query vec {query_vec_id} not found"
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = set(
        np.argsort(-(cents @ qn))[: min(n_probe, len(cents))].tolist()
    )
    q_ref = ray.put((qn, probe))

    def score(batch: pa.Table) -> pa.Table:
        cents_l = ray.get(cents_ref)
        qv, probe_l = ray.get(q_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        nm = mat / norms[:, None]
        assign = (nm @ cents_l.T).argmax(axis=1)
        keep = np.isin(assign, list(probe_l)) & (ids != query_vec_id)
        cos = nm[keep] @ qv
        return pa.table(
            {
                "vec_id": pa.array(ids[keep]),
                "cos": pa.array(np.round(cos, 4)),
            }
        )

    from stack_trace_deduplication_ray.pipelines.util import distributed_topk

    return distributed_topk(
        ds.map_batches(score, batch_format="pyarrow"),
        [("cos", True), ("vec_id", False)], k,
    )


def embedding_dedup_clusters(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup CLUSTERING: the LSH pair table
    (memoized, `lsh_near_pairs`) feeds connected components, and every
    vector absent from the edge set labels itself — the embedding-side
    sibling of the text/image dedup families (one (vec_id, cluster_id)
    row per vector, cluster_id = min member id).

    LSH retrieval is probabilistic (seeded) -> rows-only driver check;
    `ann_recall` quantifies the pair recall this clustering builds on.
    """
    import pyarrow as pa

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.util import sized_cfg
    from stack_trace_deduplication_ray.stages import cc as cc_mod

    cfg = sized_cfg(sf_dir, "embeddings")
    pairs = lsh_near_pairs(sf_dir, threshold=threshold)

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"src": batch.column("src"), "dst": batch.column("dst")}
        )

    edges = pairs.map_batches(as_edges, batch_format="pyarrow")

    def as_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"image_id": batch.column("vec_id").cast(pa.int64())})

    ids = read_table(sf_dir, "embeddings", columns=["vec_id"]).map_batches(
        as_ids, batch_format="pyarrow"
    )
    clusters = cc_mod.assign_clusters(ids, edges, cfg)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch.column("image_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    return clusters.map_batches(rename, batch_format="pyarrow")
