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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.pipelines.util import ensure_schema
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

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos", "vec_id"], descending=[True, False])
        .limit(k)
    )


def same_label_near_pairs(sf_dir: str, threshold: float = 0.8):
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


class HyperplaneLSH:
    """Random-hyperplane SimHash bucketer for embeddings (actor pool:
    the projection matrix is built once per actor from the seed)."""

    def __init__(self, dim: int, n_bits: int = 16, n_tables: int = 4, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        out_ids, out_buckets = [], []
        for t in range(self.n_tables):
            bits = mat @ self.planes[t].T > 0
            vals = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
            out_ids.append(ids)
            out_buckets.append(vals + (t << 32))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_buckets).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(out_ids)),
            }
        )


def lsh_near_pairs(sf_dir: str, threshold: float = 0.8, n_bits: int = 12):
    """Approximate near-dup pairs: hyperplane-LSH buckets -> within-
    bucket exact cosine verify. Output (src, dst, cos) rounded 4.
    Approximate (recall < 1 by design) -> rows-only driver check."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = next(iter(ds.limit(1).iter_batches(batch_size=1, batch_format="pyarrow")))
    dim = len(first.column("embedding")[0])

    emb = ds.materialize()
    buckets = emb.map_batches(
        HyperplaneLSH,
        fn_constructor_args=(dim, n_bits),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )

    # pull vectors into a broadcast map for the verify step (embeddings
    # table is the small side here; at scale this becomes the engine's
    # feature-attachment join instead)
    ids_all, mats = [], []
    for b in emb.iter_batches(batch_size=8192, batch_format="pyarrow"):
        i, m = _emb_matrix(b)
        ids_all.append(i)
        mats.append(m)
    all_ids = np.concatenate(ids_all)
    all_mat = np.concatenate(mats)
    all_mat = all_mat / np.maximum(
        np.linalg.norm(all_mat, axis=1, keepdims=True), 1e-12
    )
    order = np.argsort(all_ids)
    lookup_ref = ray.put((all_ids[order], all_mat[order]))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["vec_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64"),
                 "cos": pd.Series(dtype="float64")}
            )
        key_ids, mat = ray.get(lookup_ref)
        rows = mat[np.searchsorted(key_ids, ids)]
        sims = rows @ rows.T
        i, j = np.triu_indices(len(ids), k=1)
        cos = sims[i, j]
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "src": ids[i][keep].astype(np.int64),
                "dst": ids[j][keep].astype(np.int64),
                "cos": np.round(cos[keep], 4),
            }
        )

    out = buckets.groupby("bucket").map_groups(pairs, batch_format="pandas")

    # canonical pair dedup across tables/buckets
    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return ensure_schema(
        out.groupby(["src", "dst"]).map_groups(first_row, batch_format="pandas"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("cos", pa.float64())]),
    )


def knn_label_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the embeddings table —
    the retrieval-quality evaluation shape of the reference
    (Accuracy@1 over ranked candidates, ea/sim/dev/evaluation/metrics/
    base/per_instance/accuracy.py:6-27) as one brute-force vectorized
    pass: every batch scores against the broadcast full matrix.

    Output: one row (n, correct, accuracy rounded 4).
    """
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
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
