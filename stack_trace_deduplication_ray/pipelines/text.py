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
from stack_trace_deduplication_ray.pipelines.util import ensure_schema
from stack_trace_deduplication_ray.sources.tables import read_table

TEXT_DEDUP_CONFIG = DedupConfig(
    stages=("exact", "minhash", "substring"),
    lowercase=False,  # oracle parity: SQL groups by raw text
)


def _docs_as_engine_input(sf_dir: str):
    """documents -> (image_id paddedstring, caption) for the engine.

    Zero-padded ids keep lexicographic order == numeric order, so the
    engine's min-id cluster representative equals min(doc_id)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def conv(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": pa.array([f"{i:012d}" for i in ids], type=pa.string()),
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
    substring stages). Returns (doc_id, cluster_id). Non-SQL
    (LSH banding + union-find) -> rows-only driver check.
    """
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    res = run_dedup(
        _docs_as_engine_input(sf_dir), TEXT_DEDUP_CONFIG, has_image=False
    )

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(x) for x in batch.column("image_id").to_pylist()],
                    type=pa.int64(),
                ),
                "cluster_id": pa.array(
                    [int(x) for x in batch.column("cluster_id").to_pylist()],
                    type=pa.int64(),
                ),
            }
        )

    return res["clusters"].map_batches(conv, batch_format="pyarrow")


def jaccard_pairs_by_source(sf_dir: str, threshold: float = 0.5):
    """Word-set Jaccard >= threshold for doc pairs within one source
    (the all-with-all within-group enumeration, pair.py:39-57).

    Output (src, dst, jac) with src < dst, jac rounded to 6 places.
    """
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].to_numpy()
        sets = [set(t.split(" ")) for t in group["text"]]
        order = np.argsort(ids)
        out = {"src": [], "dst": [], "jac": []}
        for ai in range(len(order)):
            for bi in range(ai + 1, len(order)):
                a, b = order[ai], order[bi]
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    out["src"].append(int(ids[a]))
                    out["dst"].append(int(ids[b]))
                    out["jac"].append(round(jac, 6))
        return pd.DataFrame(
            {
                "src": pd.Series(out["src"], dtype="int64"),
                "dst": pd.Series(out["dst"], dtype="int64"),
                "jac": pd.Series(out["jac"], dtype="float64"),
            }
        )

    out_ds = ds.groupby("source").map_groups(pairs, batch_format="pandas")
    return ensure_schema(
        out_ds,
        pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("jac", pa.float64())]),
    )


def substring_candidate_pairs(sf_dir: str, cfg: DedupConfig = TEXT_DEDUP_CONFIG):
    """Winnowed-fingerprint repeated-substring candidate pairs over
    document texts, verified by shared >= L-char window. Non-SQL ->
    rows-only check. Output (src, dst) doc ids, src < dst."""
    from stack_trace_deduplication_ray.stages import candidates as cand
    from stack_trace_deduplication_ray.stages import expand as ex
    from stack_trace_deduplication_ray.stages import verify as ver
    from stack_trace_deduplication_ray.stages.signatures import text_signature_stage

    docs = _docs_as_engine_input(sf_dir)
    sigs = text_signature_stage(docs, cfg).materialize()
    e, _ = cand.pairs_from_buckets(ex.expand_substring(sigs, cfg), "substring", cfg)
    verified = ver.verify_substring(e.materialize(), sigs, cfg)

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(
                    [int(x) for x in batch.column("src").to_pylist()],
                    type=pa.int64(),
                ),
                "dst": pa.array(
                    [int(x) for x in batch.column("dst").to_pylist()],
                    type=pa.int64(),
                ),
            }
        )

    return ensure_schema(
        verified.map_batches(conv, batch_format="pyarrow"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
    )
