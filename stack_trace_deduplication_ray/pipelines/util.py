"""Small result-shaping helpers for query outputs."""

from __future__ import annotations

import os

import pyarrow as pa


def sized_cfg(sf_dir: str, table: str, cfg=None):
    """A DedupConfig whose exchange-coalesce flag matches the named
    table's row count (config.coalesce_for_rows). The count comes from
    parquet file metadata — no Ray execution. Unknown layouts keep the
    scale-safe default (coalesce on)."""
    from stack_trace_deduplication_ray.config import (
        DedupConfig,
        coalesce_for_rows,
        partitions_for_rows,
    )

    cfg = cfg or DedupConfig()
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        import pyarrow.parquet as pq

        n = pq.read_metadata(path).num_rows
        return partitions_for_rows(coalesce_for_rows(cfg, n), n)
    except Exception:
        return cfg


def ensure_schema(ds, schema: pa.Schema):
    """Guarantee a stable schema on a possibly-empty small result.

    A Ray Dataset whose every block is empty (e.g. a pair-mining query
    with no hits) loses its column schema entirely; downstream
    consumers (and the driver's schema check) then see zero columns.
    Small results are converted to an Arrow table with the declared
    schema; non-empty results pass through as the Dataset.
    """
    # materialize ONCE: the count() below otherwise executes the whole
    # lazy pipeline and still hands the caller a lazy dataset whose
    # next consumption re-executes it all over again (results at this
    # point are query outputs — small by construction)
    ds = ds.materialize()
    cnt = ds.count()
    if cnt == 0:
        return schema.empty_table()
    out = ds
    try:
        names = out.schema().names
    except Exception:
        names = None
    if names != schema.names:
        # column order drift (pandas group outputs): rebuild via Arrow
        tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
        return tbl.select(schema.names).cast(schema)
    return out


def distributed_topk(ds, keys: list[tuple[str, bool]], k: int) -> pa.Table:
    """Global top-k WITHOUT a global sort shuffle: every batch prunes
    itself to its local top-k under the same total order (any row
    outside a batch's local top-k cannot be in the global top-k), the
    <= k x n_blocks survivors are collected, and one driver-side sort
    finishes. Replaces `sort().limit(k)` — the sort is an all-to-all
    exchange of the WHOLE table for k winners.

    keys: [(column, descending)], applied in order (K5 deterministic
    total order). Returns an Arrow table of k rows.
    """
    import pandas as pd

    cols = [c for c, _ in keys]
    ascending = [not d for _, d in keys]

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(cols, ascending=ascending, kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    survivors = ds.map_batches(prune, batch_format="pyarrow").to_pandas()
    out = survivors.sort_values(
        cols, ascending=ascending, kind="stable"
    ).head(k)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
