"""Partitioned hash join built from groupby + per-partition pandas merge.

Ray 2.49's native ``Dataset.join`` crashes when any hash partition
receives zero rows from one side (the aggregator builds a schema-less
empty table and Arrow's join then fails with "No match ... for key
field reference"), which any small-or-skewed input triggers. This
module implements the same partitioned hash-join shape explicitly:

    1. tag every row of both sides with ``__p = hash(key) % P``
       (one cheap map each, common unified schema),
    2. ``union`` + ``groupby(__p)`` — ONE sort shuffle moving each row
       once, exactly like a hash-join exchange,
    3. per-partition vectorized ``pandas.merge`` inside ``map_groups``
       (P tasks, each merging ~N/P rows in C).

Semantics: inner / left-outer equi-join; the right side's columns get
no prefixing — callers pre-rename collisions (asserted). This join
backs the verify feature-attachment and the connected-components label
joins; ``num_partitions`` bounds per-task memory and is the knob to
raise on a real cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import hashing as H

_SIDE_L = np.int8(0)
_SIDE_R = np.int8(1)


def resolve_actors(cfg: DedupConfig) -> int:
    """cfg.actor_concurrency, or (cluster CPUs - 2) when left at 0."""
    if cfg.actor_concurrency:
        return cfg.actor_concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus - 2)


def resolve_partitions(cfg: DedupConfig) -> int:
    """cfg.num_partitions, or 2x cluster CPUs when left at 0 (measured
    faster than 1x at 32 CPUs — smaller per-task merges stay cache-
    resident; the classic 2-4 tasks/core rule)."""
    if cfg.num_partitions:
        return cfg.num_partitions
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(16, 2 * cpus)


def _key_partition(keys: np.ndarray, P: int) -> np.ndarray:
    """Partition assignment for an id array (int64 fast path: pure
    numpy splitmix64, no Python objects in the exchange)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int32)
    h = H.hash_ids(keys, seed=0xBEEF)
    return (h % np.uint64(P)).astype(np.int32)


def join_ds(
    left,
    right,
    on: str,
    right_on: str,
    cfg: DedupConfig,
    join_type: str = "inner",
    right_suffix: str = "",  # unused; kept for call-site symmetry
    dedup_left: list[str] | None = None,
):
    """Equi-join `left` with `right` (right side keyed by `right_on`).

    Output: left columns + right columns (minus `right_on`).
    `join_type`: "inner" or "left_outer".

    `dedup_left`: drop duplicate left rows by these columns inside each
    partition before merging. Because rows are hash-partitioned on the
    join key, this is a GLOBAL dedup whenever the key is one of the
    dedup columns — used to fold candidate-pair dedup into the verify
    feature join (saves one full shuffle per stage).
    """
    assert join_type in ("inner", "left_outer"), join_type
    P = resolve_partitions(cfg)
    lsch = left.schema()
    rsch = right.schema()
    lcols = list(lsch.names)
    rcols = [n for n in rsch.names if n != right_on]
    overlap = set(lcols) & set(rcols)
    assert not overlap, f"join column collision: {overlap} (pre-rename the right side)"
    l_types = dict(zip(lsch.names, lsch.types))
    r_types = dict(zip(rsch.names, rsch.types))
    # int64 join keys stay int64 end-to-end (8-byte exchange keys, no
    # Python-object round-trip); anything else is carried as string
    key_is_int = pa.types.is_integer(l_types[on])
    key_type = pa.int64() if key_is_int else pa.string()

    def tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keys = H.ids_np(batch.column(on).combine_chunks())
        cols = {
            "__p": pa.array(_key_partition(keys, P)),
            "__side": pa.array(np.full(n, _SIDE_L)),
            "__key": batch.column(on).cast(key_type),
        }
        for c in lcols:
            cols[c] = batch.column(c)
        for c in rcols:
            cols[c] = pa.nulls(n, r_types[c])
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keys = H.ids_np(batch.column(right_on).combine_chunks())
        cols = {
            "__p": pa.array(_key_partition(keys, P)),
            "__side": pa.array(np.full(n, _SIDE_R)),
            "__key": batch.column(right_on).cast(key_type),
        }
        for c in lcols:
            cols[c] = pa.nulls(n, l_types[c])
        for c in rcols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    unified = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    # coalesce before the sort exchange: the union carries one block
    # per upstream map task (100s of tiny blocks at high CPU counts)
    # and the sort-based groupby schedules per-block map + per-block
    # reduce tasks — measured 20 s of orchestration for ~3 s of actual
    # exchange work at 500k rows / 32 CPUs (650 s total without it).
    # Size-gated (config.coalesce_for_rows): at fixture scale the
    # extra barrier per exchange costs more than it saves.
    if cfg.coalesce_exchanges:
        unified = unified.repartition(P)

    out_schema = pa.schema(
        [(c, l_types[c]) for c in lcols] + [(c, r_types[c]) for c in rcols]
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lmask = side == _SIDE_L
        if not lmask.any():
            return out_schema.empty_table()
        lt = group.filter(pa.array(lmask))
        if dedup_left:
            # first-occurrence mask via a composite 64-bit hash of the
            # dedup key columns — pure numpy (the pandas object-dtype
            # duplicated() this replaces dominated the verify joins).
            # A collision between two DISTINCT keys (~1e-19 per pair)
            # drops one real candidate pair before verification — a
            # potentially missed duplicate, accepted at those odds.
            key = np.zeros(len(lt), dtype=np.uint64)
            for ci, c in enumerate(dedup_left):
                h = H.hash_ids(
                    H.ids_np(lt.column(c).combine_chunks()), seed=0xD0D0 + ci
                )
                key ^= (h << np.uint64(ci)) | (h >> np.uint64(64 - ci)) if ci else h
            _, first_idx = np.unique(key, return_index=True)
            if len(first_idx) < len(lt):
                keep = np.zeros(len(lt), dtype=bool)
                keep[first_idx] = True
                lt = lt.filter(pa.array(keep))
        rmask = ~lmask
        if not rmask.any():
            if join_type == "inner":
                return out_schema.empty_table()
            cols = {c: lt.column(c) for c in lcols}
            for c in rcols:
                cols[c] = pa.nulls(len(lt), r_types[c])
            return pa.table(cols).cast(out_schema)
        rt = group.filter(pa.array(rmask))
        lkeys = H.ids_np(lt.column("__key").combine_chunks())
        rkeys = H.ids_np(rt.column("__key").combine_chunks())
        order = np.argsort(rkeys)
        rsorted = rkeys[order]
        if len(rsorted) > 1 and (rsorted[1:] == rsorted[:-1]).any():
            # duplicate right keys: fall back to a general pandas merge
            ldf = lt.select(["__key", *lcols]).to_pandas()
            rdf = rt.select(["__key", *rcols]).to_pandas()
            how = "inner" if join_type == "inner" else "left"
            m = ldf.merge(rdf, on="__key", how=how)
            return pa.Table.from_pandas(
                m[lcols + rcols], schema=out_schema, preserve_index=False
            )
        # unique-right fast path (every current caller joins a table
        # keyed uniquely): index match via searchsorted, data movement
        # via Arrow take — payload columns (e.g. thumbnails, signature
        # lists) NEVER round-trip through per-row pandas objects.
        pos = np.searchsorted(rsorted, lkeys)
        pos_c = np.minimum(pos, max(len(rsorted) - 1, 0))
        hit = rsorted[pos_c] == lkeys
        if join_type == "inner":
            if not hit.any():
                return out_schema.empty_table()
            lt2 = lt.filter(pa.array(hit))
            ridx = order[pos_c[hit]]
            rsel = rt.take(pa.array(ridx, type=pa.int64()))
            cols = {c: lt2.column(c) for c in lcols}
            for c in rcols:
                cols[c] = rsel.column(c)
            return pa.table(cols).cast(out_schema)
        ridx = order[pos_c].astype(np.int64)
        idx = pa.array(ridx, type=pa.int64(), mask=~hit)  # null = miss
        rsel = rt.take(idx)
        cols = {c: lt.column(c) for c in lcols}
        for c in rcols:
            cols[c] = rsel.column(c)
        return pa.table(cols).cast(out_schema)

    return unified.groupby("__p").map_groups(merge, batch_format="pyarrow")


def should_broadcast(cfg: DedupConfig, right_rows: int | None, max_rows: int | None = None) -> bool:
    """Gate for `broadcast_attach`: the caller supplies the right
    side's row count when it is KNOWN cheaply (parquet metadata on the
    base read, or a materialized table's count()); `None` means
    unknown -> never broadcast (counting a lazy lineage would cost an
    extra execution, defeating the point)."""
    if right_rows is None:
        return False
    return right_rows <= (max_rows if max_rows is not None else cfg.broadcast_join_max_rows)


def broadcast_attach(
    left,
    right,
    on: str,
    right_on: str,
    cfg: DedupConfig,
    join_type: str = "inner",
    right_rows: int | None = None,
    max_rows: int | None = None,
    dedup_left: list[str] | None = None,
    force: bool = False,
):
    """Size-gated broadcast equi-join: same output contract as
    `join_ds` (left columns + right columns minus `right_on`), but the
    small right side is pulled once, sorted by key, `ray.put` into the
    object store, and every left batch attaches via vectorized
    searchsorted + Arrow take — ZERO exchanges, no union, no sort.

    This is the 100-TB "broadcast small sides" pattern: a lookup table
    of up to ~1M narrow rows costs one shared object-store entry read
    zero-copy by every task, where the partitioned join would move the
    (often much larger) left side through an all-to-all. Above the
    gate (`should_broadcast`) it falls back to `join_ds` unchanged.

    `dedup_left` applies only on the fallback path (a broadcast map
    cannot dedup globally); callers must only pass it when the left
    side is structurally duplicate-free under broadcast.
    """
    assert join_type in ("inner", "left_outer"), join_type
    if not force and not should_broadcast(cfg, right_rows, max_rows):
        return join_ds(
            left, right, on, right_on, cfg,
            join_type=join_type, dedup_left=dedup_left,
        )
    import ray

    rbatches = list(right.iter_batches(batch_size=None, batch_format="pyarrow"))
    if rbatches:
        rt = pa.concat_tables(rbatches, promote_options="default").combine_chunks()
    else:
        rsch = right.schema()
        rt = pa.schema(list(zip(rsch.names, rsch.types))).empty_table()
    rcols = [n for n in rt.schema.names if n != right_on]
    lcols = list(left.schema().names)
    overlap = set(lcols) & set(rcols)
    assert not overlap, f"join column collision: {overlap} (pre-rename the right side)"
    r_types = {n: rt.schema.field(n).type for n in rcols}
    rkeys = H.ids_np(rt.column(right_on).combine_chunks())
    order = np.argsort(rkeys, kind="stable")
    rsorted = rkeys[order]
    unique_right = len(rsorted) < 2 or not (rsorted[1:] == rsorted[:-1]).any()
    rdata = rt.select(rcols).take(pa.array(order, type=pa.int64()))
    if not unique_right:
        # duplicate right keys: per-batch pandas merge against the
        # broadcast frame (still zero exchanges)
        lsch = left.schema()
        out_schema = pa.schema(
            list(zip(lsch.names, lsch.types))
            + [(c, r_types[c]) for c in rcols]
        )
        rdf = rdata.to_pandas()
        rdf["__key"] = rsorted
        ref = ray.put(rdf)

        def attach_dup(batch: pa.Table) -> pa.Table:
            import pandas as pd  # noqa: F401

            r = ray.get(ref)
            ldf = batch.to_pandas()
            ldf["__key"] = H.ids_np(batch.column(on).combine_chunks())
            how = "inner" if join_type == "inner" else "left"
            m = ldf.merge(r, on="__key", how=how)
            # explicit schema: a left_outer miss otherwise degrades
            # int64 right columns to float64 via pandas NaN
            return pa.Table.from_pandas(
                m[lcols + rcols], schema=out_schema, preserve_index=False
            )

        return left.map_batches(attach_dup, batch_format="pyarrow")

    ref = ray.put((rsorted, rdata))

    def attach(batch: pa.Table) -> pa.Table:
        keys_arr, rd = ray.get(ref)
        lkeys = H.ids_np(batch.column(on).combine_chunks())
        pos = np.searchsorted(keys_arr, lkeys)
        pos_c = np.minimum(pos, max(len(keys_arr) - 1, 0))
        hit = (keys_arr[pos_c] == lkeys) if len(keys_arr) else np.zeros(len(lkeys), bool)
        if join_type == "inner":
            if not hit.any():
                cols = {c: batch.column(c).slice(0, 0) for c in lcols}
                for c in rcols:
                    cols[c] = pa.nulls(0, r_types[c])
                return pa.table(cols)
            lt = batch.filter(pa.array(hit))
            rsel = rd.take(pa.array(pos_c[hit], type=pa.int64()))
            cols = {c: lt.column(c) for c in lcols}
            for c in rcols:
                cols[c] = rsel.column(c)
            return pa.table(cols)
        idx = pa.array(pos_c.astype(np.int64), type=pa.int64(), mask=~hit)
        rsel = rd.take(idx)
        cols = {c: batch.column(c) for c in lcols}
        for c in rcols:
            cols[c] = rsel.column(c)
        return pa.table(cols)

    return left.map_batches(attach, batch_format="pyarrow")


def partitioned_groups(ds, key_col: str, partition_fn, cfg: DedupConfig):
    """Group-wise processing at PARTITION granularity.

    ``groupby(key).map_groups(fn)`` pays a Python call per group —
    ruinous for tens of thousands of tiny buckets. This helper hash-
    partitions rows on `key_col` (one shuffle, same movement as the
    groupby) and hands each partition's rows to `partition_fn` as ONE
    pandas DataFrame (sorted by `key_col`); the function iterates its
    groups in-process. P calls total instead of |groups|.
    """
    import pandas as pd

    P = resolve_partitions(cfg)

    def tag(batch: pa.Table) -> pa.Table:
        keys = H.ids_np(batch.column(key_col).combine_chunks())
        return batch.append_column("__p", pa.array(_key_partition(keys, P)))

    def run(part: pd.DataFrame):
        part = part.drop(columns="__p").sort_values(key_col, kind="stable")
        out = partition_fn(part)
        if isinstance(out, pa.Table):
            return out
        # hand Arrow back to Ray: pandas-built blocks surface numpy
        # dtypes in Dataset.schema(), which downstream joins can't use;
        # empty object columns must not degrade to null type
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        if len(tbl) == 0:
            cols = []
            for f in tbl.schema:
                t = pa.string() if pa.types.is_null(f.type) else f.type
                cols.append(pa.array([], type=t))
                tbl = pa.table(dict(zip(tbl.schema.names, cols)))
        return tbl

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    # coalesce: upstream unions can carry hundreds of tiny blocks and
    # the sort pays a fixed cost per block (size-gated, see join_ds)
    if cfg.coalesce_exchanges:
        tagged = tagged.repartition(P)
    return tagged.groupby("__p").map_groups(run, batch_format="pandas")


def partitioned_groups_arrow(ds, key_col: str, partition_fn, cfg: DedupConfig):
    """Arrow-native sibling of partitioned_groups: the partition fn
    receives a pyarrow.Table sorted by `key_col`. Use when the rows
    carry list-typed columns that must not round-trip through pandas
    (e.g. MinHash signature lists)."""
    P = resolve_partitions(cfg)

    def tag(batch: pa.Table) -> pa.Table:
        keys = H.ids_np(batch.column(key_col).combine_chunks())
        return batch.append_column("__p", pa.array(_key_partition(keys, P)))

    def run(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["__p"]).sort_by(key_col)
        return partition_fn(part)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if cfg.coalesce_exchanges:
        tagged = tagged.repartition(P)
    return tagged.groupby("__p").map_groups(run, batch_format="pyarrow")
