"""Connected components: confirmed edges -> cluster assignment.

The reference partitions stacks into mutable ``Issue`` objects and
merges issues transitively through a hand-rolled replacement-chain
resolution (path compression over ``duplicates[iid1]=iid2`` loops,
/root/reference/ea/sim/dev/scripts/data/preprocess/so/steps/
merge_issues_duplicates.py:28-67). Here the same semantics — every
report reachable through dup edges lands in one cluster whose
representative is the *first* member (reference keep-first:
sorted-ids-min, ea/sim/main/data/objects/issue.py:13-22) — are
computed as connected components with cluster_id = lexicographic min
image_id.

Two interchangeable implementations (tests assert they agree):

- ``driver_union_find``: exact path-compressed union-find on the
  driver. Edges stream in via ``iter_batches`` (never ``take_all`` of
  row dicts); right choice while |edges| fits driver memory
  (cfg.driver_cc_max_edges).
- ``label_propagation``: distributed min-label propagation — per
  round, each node takes the min label among itself and its
  neighbors (groupby-aggregate-min + hash joins); converges in
  O(log diameter) rounds. The at-scale path.

Final assignment: every input id absent from the edge set is its own
singleton cluster (left join + fill-own-id).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages.joins import join_ds, resolve_partitions

logger = logging.getLogger(__name__)


def driver_union_find(edges) -> dict[str, str]:
    """Stream edges to the driver, return {node: min-member label}.

    Vectorized: node ids are factorized to int codes, then min-label
    propagation with pointer jumping runs over the WHOLE edge array in
    numpy (O(E) C-speed work per round, O(log diameter) rounds) — no
    per-edge Python loop. Labels live in rank space (rank = position
    in the sorted unique-id order) so the minimum label is exactly the
    lexicographic min member id, matching the keep-first rule.
    """
    from stack_trace_deduplication_ray.functions import hashing as H

    srcs, dsts = [], []
    for batch in edges.select_columns(["src", "dst"]).iter_batches(
        batch_size=262144, batch_format="pyarrow"
    ):
        srcs.append(H.ids_np(batch.column("src").combine_chunks()))
        dsts.append(H.ids_np(batch.column("dst").combine_chunks()))
    if not srcs:
        return {}
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    codes, uniques = pd.factorize(np.concatenate([s, d]))
    # keep the native dtype: int64 ids stay int64 (fast argsort /
    # comparisons); string ids stay an object array
    uniques = np.asarray(uniques)
    e_s = codes[: len(s)]
    e_d = codes[len(s):]
    n = len(uniques)
    order = np.argsort(uniques)  # order[r] = code of the rank-r id
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    labels = rank.copy()
    while True:
        prev = labels.copy()
        m = np.minimum(labels[e_s], labels[e_d])
        np.minimum.at(labels, e_s, m)
        np.minimum.at(labels, e_d, m)
        labels = np.minimum(labels, labels[order[labels]])  # pointer jump
        if np.array_equal(labels, prev):
            break
    roots = uniques[order[labels]]
    return dict(zip(uniques, roots))


def _labels_checksum(labels) -> int:
    """Order-independent fingerprint of the (node, label) assignment:
    sum of mixed 64-bit hashes. One cheap map + global sum — no
    shuffle — used for fixpoint detection instead of a compare join."""
    from stack_trace_deduplication_ray.functions import hashing as H

    def h(batch: pa.Table) -> pa.Table:
        a = H.hash_ids(H.ids_np(batch.column("node").combine_chunks()), seed=11)
        b = H.hash_ids(H.ids_np(batch.column("label").combine_chunks()), seed=12)
        with np.errstate(over="ignore"):
            v = H.splitmix64(a ^ b).view(np.int64)
        return pa.table({"h": pa.array(v)})

    s = labels.map_batches(h, batch_format="pyarrow").sum("h")
    return int(s) if s is not None else 0


def label_propagation(edges, cfg: DedupConfig, max_rounds: int = 50):
    """Distributed hash-to-min connected components.

    Per round each node's label becomes
        min(label(v), min_u~v label(u), label(label(v)))
    — the third term is the pointer-doubling shortcut that makes the
    round count O(log diameter) instead of O(diameter) (chains would
    otherwise propagate one hop per round). Each round costs two
    partitioned hash joins + one groupby-min; convergence is detected
    by an order-independent label checksum (no compare join).

    Returns a Dataset (image_id, cluster_id) covering nodes with >= 1
    edge.
    """
    from ray.data.aggregate import Min

    # bidirectional edge list built once: (node, nbr)
    def bidir(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        dst = batch.column("dst")
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [src.combine_chunks(), dst.combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [dst.combine_chunks(), src.combine_chunks()]
                ),
            }
        )

    e = (
        edges.select_columns(["src", "dst"])
        .map_batches(bidir, batch_format="pyarrow")
        .materialize()
    )

    # initial labels: min(node, min neighbor)
    def init_labels(batch: pa.Table) -> pa.Table:
        from stack_trace_deduplication_ray.functions import hashing as H

        idt = batch.schema.field("node").type
        node = H.ids_np(batch.column("node").combine_chunks())
        nbr = H.ids_np(batch.column("nbr").combine_chunks())
        return pa.table(
            {
                "node": pa.array(node, type=idt),
                "label": pa.array(np.minimum(node, nbr), type=idt),
            }
        )

    labels = (
        e.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = _labels_checksum(labels)

    for rnd in range(max_rounds):
        # neighbor messages: one join on the bidirectional edge list
        j = join_ds(e, labels, "node", "node", cfg)

        def msg(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("nbr"), "label": batch.column("label")}
            )

        m_nbr = j.map_batches(msg, batch_format="pyarrow")

        # pointer doubling: label(label(v))
        def as_lookup(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lkey": batch.column("node"),
                    "label2": batch.column("label"),
                }
            )

        lookup = labels.map_batches(as_lookup, batch_format="pyarrow")
        jd = join_ds(labels, lookup, "label", "lkey", cfg)

        def dbl(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("node"), "label": batch.column("label2")}
            )

        m_dbl = jd.map_batches(dbl, batch_format="pyarrow")

        labels = (
            labels.union(m_nbr)
            .union(m_dbl)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            # coalesce: without this the block count multiplies each
            # round and per-round wall time grows superlinearly
            .repartition(resolve_partitions(cfg))
            .materialize()
        )
        cur = _labels_checksum(labels)
        logger.info("label_propagation round %d checksum %d", rnd, cur)
        if cur == prev_sum:
            break
        prev_sum = cur

    def to_clusters(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch.column("node"),
                "cluster_id": batch.column("label"),
            }
        )

    return labels.map_batches(to_clusters, batch_format="pyarrow")


def assign_clusters(all_ids_ds, edges, cfg: DedupConfig):
    """ids Dataset (col image_id) + edges -> clusters Dataset
    (image_id, cluster_id); singletons label themselves."""
    n_edges = edges.count()
    if n_edges <= cfg.driver_cc_max_edges:
        labels = driver_union_find(edges)
        # broadcast ONLY the non-identity assignments as two parallel
        # sorted arrays: serializes ~10x smaller and faster than a
        # dict of every touched node, and per-batch lookup is a
        # vectorized searchsorted instead of a hashtable probe per row
        nonself = [(k, v) for k, v in labels.items() if k != v]
        is_int = bool(nonself) and isinstance(
            nonself[0][0], (int, np.integer)
        )
        kdt = np.int64 if is_int else object
        nk = np.asarray([k for k, _ in nonself], dtype=kdt)
        nv = np.asarray([v for _, v in nonself], dtype=kdt)
        order = np.argsort(nk)
        ref = ray.put((nk[order], nv[order]))

        def apply(batch: pa.Table) -> pa.Table:
            from stack_trace_deduplication_ray.functions import hashing as H

            keys, roots = ray.get(ref)
            idt = batch.schema.field("image_id").type
            ids = H.ids_np(batch.column("image_id").combine_chunks())
            out = ids.copy()
            if len(keys):
                pos = np.searchsorted(keys, ids)
                pos_c = np.minimum(pos, len(keys) - 1)
                hit = keys[pos_c] == ids
                out[hit] = roots[pos_c[hit]]
            return pa.table(
                {
                    "image_id": batch.column("image_id"),
                    "cluster_id": pa.array(out, type=idt),
                }
            )

        return all_ids_ds.select_columns(["image_id"]).map_batches(
            apply, batch_format="pyarrow"
        )

    # scale path: distributed propagation + left join for singletons
    comp = label_propagation(edges, cfg)

    def rn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"iid_r": batch.column("image_id"), "label": batch.column("cluster_id")}
        )

    joined = join_ds(
        all_ids_ds.select_columns(["image_id"]),
        comp.map_batches(rn, batch_format="pyarrow"),
        "image_id", "iid_r", cfg, join_type="left_outer",
    )

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized singleton fill: null label -> own id
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "cluster_id": pc.coalesce(
                    batch.column("label"), batch.column("image_id")
                ),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")
