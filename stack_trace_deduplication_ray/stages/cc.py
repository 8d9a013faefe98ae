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

Three interchangeable implementations (tests assert they agree):

- ``driver_union_find``: exact vectorized union-find on the driver.
  Edges stream in via ``iter_batches`` (never ``take_all`` of row
  dicts); right choice while |edges| fits driver memory
  (cfg.driver_cc_max_edges).
- ``contracted_components``: the at-scale default — per-partition
  local union-find contracts the edge list (1-2 rounds of ~2
  exchanges each), the driver finishes the contracted graph, star
  mappings compose back. Falls back to ``label_propagation`` if
  contraction stalls above the driver gate.
- ``label_propagation``: fully shuffle-native min-label propagation —
  per round each node takes the min label among itself and its
  neighbors plus the label(label(v)) doubling shortcut; converges in
  O(log diameter) rounds of ~5 exchanges each.

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


def driver_union_find_arrays(edges) -> tuple[np.ndarray, np.ndarray]:
    """Pull edges to the driver, return (nodes, min-member labels).

    Vectorized: node ids are factorized to int codes, then min-label
    propagation with pointer jumping runs over the WHOLE edge array in
    numpy (O(E) C-speed work per round, O(log diameter) rounds) — no
    per-edge Python loop. Labels live in rank space (rank = position
    in the sorted unique-id order) so the minimum label is exactly the
    lexicographic min member id, matching the keep-first rule.

    The pull is ``to_arrow_refs()`` on the materialized edge table +
    one parallel ``ray.get`` (zero-copy plasma reads on one node) —
    NOT a streamed per-block select: the round-4 2M-row profile
    measured the streamed pull at 22.6 s on the 32-CPU leg vs 10.2 s
    at 8 CPUs (per-block task launch grows with the
    parallelism-induced block count; this path is flat in it). Extra
    columns beyond src/dst (the int8 stage code) ride along unread —
    cheaper than a select wave.
    """
    import ray as _ray

    from stack_trace_deduplication_ray.functions import hashing as H

    srcs, dsts = [], []
    for t in _ray.get(edges.materialize().to_arrow_refs()):
        if t.num_rows == 0:
            continue
        srcs.append(H.ids_np(t.column("src").combine_chunks()))
        dsts.append(H.ids_np(t.column("dst").combine_chunks()))
    if not srcs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    return _uf_min_roots(s, d)


def driver_union_find(edges) -> dict[str, str]:
    """Dict view of ``driver_union_find_arrays`` (tests / small
    graphs; hot paths use the array form — no boxed-int dict)."""
    uniques, roots = driver_union_find_arrays(edges)
    return dict(zip(uniques, roots))


def _uf_min_roots(s: np.ndarray, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized union-find core over edge endpoint arrays: returns
    (uniques, roots) where roots[i] is the minimum member id of
    uniques[i]'s component. Shared by the driver path and the
    per-partition contraction stage."""
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
    return uniques, uniques[order[labels]]


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


def _relabel_col(e, col: str, stars, cfg: DedupConfig):
    """edges with `col` mapped through stars(node -> root); endpoints
    absent from the mapping keep themselves (left-outer + coalesce)."""
    import pyarrow.compute as pc

    def ren(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__sk" + col: batch.column("node"),
                "__sr" + col: batch.column("root"),
            }
        )

    j = join_ds(
        e, stars.map_batches(ren, batch_format="pyarrow"),
        col, "__sk" + col, cfg, join_type="left_outer",
    )

    def fill(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.schema.names:
            if name == col:
                cols[name] = pc.coalesce(
                    batch.column("__sr" + col), batch.column(col)
                )
            elif name != "__sr" + col:
                cols[name] = batch.column(name)
        return pa.table(cols)

    return j.map_batches(fill, batch_format="pyarrow")


def contracted_components(edges, cfg: DedupConfig, max_rounds: int = 4):
    """Distributed CC by LOCAL CONTRACTION: each round hash-partitions
    the edge list, runs the vectorized numpy union-find INSIDE every
    partition (any edge subset yields correct partial merges), emits
    the non-identity (node -> local min root) stars, relabels both
    endpoints through them and drops the self-loops that local merging
    created. Components with most of their edges co-partitioned
    collapse immediately, so the edge list typically shrinks by the
    local clustering factor per round (dup clusters are edge-dense);
    when it fits under cfg.driver_cc_max_edges the driver union-find
    finishes the contracted graph, and the star mappings compose back
    in reverse.

    vs label_propagation (hash-to-min): that loop needs O(log
    diameter) rounds of ~5 exchanges EACH over the full label table —
    measured 39 of 59 run minutes at a 2M-row corpus whose edge count
    crossed the driver gate. Contraction does ~2 exchanges per round
    for 1-2 rounds, then finishes driver-side. label_propagation is
    kept as the fully-shuffle-native fallback (and the randomized
    equivalence test covers all three implementations).

    Returns (image_id, cluster_id) covering every node with >= 1 edge.
    """
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    def local_stars(part: pd.DataFrame) -> pd.DataFrame:
        s = part["src"].to_numpy()
        d = part["dst"].to_numpy()
        uniques, roots = _uf_min_roots(s, d)
        keep = uniques != roots
        return pd.DataFrame({"node": uniques[keep], "root": roots[keep]})

    e = edges.select_columns(["src", "dst"]).materialize()
    mappings: list = []
    n = e.count()
    for _ in range(max_rounds):
        if n <= cfg.driver_cc_max_edges:
            break
        stars = partitioned_groups(e, "src", local_stars, cfg).materialize()
        if stars.count() == 0:
            break  # no local merges found: contraction stalled
        mappings.append(stars)
        e = _relabel_col(e, "src", stars, cfg)
        e = _relabel_col(e, "dst", stars, cfg)

        def drop_self(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.invert(pc.equal(batch.column("src"), batch.column("dst")))
            )

        e = e.map_batches(drop_self, batch_format="pyarrow").materialize()
        n2 = e.count()
        logger.info("contracted_components: %d -> %d edges", n, n2)
        if n2 >= n:  # no local progress (adversarial partitioning)
            break
        n = n2

    if n > cfg.driver_cc_max_edges:
        # contraction stalled above the driver gate: finish with the
        # shuffle-native propagation loop on the (smaller) graph
        final = label_propagation(e, cfg)
    else:
        uu, rr = driver_union_find_arrays(e)
        idt = pa.int64() if uu.dtype == np.int64 else pa.string()
        import ray.data as rd

        final = rd.from_arrow(
            pa.table(
                {
                    "image_id": pa.array(uu, type=idt),
                    "cluster_id": pa.array(rr, type=idt),
                }
            )
        )

    # compose backwards: every star level's nodes take their ROOT's
    # final label (roots absent from `final` kept their own id, i.e.
    # their component never grew past the local merge)
    for stars in reversed(mappings):
        if final.count() == 0:
            # every contracted root kept its own id: the stars ARE the
            # labels at this level
            def as_labels(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "image_id": batch.column("node"),
                        "cluster_id": batch.column("root"),
                    }
                )

            final = stars.map_batches(
                as_labels, batch_format="pyarrow"
            ).materialize()
            continue

        def ren2(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__fk": batch.column("image_id"),
                    "__fl": batch.column("cluster_id"),
                }
            )

        j = join_ds(
            stars, final.map_batches(ren2, batch_format="pyarrow"),
            "root", "__fk", cfg, join_type="left_outer",
        )

        def emit(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "image_id": batch.column("node"),
                    "cluster_id": pc.coalesce(
                        batch.column("__fl"), batch.column("root")
                    ),
                }
            )

        from ray.data.aggregate import Min

        final = (
            final.union(j.map_batches(emit, batch_format="pyarrow"))
            .groupby("image_id")
            .aggregate(Min("cluster_id", alias_name="cluster_id"))
            .materialize()
        )
    return final


def assign_clusters(all_ids_ds, edges, cfg: DedupConfig):
    """ids Dataset (col image_id) + edges -> clusters Dataset
    (image_id, cluster_id); singletons label themselves."""
    n_edges = edges.count()
    if n_edges <= cfg.driver_cc_max_edges:
        uu, rr = driver_union_find_arrays(edges)
        # broadcast ONLY the non-identity assignments as two parallel
        # sorted arrays: serializes ~10x smaller and faster than a
        # dict of every touched node, and per-batch lookup is a
        # vectorized searchsorted instead of a hashtable probe per row
        mask = uu != rr
        nk, nv = uu[mask], rr[mask]
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

    # scale path: local-contraction components + left join for
    # singletons (label_propagation remains as the shuffle-native
    # fallback contraction defers to if it stalls)
    comp = contracted_components(edges, cfg)

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
