"""Time-ordered / forget-window edge semantics.

The reference's evaluation is a chronological replay: a query report
can only match EARLIER reports
(/root/reference/ea/sim/main/data/buckets/event_state_model.py:106-121),
and `ReportTimeIssueSelector` drops candidates older than
`forget_days` (issues_selector.py:31-48). The batch analogs here are
edge predicates applied AFTER candidate generation and BEFORE
clustering:

- orientation: src = earlier endpoint ("earlier report wins" — the
  time-axis version of the min-id keep-first rule);
- forget window: drop edges whose endpoints are more than `max_age`
  apart.

Both are optional, off by default (SURVEY.md §2.9): enabling them
changes which pairs may merge, exactly like the reference's windowed
replay vs its full-history mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages.joins import join_ds


def apply_time_window(
    edges,
    times,
    cfg: DedupConfig,
    max_age: float | None = None,
):
    """edges(src, dst, ...) x times(image_id, ts) -> edges with
    ts-ordered endpoints (src = earlier; ties keep id order) and,
    when `max_age` is given, only pairs with |ts_src - ts_dst| <=
    max_age. `ts` is numeric (epoch seconds / day index — the
    reference uses day offsets, events_from_state.py:68-69).

    Two partitioned hash joins attach the endpoint timestamps; the
    predicate and reorientation are one vectorized map.
    """

    def ren(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__tid" + suffix: batch.column("image_id"),
                    "ts" + suffix: batch.column("ts"),
                }
            )

        return fn

    t_src = times.map_batches(ren("_src"), batch_format="pyarrow")
    t_dst = times.map_batches(ren("_dst"), batch_format="pyarrow")
    j = join_ds(edges, t_src, "src", "__tid_src", cfg)
    j = join_ds(j, t_dst, "dst", "__tid_dst", cfg)
    carry = [c for c in edges.schema().names if c not in ("src", "dst")]

    def orient(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src").to_pylist(), dtype=object)
        dst = np.asarray(batch.column("dst").to_pylist(), dtype=object)
        ts_s = batch.column("ts_src").to_numpy(zero_copy_only=False)
        ts_d = batch.column("ts_dst").to_numpy(zero_copy_only=False)
        if max_age is not None:
            keep = np.abs(ts_s - ts_d) <= max_age
        else:
            keep = np.ones(len(src), dtype=bool)
        # earlier endpoint first; equal timestamps keep id order
        swap = (ts_d < ts_s) & keep
        new_src = np.where(swap, dst, src)
        new_dst = np.where(swap, src, dst)
        new_ts_s = np.where(swap, ts_d, ts_s)
        new_ts_d = np.where(swap, ts_s, ts_d)
        cols = {
            "src": pa.array(new_src[keep], type=pa.string()),
            "dst": pa.array(new_dst[keep], type=pa.string()),
            "ts_src": pa.array(new_ts_s[keep]),
            "ts_dst": pa.array(new_ts_d[keep]),
        }
        kept = pa.array(keep)
        for c in carry:
            cols[c] = batch.column(c).filter(kept)
        return pa.table(cols)

    return j.map_batches(orient, batch_format="pyarrow")
