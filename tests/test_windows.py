"""Time-ordered / forget-window edge semantics (SURVEY.md §2.9)."""

import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages.windows import apply_time_window


def _dsets(ray_session):
    import ray.data as rd

    edges = rd.from_arrow(
        pa.table(
            {
                "src": ["a", "b", "c"],
                "dst": ["b", "c", "d"],
                "stage": ["minhash"] * 3,
                "score": [0.9, 0.8, 0.7],
            }
        )
    )
    times = rd.from_arrow(
        pa.table(
            {
                "image_id": ["a", "b", "c", "d"],
                "ts": [10.0, 5.0, 6.0, 100.0],
            }
        )
    )
    return edges, times


def test_orientation_earlier_first(ray_session):
    edges, times = _dsets(ray_session)
    out = (
        apply_time_window(edges, times, DedupConfig())
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    # (a=10, b=5) must flip to src=b
    row = out[(out.src == "b") & (out.dst == "a")]
    assert len(row) == 1 and row.ts_src.iloc[0] == 5.0
    assert (out.ts_src <= out.ts_dst).all()
    # carried columns survive
    assert set(out.columns) >= {"stage", "score"}


def test_forget_window_drops_far_pairs(ray_session):
    edges, times = _dsets(ray_session)
    out = apply_time_window(edges, times, DedupConfig(), max_age=50.0).to_pandas()
    # (c=6, d=100) gap 94 > 50 -> dropped
    assert len(out) == 2
    assert not ((out.src == "c") & (out.dst == "d")).any()
