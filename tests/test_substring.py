"""Suffix-array + winnowing repeated-substring operators."""

import numpy as np
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages.expand import winnow_fingerprints
from stack_trace_deduplication_ray.stages.substring import (
    _suffix_edges_for_texts,
    build_suffix_array,
    suffix_array_substring_edges,
)


def test_build_suffix_array_matches_sorted_suffixes():
    s = "banana$"
    data = np.frombuffer(s.encode(), dtype=np.uint8)
    sa = build_suffix_array(data)
    suffixes = sorted(range(len(s)), key=lambda i: s[i:])
    assert sa.tolist() == suffixes


def test_build_suffix_array_random():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4, 200).astype(np.int32)
    sa = build_suffix_array(data)
    as_str = "".join(map(str, data.tolist()))
    assert sa.tolist() == sorted(range(len(data)), key=lambda i: as_str[i:])


def test_suffix_edges_finds_long_shared_run():
    shared = "the quick brown fox jumps over the lazy dog repeatedly"
    ids = np.array(["a", "b", "c"], dtype=object)
    texts = [
        "prefix one " + shared,
        shared + " suffix two",
        "completely unrelated text with nothing in common at all",
    ]
    src, dst = _suffix_edges_for_texts(ids, texts, L=32)
    assert set(zip(src, dst)) == {("a", "b")}


def test_suffix_edges_no_cross_sentinel_match():
    # two docs whose concatenation would fake a long run across the
    # boundary must NOT match
    ids = np.array(["a", "b"], dtype=object)
    texts = ["x" * 20, "x" * 20]
    src, dst = _suffix_edges_for_texts(ids, texts, L=32)
    assert len(src) == 0  # each doc only has 20 x's, below L


def test_suffix_edges_exact_L_threshold():
    ids = np.array(["a", "b"], dtype=object)
    run = "z" * 32
    src, dst = _suffix_edges_for_texts(ids, [run + "1", "2" + run], L=32)
    assert set(zip(src, dst)) == {("a", "b")}
    src, dst = _suffix_edges_for_texts(ids, ["z" * 31 + "1", "2" + "z" * 31], L=32)
    assert len(src) == 0


def test_suffix_array_stage_on_dataset(ray_session):
    import ray.data as rd

    shared = "a shared caption fragment that is long enough for the pass"
    sigs = rd.from_arrow(
        pa.table(
            {
                "image_id": ["d1", "d2", "d3"],
                "caption_norm": [
                    "AA " + shared,
                    shared + " BB",
                    "nothing in common here whatsoever with the others!",
                ],
            }
        )
    )
    cfg = DedupConfig()
    out = suffix_array_substring_edges(sigs, cfg).to_pandas()
    assert set(zip(out.src, out.dst)) == {("d1", "d2")}
    assert set(out.stage) == {"suffix_array"}


def test_winnowing_guarantee():
    """Strings sharing >= L + w - 1 chars share >= 1 fingerprint."""
    L, w = 32, 8
    shared = "s" * (L + w - 1)
    fp, offs = winnow_fingerprints(["abc" + shared, shared + "xyz"], L, w)
    s1 = set(fp[offs[0]: offs[1]].tolist())
    s2 = set(fp[offs[1]: offs[2]].tolist())
    assert s1 & s2
