"""Declared Arrow schemas for every logical table.

The reference hand-parses two implicit JSON schemas
(ea/sim/main/data/parsers/parser_v1.py:4-35, parser_v0.py:4-21); here
every table is a declared ``pyarrow.Schema`` constant — no dynamic
inference anywhere in the pipeline.
"""

from __future__ import annotations

import pyarrow as pa

# The primary input table (BASELINE.json `input_hint`).
IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# Ground-truth side table (FIXTURES.md F2); reference analog:
# state.csv (timestamp, rid, iid) labels,
# ea/sim/main/data/buckets/events_extractors/events_from_state.py:61-73.
TRUTH_CLUSTERS = pa.schema(
    [
        ("image_id", pa.string()),
        ("cluster_id", pa.string()),
        ("dup_class", pa.string()),
    ]
)

# Per-row signatures (only these travel through shuffles — the wide
# `bytes` column is projected away before any groupby).
SIGNATURES = pa.schema(
    [
        ("image_id", pa.string()),
        ("exact_hash", pa.uint64()),
        ("image_hash", pa.uint64()),
        ("simhash", pa.uint64()),
        ("bands", pa.list_(pa.int64(), 16)),  # LSH band keys (int64 bit-cast)
        ("n_shingles", pa.int32()),
    ]
)

# Candidate / confirmed duplicate edges. src < dst canonical order
# (edge-dedup key), stage in {exact, minhash, simhash, substring}.
EDGES = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("stage", pa.string()),
        ("score", pa.float64()),
    ]
)

# Final cluster assignment; cluster_id = lexicographic min member
# image_id (the deterministic keep-first representative — batch analog
# of the reference's sorted-ids keep-first,
# ea/sim/main/data/objects/issue.py:13-22).
CLUSTERS = pa.schema(
    [
        ("image_id", pa.string()),
        ("cluster_id", pa.string()),
    ]
)

METRICS = pa.schema(
    [
        ("metric", pa.string()),
        ("value", pa.float64()),
    ]
)
