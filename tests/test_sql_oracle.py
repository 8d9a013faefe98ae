"""Sub-stage validation of the machine-generated DuckDB oracle SQL
(eval/sql_oracle.py) against the numpy kernels it re-derives: byte
extraction + k-gram polynomial hashes, MinHash signatures -> LSH band
keys, winnowed fingerprints, and the SRP-LSH bucket assignment. The
end-to-end statements are covered by tests/test_oracle_parity.py;
these pin the individual hash constructions so a regression points at
the exact stage.

No Ray needed: DuckDB + numpy only (fast)."""

from __future__ import annotations

import unicodedata

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from stack_trace_deduplication_ray.eval import sql_oracle as O
from stack_trace_deduplication_ray.functions import hashing as H

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", t)
    norm = [
        " ".join(unicodedata.normalize("NFC", c).split())
        for c in t.column("text").to_pylist()
    ]
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    rep_of: dict = {}
    for i, s in zip(ids, norm):
        if s not in rep_of or i < rep_of[s]:
            rep_of[s] = int(i)
    uniq = sorted(rep_of, key=lambda s: rep_of[s])
    reps = np.array([rep_of[s] for s in uniq], dtype=np.int64)
    return con, uniq, reps


def _probe(con, prefix: str, tail: str):
    return con.sql("WITH RECURSIVE " + prefix + tail).fetchall()


def test_gram_hashes_match_window_hashes(docs):
    con, uniq, reps = docs
    rows = _probe(
        con,
        O._BASE_CTES + O._gram_chain("g5", 5),
        "fin AS (SELECT 1)\nSELECT rep, pos, g FROM g5 ORDER BY rep, pos",
    )
    got: dict = {}
    for r, p, g in rows:
        got.setdefault(int(r), []).append((int(p), int(g)))
    for s, rep in zip(uniq, reps):
        flat = np.frombuffer(s.encode(), dtype=np.uint8)
        wh = H.window_hashes(flat, 5)
        exp = [(i + 1, int(x)) for i, x in enumerate(wh)]
        assert got.get(int(rep), []) == exp


def test_band_keys_match(docs):
    con, uniq, reps = docs
    from stack_trace_deduplication_ray.pipelines.text import TEXT_DEDUP_CONFIG

    cfg = TEXT_DEDUP_CONFIG
    rows = _probe(
        con,
        O._BASE_CTES + O._gram_chain("g5", cfg.shingle_k)
        + O._perm_values(cfg) + O._SIG_CTES + O._band_chain(cfg),
        "fin AS (SELECT 1)\nSELECT rep, band, bk FROM bandkeys",
    )
    a, b = H.minhash_params(cfg.num_perm, cfg.minhash_seed)
    sh, offs = H.shingle_hashes(uniq, cfg.shingle_k)
    sig = H.minhash_signatures(sh, offs, a, b)
    bands = H.band_keys(sig, cfg.bands, cfg.rows_per_band)
    exp = {
        (int(rep), bd): int(bands[i, bd])
        for i, rep in enumerate(reps)
        for bd in range(cfg.bands)
    }
    assert len(rows) == len(exp)
    for r, bd, bk in rows:
        assert exp[(int(r), int(bd))] == int(bk)


def test_winnow_fingerprints_match(docs):
    con, uniq, reps = docs
    from stack_trace_deduplication_ray.pipelines.text import TEXT_DEDUP_CONFIG
    from stack_trace_deduplication_ray.stages.expand import winnow_fingerprints

    cfg = TEXT_DEDUP_CONFIG
    rows = _probe(
        con,
        O._BASE_CTES + O._gram_chain("g32", cfg.substring_min_len)
        + O._winnow_ctes(cfg),
        "fin AS (SELECT 1)\nSELECT rep, fp FROM fps",
    )
    fp, fo = winnow_fingerprints(uniq, cfg.substring_min_len, cfg.winnow_window)
    exp = sorted(
        (int(rep), int(v))
        for i, rep in enumerate(reps)
        for v in fp[fo[i] : fo[i + 1]]
    )
    assert sorted((int(r), int(v)) for r, v in rows) == exp


def test_srp_buckets_match_hyperplane_lsh():
    from stack_trace_deduplication_ray.pipelines.similarity import (
        LSH_QUANT_BITS,
        HyperplaneLSH,
        _emb_matrix,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    con = duckdb.connect()
    con.register("embeddings", t)
    rows = con.sql(
        "WITH RECURSIVE " + O._srp_bucket_ctes()
        + "fin AS (SELECT 1)\nSELECT vec_id, bucket FROM buckets"
    ).fetchall()
    got = set((int(v), int(b)) for v, b in rows)

    ids, mat = _emb_matrix(t)
    n = len(ids)
    n_bits = max(4, int(np.ceil(np.log2(max(2, n / 64)))))
    lsh = HyperplaneLSH(mat.shape[1], n_bits=n_bits, n_tables=16)
    out = lsh(t)
    exp = set(
        zip(
            (int(x) for x in out.column("vec_id").to_pylist()),
            (int(x) for x in out.column("bucket").to_pylist()),
        )
    )
    assert got == exp
    assert LSH_QUANT_BITS == 20  # the SQL hardcodes the same scale
