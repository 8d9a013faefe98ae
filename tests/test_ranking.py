"""Grid self-join ranker tests: the C>1 cross-chunk path must equal
the single-task brute force, including under a dominant source."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmpdir: str, n: int, seed: int = 7) -> str:
    """Tiny documents table with an 80%-dominant source."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 10)))
        for _ in range(n)
    ]
    sources = ["big" if i < int(n * 0.8) else f"s{i % 3}" for i in range(n)]
    ids = np.arange(n, dtype=np.int64) * 7 + 3
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(texts),
                "source": pa.array(sources),
            }
        ),
        os.path.join(tmpdir, "documents.parquet"),
    )
    return tmpdir


def _brute_topk(sf_dir: str, k: int) -> pd.DataFrame:
    """Driver-side reference: same-source pairs sharing >= 1 token,
    Lerch-scored, top-k per src by (score desc, dst asc)."""
    from stack_trace_deduplication_ray.functions import scoring as S
    from stack_trace_deduplication_ray.pipelines.ranking import _df_fit

    n_docs, (keys, dfs) = _df_fit(sf_dir)
    idf_of = {int(t): 1.0 + np.log(n_docs / (d + 1.0)) for t, d in zip(keys, dfs)}
    df = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    rows = []
    for _, g in df.groupby("source"):
        ids = g["doc_id"].to_numpy()
        sets = S.token_hash_sets(list(g["text"]))
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                if len(np.intersect1d(sets[a], sets[b], assume_unique=True)):
                    s, d = sorted((int(ids[a]), int(ids[b])))
                    ia, ib = (a, b)
                    rows.append(
                        (s, d, round(S.lerch_score(sets[ia], sets[ib], idf_of), 4))
                    )
    out = pd.DataFrame(rows, columns=["src", "dst", "score"])
    out = out.sort_values(
        ["src", "score", "dst"], ascending=[True, False, True], kind="stable"
    )
    return (
        out.groupby("src", sort=False)
        .head(k)
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
        .astype({"src": "int64", "dst": "int64"})
    )


def test_grid_ranker_equals_brute_force_under_skew(ray_session, tmp_path):
    """chunk_target=20 forces C>1 on the dominant source (cross-chunk
    cells active); results must equal the single-task brute force."""
    from stack_trace_deduplication_ray.pipelines.ranking import (
        _ranked_pairs_query,
    )
    from stack_trace_deduplication_ray.functions import scoring as S

    sf = _write_docs(str(tmp_path / "sf"), n=120)

    def builder(n_docs, fit):
        keys, dfs = fit
        idf_of = {
            int(t): 1.0 + np.log(n_docs / (d + 1.0))
            for t, d in zip(keys, dfs)
        }

        def score_pairs(ta, tb):
            sa = S.token_hash_sets(list(ta))
            sb = S.token_hash_sets(list(tb))
            return np.fromiter(
                (S.lerch_score(a, b, idf_of) for a, b in zip(sa, sb)),
                dtype=np.float64, count=len(sa),
            )

        return score_pairs

    k = 5
    res = _ranked_pairs_query(sf, builder, k, chunk_target=20, max_grid=8)
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res)
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    got = got.sort_values(["src", "dst"]).reset_index(drop=True)
    exp = _brute_topk(sf, k)
    # the dominant source must actually exercise the C>1 grid
    n_big = int(0.8 * 120)
    assert int(np.ceil(n_big / 20)) > 1
    pd.testing.assert_frame_equal(
        got[["src", "dst", "score"]], exp, check_dtype=False
    )


def test_grid_c1_matches_c_many(ray_session, tmp_path):
    """The same corpus partitioned with C=1 (single cell per source)
    and C>1 (grid) must produce identical ranked output."""
    from stack_trace_deduplication_ray.pipelines.ranking import (
        _ranked_pairs_query,
    )

    sf = _write_docs(str(tmp_path / "sf2"), n=90, seed=11)

    def builder(n_docs, fit):
        def score_pairs(ta, tb):
            # deterministic cheap scorer: shared-token count
            from stack_trace_deduplication_ray.functions import scoring as S

            sa = S.token_hash_sets(list(ta))
            sb = S.token_hash_sets(list(tb))
            return np.fromiter(
                (
                    float(len(np.intersect1d(a, b, assume_unique=True)))
                    for a, b in zip(sa, sb)
                ),
                dtype=np.float64, count=len(sa),
            )

        return score_pairs

    def run(chunk_target):
        res = _ranked_pairs_query(sf, builder, 4, chunk_target=chunk_target)
        out = res.to_pandas() if hasattr(res, "to_pandas") else res
        if isinstance(out, pa.Table):
            out = out.to_pandas()
        return out.sort_values(["src", "dst"]).reset_index(drop=True)

    a = run(10_000)   # C=1 everywhere
    b = run(15)       # dominant source splits into several chunks
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
