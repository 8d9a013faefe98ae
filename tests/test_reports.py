"""Raw V1/V0 report ingestion (S3/S4 sources) + method-name unifier."""

import pytest

from stack_trace_deduplication_ray.sources.reports import (
    parse_report,
    read_reports,
    reports_as_documents,
    unify_method_name,
    write_reports_fixture,
    REPORTS_SCHEMA,
)


def test_unify_method_name():
    assert unify_method_name("App.lambda$run$17") == "App.lambda$run$0"
    assert unify_method_name("App.lambda$run$0x1a/123") == "App.lambda$run$0"
    assert unify_method_name("com.$Proxy42.invoke") == "com.$Proxy0.invoke"
    assert (
        unify_method_name("jdk.GeneratedMethodAccessor99.invoke")
        == "jdk.GeneratedMethodAccessor0.invoke"
    )
    assert unify_method_name("plain.Method.name") == "plain.Method.name"


def test_parse_report_both_formats():
    v1 = {
        "id": 1, "timestamp": "1600000000001",
        "errors": ["java.lang.Throwable"], "messages": ["m"],
        "elements": [{"name": "A.b", "file_name": "A.java",
                      "line_number": 3}],
    }
    v0 = {
        "id": 2, "timestamp": "1600000000002",
        "class": ["java.lang.Throwable"], "message": ["m"],
        "frames": ["A.b", "C.d"],
    }
    r1, r0 = parse_report(v1), parse_report(v0)
    assert r1["report_id"] == 1 and r1["caption"] == "A.b"
    assert r0["frames"] == ["A.b", "C.d"]
    assert r0["caption"] == "A.b -> C.d"
    with pytest.raises(ValueError):
        parse_report({"id": 3, "timestamp": "0"})


def test_read_reports_and_dedup_adapter(ray_session, tmp_path):
    d = write_reports_fixture(str(tmp_path / "reports"), n=30, seed=7)
    ds = read_reports(d)
    df = ds.to_pandas().sort_values("report_id").reset_index(drop=True)
    assert len(df) == 30
    assert list(df.columns) == [f.name for f in REPORTS_SCHEMA]
    assert df.report_id.tolist() == list(range(30))
    # planted exact dups: every i % 5 == 0 (i > 0) copies i-1's frames
    for i in range(5, 30, 5):
        assert df.caption[i] == df.caption[i - 1]
    # lambda/proxy suffixes unified
    joined = " ".join(df.caption)
    assert "$Proxy42" not in joined and "lambda$run$17" not in joined

    docs = reports_as_documents(ds).to_pandas()
    assert set(docs.columns) == {"image_id", "caption"}
    # int64 report ids pass straight through the engine's id domain
    assert docs.image_id.dtype.kind == "i"
    assert sorted(docs.image_id) == list(range(30))


def test_reports_feed_dedup_engine(ray_session, tmp_path):
    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    d = write_reports_fixture(str(tmp_path / "reports"), n=30, seed=7)
    docs = reports_as_documents(read_reports(d))
    res = run_dedup(
        docs, DedupConfig(stages=("exact", "minhash")), has_image=False
    )
    clusters = res["clusters"].to_pandas()
    assert len(clusters) == 30
    caps = read_reports(d).to_pandas().set_index("report_id").caption
    # every planted exact-dup pair must share a cluster
    cl = clusters.set_index("image_id").cluster_id
    for i in range(5, 30, 5):
        assert cl[i] == cl[i - 1], (i, caps[i], caps[i - 1])


def test_write_ranked_predictions_sink(ray_session, tmp_path):
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from stack_trace_deduplication_ray.sources.sinks import (
        write_ranked_predictions,
    )

    preds = rd.from_arrow(
        pa.table(
            {
                "query_id": ["q1"] * 5 + ["q2"] * 2,
                "candidate_id": ["c1", "c2", "c3", "c4", "c5", "d1", "d2"],
                "score": [0.9, 0.8, 0.8, 0.2, 0.1, 0.5, 0.4],
            }
        )
    )
    out_dir = str(tmp_path / "preds")
    man = write_ranked_predictions(preds, out_dir, k=3, lineage={"model": "t"})
    assert man["rows"] == 5  # q1 truncated to 3, q2 keeps 2
    assert man["model"] == "t"
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files  # partitioned parquet, not one giant file is fine too
    back = pq.read_table(out_dir).to_pandas()
    q1 = back[back.query_id == "q1"].sort_values(
        ["score", "candidate_id"], ascending=[False, True]
    )
    # deterministic K5 order: tie (0.8, c2/c3) broken by id
    assert q1.candidate_id.tolist() == ["c1", "c2", "c3"]
    assert json.load(open(os.path.join(out_dir, "_manifest.json")))["top_k"] == 3


def test_from_report_dicts_and_entry_sequences(ray_session):
    from stack_trace_deduplication_ray.sources.reports import (
        entry_sequences,
        from_report_dicts,
    )

    ds = from_report_dicts(
        [
            {
                "id": 1, "timestamp": "5",
                "errors": ["b.Err", "a.Err", "b.Err"],
                "messages": ["boom", "  "],
                "frames": ["Outer.run", "Inner.fail"],
            }
        ]
    )
    out = entry_sequences(ds, use_messages=True).to_pandas()
    assert list(out.seq[0]) == [
        "a.Err.throw", "b.Err.throw",  # sorted-unique, .throw suffix
        "boom",                         # blank message dropped
        "Inner.fail", "Outer.run",      # frames reversed (deepest first)
    ]
    plain = entry_sequences(ds, use_errors=False).to_pandas()
    assert list(plain.seq[0]) == ["Inner.fail", "Outer.run"]


def test_job_entry_point(ray_session, tmp_path, small_fixture_dir):
    """`python -m stack_trace_deduplication_ray.job` shape: runs the flagship
    over a parquet images table and writes a resumable run directory."""
    import json
    import os

    from stack_trace_deduplication_ray.job import main

    out = str(tmp_path / "run1")
    rc = main([
        "--input", f"{small_fixture_dir}/images.parquet",
        "--output", out,
        "--stages", "exact,minhash",
    ])
    assert rc == 0
    man = json.load(open(os.path.join(out, "_run_manifest.json")))
    assert man["rows"] == 1000
    assert os.path.isdir(os.path.join(out, "clusters"))
    assert os.path.isdir(os.path.join(out, "edges"))
    assert man["config"]["stages"] == ["exact", "minhash"]
