"""Raw crash-report ingestion: V1/V0 JSON report files -> one typed
Arrow table (the S3/S4 source operators).

Reference analogs: per-file JSON parsing StackParserV1/V0
(/root/reference/ea/sim/main/data/parsers/parser_v1.py:38-60,
parser_v0.py:24-38), the directory scan of DirectoryStackLoader
(stack_loader.py:27-60) and MethodNameUnifier's regex normalization
(parsers/base.py:21-32) — recast as `read_binary_files` (the scalable
Ray source for one-record-per-file corpora: file listing parallelizes,
parsing runs inside map_batches tasks, no per-file driver I/O or
lru_cache needed) + a vectorized parse batch fn with format
auto-dispatch per report.

Output schema (both formats normalize into it):
    report_id: int64          timestamp: int64 (epoch ms)
    errors:    list<string>   messages:  list<string>
    frames:    list<string>   (unified method names, outermost first)
    caption:   string         (" -> "-joined frame names — the
                               Stack.__hash__ exact-dup key surface,
                               stack.py:54-57, ready for the text
                               dedup engine)
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa

REPORTS_SCHEMA = pa.schema(
    [
        ("report_id", pa.int64()),
        ("timestamp", pa.int64()),
        ("errors", pa.list_(pa.string())),
        ("messages", pa.list_(pa.string())),
        ("frames", pa.list_(pa.string())),
        ("caption", pa.string()),
    ]
)

_NUM = r"(?:0(?:x|\.)[abcdef\d]+|\d+)"
_LAMBDA_RE = re.compile(rf"(\$)({_NUM}(?:/{_NUM})*)", re.IGNORECASE)
_GENERATED_RE = re.compile(r"(Generated\w{0,50}Accessor)(\d+)")
_PROXY_RE = re.compile(r"(\$Proxy)(\d+)")


def unify_method_name(name: str) -> str:
    """Collapse generated numeric suffixes (lambda$N, $ProxyN,
    Generated...AccessorN) to 0 so regenerated code keeps one identity
    (reference MethodNameUnifier, parsers/base.py:21-32; rewritten
    with capture groups because stdlib `re` lacks variable-length
    lookbehind)."""
    name = _LAMBDA_RE.sub(r"\g<1>0", name)
    name = _GENERATED_RE.sub(r"\g<1>0", name)
    name = _PROXY_RE.sub(r"\g<1>0", name)
    return name


def parse_report(doc: dict) -> dict:
    """One report dict (V1 or V0, auto-detected) -> normalized row.

    V1 carries frames as `elements` (structs with name/file/line); V0
    as flat `frames` strings and errors under `class`.
    """
    if "elements" in doc:  # V1
        frames = [unify_method_name(e["name"]) for e in doc["elements"]]
        errors = doc.get("errors") or []
    elif "frames" in doc:  # V0
        frames = [unify_method_name(f) for f in doc["frames"]]
        errors = doc.get("class") or doc.get("errors") or []
    else:
        raise ValueError("unknown report format (no elements/frames)")
    messages = doc.get("messages") or doc.get("message") or []
    return {
        "report_id": int(doc["id"]),
        "timestamp": int(doc["timestamp"]),
        "errors": [str(e) for e in errors],
        "messages": [str(m) for m in messages],
        "frames": frames,
        "caption": " -> ".join(frames),
    }


def read_reports(path: str):
    """Directory (or file list) of `{id}.json` reports -> Dataset with
    REPORTS_SCHEMA. Listing + reading scale as Ray read tasks; parsing
    is a batch map."""
    import ray.data as rd

    from stack_trace_deduplication_ray.sources.tables import tune_data_context

    tune_data_context()
    raw = rd.read_binary_files(path, file_extensions=["json"])

    def parse(batch: pa.Table) -> pa.Table:
        rows = [
            parse_report(json.loads(b.decode("utf-8")))
            for b in batch.column("bytes").to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=REPORTS_SCHEMA)

    return raw.map_batches(parse, batch_format="pyarrow")


def reports_as_documents(reports_ds):
    """Adapt a reports Dataset to the dedup engine's text input
    (image_id:int64, caption) — int ids pass through the engine, so
    the min-id representative rule equals min(report_id) exactly."""

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch.column("report_id").cast(pa.int64()),
                "caption": batch.column("caption"),
            }
        )

    return reports_ds.map_batches(conv, batch_format="pyarrow")


def write_reports_fixture(tmp_dir: str, n: int = 30, seed: int = 7) -> str:
    """Deterministic raw-report fixture: V1 and V0 JSON files with
    planted exact-dup frame sequences (test + demo input)."""
    import os

    rng = np.random.default_rng(seed)
    os.makedirs(tmp_dir, exist_ok=True)
    methods = [
        "com.app.Service.handle", "com.app.Db.query",
        "java.util.List.get", "com.app.Worker.lambda$run$17",
        "com.app.$Proxy42.invoke", "jdk.GeneratedMethodAccessor99.invoke",
    ]
    for i in range(n):
        depth = int(rng.integers(2, 6))
        frames = [methods[int(k)] for k in rng.integers(0, len(methods), depth)]
        if i % 5 == 0 and i > 0:  # planted exact dup of report i-1
            prev = json.load(open(os.path.join(tmp_dir, f"{i - 1}.json")))
            frames = (
                [e["name"] for e in prev["elements"]]
                if "elements" in prev else prev["frames"]
            )
        doc: dict
        if i % 2 == 0:  # V1
            doc = {
                "id": i,
                "timestamp": str(1_600_000_000_000 + i * 1000),
                "errors": ["java.lang.Throwable"],
                "messages": [f"failure {i % 3}"],
                "elements": [
                    {"name": f, "file_name": "X.java", "line_number": 1}
                    for f in frames
                ],
            }
        else:  # V0
            doc = {
                "id": i,
                "timestamp": str(1_600_000_000_000 + i * 1000),
                "class": ["java.lang.Throwable"],
                "message": [f"failure {i % 3}"],
                "frames": frames,
            }
        with open(os.path.join(tmp_dir, f"{i}.json"), "w") as f:
            json.dump(doc, f)
    return tmp_dir


def from_report_dicts(reports: list[dict]):
    """In-memory report source (S2 analog of RequestStackLoader,
    /root/reference/ea/sim/main/data/stack_loader.py:63-80): parsed
    dicts -> the same normalized Dataset as read_reports."""
    import ray.data as rd

    rows = [parse_report(d) for d in reports]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=REPORTS_SCHEMA))


def entry_sequences(
    reports_ds,
    use_errors: bool = True,
    use_messages: bool = False,
    unique_errors: bool = True,
    throw_suffix: bool = True,
):
    """Entry->sequence coders fused into one batch map (the reference's
    Exception2Seq / Message2Seq / MultiEntry2Seq,
    ea/sim/main/preprocess/entry_coders.py:87-148): frames (reversed —
    deepest first, Stack2Seq entry_coders.py:62-84), optionally
    prefixed by sorted-unique exception tokens ('.throw'-suffixed) and
    non-blank messages. Output (report_id, seq: list<string>)."""

    def fn(batch: pa.Table) -> pa.Table:
        frames = batch.column("frames").to_pylist()
        errors = batch.column("errors").to_pylist()
        messages = batch.column("messages").to_pylist()
        seqs = []
        for fr, er, ms in zip(frames, errors, messages):
            seq: list[str] = []
            if use_errors:
                toks = sorted(set(er)) if unique_errors else list(er)
                if throw_suffix:
                    toks = [t + ".throw" for t in toks]
                seq.extend(toks)
            if use_messages:
                seq.extend(m for m in ms if m.strip())
            seq.extend(reversed(fr))  # deepest frame first
            seqs.append(seq)
        return pa.table(
            {
                "report_id": batch.column("report_id"),
                "seq": pa.array(seqs, type=pa.list_(pa.string())),
            }
        )

    return reports_ds.map_batches(fn, batch_format="pyarrow")
