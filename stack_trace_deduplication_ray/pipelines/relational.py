"""Relational operators over the TPC-H-ish tables and the events log.

Covers the reference's aggregation / sort / top-k / join capability
classes (SURVEY.md §2.5 A1-A3, §2.7 K1-K3) as Ray Data groupby /
sort / broadcast-join pipelines. Column names match the SQL oracles in
``__ray_entry__`` exactly; float aggregates are rounded on BOTH sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.pipelines.util import sized_cfg
from stack_trace_deduplication_ray.sources.tables import read_table


def events_top_value_per_type(sf_dir: str, k: int = 10):
    """Top-k events by value per event_type (per-group sort + head —
    reference: per-query ranked truncation, eval_fast.py:95-96 and
    ranking_model.py:52,74). Output (event_type, event_id, value).

    Groups are processed at PARTITION granularity (one vectorized
    pandas groupby-head per partition, not one Python call per type)."""
    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def topk(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(
            ["event_type", "value", "event_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        return g.groupby("event_type", sort=False).head(k)[
            ["event_type", "event_id", "value"]
        ]

    return partitioned_groups(ds, "event_type", topk, sized_cfg(sf_dir, "events"))


def events_daily_user_agg(sf_dir: str):
    """Per-(user, day) event count and value sum (K1 sort-by-time
    analog as a windowed aggregate). Output (user_id, day, n, total)
    with total rounded to 4 places."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def day(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_pandas()
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                # string day: identical value text on the Ray and SQL
                # sides regardless of date/datetime dtype plumbing
                "day": pa.array(ts.dt.strftime("%Y-%m-%d"), type=pa.string()),
                "value": batch.column("value"),
            }
        )

    agg = (
        ds.map_batches(day, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total"))
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("total"),
            "total",
            pa.array(
                np.round(
                    batch.column("total").to_numpy(zero_copy_only=False), 4
                )
            ),
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


def users_first_event(sf_dir: str):
    """Keep-first per user: the earliest event (exact-dedup keep-first
    semantics on the time axis — reference chronological 'earlier
    report wins', issue.py:13-22). Output (user_id, first_event_id)."""
    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def first(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = g.groupby("user_id", sort=False, as_index=False).head(1)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].values,
                "first_event_id": g["event_id"].values,
            }
        )

    return partitioned_groups(ds, "user_id", first, sized_cfg(sf_dir, "events"))


def lineitem_pricing_summary(sf_dir: str, cutoff: str = "1998-09-02"):
    """TPC-H Q1-shaped pricing summary (sum/avg/count per flag+status).

    Vectorized per-batch compute + built-in partial aggregates — the
    A1-A3 aggregation class. Floats rounded to 4 places.
    """
    import datetime

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )
    cut = datetime.date.fromisoformat(cutoff)

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch.column("l_shipdate"), pa.scalar(cut))
        t = batch.filter(keep)
        disc_price = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "l_quantity": t.column("l_quantity"),
                "l_extendedprice": t.column("l_extendedprice"),
                "disc_price": disc_price,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )

    def rnd(batch: pa.Table) -> pa.Table:
        for col in ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"]:
            batch = batch.set_column(
                batch.schema.get_field_index(col),
                col,
                pa.array(
                    np.round(batch.column(col).to_numpy(zero_copy_only=False), 4)
                ),
            )
        return batch

    return agg.map_batches(rnd, batch_format="pyarrow")


def segment_order_stats(sf_dir: str):
    """Per-market-segment order stats via broadcast hash join:
    `customer` is the small side — ray.put once, dict-lookup per batch
    (never a shuffle join; SURVEY.md §4.2 broadcast pattern).
    Output (c_mktsegment, n_orders, max_price, avg_price rounded 4)."""
    from ray.data.aggregate import Count, Max, Mean

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust_map = dict(
        zip(*(cust.to_pandas()[c] for c in ["c_custkey", "c_mktsegment"]))
    )
    ref = ray.put(cust_map)

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        seg = [m.get(ck) for ck in batch.column("o_custkey").to_pylist()]
        return pa.table(
            {
                "c_mktsegment": pa.array(seg, type=pa.string()),
                "o_totalprice": batch.column("o_totalprice"),
            }
        )

    agg = (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Max("o_totalprice", alias_name="max_price"),
            Mean("o_totalprice", alias_name="avg_price"),
        )
    )

    def rnd(batch: pa.Table) -> pa.Table:
        for col in ["max_price", "avg_price"]:
            batch = batch.set_column(
                batch.schema.get_field_index(col),
                col,
                pa.array(
                    np.round(batch.column(col).to_numpy(zero_copy_only=False), 4)
                ),
            )
        return batch

    return agg.map_batches(rnd, batch_format="pyarrow")


def top_orders_by_revenue(sf_dir: str, k: int = 10):
    """Top-k orders by lineitem revenue (multi-table), with LATE
    MATERIALIZATION: `orders` is a fact table, so instead of joining
    it against every aggregated order (or collecting it to the driver
    — the round-1 anti-pattern), the top-k cut runs FIRST on the
    aggregate (distributed sort + limit), only the k winning keys are
    collected, and one filtering scan of `orders` (no shuffle)
    attaches their dates. Output (o_orderkey, revenue, o_orderdate),
    revenue rounded 4."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {"l_orderkey": batch.column("l_orderkey"), "rev": r}
        )

    per_order = (
        li.map_batches(rev, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "revenue": pa.array(
                    np.round(
                        batch.column("revenue").to_numpy(zero_copy_only=False),
                        4,
                    )
                ),
            }
        )

    from stack_trace_deduplication_ray.pipelines.util import distributed_topk

    top = distributed_topk(
        per_order.map_batches(rnd, batch_format="pyarrow"),
        [("revenue", True), ("l_orderkey", False)], k,
    ).to_pandas()
    keys = set(top["l_orderkey"])
    keys_ref = ray.put(keys)

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(keys_ref)
        mask = np.fromiter(
            (kk in wanted for kk in batch.column("o_orderkey").to_pylist()),
            dtype=bool, count=len(batch),
        )
        return batch.filter(pa.array(mask))

    dates = orders.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = (
        top.merge(dates, left_on="l_orderkey", right_on="o_orderkey")
        .sort_values(["revenue", "o_orderkey"], ascending=[False, True],
                     kind="stable")
    )
    return pa.Table.from_pandas(
        out[["o_orderkey", "revenue", "o_orderdate"]], preserve_index=False
    )


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per-user event stream split where the gap to
    the previous event exceeds `gap_minutes` — the windowed/stateful
    streaming-analog operator (reference: chronological replay with a
    forget window, ea/sim/main/data/buckets/event_state_model.py:106-121
    and issues_selector.py:31-48) expressed as ONE vectorized pass per
    hash partition (no per-user Python call): sort by (user, ts), mark
    session starts at user changes OR gap > threshold, global cumsum,
    re-base per user. Output (user_id, session_id, n_events)."""
    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def sessions(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        new_s = new_user | gap
        gsid = new_s.cumsum()  # global session counter
        base = gsid.groupby(g["user_id"].values).transform("min")
        sid = (gsid - base + 1).astype("int64")
        out = (
            pd.DataFrame({"user_id": g["user_id"], "session_id": sid})
            .groupby(["user_id", "session_id"], as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
        )
        return out.astype(
            {"user_id": "int64", "session_id": "int64", "n_events": "int64"}
        )

    return partitioned_groups(ds, "user_id", sessions, sized_cfg(sf_dir, "events"))


def events_prev_same_type(sf_dir: str, forget_minutes: int = 60):
    """Chronological predecessor links with a forget window: for each
    event, the most recent EARLIER event of the same type, kept only
    when the gap is <= forget_minutes — the reference's time-ordered
    candidate semantics ("a query only sees earlier reports",
    ea/sim/main/data/buckets/event_state_model.py:106-121) with the
    ReportTimeIssueSelector forget window (issues_selector.py:31-48)
    as one vectorized shift per hash partition.

    Output (event_id, prev_event_id) for linked events only."""
    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def links(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["event_type", "ts", "event_id"], kind="stable")
        same = g["event_type"].eq(g["event_type"].shift())
        gap_ok = g["ts"].diff() <= pd.Timedelta(minutes=forget_minutes)
        keep = (same & gap_ok).to_numpy()
        prev = g["event_id"].shift().to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[keep].astype(np.int64),
                "prev_event_id": prev[keep].astype(np.int64),
            }
        )

    return partitioned_groups(ds, "event_type", links, sized_cfg(sf_dir, "events"))


def events_replay_attach(sf_dir: str):
    """Chronological replay protocol over the events log — the
    reference's evaluation model applied as one batch query: events
    are conceptually applied one at a time against the issue state so
    far ("a query only sees earlier reports",
    /root/reference/ea/sim/main/data/buckets/event_state_model.py:106-121),
    each event either ATTACHES to the live issue whose key
    (event_type, props) it matches or OPENS a new issue
    (is_new_issue, event_state_model.py:28-30).

    issue_id(e) = the FIRST (min) event_id among same-key events at or
    before e in (ts, event_id) order; is_new = 1 iff e opened the
    issue. Computed as a hash-partitioned groupwise cumulative min
    (whole key groups co-located, one shuffle, vectorized cummin per
    partition).

    Output (event_id, issue_id, is_new). SQL-expressible (windowed
    cumulative MIN) -> DuckDB oracle ★.
    """
    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.functions import hashing as H
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    ds = read_table(
        sf_dir, "events", columns=["event_id", "event_type", "props", "ts"]
    )

    def key(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_pylist()
        pr = batch.column("props").to_pylist()
        k = H.hash_bytes_arrays(
            np.asarray([f"{a}\x1f{b}" for a, b in zip(et, pr)], dtype=object),
            seed=0x5E51,
        )
        return batch.append_column("rkey", pa.array(k.view(np.int64)))

    keyed = ds.map_batches(key, batch_format="pyarrow")

    def attach(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(
            ["event_type", "props", "ts", "event_id"], kind="stable"
        )
        issue = (
            g.groupby(["event_type", "props"], sort=False)["event_id"]
            .cummin()
            .to_numpy()
        )
        eid = g["event_id"].to_numpy()
        return pd.DataFrame(
            {
                "event_id": eid.astype(np.int64),
                "issue_id": issue.astype(np.int64),
                "is_new": (issue == eid).astype(np.int64),
            }
        )

    return partitioned_groups(
        keyed.select_columns(["rkey", "event_type", "props", "ts", "event_id"]),
        "rkey", attach, sized_cfg(sf_dir, "events"),
    )


def events_replay_windowed(sf_dir: str, forget_minutes: int = 240):
    """Windowed chronological replay: the attach-or-open protocol of
    `events_replay_attach` composed with the T12 forget window — an
    issue FORGETS members older than the window, so an event attaches
    to the live issue only when the issue's most recent member is
    within `forget_minutes`, and otherwise OPENS a new issue
    (reference ReportTimeIssueSelector.forget_days,
    /root/reference/ea/sim/main/data/buckets/issues_selector.py:31-48,
    composed with the replay model of event_state_model.py:106-121).

    issue_id = event_id of the event that opened the live session
    (the first member in (ts, event_id) order); is_new = 1 iff this
    event opened it. Hash-partitioned on the (event_type, props) key,
    vectorized gap / cumsum / session-first inside each partition.
    SQL-expressible (lag + windowed cumulative sum + first_value) ->
    DuckDB oracle ★.

    Output (event_id, issue_id, is_new).
    """
    from stack_trace_deduplication_ray.functions import hashing as H
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    ds = read_table(
        sf_dir, "events", columns=["event_id", "event_type", "props", "ts"]
    )

    def key(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_pylist()
        pr = batch.column("props").to_pylist()
        k = H.hash_bytes_arrays(
            np.asarray([f"{a}\x1f{b}" for a, b in zip(et, pr)], dtype=object),
            seed=0x5E51,
        )
        return batch.append_column("rkey", pa.array(k.view(np.int64)))

    keyed = ds.map_batches(key, batch_format="pyarrow")
    window_ns = np.int64(forget_minutes) * 60 * 1_000_000_000

    def attach(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(
            ["event_type", "props", "ts", "event_id"], kind="stable"
        )
        ts = g["ts"].to_numpy().astype("datetime64[ns]").view(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        key_change = np.ones(len(g), dtype=bool)
        et = g["event_type"].to_numpy()
        pr = g["props"].to_numpy()
        key_change[1:] = (et[1:] != et[:-1]) | (pr[1:] != pr[:-1])
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        is_new = key_change | (gap > window_ns)
        first_idx = np.nonzero(is_new)[0]
        sess = np.cumsum(is_new) - 1
        issue = eid[first_idx[sess]]
        return pd.DataFrame(
            {
                "event_id": eid,
                "issue_id": issue,
                "is_new": is_new.astype(np.int64),
            }
        )

    return partitioned_groups(
        keyed.select_columns(["rkey", "event_type", "props", "ts", "event_id"]),
        "rkey", attach, sized_cfg(sf_dir, "events"),
    )


def systematic_sample(sf_dir: str, modulus: int = 10):
    """Deterministic systematic sample: doc_id % modulus == 0
    (K6 sampling analog with an exactly SQL-matchable rule)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % modulus == 0))

    return ds.map_batches(fn, batch_format="pyarrow")


def normalized_texts(sf_dir: str):
    """Whitespace-collapsed lowercase text (M1/M3/M7 normalization
    class). Output (doc_id, text_norm); formula mirrors the SQL
    oracle: lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))."""
    from stack_trace_deduplication_ray.stages.signatures import normalize_captions

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        norm = normalize_captions(batch.column("text").to_pylist(), lowercase=True)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_norm": pa.array(norm, type=pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
